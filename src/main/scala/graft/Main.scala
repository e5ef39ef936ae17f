package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.job.ExtractionJob

/** spark-submit entry point — the reference's CLI surface (cli.py:144-404)
  * re-expressed as a batch job:
  *
  * {{{
  * spark-submit --class graft.Main <jar> \
  *   --input <parquet/iceberg path | synth:<rows> | warc:<path-glob>> \
  *   --output <dir> \
  *   [--threshold 0.85] [--diagnostics] [--force-heavy]
  *   [--max-bytes 524288] [--groups 64] [--groups-per-commit 16]
  *   [--repartition-input] [--batched-heavy]
  * graft.Main --status --output <dir>   # resume/status probe (the
  *   reference's ocr_status job table, mcp_server.py:106-254, as a
  *   lineage-table read)
  * graft.Main --prepare --input <documents parquet> --output <dir>
  *   # one-command training-corpus prep: fused gopher-gate + exact dedup +
  *   # train/val/test split (graft.job.PrepareJob), survivors written
  *   # partitionBy(split) with a write-then-commit lineage table
  * }}}
  *
  * Exit code 0 iff no failure rows (cli.py:404 contract).
  */
object Main {

  final case class Args(
      input: String = null,
      output: String = null,
      threshold: Double = 0.85,
      diagnostics: Boolean = false,
      forceHeavy: Boolean = false,
      maxBytes: Int = 512 * 1024,
      groups: Int = 64,
      groupsPerCommit: Int = 16,
      repartitionInput: Boolean = false,
      batchedHeavy: Boolean = false,
      status: Boolean = false,
      prepare: Boolean = false
  )

  def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case Nil => acc
    case "--input" :: v :: rest => parse(rest, acc.copy(input = v))
    case "--output" :: v :: rest => parse(rest, acc.copy(output = v))
    case "--threshold" :: v :: rest => parse(rest, acc.copy(threshold = v.toDouble))
    case "--diagnostics" :: rest => parse(rest, acc.copy(diagnostics = true))
    case "--force-heavy" :: rest => parse(rest, acc.copy(forceHeavy = true))
    case "--max-bytes" :: v :: rest => parse(rest, acc.copy(maxBytes = v.toInt))
    case "--groups" :: v :: rest => parse(rest, acc.copy(groups = v.toInt))
    case "--groups-per-commit" :: v :: rest => parse(rest, acc.copy(groupsPerCommit = v.toInt))
    case "--repartition-input" :: rest => parse(rest, acc.copy(repartitionInput = true))
    case "--batched-heavy" :: rest => parse(rest, acc.copy(batchedHeavy = true))
    case "--status" :: rest => parse(rest, acc.copy(status = true))
    case "--prepare" :: rest => parse(rest, acc.copy(prepare = true))
    case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toList)
    require(args.output != null, "--output is required")
    val builder = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
    // spark-submit injects the master; default for direct JVM launches
    if (!sys.props.contains("spark.master") && sys.env.get("MASTER").isEmpty)
      builder.master(s"local[${Runtime.getRuntime.availableProcessors()}]")
        .config("spark.sql.shuffle.partitions",
          Runtime.getRuntime.availableProcessors().toString)
    implicit val spark: SparkSession = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.status) {
      // status probe: committed groups + counters from the lineage table.
      // Same read policy as runCheckpointed (ExtractionJob.readCommittedGroups):
      // missing table or data-file-less directory (first-write crash) reads
      // as fresh; a corrupted table with real data files still surfaces
      val lin =
        try spark.read.parquet(s"${args.output}/lineage")
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getErrorClass == "PATH_NOT_FOUND" =>
            spark.emptyDataFrame
          case e: org.apache.spark.sql.AnalysisException
              if e.getErrorClass == "UNABLE_TO_INFER_SCHEMA" &&
                !graft.job.ExtractionJob.hasDataFiles(s"${args.output}/lineage") =>
            spark.emptyDataFrame
        }
      if (lin.isEmpty) println(s"""{"committed_groups":0,"docs":0,"failures":0}""")
      else {
        val row = lin.agg(
          countDistinct(col("commit_group")).as("g"),
          sum(col("doc_count")).as("d"),
          sum(col("failure_count")).as("f")).first()
        println(
          s"""{"committed_groups":${row.getLong(0)},"docs":${row.getLong(1)},"failures":${row.getLong(2)}}""")
      }
      spark.stop()
      return
    }

    if (args.prepare) {
      // one-command training-corpus prep over a documents table
      // (doc_id, text, ...): fused gate+dedup+split, survivors written
      // partitioned by split, lineage committed last (graft.job.PrepareJob)
      require(args.input != null, "--input is required")
      require(!args.input.startsWith("synth:") && !args.input.startsWith("warc:"),
        "--prepare reads a documents-shaped parquet table (doc_id, text, ...)")
      val docs = spark.read.parquet(args.input)
      val res = graft.job.PrepareJob.run(docs, args.output)
      println(res.json)
      spark.stop()
      return
    }

    require(args.input != null, "--input is required")
    val pages =
      if (args.input.startsWith("synth:"))
        CorpusGen.pages(spark, args.input.stripPrefix("synth:").toLong).toDF()
      else if (args.input.startsWith("warc:"))
        // raw Common-Crawl-style archives: stream-decoded per file into the
        // standard page table shape (graft.sources.Warc)
        graft.sources.Warc.toTable(spark, args.input.stripPrefix("warc:"))
      else spark.read.parquet(args.input)

    val cfg = ExtractionJob.JobConfig(
      threshold = args.threshold,
      diagnostics = args.diagnostics,
      forceHeavy = args.forceHeavy,
      maxBytes = args.maxBytes,
      numGroups = args.groups,
      groupsPerCommit = args.groupsPerCommit,
      repartitionInput = args.repartitionInput,
      batchedHeavy = args.batchedHeavy)

    // phase timings (reference: phase_timings map, pipeline.py:86-98)
    val t0 = System.nanoTime()
    val lineage = ExtractionJob.runCheckpointed(pages, cfg, args.output)
    val extractSecs = (System.nanoTime() - t0) / 1e9
    val failures = lineage.map(_.failure_count).sum
    val docs = lineage.map(_.doc_count).sum
    val docsPerSec = if (extractSecs > 0) docs / extractSecs else 0.0
    println(
      s"""{"committed_groups":${lineage.map(_.commit_group).distinct.size},"docs":$docs,"failures":$failures,""" +
        s""""phase_timings":{"extract_and_commit":${f"$extractSecs%.3f"}},"docs_per_sec":${f"$docsPerSec%.1f"}}""")
    spark.stop()
    if (failures > 0) sys.exit(1) // error_count!=0 -> nonzero exit (cli.py:404)
  }
}
