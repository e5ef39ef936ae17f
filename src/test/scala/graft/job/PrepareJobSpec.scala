package graft.job

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PrepareJobSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  // a gopher-passing text: long enough, alphabetic, sentence-shaped
  private def goodText(salt: Int): String =
    (1 to 60).map(i => s"sentence$salt word$i runs along the page and continues").mkString(". ") + "."

  test("--prepare pipeline: gate + dedup + split, partitioned write, resume") {
    import spark.implicits._
    val dup = goodText(1)
    val docs = (
      (0L until 40L).map(i => (i, goodText(i.toInt + 100))) ++ // uniques
        Seq(50L, 51L, 52L).map(i => (i, dup)) ++ // exact-dup group, canon 50
        Seq(60L -> "tiny", 61L -> "!!! ??? !!!") // gopher-gated out
    ).toDF("doc_id", "text")

    val dir = Files.createTempDirectory("prep").toFile.getAbsolutePath
    val r1 = PrepareJob.run(docs, dir)
    assert(!r1.resumed)
    assert(r1.inputDocs == 45)
    assert(r1.survivors == 41, r1) // 40 uniques + 1 canonical of the dup group
    assert(r1.dupDropped == 2, r1)
    assert(r1.gatedOut == 2, r1)

    // written survivors: partitioned by split, canonical ids only, text intact
    val written = spark.read.parquet(s"$dir/prepared")
    assert(written.count() == 41)
    assert(written.columns.toSet == Set("doc_id", "text", "split", "ws_tokens", "dup_count"))
    val dupRows = written.filter(col("dup_count") === 3).collect()
    assert(dupRows.map(_.getAs[Long]("doc_id")).toSeq == Seq(50L))
    assert(dupRows.head.getAs[String]("text") == dup)
    // physical layout: split=... directories (downstream readers prune)
    val splitDirs = new java.io.File(s"$dir/prepared").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("split=")).toSet
    assert(splitDirs.nonEmpty && splitDirs.subsetOf(Set("split=train", "split=val", "split=test")))
    // split assignment matches the deterministic bucket function
    val expectSplits = written.select(col("doc_id"),
      graft.ops.Pipeline.splitName(col("doc_id")).as("expect"))
      .filter(col("expect") =!= col("split")).count()
    assert(expectSplits == 0)

    // a documents table already carrying an output column name fails FAST
    // (before any gate/dedup work), e.g. re-preparing a prepared table
    val clashErr = intercept[IllegalArgumentException] {
      PrepareJob.run(docs.withColumn("split", lit("train")),
        Files.createTempDirectory("prepclash").toFile.getAbsolutePath)
    }
    assert(clashErr.getMessage.contains("already prepared"), clashErr.getMessage)

    // resume: committed lineage short-circuits; counts replayed, no rewrite
    val before = new java.io.File(s"$dir/prepared").lastModified()
    val r2 = PrepareJob.run(docs.limit(1), dir) // different input would change output if re-run
    assert(r2.resumed)
    assert(r2.survivors == r1.survivors && r2.inputDocs == r1.inputDocs)
    assert(new java.io.File(s"$dir/prepared").lastModified() == before)
  }
}
