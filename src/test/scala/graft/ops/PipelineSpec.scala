package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PipelineSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark
  import spark.implicits._

  private val passText =
    ("the reading of history and language must be that we have " +
      "reason to work with the question of meaning and truth today ") * 3

  private lazy val docs = Seq(
    (0L, passText),                       // passes gopher, canonical of {0, 7}
    (1L, passText + "tail variation one"), // passes gopher, unique
    (2L, "too short"),                     // fails gopher (word count)
    (3L, null.asInstanceOf[String]),       // null text -> sentinel group
    (4L, null.asInstanceOf[String]),       // second null: 3 is canonical
    (5L, "short junk"),                    // fails gopher, unique
    (6L, "short junk"),                    // exact dup of 5
    (7L, passText)                         // exact dup of 0
  ).toDF("doc_id", "text")

  test("prepare: one row per unique text, canonical id, dup counts, gate") {
    val r = Pipeline.prepare(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Boolean]("keep"), x.getAs[Long]("dup_count")))).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 5L)) // canonical ids only
    assert(r(0L) == ((true, 2L)))  // {0, 7}
    assert(r(1L) == ((true, 1L)))
    assert(r(2L) == ((false, 1L)))
    assert(r(3L) == ((false, 2L))) // null-text sentinel groups {3, 4}
    assert(r(5L) == ((false, 2L))) // {5, 6}
  }

  test("prepareRollup matches the unfused three-operator composition") {
    val unfused = {
      val kept = TextAnalysis.gopherRules(docs).filter(col("keep")).select("doc_id")
      val survivors = Dedup.markDuplicates(docs)
        .filter(!col("is_duplicate")).select("doc_id")
      docs.join(kept, Seq("doc_id")).join(survivors, Seq("doc_id"))
        .select(Pipeline.splitName(col("doc_id")).as("split"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("total_ws_tokens"))
    }
    val a = Pipeline.prepareRollup(docs).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    val b = unfused.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("prepare plan: one corpus scan, partial-aggregated, and HASH-aggregated") {
    val parquetDir = java.nio.file.Files.createTempDirectory("graft-pipe").toFile
    try {
      docs.write.mode("overwrite").parquet(parquetDir.getAbsolutePath)
      val fromDisk = spark.read.parquet(parquetDir.getAbsolutePath)
      val plan = Pipeline.prepareRollup(fromDisk).queryExecution
      // the fusion claim: the previous composition scanned documents three
      // times (gopherRules, markDuplicates, final join); the fused plan
      // must read the corpus exactly once
      val scans = plan.optimizedPlan.collectLeaves()
      assert(scans.length == 1, s"expected ONE corpus scan, got:\n${plan.optimizedPlan}")
      // and the dedup group-min must be partial-aggregated (map-side
      // combine), so a mega-duplicate key never ships row-per-copy
      val executed = plan.executedPlan.toString
      assert(executed.contains("partial_min"),
        s"expected a partial min aggregate in:\n$executed")
      // r4 verdict #3: the all-primitive agg buffer must plan as
      // HashAggregate — the previous min_by(struct) buffer forced a
      // SortAggregate, i.e. a per-map-task sort before the partial agg
      assert(executed.contains("HashAggregate"),
        s"expected HashAggregate in:\n$executed")
      assert(!executed.contains("SortAggregate"),
        s"no SortAggregate may remain in:\n$executed")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(parquetDir)
      ()
    }
  }

  test("packSequences matches the sequential prefix sum, any input partitioning") {
    // 40 docs, varying token counts, capacity 7: many boundary straddles
    val texts = (0L until 40L).map { i =>
      val n = (i % 5 + 1).toInt // 1..5 tokens
      (i, Seq.tabulate(n)(j => s"w${i}_$j").mkString(" "))
    }
    val expected = {
      var cum = 0L
      texts.sortBy(_._1).map { case (id, txt) =>
        val n = txt.split(" ").length.toLong
        val start = cum
        cum += n
        (id, n, start, start / 7L, (cum - 1) / 7L)
      }.toSet
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      Pipeline.packSequences(df, capacity = 7L).collect()
        .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_tokens"),
          x.getAs[Long]("seq_start"), x.getAs[Long]("pack_first"),
          x.getAs[Long]("pack_last"))).toSet
    val base = texts.toDF("doc_id", "text")
    assert(run(base) == expected)
    // physical-partitioning independence: a scrambled 7-partition input
    // must produce the identical packing
    assert(run(base.repartition(7, col("doc_id"))) == expected)
  }

  test("selectBudget fills the budget in quality order, any input partitioning") {
    // quality order: long English-ish docs rank above digit soup; the
    // expected set replays the greedy fill sequentially over the scores
    // the operator itself reports (score parity with the oracle is pinned
    // by the q_quality_score / q_select_budget driver oracles)
    val texts = (0L until 30L).map { i =>
      val txt =
        if (i % 3 == 0) Seq.fill(20)("the cat sat of and in a mat").mkString(" ")
        else if (i % 3 == 1) s"short doc $i"
        else Seq.fill(10)(s"number ${i * 7}").mkString(" ")
      (i, txt)
    }
    val base = texts.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Pipeline.selectBudget(df, budget = 500L).collect()
        .map(x => (x.getAs[Long]("doc_id"), x.getAs[Double]("quality_score"),
          x.getAs[Long]("n_tokens"), x.getAs[Long]("cum_tokens"),
          x.getAs[Boolean]("selected"))).toSet
    val got = run(base)
    // sequential replay: sort by (score desc, id), accumulate, cut at 500
    val expected = {
      var cum = 0L
      got.toSeq.sortBy { case (id, q, _, _, _) => (-q, id) }.map {
        case (id, q, n, _, _) =>
          cum += n
          (id, q, n, cum, cum <= 500L)
      }.toSet
    }
    assert(got == expected)
    assert(got.exists(_._5) && got.exists(!_._5), "budget must split the corpus")
    // physical-partitioning independence
    assert(run(base.repartition(7, col("doc_id"))) == got)
  }

  test("rebalanceByLang downsamples only overrepresented languages, null-safely") {
    // en: 400 docs x 10 tokens = 4000; de: 100 x 10 = 1000; one null-lang
    // 3-token doc. total 5003. target en 0.2 -> keep_prob
    // round(0.2*5003/4000, 4) = 0.2502; de absent from targets -> 1.0;
    // null lang -> 1.0 and NOT dropped.
    val docs = ((0L until 400L).map(i => (i, Seq.fill(10)("w").mkString(" "), Some("en"))) ++
      (400L until 500L).map(i => (i, Seq.fill(10)("w").mkString(" "), Some("de"))) ++
      Seq((500L, "x y z", Option.empty[String])))
      .toDF("doc_id", "text", "lang")
    val r = Pipeline.rebalanceByLang(docs, Map("en" -> 0.2)).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[String]("lang"), x.getAs[Double]("keep_prob"),
          x.getAs[Boolean]("keep")))).toMap
    assert(r.size == 501, "no doc may vanish, null-lang included")
    assert(r(450L) == (("de", 1.0, true)))
    assert(r(500L)._2 == 1.0 && r(500L)._3)
    val enKeep = (0L until 400L).count(r(_)._3)
    assert(r(0L)._2 == 0.2502, r(0L).toString)
    // md5 buckets are uniform: ~100 of 400 survive (generous bounds)
    assert(enKeep > 55 && enKeep < 150, s"expected ~100 en survivors, got $enKeep")
    // determinism: the identical call selects the identical subset
    val r2 = Pipeline.rebalanceByLang(docs, Map("en" -> 0.2)).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    assert(r.map { case (k, v) => k -> v._3 } == r2)
  }

  test("rebalanceByLang edges: empty target map keeps everything, zero budget selects nothing") {
    val docs = Seq((0L, "a b c", "en"), (1L, "d e", "de"))
      .toDF("doc_id", "text", "lang")
    val all = Pipeline.rebalanceByLang(docs, Map.empty).collect()
    assert(all.length == 2 &&
      all.forall(r => r.getAs[Double]("keep_prob") == 1.0 && r.getAs[Boolean]("keep")))
    val none = Pipeline.selectBudget(docs.select(col("doc_id"), col("text")), budget = 0L)
      .collect()
    assert(none.length == 2 && none.forall(!_.getAs[Boolean]("selected")))
  }

  test("shuffleOrder is a seeded permutation, partitioning-independent") {
    val docs = (0L until 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Pipeline.shuffleOrder(df, seed).collect()
        .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("shuffle_rank")).toMap
    val a = run(docs, 42L)
    // a permutation of 0..199
    assert(a.values.toSeq.sorted == (0L until 200L))
    // deterministic, and independent of physical partitioning
    assert(run(docs, 42L) == a)
    assert(run(docs.repartition(7, col("doc_id")), 42L) == a)
    // a different seed gives a genuinely different order
    val b = run(docs, 43L)
    assert(b.values.toSeq.sorted == (0L until 200L))
    assert(a != b)
  }

  test("splitName is deterministic and covers all three splits at scale") {
    val ids = spark.range(0, 2000).select(col("id").as("doc_id"))
    val dist = ids.select(Pipeline.splitName(col("doc_id")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist.keySet == Set("train", "val", "test"))
    // 80/10/10 within generous tolerance on 2000 ids
    assert(dist("train") > 1400 && dist("train") < 1800, dist.toString)
    assert(dist("val") > 100 && dist("test") > 100, dist.toString)
  }
}
