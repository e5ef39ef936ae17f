package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Plan-shape guards for the skew-immune dedup formulations (VERDICT r2 #1):
  * per-key statistics (exact-dup canonical id, shingle df, passage df) must
  * be partial-aggregated groupBy + join-back, never an unordered window — a
  * window partition runs on ONE task, so a mass-duplicate content hash or a
  * corpus-common shingle (df 10^7+ at web scale) would pin its entire
  * posting list on a single spilling task before any cap could drop it.
  * Partial aggregation shrinks the hot key to one row per map task.
  */
class DedupSkewSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark
  import spark.implicits._

  // planted mega-key corpus: one boilerplate text duplicated across most of
  // the corpus (the mass-duplication regime), a handful of unique docs
  private lazy val skewed = (0 until 800).map { i =>
    val text =
      if (i < 700) "mass duplicated boilerplate page body shared across the whole crawl"
      else s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i" // every token doc-unique
    (i.toLong, text)
  }.toDF("doc_id", "text")

  private def noWindow(df: DataFrame): Unit = {
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.isEmpty, s"expected no Window node, found: $windows")
    assert(
      df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty,
      "expected groupBy aggregation on the per-key statistic path")
  }

  test("markDuplicates: mega-key runs through partial aggregation, not a window") {
    val marked = Dedup.markDuplicates(skewed)
    noWindow(marked)
    val r = marked.collect()
    // map-side combine is the skew defence: the physical plan must show a
    // partial min under the hash exchange
    assert(marked.queryExecution.executedPlan.toString.contains("partial_min"))
    assert(r.length == 800)
    val dups = r.filter(_.getAs[Boolean]("is_duplicate"))
    assert(dups.length == 699) // 700 copies, one survivor
    assert(dups.forall(_.getAs[Long]("canonical_id") == 0L))
    assert(r.filter(!_.getAs[Boolean]("is_duplicate")).length == 101)
  }

  test("markDuplicatesIds: text is pruned before the exchange and values match the annotating form") {
    val skinny = Dedup.markDuplicatesIds(skewed)
    noWindow(skinny)
    // the annotating form must carry text through the join-back shuffle (its
    // contract), the skinny form must NOT: text absent from every scan leaf
    // means it cannot appear in any exchange either
    val leaves = skinny.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty)
    leaves.foreach { leaf =>
      assert(!leaf.output.exists(_.name == "text"),
        s"text must be pruned from the skinny path's scan, got: ${leaf.output}")
    }
    assert(skinny.queryExecution.executedPlan.toString.contains("partial_min"))
    assert(skinny.columns.toSeq == Seq("doc_id", "canonical_id", "is_duplicate"))
    val s = skinny.collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("canonical_id"), x.getAs[Boolean]("is_duplicate"))).toMap
    val full = Dedup.markDuplicates(skewed).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("canonical_id"), x.getAs[Boolean]("is_duplicate"))).toMap
    assert(s == full)
  }

  test("markDuplicatesIds keeps and groups null-text rows like the annotating form") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(0L, "alpha"),
      org.apache.spark.sql.Row(1L, null),
      org.apache.spark.sql.Row(2L, null),
      org.apache.spark.sql.Row(3L, "alpha"))
    val docs = spark.createDataFrame(rows, schema)
    val r = Dedup.markDuplicatesIds(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("canonical_id"), x.getAs[Boolean]("is_duplicate"))).toMap
    assert(r.size == 4, s"null-text rows must survive: $r")
    assert(r(1L) == ((1L, false)) && r(2L) == ((1L, true)))
    assert(r(3L) == ((0L, true)))
  }

  test("markDuplicates keeps and groups null-text rows (join must not drop null keys)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(0L, "alpha"),
      org.apache.spark.sql.Row(1L, null),
      org.apache.spark.sql.Row(2L, null),
      org.apache.spark.sql.Row(3L, "alpha"))
    val docs = spark.createDataFrame(rows, schema)
    val r = Dedup.markDuplicates(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("canonical_id"), x.getAs[Boolean]("is_duplicate"))).toMap
    assert(r.size == 4, s"null-text rows must survive: $r")
    // nulls form ONE group (window/oracle semantics): min id 1 is canonical
    assert(r(1L) == ((1L, false)) && r(2L) == ((1L, true)))
    assert(r(3L) == ((0L, true)))
  }

  test("ngramJaccardPairs: shingle df is a partial-aggregated groupBy, not a window") {
    val pairs = Dedup.ngramJaccardPairs(skewed, n = 4, threshold = 0.8, maxShingleDf = 64)
    noWindow(pairs)
    assert(pairs.queryExecution.executedPlan.toString.contains("partial_count"))
    // the 700-doc mega-cluster exceeds the cap: all its shingles drop (the
    // documented route-to-exact escape), unique docs share nothing
    assert(pairs.count() == 0)
  }

  test("passageDupStats: cross-doc df is a partial-aggregated groupBy with exchange reuse") {
    val stats = Dedup.passageDupStats(skewed, n = 4)
    noWindow(stats)
    val r = stats.collect()
    val byDoc = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("dup_fraction")).toMap
    assert(byDoc(0L) == 1.0) // every window of a mass-dup doc is cross-doc duplicated
    assert(byDoc(700L) == 0.0) // unique docs share no window
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"))
    // the explode+md5 map side must be evaluated ONCE: the df branch and the
    // join probe branch read the same (h, doc_id) exchange
    assert(plan.contains("ReusedExchange"), s"expected ReusedExchange in:\n$plan")
  }
}
