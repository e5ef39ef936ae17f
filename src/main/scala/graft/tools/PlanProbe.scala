package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: print the executed plans of the skew-immune dedup
  * operators so the plan-shape assertions in DedupSkewSpec match what
  * Spark actually produces (Window absence, HashAggregate, ReusedExchange).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val docs = (0 until 200).map { i =>
      val text = if (i < 120) "mass duplicated boilerplate page body text here"
                 else s"unique document number $i with words $i alpha beta gamma delta epsilon zeta eta theta"
      (i.toLong, text)
    }.toDF("doc_id", "text")

    val mark = graft.ops.Dedup.markDuplicates(docs)
    mark.collect()
    println("=== markDuplicates executed ===")
    println(mark.queryExecution.executedPlan.toString.take(4000))

    val pd = graft.ops.Dedup.passageDupStats(docs, n = 4)
    pd.collect()
    println("=== passageDupStats executed ===")
    println(pd.queryExecution.executedPlan.toString.take(6000))

    val ng = graft.ops.Dedup.ngramJaccardPairs(docs, n = 4, threshold = 0.9, maxShingleDf = 20)
    ng.collect()
    println("=== ngram optimized (logical) ===")
    println(ng.queryExecution.optimizedPlan.toString.take(3000))
    spark.stop()
  }
}
