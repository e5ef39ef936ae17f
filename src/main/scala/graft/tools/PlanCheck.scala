package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: dump formatted physical plans for key queries to verify
  * pushdown / broadcast / codegen properties.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_agg_filter", "q_join_broadcast", "q_dedup_ngram", "q_ann_brute",
      "q_quality_score", "q_dedup_simhash_pairs")
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
