package graft.tools

import org.apache.spark.sql.SparkSession

/** Transient probe: times one named query in isolation (default
  * q_repetition) to separate genuine plan regressions from host-throttle
  * bursts in the batch bench.
  */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q_repetition")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"$q rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
