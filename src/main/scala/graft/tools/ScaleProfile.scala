package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.job.ExtractionJob

/** Ad-hoc: alternating-level repeated measurement to separate machine noise
  * from structural scaling.
  */
object ScaleProfile {
  def runOnce(cpus: Int, rows: Long): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val pages = CorpusGen.pages(spark, rows, partitions = cpus * 4).toDF()
      val cfg = ExtractionJob.JobConfig(numGroups = 64, numPartitions = cpus * 4)
      val t0 = System.nanoTime()
      val n = ExtractionJob.extract(pages, cfg)(spark).count()
      val secs = (System.nanoTime() - t0) / 1e9
      require(n == rows)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      secs
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = 80000L
    runOnce(4, 20000); runOnce(16, 20000) // warmup
    for (i <- 1 to 3; cpus <- Seq(4, 16)) {
      val s = runOnce(cpus, rows)
      println(f"rep=$i cpus=$cpus wall=$s%.2f thr=${rows / s}%.0f")
    }
  }
}
