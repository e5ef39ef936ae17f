package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.job.ExtractionJob

/** One-off sustained-scale probe: 1M docs through the full pipeline at
  * local[32] — demonstrates the narrow plan holds throughput at 12x the
  * scaling-bench size with flat memory (no caching on the inline path).
  */
object SustainedProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("GRAFT_PROBE_ROWS", "1000000").toLong
    val parts = sys.env.getOrElse("GRAFT_PROBE_PARTS", "256").toInt
    val groups = sys.env.getOrElse("GRAFT_PROBE_GROUPS", "256").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    ExtractionJob.extract(CorpusGen.pages(spark, 40000, partitions = 128).toDF(),
      ExtractionJob.JobConfig(numPartitions = 128))(spark).count()
    val pages = CorpusGen.pages(spark, rows, partitions = parts).toDF()
    val cfg = ExtractionJob.JobConfig(numGroups = groups, numPartitions = parts)
    val t0 = System.nanoTime()
    val n = ExtractionJob.extract(pages, cfg)(spark).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"sustained","rows":$n,"wall_s":$secs%.2f,"docs_per_sec":${n / secs}%.0f}""")
    spark.stop()
  }
}
