package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-7 plan capture: writes `.explain("formatted")` output for the
  * named queries to `plans/r07/<query>_<tag>.txt` (tag = first arg, e.g.
  * "before"/"after"), using the same session configuration as the frozen
  * bench so the captured plans are the ones the driver's runs execute.
  */
object R07Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R07Plans <tag> <query>...")
    val tag = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r07"))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r07/${n}_$tag.txt"), plan)
      println(s"wrote plans/r07/${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
