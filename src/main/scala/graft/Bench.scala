package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS and prints ONE JSON line.
  * The two-cluster-size scaling evidence lives in graft.ScalingBench
  * (writes BENCH.md) — this main is the driver's fixed-parallelism probe.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize through the noop sink, NOT count(): under a count(1)
    // aggregate Catalyst prunes every deterministic projected column, so a
    // pure-Column query (md5/regex chains) would be timed as a bare scan.
    // The noop writer evaluates every output row in full.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JVM/codegen warmup on a cheap query so the first timed entry isn't
    // paying one-time compilation costs
    try run(SparkEntry.queries("q_agg_filter")(spark, sfDir))
    catch { case _: Throwable => () }

    // De-noised timing: the host VM throttles CPU in bursts, so a single
    // wall-clock sample can read 5-10x high (q_extract_summary measured
    // 10.5s in one driver run vs 0.4-1.3s on direct reruns). Each query
    // runs twice and reports the MIN — the closest sample to unthrottled
    // machine performance. A query that fails is recorded as -1 and
    // invalidates the headline total (see below), so a fast failure can
    // never flatter the cross-round comparison.
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      val first = once()
      // deterministic queries fail deterministically: don't pay a second run
      val second = first.flatMap(_ => once())
      val best = first.map(a => second.fold(a)(math.min(a, _)))
      if (best.isEmpty) failed += name // marked, never silent
      // a SECOND run that dies after a clean first run must stay visible
      // too: max reads -1 and the spread flags it noisy, so the artifact
      // can never masquerade as two consistent burst-free samples
      val max =
        if (first.isDefined && second.isEmpty) -1.0
        else first.getOrElse(-1.0).max(second.getOrElse(-1.0))
      (name, best.getOrElse(-1.0), max)
    }
    val qs = results
      .map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // Spread per query: min-of-2 still let a 5x throttle burst into a round
    // artifact once (BENCH_r03 q_json_extract: 1.95s driver vs 0.41s on
    // re-run). Reporting {min,max,noisy} lets a cross-round diff discard
    // throttle bursts WITHOUT a re-run: a "regression" whose own max/min
    // ratio exceeds 3 was measured during a burst and adjudicates itself.
    val spread = results
      .map { case (k, mn, mx) =>
        // noisy: burst spread (max/min > 3) OR a crashed second run (mx<0)
        val noisy = mn > 0 && (mx < 0 || mx / mn > 3.0)
        "\"" + k + "\":" + f"""{"min":$mn%.3f,"max":$mx%.3f,"noisy":$noisy}"""
      }
      .mkString("{", ",", "}")
    // Totals are only comparable across rounds over the same passing query
    // set: with any failure the headline total is reported as -1 (invalid)
    // rather than a sum over fewer queries — a regression into failure must
    // read as breakage, never as a faster round.
    val total = if (failed.nonEmpty) -1.0 else results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"spread":$spread,"failed":$failedJson,"sf":"$sfDir"}"""
    // The driver parses this from noisy sbt logs: print it AND write it to a
    // side file so `parsed` never comes back null (VERDICT r1 "What's wrong" #5)
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(Some("BENCH_LAST.json")).foreach { p =>
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(p), (json + "\n").getBytes("UTF-8"))
      catch { case _: Exception => () }
    }
    spark.stop()
  }
}
