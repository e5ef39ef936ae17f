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
    // Locale-pinned number formatting: the driver parses this JSON, and a
    // non-ROOT FORMAT-locale JVM would otherwise write decimal COMMAS
    // (same bug class fixed with Locale.ROOT in ScalingBench and RealPdf)
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
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
      // noisy-triggered third rep: a burst-spread pair (max/min > 3) gets
      // ONE more sample in the same process, so a single throttle burst
      // settles in-round instead of waiting for the next round's re-run
      // (r4 verdict: q_quality_score/q_postprocess_chain doubled under
      // flagged throttle windows with unchanged plans). A CRASHED second
      // run is deliberately NOT retried away: deterministic queries fail
      // deterministically, so a crash after a clean run is infra flake
      // worth keeping visible (mx = -1, noisy) rather than settling
      val burst = (first, second) match {
        case (Some(a), Some(b)) => math.max(a, b) / math.min(a, b) > 3.0
        case _                  => false
      }
      val third = if (burst) once() else None
      val samples = Seq(first, second, third).flatten.sorted
      val crashedRerun =
        first.isDefined && (second.isEmpty || (burst && third.isEmpty))
      if (samples.isEmpty) failed += name // marked, never silent
      val mn = samples.headOption.getOrElse(-1.0)
      val mx = if (crashedRerun) -1.0 else samples.lastOption.getOrElse(-1.0)
      // noisy iff no TWO consistent samples exist: with three reps the two
      // smallest agreeing (ratio <= 3) adjudicates the outlier as a burst
      val secondMin = if (samples.size >= 2) samples(1) else -1.0
      val noisy = mn > 0 && (crashedRerun || secondMin < 0 || secondMin / mn > 3.0)
      (name, mn, mx, noisy, samples.size)
    }
    val qs = results
      .map { case (k, v, _, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // Spread per query: min-of-2 still let a 5x throttle burst into a round
    // artifact once (BENCH_r03 q_json_extract: 1.95s driver vs 0.41s on
    // re-run). Reporting {min,max,noisy,reps} lets a cross-round diff
    // discard throttle bursts WITHOUT a re-run: a "regression" whose own
    // spread stays noisy after the automatic third rep adjudicates itself.
    val spread = results
      .map { case (k, mn, mx, noisy, reps) =>
        "\"" + k + "\":" +
          s"""{"min":${fmt(mn)},"max":${fmt(mx)},"noisy":$noisy,"reps":$reps}"""
      }
      .mkString("{", ",", "}")
    // Totals are only comparable across rounds over the same passing query
    // set: with any failure the headline total is reported as -1 (invalid)
    // rather than a sum over fewer queries — a regression into failure must
    // read as breakage, never as a faster round.
    val total = if (failed.nonEmpty) -1.0 else results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"spread":$spread,"failed":$failedJson,"sf":"$sfDir"}"""
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
