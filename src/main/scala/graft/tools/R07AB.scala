package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Paired A/B for the r7 spread() decision under a throttling host: for
  * each borderline query, the spread and no-spread variants run
  * INTERLEAVED (A B A B ...) in one session so both see the same throttle
  * windows; the per-variant MIN over reps is then comparable. Scratch
  * tool for this round's measurements (numbers cited in
  * OPTIMIZATION_r07.md); not part of the driver contract.
  */
object R07AB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def spread(df: DataFrame): DataFrame = {
      val target = spark.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }

    val cases: Seq[(String, DataFrame => DataFrame)] = Seq(
      "c4_filter" -> (d => TextAnalysis.c4LineFilter(d)),
      "pii_scrub" -> (d => TextAnalysis.piiScrub(d)),
      "langid" -> (d => TextAnalysis.langId(d)),
      "chunk_tokens" -> (d => TextAnalysis.chunkTokens(d, size = 50, stride = 40)),
      "select_budget" -> (d => graft.ops.Pipeline.selectBudget(d, budget = 5000L)),
      "rebalance" -> (d => graft.ops.Pipeline.rebalanceByLang(d,
        Map("de" -> 0.2, "en" -> 0.2, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.2))),
      "token_rarity" -> (d => TextAnalysis.tokenRarity(d)),
      "vocab_stats" -> (d => TextAnalysis.vocabStats(d)),
      "tfidf" -> (d => TextAnalysis.tfidfKeywords(d, k = 3)),
      "source_rep" -> (d => TextAnalysis.sourceReputation(d)),
      "source_filter" -> (d => TextAnalysis.sourceFilter(d)),
      "minhash" -> (d => Dedup.minhashPairs(d, n = 4, threshold = 0.8)(spark)),
      "simhash_pairs" -> (d => Dedup.simhashPairs(d, radius = 3)(spark)),
      "contamination" -> (d => Dedup.contamination(
        d.filter(pmod(col("doc_id"), lit(2)) === 0), d, n = 8)(spark)),
      "dup_spans" -> (d => Dedup.dupSpanList(d, n = 10)),
      "dup_spans_stats" -> (d => Dedup.dupSpans(d, n = 10)
        .select(col("doc_id"), col("dup_tokens"), col("total_tokens"))),
      "cut_keep1" -> (d => Dedup.cutDupSpansKeepFirst(d, n = 10)),
      "cut_all" -> (d => Dedup.cutDupSpans(d, n = 10)),
      "passage" -> (d => Dedup.passageDupStats(d, n = 10)),
      "gopher" -> (d => TextAnalysis.gopherRules(d)),
      "compose" -> (d => graft.ops.Pipeline.prepareRollup(d))
    )

    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embCases: Seq[(String, DataFrame => DataFrame)] = Seq(
      "emb_dedup" -> (e => Dedup.embeddingDupPairs(e, threshold = 0.4)),
      "emb_lsh" -> (e => {
        val planted = e.filter(col("vec_id") < 5)
          .withColumn("vec_id", col("vec_id") + lit(100000L))
        Dedup.embeddingDupPairsLsh(e.unionByName(planted), threshold = 0.95)
      }),
      "ann_brute" -> (e => graft.ops.Similarity.bruteForceTopK(e, col("vec_id") < 10, k = 5)),
      "ann_lsh" -> (e => graft.ops.Similarity.lshTopK(
        e, col("vec_id") < 10, k = 5, planes = 3, nTables = 6)(spark)),
      "ann_ivf" -> (e => graft.ops.Similarity.ivfTopK(e, col("vec_id") < 10, k = 5)(spark))
    )

    // hex-string window-key replica of the pre-r7 span subtree (md5 hex
    // `h` instead of unhex(md5) binary) — the A side of the binary-key A/B
    def dupSpanListHex(docs: DataFrame, n: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val toks = split(col("text"), " ")
      val wins = docs
        .filter(col("text").isNotNull)
        .select(col("doc_id"), toks.as("t"),
          greatest(size(toks) - lit(n - 1), lit(0)).as("nw"))
        .filter(col("nw") > 0)
        .select(col("doc_id"), explode(sequence(lit(1), col("nw"))).as("i"), col("t"))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          md5(array_join(slice(col("t"), col("i"), lit(n)), " ")).as("h"))
        .localCheckpoint(true)
      val dupk = wins.select(col("h"), col("doc_id")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("dw"))
        .filter(col("dw") >= 2).select(col("h"))
      val ordered = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      wins.join(dupk, Seq("h"))
        .select(col("doc_id"), col("i"))
        .withColumn("new_span",
          when(col("i") - lag(col("i"), 1).over(ordered) > n, 1L).otherwise(0L))
        .withColumn("span_id", sum(col("new_span")).over(running))
        .groupBy(col("doc_id"), col("span_id"))
        .agg(min(col("i")).as("span_start"), (max(col("i")) + lit(n - 1)).as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"))
    }

    def run(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

    // warmup
    run(TextAnalysis.gopherRules(docs))
    val only = args.toSet
    def ab(name: String, mk: DataFrame => DataFrame, src: () => DataFrame): Unit = {
      val a = Array.fill(reps)(0.0) // no spread
      val b = Array.fill(reps)(0.0) // spread
      (0 until reps).foreach { i =>
        a(i) = run(mk(src()))
        b(i) = run(mk(spread(src())))
      }
      println(s"AB $name nospread_min=${fmt(a.min)} spread_min=${fmt(b.min)} " +
        s"nospread=[${a.map(fmt).mkString(",")}] spread=[${b.map(fmt).mkString(",")}]")
    }
    // stage decomposition for the cluster queries: pair subtree alone,
    // then each cluster loop over a PRE-BUILT pair set (diagnosis only —
    // the declared queries rebuild pairs by contract)
    if (only.contains("stages")) {
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        val pairs = Dedup.ngramJaccardPairs(docs, n = 4, threshold = 0.8)(spark)
        run(pairs)
        val t1 = System.nanoTime()
        run(Dedup.dupClusters(docs, pairs)(spark))
        val t2 = System.nanoTime()
        run(Dedup.dupClustersStar(docs, pairs)(spark))
        val t3 = System.nanoTime()
        run(Dedup.keepBestInCluster(
          Dedup.dupClusters(docs, pairs)(spark),
          docs.select(col("doc_id"), col("n_chars").as("quality"))))
        val t4 = System.nanoTime()
        println(s"STAGE pairs=${fmt((t1 - t0) / 1e9)} labelprop=${fmt((t2 - t1) / 1e9)} " +
          s"star=${fmt((t3 - t2) / 1e9)} clusters+election=${fmt((t4 - t3) / 1e9)}")
      }
    }
    cases.filter(c => only.isEmpty || only(c._1))
      .foreach { case (n, mk) => ab(n, mk, () => docs) }
    embCases.filter(c => only.isEmpty || only(c._1))
      .foreach { case (n, mk) => ab(n, mk, () => emb) }
    // hexkey: A = pre-r7 hex-string span key, B = shipped binary key
    if (only.isEmpty || only("hexkey")) {
      val a = Array.fill(reps)(0.0)
      val b = Array.fill(reps)(0.0)
      (0 until reps).foreach { i =>
        a(i) = run(dupSpanListHex(docs, 10))
        b(i) = run(Dedup.dupSpanList(docs, n = 10))
      }
      println(s"AB hexkey hex_min=${fmt(a.min)} binary_min=${fmt(b.min)} " +
        s"hex=[${a.map(fmt).mkString(",")}] binary=[${b.map(fmt).mkString(",")}]")
    }
    spark.stop()
  }
}
