package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Dedup

class ExpressionsSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  test("native simhash64 is bit-identical to the Scala kernel") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq(
      "the quick brown fox", "", "single", "a b c d e f g",
      "unicode tokens école über δοκιμή 文本 here",
      "double  space and trailing ", " leading and ﬁnal")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select(col("doc_id"), GraftFunctions.simhash64(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(native(i.toLong) == Dedup.simhash64(t), s"mismatch for '$t'")
    }
  }

  test("simhash64 is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT simhash64('hello simhash world') AS h").head.getLong(0)
    assert(viaSql == Dedup.simhash64("hello simhash world"))
  }

  test("simhash64 stays inside whole-stage codegen (no UDF boundary)") {
    GraftFunctions.register(spark)
    // spark.range forces a real (non-local-relation) physical plan
    val df = spark.range(5)
      .select(GraftFunctions.simhash64(concat(lit("token "), col("id"))).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"))
    assert(df.queryExecution.executedPlan.find(
      _.getClass.getSimpleName.startsWith("WholeStageCodegen")).nonEmpty, plan)
    val got = df.collect().map(_.getLong(0)).toSeq
    val expected = (0 until 5).map(i => Dedup.simhash64(s"token $i"))
    assert(got == expected)
  }

  test("ivf_cells matches the closure-reference ordering, stays in codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val dim = 8
    val k = 16
    val centroids: Seq[Seq[Double]] = Seq.fill(k) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val vecs = Seq.tabulate(40)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian()).toSeq))
    val df = vecs.toDF("vec_id", "v")
    for (nProbe <- Seq(1, 4)) {
      val out = df
        .select(col("vec_id"), GraftFunctions.ivfCells(col("v"), centroids, nProbe).as("cells"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1))
        .toMap
      vecs.foreach { case (id, v) =>
        // the closure formulation this expression replaced: descending dot,
        // ties to the lower cell id
        def dot(c: Seq[Double]) = c.zip(v).map { case (a, b) => a * b }.sum
        val expect = centroids.zipWithIndex
          .sortBy { case (c, i) => (-dot(c), i) }.take(nProbe).map(_._2)
        assert(out(id) == expect, s"vec $id nProbe $nProbe")
      }
    }
    val planDf = spark.range(6).select(
      GraftFunctions.ivfCells(array((0 until dim).map(d => rand(d)): _*), centroids, 2).as("c"))
    val plan = planDf.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(planDf.queryExecution.executedPlan.find(
      _.getClass.getSimpleName.startsWith("WholeStageCodegen")).nonEmpty, plan)
    // a vector whose length disagrees with the centroid dim is LOUD —
    // zero-padding would silently assign a cell to malformed data
    val short = Seq((1L, Seq.fill(dim - 2)(0.5))).toDF("vec_id", "v")
    val err = intercept[Exception] {
      short.select(GraftFunctions.ivfCells(col("v"), centroids, 1)).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(err).exists(_.contains("centroid dimension")), err.toString)
  }

  test("ivfTopK plans with no UDF boundary anywhere (q_ann_ivf shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val emb = Seq.tabulate(120)(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()), i % 3))
      .toDF("vec_id", "embedding", "label")
    val out = graft.ops.Similarity.ivfTopK(emb, col("vec_id") < 5, k = 3)(spark)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"), plan)
    // the surface still returns sane ranked neighbors
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(1)).forall(r => r >= 1 && r <= 3))
  }

  test("null propagates (nullIntolerant)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(GraftFunctions.simhash64(col("text")).as("h"))
    assert(df.head.isNullAt(0))
  }

  test("native shingle_hashes64 is bit-identical to the Scala kernel") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog", // > n tokens
      "three token text", "two tokens", "one", "", // <= n fallbacks
      "double  space empty  tokens inside here now", // empty tokens count
      "unicode école über δοκιμή 文本 shingle content here",
      "trailing space here now ok ", " leading space text here too",
      "repeat repeat repeat repeat repeat repeat") // duplicate shingles collapse
    for (n <- Seq(1, 2, 4, 7)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val native = df
        .select(col("doc_id"), GraftFunctions.shingleHashes64(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(java.util.Arrays.equals(native(i.toLong), Dedup.shingleHashes(t, n)),
          s"mismatch for '$t' at n=$n")
      }
    }
  }

  test("native minhash_sig and minhash_bands are bit-identical to the kernels") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog near the river",
      "completely different content about query planning and shuffles",
      "short", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select(
      col("doc_id"),
      GraftFunctions.minhashSig(GraftFunctions.shingleHashes64(col("text"), 4), 64).as("sig"))
      .withColumn("bands", GraftFunctions.minhashBands(col("sig"), 16))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val sig = Dedup.minhashSignature(Dedup.shingleHashes(t, 4), 64)
      assert(java.util.Arrays.equals(native(i.toLong)._1, sig), s"sig mismatch for '$t'")
      // reference band formula (the loop previously inlined in minhashPairs)
      val rowsPerBand = 64 / 16
      val bands = (0 until 16).map { bnd =>
        var h = 0xcbf29ce484222325L ^ bnd.toLong
        var k = bnd * rowsPerBand
        while (k < (bnd + 1) * rowsPerBand) { h = Dedup.mix64(h ^ sig(k)); k += 1 }
        h
      }.toArray
      assert(java.util.Arrays.equals(native(i.toLong)._2, bands), s"bands mismatch for '$t'")
    }
  }

  test("native simhash_keys matches the Manku block-combination reference") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val hashes = Seq(0L, -1L, 0x0123456789abcdefL, 0xdeadbeefcafebabeL, 42L)
    for (radius <- Seq(1, 3, 5)) {
      val nBlocks = radius + 3
      val bounds = (0 to nBlocks).map(b => b * 64 / nBlocks)
      val combos = (0 until nBlocks).combinations(3).map(_.toSeq).toSeq
      def refKeys(h: Long): Array[Long] = combos.map { combo =>
        var key = 0L
        combo.foreach { b =>
          val lo = bounds(b)
          val width = bounds(b + 1) - lo
          val mask = if (width >= 64) -1L else (1L << width) - 1
          key = (key << width) | ((h >>> lo) & mask)
        }
        key
      }.toArray
      val native = hashes.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("doc_id", "h")
        .select(col("doc_id"), GraftFunctions.simhashKeys(col("h"), radius).as("k"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      hashes.zipWithIndex.foreach { case (h, i) =>
        assert(java.util.Arrays.equals(native(i.toLong), refKeys(h)),
          s"mismatch for $h at radius $radius")
      }
    }
  }

  test("sign_lsh_packed/probes are bit-identical to the Similarity kernel") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val golden = 0x9e3779b97f4a7c15L
    val vecs = (0 until 40).map { i =>
      Array.tabulate(16)(d =>
        graft.ops.Dedup.mix64(i * 131L + d).toDouble / Long.MaxValue)
    }
    for ((seed, planes, tables) <- Seq((7L, 3, 6), (42L, 8, 1), (99L, 5, 4))) {
      val native = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
        .select(col("id"),
          GraftFunctions.signLshPacked(col("v"), seed, planes, tables).as("p"),
          GraftFunctions.signLshProbes(col("v"), seed, planes, tables).as("q"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)))
        .toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        val expPacked = (0 until tables).map { t =>
          (t.toLong << 32) |
            graft.ops.Similarity.lshBucket(v, seed + golden * t, planes).toLong
        }.toArray
        val expProbes = (0 until tables).flatMap { t =>
          val b = graft.ops.Similarity.lshBucket(v, seed + golden * t, planes)
          (b +: (0 until planes).map(p => b ^ (1 << p)))
            .map(x => (t.toLong << 32) | x.toLong)
        }.toArray
        assert(java.util.Arrays.equals(native(i.toLong)._1, expPacked), s"packed vec $i")
        assert(java.util.Arrays.equals(native(i.toLong)._2, expProbes), s"probes vec $i")
      }
    }
  }

  test("lshTopK and embeddingDupPairsLsh candidate generation have no udf boundary") {
    import spark.implicits._
    val emb = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(d =>
        (graft.ops.Dedup.mix64(i * 17 + d).toDouble / Long.MaxValue).toFloat))
    }.toDF("vec_id", "embedding")
    val topk = graft.ops.Similarity.lshTopK(emb, col("vec_id") < 5, 3,
      planes = 3, nTables = 4)(spark)
    assert(!topk.queryExecution.executedPlan.toString.toLowerCase.contains("scalaudf"))
    assert(topk.collect().nonEmpty)
    val pairs = graft.ops.Dedup.embeddingDupPairsLsh(emb, threshold = 0.99)
    assert(!pairs.queryExecution.executedPlan.toString.toLowerCase.contains("scalaudf"))
    pairs.collect() // diffuse vectors: empty result is fine, plan must run
  }

  test("shingle pipeline stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(10)
      .select(GraftFunctions.minhashSig(
        GraftFunctions.shingleHashes64(
          concat(lit("alpha beta gamma delta epsilon token "), col("id")), 4), 16).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(df.queryExecution.executedPlan.find(
      _.getClass.getSimpleName.startsWith("WholeStageCodegen")).nonEmpty, plan)
    assert(df.collect().length == 10)
  }
}
