package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale deduplication operators over a `documents(doc_id, text, ...)`
  * table — the operations a training-data pipeline layers on top of
  * extraction. All are shuffle-conscious: exact dedup is one hash
  * aggregation; the near-dup family works on (key, doc_id) postings so the
  * only quadratic step is within an LSH bucket / shared-shingle group,
  * never across the corpus.
  *
  * Algorithms are the published classics: MinHash resemblance sketching
  * (Broder, "On the resemblance and containment of documents", 1997) with
  * banded LSH (Indyk/Motwani-style), SimHash (Charikar, "Similarity
  * estimation techniques from rounding algorithms", 2002) with the
  * block-permutation hamming search of Manku/Jain/Das Sarma ("Detecting
  * near-duplicates for web crawling", WWW 2007).
  */
object Dedup {

  // ---------- deterministic hashing (pure Scala, partitioning-invariant) ----

  /** splitmix64 finalizer (graft.util.Hashing) used for shingle/minhash
    * streams.
    */
  def mix64(z0: Long): Long = graft.util.Hashing.mix64(z0)

  /** 64-bit FNV-1a over UTF-8 bytes, then mixed: the base shingle hash. */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Word n-gram shingle hashes, distinct, sorted (sorted so signatures and
    * set ops are order-canonical).
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val tokens = text.split(" ", -1)
    if (tokens.length < n) {
      // one whole-text shingle, INCLUDING empty text: the SQL-oracle
      // equivalent string_split('') yields [''], so '' must hash too
      Array(hash64(text))
    } else {
      val set = scala.collection.mutable.SortedSet.empty[Long]
      var i = 0
      while (i + n <= tokens.length) {
        set += hash64(tokens.slice(i, i + n).mkString(" "))
        i += 1
      }
      set.toArray
    }
  }

  /** MinHash signature: numHashes permutations approximated by
    * mix64(shingle ^ seed_i) minima (one pass over the shingles).
    */
  def minhashSignature(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val s = shingles(i)
      var h = 0
      while (h < numHashes) {
        val v = mix64(s ^ (0x9e3779b97f4a7c15L * (h + 1)))
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens (sign of per-bit weighted sums). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    text.split(" ", -1).foreach { t =>
      if (t.nonEmpty) {
        val h = hash64(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---------- DataFrame operators -------------------------------------------

  /** Exact dedup: one hash aggregation on md5(text). Survivor = min doc_id.
    * At 10^12 rows this is a single shuffle on a 16-byte key with partial
    * aggregation — the cheapest possible formulation.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col("doc_id")).as("keep_id"))

  /** Annotate every row with its exact-dup canonical id (min id over the
    * md5(text) group) and a duplicate flag — the form a training-data
    * pipeline consumes (filter `!is_duplicate` keeps one survivor per
    * content hash). One window over one hash shuffle.
    */
  def markDuplicates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol)))
    docs
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  /** Exact all-pairs n-gram Jaccard >= threshold via shingle postings:
    * explode (shingle, doc) -> self-join on shingle -> per-pair common count
    * -> |A|+|B|-common denominator. Only docs sharing a shingle ever meet,
    * so cost tracks true similarity structure, not corpus size squared.
    * Shingle hashes are 8-byte longs, not strings — smaller shuffle.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 4, threshold: Double = 0.8)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val shingled = docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, shingleHashes(text, n)) }
      .toDF("doc_id", "shingles")
      .select(col("doc_id"), size(col("shingles")).as("n_sh"), col("shingles"))
    val posts = shingled.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val a = posts.select(col("sh"), col("doc_id").as("a_id"), col("n_sh").as("a_n"))
    val b = posts.select(col("sh"), col("doc_id").as("b_id"), col("n_sh").as("b_n"))
    a.join(b, Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("common"))
      .withColumn(
        "jaccard",
        round(col("common").cast("double") / (col("a_n") + col("b_n") - col("common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash + LSH near-dup candidate generation with exact-Jaccard
    * verification. Bands of `rowsPerBand` signature slots bucket-join
    * candidates (the only shuffle proportional to corpus size); candidate
    * pairs are then verified against the true shingle-set Jaccard so the
    * output contains no false positives. Degenerate buckets are capped at
    * `maxBucket` docs — a cap that only binds on mass-duplicate clusters,
    * where pairwise output is the wrong shape anyway (cluster these via
    * `exact`/`markDuplicates` instead). Shingling is recomputed per use
    * rather than cached: a persist here would outlive the returned (lazy)
    * DataFrame with no unpersist point, and the shingle pass is cheap.
    */
  def minhashPairs(
      docs: DataFrame,
      n: Int = 4,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucket: Int = 200
  )(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val shingled = docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val sh = shingleHashes(text, n)
        (id, sh, minhashSignature(sh, numHashes))
      }
      .toDF("doc_id", "shingles", "sig")

    // band buckets: (band, hash(slice)) -> doc list
    val bandRows = shingled
      .as[(Long, Array[Long], Array[Long])]
      .flatMap { case (id, _, sig) =>
        (0 until bands).iterator.map { bnd =>
          var h = 0xcbf29ce484222325L ^ bnd.toLong
          var i = bnd * rowsPerBand
          while (i < (bnd + 1) * rowsPerBand) { h = mix64(h ^ sig(i)); i += 1 }
          (bnd, h, id)
        }
      }
      .toDF("band", "bucket", "doc_id")

    val candidates = bandRows
      .groupBy("band", "bucket")
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, maxBucket).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairsUdf(col("ids"))).as("p"))
      .select(col("p._1").as("a_id"), col("p._2").as("b_id"))
      .distinct()

    // exact verification against the shingle sets
    val sets = shingled.select(col("doc_id"), col("shingles"))
    val verified = candidates
      .join(sets.withColumnRenamed("doc_id", "a_id").withColumnRenamed("shingles", "a_sh"), "a_id")
      .join(sets.withColumnRenamed("doc_id", "b_id").withColumnRenamed("shingles", "b_sh"), "b_id")
      .withColumn("common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn(
        "jaccard",
        round(
          col("common").cast("double") /
            (size(col("a_sh")) + size(col("b_sh")) - col("common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    verified
  }

  private val pairsUdf =
    udf { ids: Seq[Long] =>
      for { i <- ids.indices; j <- (i + 1) until ids.size } yield (ids(i), ids(j))
    }

  /** Per-doc 64-bit SimHash (near-dup = small hamming distance; identical
    * simhash groups are exact-bucket near-dups). Computed by the native
    * Catalyst expression (codegen'd, no object churn); bit-identical to the
    * Scala kernel `simhash64` (tested). Emitted per doc so downstream can
    * choose the radius; grouping by the hash itself is the radius-0 dedup.
    */
  def simhashes(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    docs.select(
      col("doc_id"),
      graft.expressions.GraftFunctions.simhash64(col("text")).as("simhash"))
  }

  /** SimHash near-dup pairs within hamming radius via block-key indexing
    * (Charikar/Manku-style): split the 64-bit hash into `radius+1` blocks;
    * any pair within `radius` shares at least one exact block (pigeonhole),
    * so bucket-join on (block_idx, block_value) finds all candidates without
    * a cross join; verify hamming <= radius.
    */
  def simhashPairs(docs: DataFrame, radius: Int = 3)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val blocks = radius + 1
    val bits = 64 / blocks
    val hashed = simhashes(docs).as[(Long, Long)]
    val posts = hashed.flatMap { case (id, h) =>
      (0 until blocks).iterator.map { b =>
        val shift = b * bits
        val width = if (b == blocks - 1) 64 - shift else bits
        val mask = if (width >= 64) -1L else (1L << width) - 1
        (b, (h >>> shift) & mask, id, h)
      }
    }.toDF("block", "value", "doc_id", "simhash")
    val a = posts.select(col("block"), col("value"), col("doc_id").as("a_id"), col("simhash").as("a_h"))
    val b = posts.select(col("block"), col("value"), col("doc_id").as("b_id"), col("simhash").as("b_h"))
    a.join(b, Seq("block", "value"))
      .filter(col("a_id") < col("b_id"))
      // hamming distance as pure built-ins (bit_count(a XOR b)) — stays
      // inside whole-stage codegen, no UDF boundary on the pair stream
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_h").bitwiseXOR(col("b_h"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }

  /** Embedding cosine near-dup pairs, blocked by `label` (the cluster id the
    * table carries) — the blocking join keeps the pair space linear-ish; the
    * cosine is computed with codegen'd higher-order functions, in double
    * precision, sequential fold order (deterministic).
    */
  def embeddingDupPairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    // per-row norm computed once before the join — bit-identical to the
    // per-pair formula (sqrt(dot(v,v)) is the same double either way) at a
    // third of the pair-stage work
    val e = embeddings.select(
      col("vec_id"),
      col("label"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Similarity.dotCol(col("v"), col("v"))))
    val a = e.select(col("label"), col("vec_id").as("a_id"), col("v").as("a_v"),
      col("norm").as("a_norm"))
    val b = e.select(col("label"), col("vec_id").as("b_id"), col("v").as("b_v"),
      col("norm").as("b_norm"))
    a.join(b, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos",
        Similarity.dotCol(col("a_v"), col("b_v")) / (col("a_norm") * col("b_norm")))
      .filter(col("cos") >= threshold)
      .select(col("label"), col("a_id"), col("b_id"), round(col("cos"), 6).as("cosine"))
  }
}
