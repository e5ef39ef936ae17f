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

  /** Exact-dup grouping key: md5 of the text with a non-colliding sentinel
    * for null text (not 32 hex chars, so it can never equal a real md5).
    * Null text would otherwise hash to null and an inner equi-join would
    * silently DROP those rows (null keys never match); the sentinel groups
    * them like the SQL oracle's window formulation does. ONE definition,
    * shared by [[markDuplicates]], [[markDuplicatesIds]] and
    * [[Pipeline.prepare]] — their mutual equivalence (and the
    * q_pipeline_compose oracle) depends on all three using the identical
    * key.
    */
  def textHashKey(textCol: Column): Column =
    coalesce(md5(textCol), lit("null-text"))

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
    * content hash).
    *
    * Skew-immune formulation: the canonical id is a partial-aggregated
    * `groupBy(hash).min(id)` joined back, NOT a window. A window partition
    * is processed by ONE task, so a mass-duplicate content hash (10^7+
    * copies of a boilerplate page at web scale) would pin its entire
    * posting list on a single spilling task; under partial aggregation the
    * hot hash shrinks to one row per map task before the shuffle, and the
    * join-back's hot probe partition is AQE-skew-splittable (the build side
    * is one row per hash, so duplicating it across splits is free).
    */
  def markDuplicates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // null-text sentinel semantics: see [[textHashKey]]
    val hashed = docs.withColumn("__text_hash", textHashKey(col(textCol)))
    val canon = hashed
      .groupBy(col("__text_hash"))
      .agg(min(col(idCol)).as("canonical_id"))
    hashed
      .join(canon, Seq("__text_hash"))
      .drop("__text_hash")
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  /** Skinny form of [[markDuplicates]]: returns only
    * `(idCol, canonical_id, is_duplicate)` with the text column pruned
    * BEFORE any exchange. The annotating form's contract ("every input
    * column survives") forces the probe side of the join-back to carry the
    * full `text` payload through the `__text_hash` shuffle — at web scale
    * that is the corpus's entire text width through one exchange. Here both
    * join sides derive from a `(id, md5)` projection, so the two shuffles
    * move ~50-byte rows and the caller re-attaches whatever columns it
    * needs with a join on `idCol` (or simply filters ids): two narrow
    * shuffles instead of one corpus-wide one, and `text` stays columnar at
    * rest. Same null-text sentinel semantics as the annotating form.
    */
  def markDuplicatesIds(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hashed = docs.select(
      col(idCol),
      textHashKey(col(textCol)).as("__text_hash"))
    val canon = hashed
      .groupBy(col("__text_hash"))
      .agg(min(col(idCol)).as("canonical_id"))
    hashed
      .join(canon, Seq("__text_hash"))
      .select(
        col(idCol),
        col("canonical_id"),
        (col(idCol) =!= col("canonical_id")).as("is_duplicate"))
  }

  /** Exact all-pairs n-gram Jaccard >= threshold via shingle postings:
    * explode (shingle, doc) -> self-join on shingle -> per-pair common count
    * -> |A|+|B|-common denominator. Only docs sharing a shingle ever meet,
    * so cost tracks true similarity structure, not corpus size squared.
    * Shingle hashes are 8-byte longs, not strings — smaller shuffle.
    *
    * Shingles whose document frequency exceeds `maxShingleDf` are dropped
    * before the self-join: a shingle shared by k docs yields k^2 join rows,
    * and at web scale boilerplate 4-grams have k in the millions while
    * contributing ~0 Jaccard discrimination. The cap must not bind on honest
    * near-dup structure — default 128 is ~20x the max df of the test corpus.
    * When the cap binds, the computed value is the Jaccard of the
    * LOW-DF shingle sets: numerator AND denominator both count only kept
    * shingles (the same universe), so a pair that shares ANY low-df content
    * keeps its full score (an identical pair with some unique shingles stays
    * at 1.0 however much boilerplate was dropped). The flip side: when the
    * cap binds, the score can OVERSTATE true Jaccard — two documents that
    * share a few low-df shingles but are otherwise dominated by dropped
    * boilerplate lose mass from numerator AND denominator, so the kept-
    * universe ratio upper-bounds the true one and pairs below the true-
    * Jaccard threshold can be emitted. Callers needing the uninflated score
    * must re-verify emitted pairs against full shingle sets (as
    * [[minhashPairs]] does). The one regime the cap
    * excludes ON PURPOSE is a duplicate cluster larger than `maxShingleDf`
    * itself — there EVERY shingle is corpus-common, all postings drop, and
    * no pairs are emitted. That is the mass-duplication regime where k^2
    * pairwise rows are the wrong output shape anyway: route it through
    * [[exact]]/[[markDuplicates]] (one hash aggregation), the same escape
    * [[simhashPairs]] documents for its bucket cap.
    *
    * `logDropped = true` eagerly counts and logs the dropped shingles — a
    * diagnostic (extra job), not for the hot path.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      n: Int = 4,
      threshold: Double = 0.8,
      maxShingleDf: Int = 128,
      logDropped: Boolean = false
  )(implicit spark: SparkSession): DataFrame = {
    // native codegen expression (bit-identical to the Scala kernel,
    // property-tested): no typed-map object boundary — pruning and
    // whole-stage codegen run through the shingling
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    val shingled = docs.select(
      col("doc_id"),
      graft.expressions.GraftFunctions.shingleHashes64(col("text"), n).as("shingles"))
    val posts0 = shingled.select(col("doc_id"), explode(col("shingles")).as("sh"))
    // Document frequency per shingle: a partial-aggregated groupBy joined
    // back, NOT a window. A window partition runs on ONE task, so a
    // corpus-common boilerplate shingle (df 10^7-10^8 at web scale) would
    // land its whole posting list on a single spilling task BEFORE the df
    // cap could drop it; under partial aggregation the hot shingle shrinks
    // to one row per map task. The inner join against the pre-filtered
    // low-df table both annotates and drops capped shingles in one step
    // (hot probe partitions are AQE-skew-splittable: one build row per key).
    val dfTab = posts0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // The kept postings are MATERIALIZED once (reliable checkpoint when a
    // dir is set, eager localCheckpoint otherwise — see [[truncateLineage]]):
    // without this the a-side, b-side and both docSizes joins below each
    // re-plan the whole explode+df subtree, scanning the corpus up to 8x
    // and re-shingling it 4x (r5 PLANS.md evidence), and cluster builders
    // ([[dupClusters]]/[[dupClustersStar]]) pay the subtree AGAIN for their
    // pair set. At 100 TB eight corpus scans was the single largest
    // avoidable cost left; after the checkpoint every consumer reads the
    // one materialized (sh, doc_id) posting set and `documents` is scanned
    // in exactly one job. Construction is therefore EAGER, and reliable
    // checkpoints (dir set) persist until cleanCheckpoints=true or the dir
    // is removed — the truncateLineage storage contract, see minhashPairs'
    // scaladoc.
    val kept = truncateLineage(posts0
      .join(dfTab.filter(col("df") <= maxShingleDf).select(col("sh")), Seq("sh")))
    if (logDropped) {
      val dropped = dfTab.filter(col("df") > maxShingleDf).count()
      println(s"ngramJaccardPairs: dropped $dropped shingles with df > $maxShingleDf")
    }
    // per-doc set size over the SAME kept universe as the intersection —
    // numerator and denominator must agree or dropped boilerplate would
    // depress the Jaccard of genuinely identical pairs. Joined onto the
    // AGGREGATED pair table (one row per candidate pair), not carried
    // through the wide self-join.
    val docSizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = kept.select(col("sh"), col("doc_id").as("a_id"))
    val b = kept.select(col("sh"), col("doc_id").as("b_id"))
    a.join(b, Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("common"))
      .join(docSizes.select(col("doc_id").as("a_id"), col("n_sh").as("a_n")), Seq("a_id"))
      .join(docSizes.select(col("doc_id").as("b_id"), col("n_sh").as("b_n")), Seq("b_id"))
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
    * `exact`/`markDuplicates` instead). The shingle+signature projection is
    * materialized once via [[truncateLineage]]: band generation AND both
    * sides of the verification join consume it, and without truncation each
    * consumer re-scans and re-shingles the corpus (the r5 PLANS.md
    * redundant-subtree finding). Two consequences callers own: CONSTRUCTING
    * the returned DataFrame now runs the shingle scan eagerly (it is no
    * longer a free lazy plan), and checkpoint storage follows the
    * [[truncateLineage]] contract — localCheckpoint blocks are reclaimed by
    * the ContextCleaner when the plan is dropped, but RELIABLE checkpoints
    * (checkpoint dir set) persist until
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` or the dir is
    * removed, so long-lived sessions calling this repeatedly must set one
    * of those up (same dial the cluster loop already documents).
    */
  def minhashPairs(
      docs: DataFrame,
      n: Int = 4,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucket: Int = 200
  )(implicit spark: SparkSession): DataFrame = {
    // native codegen expressions end to end (shingles -> signature -> band
    // keys, each bit-identical to the Scala kernels): the whole candidate
    // generation stays inside whole-stage codegen with no typed-map
    // object boundaries
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    import graft.expressions.GraftFunctions.{minhashBands, minhashSig, shingleHashes64}
    val shingled = truncateLineage(docs.select(
      col("doc_id"),
      shingleHashes64(col("text"), n).as("shingles"))
      .withColumn("sig", minhashSig(col("shingles"), numHashes)))

    // band buckets: (band, hash(slice)) -> doc list
    val bandRows = shingled
      .select(col("doc_id"),
        posexplode(minhashBands(col("sig"), bands)).as(Seq("band", "bucket")))
      .select(col("band"), col("bucket"), col("doc_id"))

    // bucket cap via a streaming row_number window (no per-bucket array
    // materialization — a collect_list would buffer a mass-duplicate
    // mega-bucket whole before the slice); pairs from the capped self-join
    val wBucket = Window.partitionBy(col("band"), col("bucket")).orderBy(col("doc_id").asc)
    val capped = bandRows
      .withColumn("rn", row_number().over(wBucket))
      .filter(col("rn") <= maxBucket)
      .drop("rn")
    val candidates = capped.select(col("band"), col("bucket"), col("doc_id").as("a_id"))
      .join(capped.select(col("band"), col("bucket"), col("doc_id").as("b_id")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
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

  /** Per-doc 64-bit SimHash (near-dup = small hamming distance; identical
    * simhash groups are exact-bucket near-dups). Computed by the native
    * Catalyst expression (codegen'd, no object churn); bit-identical to the
    * Scala kernel `simhash64` (tested). Emitted per doc so downstream can
    * choose the radius; grouping by the hash itself is the radius-0 dedup.
    */
  def simhashes(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    docs.select(
      col("doc_id"),
      graft.expressions.GraftFunctions.simhash64(col("text")).as("simhash"))
  }

  /** SimHash near-dup pairs within hamming `radius`, using the
    * multi-table block-combination construction of Manku/Jain/Das Sarma
    * (WWW 2007 §3): split the 64-bit hash into B = radius + 3 blocks; a pair
    * within `radius` differs in at most `radius` blocks, so it AGREES on at
    * least B - radius = 3 blocks — every 3-block combination is a table, and
    * the pair collides in at least one table on that combination's
    * concatenated ~32-bit key. Wider keys are the scale fix over the naive
    * radius+1 pigeonhole split: 16-bit keys put ~N/65k docs in every bucket
    * (quadratic blowup at web scale), while ~32-bit keys keep expected
    * buckets O(N/4x10^9).
    *
    * Degenerate buckets (mass-duplicate clusters: many IDENTICAL simhashes)
    * are capped at `maxBucket` docs, mirroring `minhashPairs`: pairwise
    * output is the wrong shape for those — route them through the radius-0
    * escape (group by the simhash itself via [[simhashes]] /
    * [[markDuplicates]]) instead.
    *
    * Verification (bit_count(a XOR b) <= radius) runs on codegen'd built-ins;
    * candidate generation is exact (no false negatives below the cap) by the
    * pigeonhole argument above.
    */
  def simhashPairs(docs: DataFrame, radius: Int = 3, maxBucket: Int = 1000)(
      implicit spark: SparkSession): DataFrame =
    simhashPairsFromHashes(simhashes(docs), radius, maxBucket)

  /** Pair search over a precomputed (doc_id, simhash) table — the testable
    * core of [[simhashPairs]].
    */
  def simhashPairsFromHashes(hashed0: DataFrame, radius: Int = 3, maxBucket: Int = 1000)(
      implicit spark: SparkSession): DataFrame = {
    require(radius >= 0 && radius <= 8, s"radius $radius out of range")
    if (radius == 0) {
      // exact-hash grouping: no pair search needed at all (window cap, same
      // no-materialization discipline as below)
      val w0 = Window.partitionBy(col("simhash")).orderBy(col("doc_id").asc)
      val capped0 = hashed0
        .select(col("doc_id"), col("simhash"))
        .withColumn("rn", row_number().over(w0))
        .filter(col("rn") <= maxBucket)
        .drop("rn")
      return capped0.select(col("simhash"), col("doc_id").as("a_id"))
        .join(capped0.select(col("simhash"), col("doc_id").as("b_id")), Seq("simhash"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), lit(0).as("hamming"))
    }
    // per-table block-combination keys via the native codegen expression
    // (table id = position in the key array) — no typed-map boundary
    graft.expressions.GraftFunctions.register(hashed0.sparkSession)
    val posts = hashed0
      .select(col("doc_id"), col("simhash"),
        posexplode(graft.expressions.GraftFunctions.simhashKeys(col("simhash"), radius))
          .as(Seq("table_id", "key")))
      .select(col("table_id"), col("key"), col("doc_id"), col("simhash"))

    // Bucket cap WITHOUT materializing buckets: a row_number window keeps
    // the maxBucket lowest doc_ids per (table,key) — rows stream through the
    // spill-capable window sort; a collect_list cap would materialize a
    // mega-bucket (10^7 identical hashes) in ONE aggregation buffer before
    // slicing. Pairs come from the capped self-join, hamming-verified.
    val wBucket = Window.partitionBy(col("table_id"), col("key")).orderBy(col("doc_id").asc)
    val capped = posts
      .withColumn("rn", row_number().over(wBucket))
      .filter(col("rn") <= maxBucket)
      .drop("rn")
    val a = capped.select(col("table_id"), col("key"),
      col("doc_id").as("a_id"), col("simhash").as("a_h"))
    val b = capped.select(col("table_id"), col("key"),
      col("doc_id").as("b_id"), col("simhash").as("b_h"))
    a.join(b, Seq("table_id", "key"))
      .filter(col("a_id") < col("b_id"))
      // hamming as pure built-ins (bit_count(xor)) — stays inside codegen
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_h").bitwiseXOR(col("b_h"))).cast("int").as("hamming"))
      .filter(col("hamming") <= radius)
      .distinct()
  }

  /** Lineage truncation for iterative plans: reliable `checkpoint()` when
    * the session has a checkpoint directory configured, eager
    * `localCheckpoint` otherwise. Local checkpoints store their blocks ON
    * the executors — fast, but NOT fault-tolerant: at cluster scale a
    * single executor loss (or dynamic-allocation decommission) mid-loop
    * kills the job unrecoverably. Production deployments must call
    * `spark.sparkContext.setCheckpointDir(...)` so every round's state
    * lands on reliable storage and the loop survives executor churn; the
    * local fallback is the single-JVM / test default.
    *
    * Cleanup: Spark only deletes superseded reliable checkpoints when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
    * false) — set it in long-lived sessions, or point the checkpoint dir
    * at a per-job location removed after the job, else each iteration's
    * files accumulate on the reliable store.
    */
  private[ops] def truncateLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)

  /** Connected-component dedup clusters over a near-dup PAIR set: every doc
    * gets `cluster_id` = the smallest doc_id reachable through the pairs
    * (docs in no pair keep their own id) — the step a training pipeline runs
    * after candidate generation, so each near-dup component keeps exactly
    * one survivor (`doc_id == cluster_id`).
    *
    * Iterative smallest-label propagation with a driver convergence loop:
    * each iteration is one edge-label join + min-aggregate, labels persisted
    * per round (bounded lineage), convergence when no label shrinks. The
    * iteration count is the component diameter — near-dup components are
    * near-cliques, so 2-3 rounds in practice; for adversarial long-chain
    * graphs use [[dupClustersStar]] (same signature, O(log^2 n) rounds on
    * any diameter). Checkpointing is reliable when a checkpoint dir is set
    * (see [[truncateLineage]]).
    */
  def dupClusters(docs: DataFrame, pairs: DataFrame, maxIters: Int = 50)(
      implicit spark: SparkSession): DataFrame = {
    // eager checkpoints per round: without lineage truncation every
    // iteration's logical plan embeds all previous rounds and Catalyst
    // analysis cost explodes (classic iterative-DataFrame pitfall).
    // Pair generation is checkpointed ONCE before deriving both edge
    // directions — a plain union would embed (and re-execute) the expensive
    // pair subtree twice.
    val p = truncateLineage(pairs.select(col("a_id"), col("b_id")))
    // edges derive from the MATERIALIZED pair set by a plain union — no
    // second checkpoint (r7): each iteration's join re-reads p twice, which
    // costs the same row reads the materialized edge copy would, without
    // paying an extra materialization job and a second pair-sized block set
    // up front (the expensive pair subtree itself is never re-executed —
    // that is what the p checkpoint is for)
    val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(p.select(col("b_id").as("src"), col("a_id").as("dst")))
    var labels = truncateLineage(
      docs.select(col("doc_id"), col("doc_id").as("cluster_id")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("cluster_id")).as("neighbor_min"))
      // the shrink flag rides the checkpointed frame (r7): the convergence
      // count then scans the already-materialized blocks instead of
      // re-joining the new labels against the old ones — one shuffle join
      // fewer per iteration, identical convergence condition (flag true
      // iff this row's label shrank this round)
      val updated = truncateLineage(
        labels
          .join(neighborMin.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
              .as("cluster_id"),
            (coalesce(col("neighbor_min"), col("cluster_id")) < col("cluster_id"))
              .as("__shrunk")))
      changed = updated.filter(col("__shrunk")).count()
      labels = updated.select(col("doc_id"), col("cluster_id"))
      iter += 1
    }
    // a silent non-converged return would hand out WRONG cluster ids (one
    // component, several "survivors") — fail loudly; raise maxIters for
    // pathological long-chain graphs (or switch to large-star/small-star)
    if (changed > 0)
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIters iterations ($changed labels still shrinking)")
    labels
  }

  /** Large-star step (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC 2014 §3): for every node u, connect each STRICTLY
    * LARGER neighbor to m = min(N(u) ∪ {u}). All per-node statistics are
    * partial-aggregated groupBys (a hub node shrinks to one row per map
    * task); output edges always point larger -> smaller.
    */
  private def largeStarStep(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
    sym.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star step: for every node u, connect u and each of its
    * (smaller) neighbors to m = min(N(u)); edges stay larger -> smaller.
    *
    * INPUT CONTRACT (r7): `dir` must already be a DISTINCT edge set
    * directed strictly larger -> smaller (u > v) — exactly what
    * [[largeStarStep]] emits (its output rows are (old_v,
    * least(mn, old_u)) with old_v > old_u >= least(mn, old_u), ending in
    * `.distinct()`) and what [[dupClustersStar]]'s initial normalization
    * produces. The previous re-normalization here
    * (greatest/least + filter + distinct) was therefore an IDENTITY
    * transformation costing one full edge-set exchange per round; the
    * contract is asserted by construction at both call sites.
    */
  private def smallStarStep(dir: DataFrame): DataFrame = {
    val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
    dir.join(mins, Seq("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .union(mins.select(col("u").as("a"), col("m").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .select(col("a").as("u"), col("b").as("v"))
  }

  /** [[dupClusters]] via alternating large-star / small-star contraction
    * (Kiveris et al., SoCC 2014) — same signature, same output contract
    * (`cluster_id` = smallest reachable doc_id). Converges in O(log^2 n)
    * rounds on ANY graph shape, vs label propagation's diameter-many
    * rounds: the drop-in for adversarial long-chain graphs (a 1000-node
    * chain converges in ~10 rounds here vs 999 there — tested). Per-round
    * state is one edge set, truncated via [[truncateLineage]] (reliable
    * when a checkpoint dir is set). Convergence = the round's edge set is
    * IDENTICAL to the previous round's (count gate first, then an exact
    * exceptAll diff — never a hash heuristic, a false convergence would
    * silently emit multiple survivors per component).
    */
  def dupClustersStar(docs: DataFrame, pairs: DataFrame, maxIters: Int = 40)(
      implicit spark: SparkSession): DataFrame = {
    val p = truncateLineage(pairs.select(col("a_id"), col("b_id")))
    var edges = truncateLineage(
      p.select(greatest(col("a_id"), col("b_id")).as("u"),
          least(col("a_id"), col("b_id")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    var prevCount = edges.count()
    var converged = prevCount == 0
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = truncateLineage(smallStarStep(largeStarStep(edges)))
      val cnt = next.count()
      converged = cnt == prevCount && next.exceptAll(edges).isEmpty
      edges = next
      prevCount = cnt
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dupClustersStar did not converge in $maxIters iterations ($prevCount edges)")
    // converged state is a min-rooted star per component: every non-root
    // points directly at its component minimum
    docs.select(col("doc_id"))
      .join(edges.select(col("u").as("doc_id"), col("v").as("root")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
  }

  /** Quality-aware canonical selection over dedup clusters: for every
    * cluster from [[dupClusters]]/[[dupClustersStar]], elect the HIGHEST
    * `quality` doc (ties → smallest doc_id) as the survivor — what a
    * training pipeline actually keeps from a near-dup component (the best
    * extraction of the page, not an arbitrary member). Returns every doc
    * annotated `(doc_id, cluster_id, quality, keep)`; filter on `keep`
    * for the survivor corpus.
    *
    * `quality` should be a deterministic per-doc column (char count, a
    * quality score) — the election is total because doc_id breaks ties.
    * A doc with a MISSING or null quality is still returned (quality
    * null) and never beats a scored member; a cluster whose members are
    * ALL unscored falls back to the min-doc_id canonical — no document is
    * ever silently dropped from the annotation.
    *
    * At scale: the arg-max runs as TWO all-primitive hash-aggregable
    * `groupBy(cluster_id)` passes — max quality per cluster, then min
    * doc_id among the max-quality members — never a `max_by`/struct
    * aggregate (SortAggregate) and never a per-cluster window, so a
    * mega-cluster (one boilerplate page duplicated 10^6 times) shrinks to
    * one row per map task in both passes instead of pinning a single
    * window task. Same election discipline as [[cutDupSpansKeepFirst]];
    * like there, the labels⨝quality join is materialized once for its
    * three consumers instead of re-running the quality subtree per pass.
    */
  def keepBestInCluster(
      labels: DataFrame,
      quality: DataFrame,
      qualityCol: String = "quality"): DataFrame = {
    val j = truncateLineage(
      labels
        .select(col("doc_id"), col("cluster_id"))
        .join(
          quality.select(col("doc_id"), col(qualityCol).as("q")),
          Seq("doc_id"), "left"))
    // max() ignores nulls: best_q is null only for all-unscored clusters,
    // where the null-safe <=> match admits every member and the min-doc_id
    // pass elects the fallback canonical
    val bestQ = j.groupBy(col("cluster_id")).agg(max(col("q")).as("best_q"))
    val bestId = j
      .join(bestQ, Seq("cluster_id"))
      .filter(col("q") <=> col("best_q"))
      .groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("best_id"))
    j.join(bestId, Seq("cluster_id"))
      .select(
        col("doc_id"),
        col("cluster_id"),
        col("q").as(qualityCol),
        (col("doc_id") === col("best_id")).as("keep"))
  }

  /** Cross-corpus contamination (train/test decontamination): for every doc
    * of `target` (the held-out set), the fraction of its distinct n-gram
    * shingles that occur ANYWHERE in `corpus` (the training set) — the
    * standard benchmark-decontamination signal (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", 2022; GPT-3 appendix C
    * style n-gram overlap). Docs above `threshold` are contaminated and
    * must be dropped from the held-out set (or the training set).
    *
    * Scale shape: the corpus side collapses to DISTINCT shingle hashes
    * (one partial-aggregated pass over the training set — no doc ids, no
    * posting lists), and the per-doc statistics are groupBy+join-back like
    * the rest of the family, so a boilerplate shingle shared by 10^8
    * training docs is ONE row on the build side. Shingling runs through
    * the native codegen expression.
    *
    * Hashed-universe approximation: overlap is computed over 64-bit shingle
    * HASHES, not shingle strings, so a hash collision between a training
    * shingle and an unrelated held-out shingle counts as contamination.
    * At ~2^-64 per pair the effect is negligible at any realistic corpus
    * size, but the signal is hash-based, not the literal Lee-et-al string
    * n-gram overlap — same kernel contract as [[ngramJaccardPairs]].
    */
  def contamination(
      corpus: DataFrame,
      target: DataFrame,
      n: Int = 8,
      threshold: Double = 0.8
  )(implicit spark: SparkSession): DataFrame = {
    graft.expressions.GraftFunctions.register(target.sparkSession)
    def posts(df: DataFrame) = df.select(
      col("doc_id"),
      explode(graft.expressions.GraftFunctions.shingleHashes64(col("text"), n)).as("sh"))
    // one pass over the target: left-join the distinct corpus shingles with
    // a hit marker, then count total vs non-null-marker rows in ONE per-doc
    // aggregation — a totals/hits two-branch form would scan and re-shingle
    // the whole held-out set twice (the branches share no reusable exchange)
    val corpusShingles = posts(corpus).select(col("sh")).distinct()
      .withColumn("__hit", lit(1))
    posts(target)
      .join(corpusShingles, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("contaminated_shingles"))
      .withColumn(
        "contamination_frac",
        round(col("contaminated_shingles").cast("double") / col("n_shingles"), 4))
      .withColumn("is_contaminated", col("contamination_frac") >= threshold)
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

  /** Per-document duplicated-passage statistics (the CCNet/RefinedWeb-style
    * sub-document dedup signal): hash every sliding `n`-token window; a
    * window is DUPLICATED when its hash occurs in at least two distinct
    * documents; output per doc = window count, duplicated-window count, and
    * the duplicated fraction. Training pipelines drop or trim documents
    * above a fraction threshold.
    *
    * Pure built-ins end to end (split/sequence/slice/md5 are all
    * codegen'd): the only shuffles are the hash-df aggregation and the
    * per-doc rollup — both partial-aggregated, no arrays ever collected.
    * Cross-doc df is computed on (hash, doc) DISTINCT postings, so a phrase
    * repeated inside ONE document does not count as duplication.
    *
    * Skew discipline: cross-doc df is a partial-aggregated groupBy over the
    * collapsed (hash, doc) rows joined back — not a window. A boilerplate
    * passage shared by 10^7 docs would otherwise pin one window task with
    * its whole posting list; partial aggregation shrinks it to one row per
    * map task, and the join-back's hot probe partition splits under AQE.
    * The explode+md5 map side is NOT recomputed for the second consumer:
    * both branches read the identical (h, doc_id) exchange, which Spark
    * reuses (ReusedExchange — asserted in tests).
    */
  /** The sliding-window hash subtree shared by [[passageDupStats]] and the
    * span operators: one row per n-token window, `(doc_id, i, h)` with `i`
    * the 1-based start offset and `h` = the raw md5 bytes of the
    * space-joined window (binary — same equality relation as the hex
    * digest the SQL oracle spells, at half the key width).
    * This is the SINGLE definition of the window hash — tokenization,
    * window count, and hash live here so the counting and span/cut
    * operators can never diverge. (The `text IS NOT NULL` filter is
    * semantically a no-op for callers that only consume `h` — a null text
    * has no windows either way — but makes the frame safe to reuse where
    * `i`/`t` are touched.)
    */
  private[ops] def windowHashes(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        toks.as("t"),
        greatest(size(toks) - lit(n - 1), lit(0)).as("nw"))
      .filter(col("nw") > 0)
      .select(col("doc_id"), explode(sequence(lit(1), col("nw"))).as("i"), col("t"))
      .select(
        col("doc_id"),
        col("i").cast("long").as("i"),
        // the 16 raw md5 bytes, not the 32-char hex string (r7, guide §2.3
        // "narrower types"): `h` is a purely internal equality key — it
        // feeds the df aggregation, the dup join and the checkpoint, and
        // never appears in any output — and unhex(md5(x)) = bytes(md5(x))
        // is BIJECTIVE with the hex form, so the matched-window relation
        // (and with it every span/count result) is byte-identical while
        // every exchange and the materialized checkpoint carry half the
        // key bytes with cheaper binary comparisons
        unhex(md5(array_join(slice(col("t"), col("i"), lit(n)), " "))).as("h"))
  }

  def passageDupStats(docs: DataFrame, n: Int = 10): DataFrame = {
    val wins = windowHashes(docs, n).select(col("doc_id"), col("h"))
    val perDocHash = wins.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("cnt"))
    // The trivially-true filter pins `cnt` against column pruning: without it
    // Catalyst prunes the count out of THIS branch's partial aggregate, the
    // two (h, doc_id) exchanges stop being identical, and ReuseExchange no
    // longer fires — the explode+md5 map side would run twice (verified in
    // the plan; count(1) >= 1 always holds for an aggregate output row).
    val dfTab = perDocHash
      .filter(col("cnt") >= 1)
      .groupBy(col("h")).agg(count(lit(1)).as("docs_with"))
    perDocHash
      .join(dfTab, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("windows"),
        sum(when(col("docs_with") >= 2, col("cnt")).otherwise(0L)).as("dup_windows"))
      .withColumn(
        "dup_fraction",
        round(col("dup_windows").cast("double") / col("windows"), 4))
  }

  /** Duplicated-SPAN masking — exact substring dedup at n-gram
    * granularity, the transform of Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499): for
    * every document, the MAXIMAL 1-based token spans covered by n-token
    * windows whose window hash occurs in at least `minDocs` documents
    * corpus-wide. Unlike [[passageDupStats]] (which only counts), this
    * returns the actual offsets a pipeline would cut.
    *
    * Output: (doc_id, spans: array<struct<span_start:long, span_end:long>>
    * sorted ascending, both ends inclusive; dup_tokens; total_tokens) —
    * one row per INPUT document, empty spans for clean docs.
    *
    * At scale: the window/df subtree is the [[passageDupStats]] shape
    * (one explode + partial-aggregated document frequency); the span
    * merge runs under a per-DOCUMENT window function — partition key =
    * doc_id, bounded by the document's own window count, so no corpus
    * hot key exists by construction. Two windows (lag + running sum)
    * share one sort: spans merge when the token intervals overlap or
    * touch (window gap <= n), NOT only when window indices are
    * consecutive — windows i and i+2 still overlap in tokens for n > 2.
    */
  def dupSpans(docs: DataFrame, n: Int = 10, minDocs: Int = 2): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(toks).cast("long").as("total_tokens"))
      .join(dupSpanLists(docs, n, minDocs), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("spans"), emptySpans).as("spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        col("total_tokens"))
  }

  private val emptySpans =
    array().cast("array<struct<span_start:bigint,span_end:bigint>>")

  /** Flat listing form of [[dupSpans]]: one row per duplicated span,
    * `(doc_id, span_start, span_end)`, docs with spans only — the shape a
    * span export or the driver's flat-listing query wants, WITHOUT the
    * clean-doc join and token counters [[dupSpans]] adds on top.
    */
  def dupSpanList(docs: DataFrame, n: Int = 10, minDocs: Int = 2): DataFrame =
    dupSpanRows(docs, n, minDocs)

  /** One row per maximal duplicated span: `(doc_id, span_start, span_end)`.
    * Shared by the listing, rollup, and cut forms.
    */
  private def dupSpanRows(docs: DataFrame, n: Int, minDocs: Int): DataFrame = {
    // materialized once (same discipline as ngramJaccardPairs' postings):
    // the window subtree feeds BOTH the df aggregation and the span join —
    // without the truncation the corpus is tokenized and hashed twice
    val wins = truncateLineage(windowHashes(docs, n))
    mergeIslands(wins.join(dupHashes(wins, minDocs), Seq("h")), n)
  }

  /** Hashes occurring in at least `minDocs` DISTINCT documents — the
    * shared "duplicated" predicate of the span family. Partial-aggregated
    * (distinct + count), no window.
    */
  private def dupHashes(wins: DataFrame, minDocs: Int): DataFrame =
    wins
      .select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("docs_with"))
      .filter(col("docs_with") >= minDocs)
      .select(col("h"))

  /** Merge a set of cut-marked windows `(doc_id, i)` into maximal token
    * spans: windows join the same span when their token intervals overlap
    * or touch (start gap <= n). Per-DOCUMENT window functions only —
    * partition key = doc_id, so no corpus hot key exists by construction;
    * the lag and running-sum windows share one sort.
    */
  private def mergeIslands(cutWins: DataFrame, n: Int): DataFrame = {
    val ordered = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cutWins
      .select(col("doc_id"), col("i"))
      .withColumn(
        "new_span",
        when(col("i") - lag(col("i"), 1).over(ordered) > n, 1L).otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(running))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("i")).as("span_start"), (max(col("i")) + lit(n - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** The shared span-list subtree of [[dupSpans]]/[[cutDupSpans]]:
    * `(doc_id, spans, dup_tokens)` for documents that HAVE duplicated
    * spans only — callers left-join and coalesce for the clean docs.
    */
  private def dupSpanLists(docs: DataFrame, n: Int, minDocs: Int): DataFrame =
    spanListsOf(dupSpanRows(docs, n, minDocs))

  /** Per-doc sorted span-list rollup of a `(doc_id, span_start, span_end)`
    * row set. The struct field names and sort order are a CONTRACT with
    * [[cutBySpanLists]]'s `getField` access — one definition for every
    * consumer (the rollup, both cut variants) so the shape cannot fork.
    */
  private def spanListsOf(spanRows: DataFrame): DataFrame =
    spanRows
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(struct(col("span_start"), col("span_end")))).as("spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))

  /** The cut step of exact substring dedup: rewrite each document with its
    * duplicated spans (per [[dupSpans]]) REMOVED. This is the destructive
    * variant of Lee et al. 2022's ExactSubstr transform — every occurrence
    * of a corpus-duplicated n-gram run is dropped (the published default:
    * at web scale the duplicated mass is boilerplate). For the
    * keep-one-copy policy see [[cutDupSpansKeepFirst]].
    *
    * Output: `(doc_id, clean_text, kept_tokens)` — one row per input
    * document with non-null text; a fully-duplicated document survives as
    * an empty string with `kept_tokens = 0`, so downstream length gates
    * (not this operator) decide whether it lives.
    *
    * At scale: the span side is the shared [[dupSpanLists]] subtree (docs
    * WITH spans only — the usual minority); the text side is ONE
    * column-pruned scan of (id, text) left-joined on doc_id. The rewrite
    * itself is a row-local higher-order-function chain (`filter` with
    * index + `exists` over the doc's own span list), no explode of the
    * token stream and no shuffle beyond the doc_id join. Cost per row is
    * tokens × spans-per-doc, both document-bounded; `kept_tokens` is the
    * filtered array's own length, so no total/dup counters ride the join.
    */
  def cutDupSpans(docs: DataFrame, n: Int = 10, minDocs: Int = 2): DataFrame =
    cutBySpanLists(docs, dupSpanLists(docs, n, minDocs))

  /** Keep-one-copy variant of [[cutDupSpans]]: for every corpus-duplicated
    * window hash, the globally FIRST occurrence (minimum `(doc_id, i)`,
    * deterministic) is elected canonical and is never itself cut; every
    * other occurrence is cut exactly as in [[cutDupSpans]]. One copy of
    * each duplicated run therefore survives — the policy a
    * citation-preserving or provenance-sensitive corpus wants, where the
    * destructive default would drop ALL copies of a popular passage.
    *
    * Granularity caveat (documented contract): the keep guarantee is
    * per-WINDOW, not per-token — a canonical window's tokens can still
    * fall inside a cut span started by a DIFFERENT duplicated run
    * overlapping it in the same document. For disjoint duplicated runs
    * (the common boilerplate case) the canonical copy survives verbatim.
    *
    * At scale: the lexicographic-min election runs as TWO hash-aggregable
    * `groupBy(h)` steps — min doc per hash, then min index within that
    * doc — because a single `min(struct(doc_id, i))` plans as a
    * SortAggregate (struct min is not hash-aggregable), which would sort
    * every duplicated occurrence map- and reduce-side. All-primitive mins
    * keep the election HashAggregate end to end, NO per-hash window, so a
    * corpus-common boilerplate hash shrinks to one row per map task
    * instead of pinning a single window task (same groupBy+join-back
    * discipline as [[markDuplicates]]). The window subtree AND the
    * duplicated-occurrence join are each materialized once — the latter
    * feeds three consumers (both election passes and the cut join), which
    * would otherwise re-run the df join per consumer.
    */
  def cutDupSpansKeepFirst(docs: DataFrame, n: Int = 10, minDocs: Int = 2): DataFrame = {
    val wins = truncateLineage(windowHashes(docs, n))
    val dup = truncateLineage(wins.join(dupHashes(wins, minDocs), Seq("h")))
    val cDoc = dup.groupBy(col("h")).agg(min(col("doc_id")).as("c_doc"))
    val canon = dup
      .join(cDoc, Seq("h"))
      .filter(col("doc_id") === col("c_doc"))
      .groupBy(col("h"), col("c_doc")).agg(min(col("i")).as("c_i"))
    val cutWins = dup
      .join(canon, Seq("h"))
      .filter(!(col("doc_id") === col("c_doc") && col("i") === col("c_i")))
    cutBySpanLists(docs, spanListsOf(mergeIslands(cutWins, n)))
  }

  /** The shared rewrite of the cut family: drop every token of `docs`
    * that falls inside its document's span list (row-local higher-order
    * `filter` + `exists`; clean docs pass through via the left join).
    */
  private def cutBySpanLists(docs: DataFrame, spanLists: DataFrame): DataFrame = {
    val spansByDoc = spanLists.select(col("doc_id"), col("spans"))
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .join(spansByDoc, Seq("doc_id"), "left")
      .withColumn("kept", filter(col("t"), (tok, i) =>
        !exists(coalesce(col("spans"), emptySpans), sp =>
          (i + lit(1)) >= sp.getField("span_start") &&
            (i + lit(1)) <= sp.getField("span_end"))))
      .select(
        col("doc_id"),
        array_join(col("kept"), " ").as("clean_text"),
        size(col("kept")).cast("long").as("kept_tokens"))
  }

  /** Embedding cosine near-dup pairs WITHOUT a blocking label — for corpora
    * that carry no cluster column. Multi-table sign-LSH blocking (reusing
    * [[Similarity.lshBucket]] with a per-table seed): a near-identical pair
    * is separated by any given hyperplane with probability angle/pi, so it
    * collides in at least one of the `tables` independent bucketings with
    * probability 1 - (1 - (1-p)^planes)^tables. This is a NEAR-DUP
    * operator: the default threshold is dup-grade (0.95 -> p=0.10, pair
    * recall ~0.93 at the defaults; identical vectors are found with
    * probability 1) — at looser thresholds the collision bound collapses
    * (cos 0.4 -> ~0.14 recall) and the right tool is the exact
    * label-blocked [[embeddingDupPairs]] or a higher `tables` count.
    * Candidates are verified by exact cosine, so the output has no false
    * positives at any setting.
    *
    * Scale tuning: expected bucket size is N / 2^planes per table — raise
    * `planes` with corpus size (e.g. 30 planes for 10^9 buckets at 10^12
    * rows) and `tables` to recover the recall the harder partition loses;
    * postings stay `tables` rows per vector.
    *
    * Determinism note (round 4): per-table seeds derive as
    * `seed + GOLDEN * t` (shared with [[Similarity.lshTopK]] via the
    * native `sign_lsh_packed` expression); before round 4 they derived as
    * `seed ^ (t * GOLDEN)`, so the same `seed` does NOT reproduce
    * pre-round-4 candidate sets for `tables >= 2`. Exact duplicates (the
    * oracle's planted guarantee) collide in every table under any scheme;
    * only which NEAR-threshold pairs happen to collide shifts.
    *
    * Degenerate buckets are capped at `maxBucket` vectors (r7 — the same
    * discipline as [[minhashPairs]]/[[simhashPairs]]): IDENTICAL vectors
    * collide in EVERY table by construction, so one mass-duplicated
    * embedding (the all-zeros vector of empty docs, a boilerplate page
    * embedded 10^6 times) would otherwise form a quadratic bucket in all
    * `tables` tables at once — `tables` x 10^12 candidate rows from a
    * single hot key. The cap is a streaming row_number window (lowest
    * `maxBucket` vec_ids per packed table|bucket key — rows stream through
    * the spill-capable window sort, no bucket is ever materialized whole),
    * so pair output from a mega-bucket is bounded at
    * `maxBucket*(maxBucket-1)/2` per table. The cap only binds on
    * mass-duplicate clusters, where pairwise output is the wrong shape
    * anyway: route exact-identical vectors through a hash-grouping dedup
    * first (group by a digest of the vector — the embedding analogue of
    * [[exact]]), exactly as the shingle family documents for its own
    * mass-dup escape. Expected bucket size on diffuse data is
    * N / 2^planes per table — far under any sensible cap.
    */
  def embeddingDupPairsLsh(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      tables: Int = 6,
      planes: Int = 8,
      seed: Long = 7L,
      maxBucket: Int = 200
  ): DataFrame = {
    // native codegen bucketing (no udf boundary in candidate generation);
    // the packed (table << 32 | bucket) long IS the blocking key. Register
    // into the dataframe's OWN session — the one that analyzes this plan —
    // not SparkSession.active, which can be a different session under
    // newSession()/multi-threaded callers.
    graft.expressions.GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Similarity.dotCol(col("v"), col("v"))))
      .withColumn("tb",
        explode(graft.expressions.GraftFunctions.signLshPacked(col("v"), seed, planes, tables)))
    // bucket cap without materializing buckets (see scaladoc): keep the
    // maxBucket lowest vec_ids per packed table|bucket key
    val wBucket = Window.partitionBy(col("tb")).orderBy(col("vec_id").asc)
    val capped = e
      .withColumn("rn", row_number().over(wBucket))
      .filter(col("rn") <= maxBucket)
      .drop("rn")
    val a = capped.select(col("tb"), col("vec_id").as("a_id"),
      col("v").as("a_v"), col("norm").as("a_norm"))
    val b = capped.select(col("tb"), col("vec_id").as("b_id"),
      col("v").as("b_v"), col("norm").as("b_norm"))
    a.join(b, Seq("tb"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (Similarity.dotCol(col("a_v"), col("b_v")) / (col("a_norm") * col("b_norm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("a_id"), col("b_id"))
      .agg(round(max(col("cos")), 6).as("cosine"))
  }
}
