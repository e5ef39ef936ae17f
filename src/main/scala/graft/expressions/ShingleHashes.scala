package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingle hashing (`shingle_hashes64(text, n)` ->
  * sorted distinct array<bigint>).
  *
  * Why an Expression: shingling runs over every document in the dedup
  * family (exact n-gram Jaccard, MinHash, connected components). The
  * previous formulation was a typed `Dataset.map`, which forces a
  * DeserializeToObject/SerializeFromObject boundary — every row pays full
  * object materialization, column pruning stops at the boundary, and
  * whole-stage codegen splits. This expression participates in codegen
  * (a direct static call) and hashes byte ranges of the UTF8String in
  * place: tokens split on the 0x20 byte (single-space tokenization, the
  * same contract as [[SimHashImpl]]), and an n-token window's joined
  * string is EXACTLY the byte subrange from its first token's start to its
  * last token's end — so hashing the subrange is bit-identical to the
  * Scala kernel `Dedup.shingleHashes` (property-tested), including the
  * empty-token semantics of `split(" ", -1)` and the whole-text fallback
  * for docs shorter than n tokens.
  */
case class ShingleHashes64Expr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size $n must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes64 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes64"

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleImpl.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleImpl {
  /** Sorted distinct 64-bit shingle hashes of `s` under single-space
    * tokenization; byte-range FNV-1a + mix64, identical constants to
    * `graft.ops.Dedup.hash64`.
    */
  def hashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token count under split(" ", -1): separators + 1
    var seps = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) seps += 1; i += 1 }
    val nTokens = seps + 1
    if (nTokens < n) {
      // whole-text shingle, INCLUDING empty text (SQL parity: split('')
      // yields [''], so '' must hash too)
      return UnsafeArrayData.fromPrimitiveArray(Array(hashRange(bytes, 0, len)))
    }
    // start offset of every token (position after each separator)
    val starts = new Array[Int](nTokens)
    starts(0) = 0
    var tk = 1
    i = 0
    while (i < len) { if (bytes(i) == 0x20) { starts(tk) = i + 1; tk += 1 }; i += 1 }
    val nWindows = nTokens - n + 1
    val out = new Array[Long](nWindows)
    var w = 0
    while (w < nWindows) {
      val from = starts(w)
      val until = if (w + n < nTokens) starts(w + n) - 1 else len // exclude trailing sep
      out(w) = hashRange(bytes, from, until)
      w += 1
    }
    // sorted distinct (the kernel's SortedSet contract)
    java.util.Arrays.sort(out)
    var uniq = 0
    var j = 0
    while (j < nWindows) {
      if (j == 0 || out(j) != out(j - 1)) { out(uniq) = out(j); uniq += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, uniq))
  }

  private def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  // delegate, not a copy: only ever called from compiled Scala (the codegen
  // entry points are hashes/sig/bands/keys), so the single mix64 definition
  // in graft.util.Hashing stays the one source of the constants
  def mix64(z0: Long): Long = graft.util.Hashing.mix64(z0)
}

/** `minhash_sig(shingles, k)`: MinHash signature over a shingle-hash array
  * (k seeded-mix minima, one pass). Same Expression rationale as
  * [[ShingleHashes64Expr]]; bit-identical to `Dedup.minhashSignature`.
  */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"signature size $k must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=false only: toLongArray would silently read a null
    // element as shingle 0 and compute a wrong signature
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> without null elements, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashImpl.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashImpl {
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val sh = shingles.toLongArray()
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val s = sh(i)
      var h = 0
      while (h < k) {
        val v = ShingleImpl.mix64(s ^ (0x9e3779b97f4a7c15L * (h + 1)))
        if (v < out(h)) out(h) = v
        h += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-band LSH bucket keys of a signature (`minhash_bands(sig, bands)`):
    * band b's key chains mix64 over its signature slice from a
    * band-seeded FNV init — identical to the loop previously inlined in
    * `Dedup.minhashPairs`.
    *
    * The signature length must be a positive multiple of `nBands`: a
    * non-divisible length would silently ignore the trailing signature
    * entries, and nBands > length would make rowsPerBand 0 so EVERY
    * document gets the same per-band keys — turning LSH candidate
    * generation into a full cross join. `minhash_bands` is a public SQL
    * function reachable with arbitrary arguments, so both degenerate
    * shapes fail loudly here instead of computing garbage keys.
    */
  def bands(sig: ArrayData, nBands: Int): ArrayData = {
    val s = sig.toLongArray()
    if (nBands <= 0) {
      throw new IllegalArgumentException(
        s"minhash_bands: band count must be positive, got $nBands")
    }
    if (s.length < nBands || s.length % nBands != 0) {
      throw new IllegalArgumentException(
        s"minhash_bands: signature length ${s.length} must be a positive " +
          s"multiple of the band count $nBands (rows-per-band would be " +
          s"${s.length / nBands} with ${s.length % nBands} entries ignored)")
    }
    val rowsPerBand = s.length / nBands
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0xcbf29ce484222325L ^ b.toLong
      var i = b * rowsPerBand
      while (i < (b + 1) * rowsPerBand) { h = ShingleImpl.mix64(h ^ s(i)); i += 1 }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object SimHashKeysImpl {
  /** Per-table block-combination keys of a 64-bit simhash for the Manku
    * multi-table hamming search (`simhash_keys(h, radius)`): B = radius + 3
    * near-even bit blocks, one ~32-bit concatenated key per 3-block
    * combination — identical to the loop previously inlined in
    * `Dedup.simhashPairsFromHashes`. Combination order is
    * `(0 until B).combinations(3)` order; the table id is the array index.
    */
  def keys(h: Long, radius: Int): ArrayData = {
    val nBlocks = radius + 3
    val combos = combosFor(nBlocks)
    val bounds = Array.tabulate(nBlocks + 1)(b => b * 64 / nBlocks)
    val out = new Array[Long](combos.length)
    var t = 0
    while (t < combos.length) {
      val combo = combos(t)
      var key = 0L
      var i = 0
      while (i < combo.length) {
        val b = combo(i)
        val lo = bounds(b)
        val width = bounds(b + 1) - lo
        val mask = if (width >= 64) -1L else (1L << width) - 1
        key = (key << width) | ((h >>> lo) & mask)
        i += 1
      }
      out(t) = key
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val comboCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Int]]]()
  private def combosFor(nBlocks: Int): Array[Array[Int]] =
    comboCache.computeIfAbsent(nBlocks,
      n => (0 until n).combinations(3).map(_.toArray).toArray)
}

/** `simhash_keys(h, radius)` — see [[SimHashKeysImpl.keys]]. */
case class SimHashKeysExpr(child: Expression, radius: Int) extends UnaryExpression {
  require(radius >= 1 && radius <= 8, s"radius $radius out of range for key tables")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_keys requires bigint, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_keys"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKeysImpl.keys(input.asInstanceOf[Long], radius)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashKeysImpl.keys($c, $radius)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_bands(sig, bands)` — see [[MinHashImpl.bands]]. */
case class MinHashBandsExpr(child: Expression, nBands: Int) extends UnaryExpression {
  require(nBands >= 1, s"band count $nBands must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<bigint> without null elements, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.bands(input.asInstanceOf[ArrayData], nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashImpl.bands($c, $nBands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
