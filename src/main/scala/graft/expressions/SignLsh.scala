package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native multi-table sign-LSH bucketing
  * (`sign_lsh_packed(vec, seed, planes, tables)` -> array<bigint>).
  *
  * Why an Expression: bucket assignment runs over EVERY corpus vector in
  * `Similarity.lshTopK` (and the probe variant over every query). The
  * previous formulation was a Scala UDF — a closure-serialization boundary
  * that blocks whole-stage codegen exactly on the ANN candidate-generation
  * hot path, the last UDFs left in the engine. This expression participates
  * in codegen via a direct static call.
  *
  * Each output entry packs `(table << 32) | bucket` into one long, so the
  * caller recovers both halves with plain bitwise Columns (shiftright /
  * bitwise-and — still codegen) after `explode`. [[SignLshProbesExpr]]
  * emits, per table, the center bucket plus all hamming-1 neighbors — the
  * multi-probe query side. Bit-identical to `Similarity.lshBucket` with the
  * per-table seed derivation `seed + GOLDEN * t` (property-tested).
  */
abstract class SignLshBase extends UnaryExpression {
  def seed: Long
  def planes: Int
  def nTables: Int
  // NOTE: no require() here — a superclass-body check would run during
  // Java deserialization BEFORE the case-class fields are assigned
  // (planes reads 0 mid-construction and the executor-side deserialize
  // fails with InvalidClassException). Each concrete class validates in
  // its own body instead.
  protected final def validateParams(): Unit = {
    require(planes >= 1 && planes <= 30, s"planes must be in [1,30], got $planes")
    require(nTables >= 1, s"tables must be >= 1, got $nTables")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
}

case class SignLshPackedExpr(child: Expression, seed: Long, planes: Int, nTables: Int)
    extends SignLshBase {
  validateParams()
  override def prettyName: String = "sign_lsh_packed"
  override protected def nullSafeEval(input: Any): Any =
    SignLshImpl.packed(input.asInstanceOf[ArrayData], seed, planes, nTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SignLshImpl.packed($c, ${seed}L, $planes, $nTables)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SignLshProbesExpr(child: Expression, seed: Long, planes: Int, nTables: Int)
    extends SignLshBase {
  validateParams()
  override def prettyName: String = "sign_lsh_probes"
  override protected def nullSafeEval(input: Any): Any =
    SignLshImpl.probes(input.asInstanceOf[ArrayData], seed, planes, nTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SignLshImpl.probes($c, ${seed}L, $planes, $nTables)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLshImpl {
  private val Golden = 0x9e3779b97f4a7c15L

  /** One bucket for one table — the same arithmetic as
    * `Similarity.lshBucket` over `Similarity.hyperplane` (mix64-derived
    * pseudo-random planes), inlined here so the expression has no
    * dependency cycle onto ops. A null array element reads as 0.0 (it
    * cannot influence any dot product's sign).
    */
  def bucket(v: ArrayData, tableSeed: Long, planes: Int): Int = {
    val n = v.numElements()
    var b = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        if (!v.isNullAt(d)) {
          val h = graft.util.Hashing.mix64(tableSeed ^ (p.toLong << 32) ^ d.toLong)
          dot += v.getDouble(d) * (h.toDouble / Long.MaxValue.toDouble)
        }
        d += 1
      }
      if (dot > 0) b |= (1 << p)
      p += 1
    }
    b
  }

  def packed(v: ArrayData, seed: Long, planes: Int, nTables: Int): ArrayData = {
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      out(t) = (t.toLong << 32) | bucket(v, seed + Golden * t, planes).toLong
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def probes(v: ArrayData, seed: Long, planes: Int, nTables: Int): ArrayData = {
    val perTable = 1 + planes
    val out = new Array[Long](nTables * perTable)
    var t = 0
    while (t < nTables) {
      val b = bucket(v, seed + Golden * t, planes)
      val base = t * perTable
      val tHi = t.toLong << 32
      out(base) = tHi | b.toLong
      var p = 0
      while (p < planes) {
        out(base + 1 + p) = tHi | (b ^ (1 << p)).toLong
        p += 1
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
