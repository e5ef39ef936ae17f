package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native IVF coarse-quantizer lookup
  * (`ivf_cells(vec, centroids, nProbe)` -> array<int>): the `nProbe` cell
  * ids whose (unit) centroids have the highest dot product with the input
  * vector, descending, ties to the LOWER cell id — bit-identical to the
  * closure-UDF formulation it replaces (`maxBy((dot, -id))` for assignment,
  * `sortBy((-dot, id)).take(nProbe)` for probing; strict `>` during an
  * index-ordered scan reproduces both).
  *
  * Why an Expression: cell assignment runs over EVERY corpus vector in
  * `Similarity.ivfTopK`/`assignCells`, and the two closure UDFs here were
  * the last UDFs on any shipped operator's hot path — a serialization
  * boundary that broke whole-stage codegen exactly where the scan is
  * widest. The centroid matrix rides in the expression (plan-serialized,
  * `ctx.addReferenceObj` in codegen): fine for coarse quantizers sized like
  * the default 16 (a few KB). A cell count big enough to make the plan
  * payload matter (say 2^16 centroids at high dim) wants the
  * explode+broadcast-join argmin formulation instead — at that size the
  * lookup is a join, not a scalar.
  */
case class IvfCellsExpr(child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression {
  // concrete-class body validation (a base-class require would run during
  // Java deserialization before field assignment — see SignLshBase)
  require(centroids.nonEmpty, "ivf_cells: empty centroid set")
  require(centroids.forall(_.length == centroids.head.length),
    "ivf_cells: ragged centroid matrix")
  require(nProbe >= 1, s"ivf_cells: nProbe must be >= 1, got $nProbe")

  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray
  private def dim: Int = centroids.head.length
  private def k: Int = centroids.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivf_cells"

  override protected def nullSafeEval(input: Any): Any =
    IvfImpl.cells(input.asInstanceOf[ArrayData], flat, dim, k, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.IvfImpl.cells($c, $ref, $dim, $k, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen-callable implementation (static forwarder emitted for Java). */
object IvfImpl {

  /** Top-`nProbe` centroid indices by dot product, descending, ties to the
    * lower index (strict `>` in an index-ordered selection scan). A null
    * vector element reads as 0.0, mirroring SignLshImpl. A vector whose
    * length differs from the centroid dimension is LOUD (the closure it
    * replaced crashed on short vectors too — silently zero-padding would
    * assign a cell to malformed data). NaN semantics are defined, not
    * inherited: a NaN dot product never wins a strict-`>` comparison, so a
    * NaN-poisoned vector deterministically lands in the lowest-indexed
    * remaining cell (the replaced Scala `maxBy` treated NaN as greatest —
    * the one documented divergence, on inputs that are garbage either way).
    */
  def cells(v: ArrayData, flat: Array[Double], dim: Int, k: Int, nProbe: Int): ArrayData = {
    val n = v.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"ivf_cells: vector length $n != centroid dimension $dim")
    val dots = new Array[Double](k)
    var j = 0
    while (j < k) {
      var dot = 0.0
      var d = 0
      while (d < dim) {
        if (!v.isNullAt(d)) dot += v.getDouble(d) * flat(j * dim + d)
        d += 1
      }
      dots(j) = dot
      j += 1
    }
    val m = math.min(nProbe, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var slot = 0
    while (slot < m) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!used(i) && (best < 0 || dots(i) > bestDot)) { best = i; bestDot = dots(i) }
        i += 1
      }
      used(best) = true
      out(slot) = best
      slot += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
