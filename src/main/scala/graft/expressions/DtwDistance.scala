package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dynamic-time-warping distance between two double arrays —
  * Sakoe & Chiba 1978's banded DP, the canonical elastic similarity for
  * time-series profiles that plain Euclidean mis-ranks under phase
  * shift. Cost is |a_i − b_j| with the standard three-way recurrence;
  * the band radius (`DtwDistance.Band`, adjusted for length difference
  * so corners stay reachable) caps the DP at O(n·band) instead of
  * O(n·m).
  *
  * Codegen is a single static call inside whole-stage codegen (the
  * [[JaroWinkler]] shape). Scratch: two rolling DP rows — O(m) heap per
  * call, no quadratic table. Callers compare AGGREGATED profiles
  * (hourly/daily shapes, tens of points), never raw µs streams: the
  * corpus-scale work is the upstream groupBy, and the pair count is
  * bounded by the profile-key vocabulary.
  */
case class DtwDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dtw"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<double>, got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DtwDistance.dtw(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.DtwDistance.dtw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwDistance =
    copy(left = newLeft, right = newRight)
}

object DtwDistance {

  /** Sakoe-Chiba band radius. Fixed (not a parameter expression) so the
    * generated code stays a two-arg static call; widen here if a caller
    * ever needs a looser band. */
  val Band = 3

  /** Static DP helper referenced from generated code. Null elements are
    * the caller's bug surfaced as NaN propagation (profiles come from
    * aggregates, which never emit null array elements here). */
  def dtw(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return if (n == m) 0.0 else Double.PositiveInfinity
    // widen the band by the length difference so (n-1, m-1) is reachable
    val band = math.max(Band, math.abs(n - m))
    val INF = Double.PositiveInfinity
    var prev = Array.fill(m + 1)(INF)
    var cur = new Array[Double](m + 1)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, INF)
      val lo = math.max(1, i - band)
      val hi = math.min(m, i + band)
      var j = lo
      while (j <= hi) {
        val c = math.abs(a.getDouble(i - 1) - b.getDouble(j - 1))
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Array variant for specs and driver-side checks. */
  def dtwArrays(a: Array[Double], b: Array[Double]): Double =
    dtw(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b))
}
