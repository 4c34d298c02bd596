package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native codegen haversine great-circle distance (km) over degree
  * doubles — ONE whole-stage-codegen call instead of the 12-node
  * sin/cos/asin Column tree, and the expression
  * [[graft.plans.GeoRadiusJoinRule]] pattern-matches to rewrite a
  * declarative `CROSS JOIN … WHERE graft_haversine(…) < r` into the
  * grid-bucketed candidate join.
  *
  * BIT PARITY CONTRACT: [[Haversine.km]] performs the exact operations,
  * in the exact association, of [[graft.ops.Geo.haversineKm]]'s Column
  * tree and [[graft.ops.Geo.haversineSql]]'s DuckDB text (same double
  * literals for π/180, π/360 and the IUGG diameter) — the three
  * renderings of the formula must never drift, or the oracle hash
  * compare and the rule's "rewrite is invisible" guarantee both break.
  */
case class HaversineKm(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression) extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_haversine"

  override def checkInputDataTypes(): TypeCheckResult =
    // ExpectsInputTypes/AbstractDataType are private[sql] in Spark 4 —
    // manual check; the SQL function builder casts numerics to double
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs four doubles, got ${children.map(_.dataType.sql).mkString(", ")}")

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Haversine.km(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.expressions.Haversine.km($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): HaversineKm =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object Haversine {
  // the same double literals as graft.ops.Geo — see the parity contract
  val DegToRad = 0.017453292519943295
  val HalfDegToRad = 0.008726646259971648
  val EarthDiameterKm = 12742.0176

  /** Static helper referenced from generated code; operation order is
    * the parity contract with Geo.haversineKm / Geo.haversineSql.
    */
  def km(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val sdlat = Math.sin((lat2 - lat1) * HalfDegToRad)
    val sdlon = Math.sin((lon2 - lon1) * HalfDegToRad)
    val a = sdlat * sdlat +
      Math.cos(lat1 * DegToRad) * Math.cos(lat2 * DegToRad) * (sdlon * sdlon)
    EarthDiameterKm * Math.asin(Math.min(1.0, Math.sqrt(a)))
  }
}
