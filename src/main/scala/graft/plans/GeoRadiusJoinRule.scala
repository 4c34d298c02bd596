package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}

import graft.expressions.HaversineKm

/** Always-true, NON-foldable marker conjunct stamped into every join
  * condition [[GeoRadiusJoinRule]] emits. The fixed-point optimizer
  * batch re-runs the rule after other rules have REBUILT the joins
  * (losing any TreeNodeTag — `copy()` does not carry tags), so the loop
  * guard must live in the condition expression tree itself. Two lessons
  * are baked in, both measured as optimizer OOMs by earlier drafts:
  * foldable MUST be false (ConstantFolding would erase a foldable true),
  * and the marker MUST reference one attribute from EACH join side — a
  * reference-free conjunct is "evaluable on the left child" (∅ ⊆ left),
  * so PushPredicateThroughJoin hoists it OUT of the join condition and
  * the rule re-matches its own output. Children are never evaluated;
  * execution cost is a literal `true` per candidate row.
  */
case class GeoRewriteMarker(left: Expression, right: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.literal("true", BooleanType))
  override def prettyName: String = "graft_geo_rewritten"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoRewriteMarker =
    copy(left = newChildren(0), right = newChildren(1))
}

/** Catalyst optimizer rule: rewrite a DECLARATIVE geo radius join —
  *
  *   {{{ SELECT … FROM pts p, sites s WHERE graft_haversine(p.lat, p.lon, s.lat, s.lon) < 500.0 }}}
  *
  * — from the naive cross product Catalyst would otherwise plan
  * (BroadcastNestedLoopJoin: O(|L|·|R|) trig at 100 TB) into the
  * grid-bucketed candidate join of [[graft.ops.Geo.radiusPairs]]: bucket
  * both sides into latitude/longitude cells at least one radius wide,
  * equi-join each probe row's 3×3 cell neighborhood (longitude wrapping
  * modulo the grid), and re-apply the ORIGINAL predicate on the
  * candidates. The user states intent; the optimizer picks the plan —
  * the Spark-first answer to a spatial-join operator.
  *
  * Exactness: the residual filter keeps the kept-set correct whatever
  * the grid does, and completeness is split by latitude band —
  *   - |lat| ≤ 66°: cell widths are derived from the haversine identity
  *     itself (Δφ ≤ r/R; sin(Δλ/2) ≤ sin(r/2R)/cos 66° — the curvature-
  *     exact bound, not the linear approximation), so two band rows
  *     within r can never sit more than one cell apart;
  *   - |lat| > 66° (either side): the pair routes through an explicit
  *     fallback join carrying the original predicate — polar caps hold
  *     a vanishing fraction of real corpora, and the fallback keeps the
  *     rewrite EXACT without a latitude-banded grid.
  * Null coordinates drop in every branch exactly as the original filter
  * dropped them. The rewrite declines (plan unchanged) when the radius
  * is so large the band grid would have < 4 longitude cells.
  *
  * Guards: every rewritten join condition carries a
  * [[GeoRewriteMarker]] conjunct, so the rule cannot re-match its own
  * output inside the fixed-point batch Spark runs injected rules in —
  * a TreeNodeTag would NOT survive there, because sibling rules rebuild
  * joins with `copy()`, which drops tags (measured: the tag-guarded
  * draft of this rule OOMed the optimizer re-expanding its own polar
  * branches). Matches both the Filter-over-unconditioned-join shape and
  * the pushed-down condition-in-join shape (PushPredicateThroughJoin
  * runs in the same batch).
  */
case class GeoRadiusJoinRule() extends Rule[LogicalPlan] {

  private val BandLat = 66.0
  private val SphereRadiusKm = 6371.0088 // IUGG mean radius (Geo.EarthDiameterKm / 2)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, Join(left, right, Inner | Cross, None, _))
        if unmarked(cond) =>
      rewrite(cond, left, right).getOrElse(f)
    case j @ Join(left, right, Inner | Cross, Some(cond), _)
        if unmarked(cond) =>
      rewrite(cond, left, right).getOrElse(j)
  }

  private def unmarked(cond: Expression): Boolean =
    !cond.exists(_.isInstanceOf[GeoRewriteMarker])

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** (latL, lonL, latR, lonR, radius) when some conjunct is
    * `graft_haversine < r` with one coordinate pair per join side.
    */
  private def extract(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Expression, Double)] = {
    def oriented(h: HaversineKm, r: Double) = {
      val firstRefs = h.lat1.references ++ h.lon1.references
      val secondRefs = h.lat2.references ++ h.lon2.references
      if (r > 0 && firstRefs.subsetOf(left.outputSet) &&
        secondRefs.subsetOf(right.outputSet))
        Some((h.lat1, h.lon1, h.lat2, h.lon2, r))
      else if (r > 0 && secondRefs.subsetOf(left.outputSet) &&
        firstRefs.subsetOf(right.outputSet))
        Some((h.lat2, h.lon2, h.lat1, h.lon1, r))
      else None
    }
    conjuncts(cond).flatMap {
      case LessThan(h: HaversineKm, Literal(r: Double, DoubleType)) =>
        oriented(h, r)
      case LessThanOrEqual(h: HaversineKm, Literal(r: Double, DoubleType)) =>
        oriented(h, r)
      case GreaterThan(Literal(r: Double, DoubleType), h: HaversineKm) =>
        oriented(h, r)
      case GreaterThanOrEqual(Literal(r: Double, DoubleType), h: HaversineKm) =>
        oriented(h, r)
      case _ => None
    }.headOption
  }

  private def rewrite(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[LogicalPlan] =
    extract(cond, left, right).flatMap { case (latL, lonL, latR, lonR, r) =>
      // cell widths from the haversine identity (see scaladoc): lat from
      // the meridian arc, lon from the curvature-exact band bound
      val dLatDeg = math.toDegrees(r / SphereRadiusKm) + 1e-9
      val sinHalf = math.sin(r / (2.0 * SphereRadiusKm)) /
        math.cos(math.toRadians(BandLat))
      val nLon =
        if (sinHalf >= 1.0) 0L
        else math.floor(360.0 / (math.toDegrees(2.0 * math.asin(sinHalf)) + 1e-9)).toLong
      if (nLon < 4 || left.output.isEmpty || right.output.isEmpty) None
      else {
        val cellLon = 360.0 / nLon
        val outAttrs = (left.output ++ right.output).map(a => a: NamedExpression)

        def cellY(lat: Expression): Expression =
          Floor(Divide(Add(lat, Literal(90.0)), Literal(dLatDeg)))
        def cellX(lon: Expression): Expression =
          Pmod(Floor(Divide(Add(lon, Literal(180.0)), Literal(cellLon))),
            Literal(nLon))
        def band(lat: Expression, child: LogicalPlan): LogicalPlan =
          Filter(LessThanOrEqual(Abs(lat), Literal(BandLat)), child)
        def polar(lat: Expression, child: LogicalPlan): LogicalPlan =
          Filter(GreaterThan(Abs(lat), Literal(BandLat)), child)

        // probe (left): 9-cell neighborhood via two exploded deltas
        val cyA = Alias(cellY(latL), "__gcy")()
        val cxA = Alias(cellX(lonL), "__gcx")()
        val projL = Project(left.output ++ Seq(cyA, cxA), band(latL, left))
        val dyAttr = AttributeReference("__gdy", LongType, nullable = false)()
        val dxAttr = AttributeReference("__gdx", LongType, nullable = false)()
        val deltas = CreateArray(Seq(Literal(-1L), Literal(0L), Literal(1L)))
        val genDy = Generate(Explode(deltas), Nil, outer = false, None,
          Seq(dyAttr), projL)
        val genDx = Generate(Explode(deltas), Nil, outer = false, None,
          Seq(dxAttr), genDy)
        val pcyA = Alias(Add(cyA.toAttribute, dyAttr), "__pcy")()
        val pcxA = Alias(Pmod(Add(cxA.toAttribute, dxAttr), Literal(nLon)),
          "__pcx")()
        val probe = Project(left.output ++ Seq(pcyA, pcxA), genDx)

        // build (right): one cell per row
        val bcyA = Alias(cellY(latR), "__bcy")()
        val bcxA = Alias(cellX(lonR), "__bcx")()
        val build = Project(right.output ++ Seq(bcyA, bcxA), band(latR, right))

        def marker = GeoRewriteMarker(left.output.head, right.output.head)
        val joinCond = And(And(EqualTo(pcyA.toAttribute, bcyA.toAttribute),
          EqualTo(pcxA.toAttribute, bcxA.toAttribute)), marker)
        val gridJoin = Join(probe, build, Inner, Some(joinCond), JoinHint.NONE)
        val gridBranch = Project(outAttrs, Filter(cond, gridJoin))

        // polar fallbacks keep the rewrite exact outside the band; the
        // marker conjunct keeps this rule from re-matching them after
        // predicate pushdown merges `cond` into their join conditions
        def fallback(l: LogicalPlan, rr: LogicalPlan): LogicalPlan = {
          val jj = Join(l, rr, Inner, Some(marker), JoinHint.NONE)
          Project(outAttrs, Filter(cond, jj))
        }
        val polarLeft = fallback(polar(latL, left), right)
        val bandPolar = fallback(band(latL, left), polar(latR, right))

        Some(Union(Seq(gridBranch, polarLeft, bandPolar)))
      }
    }
}
