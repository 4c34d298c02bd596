package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DeflateRatio, DotProduct, HeavyHitters, RollingAnchors, SortedIntersectCount, TDigestQuantile}

/** Session extension registering graft's native expressions with the SQL
  * function registry, so `spark.sql("SELECT graft_dot(a, b) ...")` works:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // programmatic
  *   // or .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, cls, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }
    // optimizer rule: declarative `… WHERE graft_haversine(…) < r` over a
    // cross join rewrites to the grid-bucketed candidate join (see
    // graft.plans.GeoRadiusJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.GeoRadiusJoinRule())
  }
}

object GraftExtensions {

  /** The SQL function surface, as ONE source of truth — consumed by both
    * the extension injection above and `Bridge.registerFunctions` (the
    * imperative route into an existing session), so the two registration
    * paths can never drift.
    */
  val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct], children => {
      require(children.length == 2,
        s"graft_dot takes 2 arguments, got ${children.length}")
      DotProduct(children.head, children(1))
    }),
    ("graft_tdigest_quantile", classOf[TDigestQuantile], children =>
      children.length match {
        case 2 => new TDigestQuantile(children.head, children(1))
        case 3 => TDigestQuantile(children.head, children(1), children(2))
        case other => throw new IllegalArgumentException(
          s"graft_tdigest_quantile takes 2 or 3 arguments, got $other")
      }),
    ("graft_heavy_hitters", classOf[HeavyHitters], children => {
      require(children.length == 2,
        s"graft_heavy_hitters takes 2 arguments, got ${children.length}")
      HeavyHitters(children.head, children(1))
    }),
    ("graft_deflate_ratio", classOf[DeflateRatio], children => {
      require(children.length == 1,
        s"graft_deflate_ratio takes 1 argument, got ${children.length}")
      DeflateRatio(children.head)
    }),
    ("graft_anchors", classOf[RollingAnchors], children => {
      require(children.length == 4,
        s"graft_anchors takes 4 arguments, got ${children.length}")
      RollingAnchors(children.head, children(1), children(2), children(3))
    }),
    ("graft_haversine", classOf[graft.expressions.HaversineKm], children => {
      require(children.length == 4,
        s"graft_haversine takes 4 arguments, got ${children.length}")
      // numeric SQL literals arrive as int/decimal — cast to double here
      // (ExpectsInputTypes is private[sql] in Spark 4)
      val d = children.map(c =>
        org.apache.spark.sql.catalyst.expressions.Cast(c,
          org.apache.spark.sql.types.DoubleType))
      graft.expressions.HaversineKm(d(0), d(1), d(2), d(3))
    }),
    ("graft_sorted_intersect", classOf[SortedIntersectCount], children => {
      require(children.length == 2,
        s"graft_sorted_intersect takes 2 arguments, got ${children.length}")
      SortedIntersectCount(children.head, children(1))
    }))
}
