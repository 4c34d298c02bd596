package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Geo

/** The declarative geo-radius join rewrite: the optimizer rule must turn
  * `CROSS JOIN … WHERE graft_haversine(…) < r` into the grid candidate
  * join WITHOUT changing a single row — including polar points (outside
  * the banded grid) and pairs straddling the antimeridian — and must
  * decline cleanly when the radius is too large for a useful grid.
  * The test session lacks the injected extensions, so the rule is
  * attached via `spark.experimental.extraOptimizations` and the
  * function via the shared registration helper.
  */
class GeoRuleSpec extends SparkSpec {

  import spark.implicits._

  // functions + rule come from the shared SparkSpec session, which
  // mirrors the deployment builder's GraftExtensions injection

  /** Deterministic scatter over the FULL ±90° lat range (not just the
    * fixture's ±60° band) so the polar fallback branch carries rows.
    */
  private def scatter(n: Int, salt: String, idName: String): DataFrame =
    spark.range(n).select(col("id").as(idName),
      ((conv(substring(md5(concat(lit(salt), col("id"))), 1, 15), 16, 10)
        .cast("long") % 1800000L - 900000L) / 10000.0).as("lat"),
      ((conv(substring(md5(concat(lit(salt), col("id"))), 17, 15), 16, 10)
        .cast("long") % 3600000L - 1800000L) / 10000.0).as("lon"))

  private def sqlRadius(r: Double): DataFrame = {
    scatter(400, "L", "lid").createOrReplaceTempView("__rule_l")
    scatter(150, "R", "rid").createOrReplaceTempView("__rule_r")
    spark.sql(
      s"""SELECT l.lid, r.rid
         |FROM __rule_l l, __rule_r r
         |WHERE graft_haversine(l.lat, l.lon, r.lat, r.lon) < $r""".stripMargin)
  }

  private def naive(r: Double): Set[(Long, Long)] =
    scatter(400, "L", "lid").crossJoin(
        scatter(150, "R", "rid").select(col("rid"),
          col("lat").as("rlat"), col("lon").as("rlon")))
      .filter(Geo.haversineKm(col("lat"), col("lon"),
        col("rlat"), col("rlon")) < r)
      .select("lid", "rid").as[(Long, Long)].collect().toSet

  test("rewritten plan: grid equi-join + 3-branch union, naive-identical rows") {
    val df = sqlRadius(500.0)
    val optimized = df.queryExecution.optimizedPlan
    val unions = optimized.collect { case u: Union => u }
    assert(unions.nonEmpty, "rule did not rewrite: no Union in plan")
    val gridJoins = optimized.collect {
      case j: Join if j.condition.exists(_.exists(
        _.isInstanceOf[GeoRewriteMarker])) => j
    }
    assert(gridJoins.size == 3, s"expected 3 marked joins, got ${gridJoins.size}")
    assert(gridJoins.exists(_.condition.get.toString.contains("__pcy")),
      "no grid equi-join on cell keys")
    val got = df.as[(Long, Long)].collect().toSet
    val expected = naive(500.0)
    assert(expected.nonEmpty, "scatter produced no in-radius pairs")
    assert(got == expected)
    // the scatter must actually exercise the polar fallback
    val polarRows = scatter(400, "L", "lid").filter(abs(col("lat")) > 66.0).count()
    assert(polarRows > 0, "no polar rows — the fallback branch is untested")
  }

  test("antimeridian pair is found through the lon cell wrap") {
    Seq((1L, 0.0, -179.95)).toDF("lid", "lat", "lon")
      .createOrReplaceTempView("__rule_l")
    Seq((2L, 0.0, 179.95)).toDF("rid", "lat", "lon")
      .createOrReplaceTempView("__rule_r")
    val rows = spark.sql(
      """SELECT l.lid, r.rid FROM __rule_l l, __rule_r r
        |WHERE graft_haversine(l.lat, l.lon, r.lat, r.lon) < 50.0""".stripMargin)
    assert(rows.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.exists(
        _.isInstanceOf[GeoRewriteMarker])) => j }.nonEmpty,
      "rule did not fire on the seam fixture")
    assert(rows.count() == 1)
  }

  test("oversized radius declines the rewrite and stays correct") {
    val df = sqlRadius(15000.0)
    assert(df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.exists(
        _.isInstanceOf[GeoRewriteMarker])) => j }.isEmpty,
      "rule should decline when the band grid has < 4 lon cells")
    assert(df.as[(Long, Long)].collect().toSet == naive(15000.0))
  }

  test("native graft_haversine is bit-identical to the Column-tree haversine") {
    val diffs = scatter(500, "L", "lid").crossJoin(
        scatter(40, "R", "rid").select(col("rid"),
          col("lat").as("rlat"), col("lon").as("rlon")))
      .select(
        Geo.haversineKm(col("lat"), col("lon"), col("rlat"), col("rlon"))
          .as("tree"),
        expr("graft_haversine(lat, lon, rlat, rlon)").as("native"))
      .filter(col("tree") =!= col("native"))
      .count()
    assert(diffs == 0, s"$diffs pairs diverge between tree and native haversine")
  }
}
