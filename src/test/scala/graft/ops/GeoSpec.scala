package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Geo grid-join correctness: the bucketed candidate set must reproduce
  * the brute-force pair set exactly (including across the antimeridian
  * seam), and the haversine must hit known ground distances.
  */
class GeoSpec extends SparkSpec {

  import spark.implicits._

  test("haversine hits known ground distances") {
    val d = spark.range(1).select(
      Geo.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(1.0)).as("eq1deg"),
      Geo.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(0.0)).as("zero"),
      Geo.haversineKm(lit(50.0), lit(10.0), lit(52.0), lit(13.0)).as("ab"),
      Geo.haversineKm(lit(52.0), lit(13.0), lit(50.0), lit(10.0)).as("ba"))
      .head()
    // 1° of longitude at the equator: 2πR/360 = 111.195 km
    assert(math.abs(d.getDouble(0) - 111.195) < 0.01)
    assert(d.getDouble(1) == 0.0)
    assert(math.abs(d.getDouble(2) - d.getDouble(3)) < 1e-9) // symmetric
    assert(d.getDouble(2) > 280 && d.getDouble(2) < 320) // ~306 km
  }

  /** Deterministic scatter of n points over the ±60° lat domain. */
  private def scatter(n: Int, salt: String) = spark.range(n)
    .select(col("id"),
      (conv(substring(md5(concat(lit(salt), col("id"))), 1, 15), 16, 10)
        .cast("long") % 1200000L - 600000L).as("lat_e4"),
      (conv(substring(md5(concat(lit(salt), col("id"))), 17, 15), 16, 10)
        .cast("long") % 3600000L - 1800000L).as("lon_e4"))

  test("radiusPairs ≡ brute force on a deterministic scatter") {
    val left = scatter(200, "L").withColumnRenamed("id", "lid")
    val right = scatter(60, "R").withColumnRenamed("id", "rid")
    val grid = Geo.radiusPairs(left, "lid", right, "rid", 500.0, 45249L, 100000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = left.crossJoin(
        right.select(col("rid"), col("lat_e4").as("rla"), col("lon_e4").as("rlo")))
      .withColumn("d", Geo.haversineKm(
        col("lat_e4") / 10000.0, col("lon_e4") / 10000.0,
        col("rla") / 10000.0, col("rlo") / 10000.0))
      .filter(col("d") < 500.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "scatter produced no in-radius pairs — tune n")
    assert(grid == brute)
  }

  test("antimeridian seam: a pair straddling ±180° is found via the lon wrap") {
    val left = Seq((1L, 0L, -1799500L)).toDF("lid", "lat_e4", "lon_e4")
    val right = Seq((2L, 0L, 1799500L)).toDF("rid", "lat_e4", "lon_e4")
    val rows = Geo.radiusPairs(left, "lid", right, "rid", 500.0, 45249L, 100000L)
      .collect()
    assert(rows.length == 1)
    // 0.1° of longitude at the equator ≈ 11.12 km
    assert(math.abs(rows(0).getAs[Double]("dist_km") - 11.12) < 0.01)
  }

  test("cell-width preconditions are asserted") {
    val df = Seq((1L, 0L, 0L)).toDF("id", "lat_e4", "lon_e4")
    intercept[IllegalArgumentException] { // 90910 does not divide 3600000
      Geo.radiusPairs(df, "id", df, "id", 500.0, 45249L, 90910L)
    }
    intercept[IllegalArgumentException] { // lat cells narrower than radius
      Geo.radiusPairs(df, "id", df, "id", 500.0, 10000L, 100000L)
    }
    // the old linear 55 km/° bound ACCEPTED this (40° × 55 = 2200 ≥ 2200)
    // but the curvature-exact worst case at 60° lat is 40.19° > 40°:
    // pairs could span past the 3×3 neighborhood and silently drop
    intercept[IllegalArgumentException] {
      Geo.radiusPairs(df, "id", df, "id", 2200.0, 200000L, 400000L)
    }
  }

  test("agg_moments matches driver-side float skew/kurt on the real fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("agg_moments")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val raw = graft.sources.Events.read(spark, s"$dir/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(cast(value as decimal(18,6)) * 1000000 as bigint) div 100000")
          .cast("double").as("c"))
      .as[(String, Double)].collect().groupBy(_._1)
    for ((et, rows) <- raw) {
      val cs = rows.map(_._2)
      val n = cs.length.toDouble
      val mean = cs.sum / n
      val m2 = cs.map(x => math.pow(x - mean, 2)).sum / n
      val m3 = cs.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = cs.map(x => math.pow(x - mean, 4)).sum / n
      val (gn, gmean, gskew, gkurt) = got(et)
      assert(gn == cs.length)
      assert(math.abs(gmean - mean / 10.0) < 1e-5, s"$et mean")
      assert(math.abs(gskew - m3 / math.pow(m2, 1.5)) < 1e-5, s"$et skew")
      assert(math.abs(gkurt - (m4 / (m2 * m2) - 3.0)) < 1e-5, s"$et kurt")
    }
  }

  test("ml_knn_classify: majority vote verified against per-row recompute") {
    val dir = "/root/testdata/sf0.001"
    val pred = graft.SparkEntry.queries("ml_knn_classify")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2)))
    assert(pred.nonEmpty)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)].collect()
    val (test, train) = e.partition(_._1 % 20 == 0)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    for ((qid, _, lbl) <- test) {
      val top = train.map { case (nid, v, nl) =>
        (nl, cos(test.find(_._1 == qid).get._2, v), nid)
      }.sortBy { case (_, c, nid) => (-c, nid) }.take(5)
      val want = top.groupBy(_._1).map { case (l, g) => (l, g.length) }
        .toSeq.sortBy { case (l, v) => (-v, l) }.head._1
      val (gotTrue, gotPred) = pred.find(_._1 == qid).get._2
      assert(gotTrue == lbl)
      assert(gotPred == want, s"qid=$qid")
    }
  }
}
