package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class AnomalyMathSpec extends SparkSpec {
  import spark.implicits._

  test("tagAnomaly is |y - yhat|") {
    val df = Seq((3.0, 5.0), (5.0, 3.0), (2.0, 2.0)).toDF("y", "yh")
    val out = df.select(AnomalyMath.tagAnomaly(col("y"), col("yh"))).as[Double].collect()
    assert(out.toSeq == Seq(2.0, 2.0, 0.0))
  }

  test("totalAnomaly is the L2 norm across tag errors") {
    val df = Seq((3.0, 0.0, 4.0, 0.0)).toDF("y1", "h1", "y2", "h2")
    val out = df.select(AnomalyMath.totalAnomaly(
      Seq((col("y1"), col("h1")), (col("y2"), col("h2"))))).as[Double].collect()
    assert(out.head == 5.0) // sqrt(9 + 16)
  }

  test("scaledTagAnomaly is |y-yhat| / (max(y)-min(y)), fitted on y only") {
    // y in [0, 10] -> range 10; |y-yhat|=2 everywhere -> scaled 0.2
    val df = Seq((0.0, 2.0), (10.0, 8.0), (5.0, 3.0)).toDF("y", "yh")
    val out = AnomalyMath.scaledTagAnomaly(df, Seq("y" -> "yh"))
      .select("y_anomaly_scaled").as[Double].collect()
    assert(out.forall(v => math.abs(v - 0.2) < 1e-12))
    // constant y -> null, not a divide-by-zero crash
    val const = Seq((1.0, 5.0)).toDF("y", "yh")
    val row = AnomalyMath.scaledTagAnomaly(const, Seq("y" -> "yh"))
      .select("y_anomaly_scaled").collect().head
    assert(row.isNullAt(0))
  }

  test("anomaly properties: non-negative, zero iff e=0 (scalacheck)") {
    val gen = Gen.chooseNum(-1e100, 1e100)
    val prop = Prop.forAll(gen, gen) { (y: Double, yh: Double) =>
      val a = math.abs(y - yh)
      a >= 0.0 && ((a == 0.0) == (y == yh))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("metricExprs computes MAE/RMSE/R2 against a fixture") {
    val df = Seq((1.0, 2.0), (3.0, 3.0), (5.0, 4.0)).toDF("y", "yh")
    val row = df.agg(
      AnomalyMath.metricExprs(col("y"), col("yh")).head,
      AnomalyMath.metricExprs(col("y"), col("yh")).tail: _*).collect().head
    assert(math.abs(row.getAs[Double]("mae") - 2.0 / 3) < 1e-12)
    assert(math.abs(row.getAs[Double]("rmse") - math.sqrt(2.0 / 3)) < 1e-12)
    // var_pop(y) = 8/3; r2 = 1 - (2/3)/(8/3) = 0.75
    assert(math.abs(row.getAs[Double]("r2") - 0.75) < 1e-12)
    // sum(e) = 0 so Var(e) = MSE and explained_variance = r2 here
    assert(math.abs(row.getAs[Double]("explained_variance") - 0.75) < 1e-12)
  }

  test("threshold matches the exact percentile definition") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = df.agg(AnomalyMath.threshold(col("v"), 0.99)).as[Double].collect().head
    assert(math.abs(out - 99.01) < 1e-9) // linear interpolation percentile
  }

  test("thresholdApprox tracks the exact percentile within rank tolerance") {
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val (exact, approx) = df.agg(
        AnomalyMath.threshold(col("v"), 0.99).as("e"),
        AnomalyMath.thresholdApprox(col("v"), 0.99).as("a"))
      .as[(Double, Double)].collect().head
    // rank error <= n/accuracy = 1 rank here
    assert(math.abs(approx - exact) <= 2.0, s"exact=$exact approx=$approx")
  }

  test("smooth is a trailing mean over k rows") {
    val df = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)).toDF("k", "v")
    val out = df.select(
      AnomalyMath.smooth(col("v"), Seq.empty, Seq(col("k")), 2).as("s"))
      .orderBy("k").as[Double].collect()
    assert(out.toSeq == Seq(2.0, 3.0, 5.0))
  }

  test("cusum closed form equals the clamped textbook recursion, per key") {
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 30.0),
      ("a", 5L, 1.0), ("a", 6L, 1.0),
      ("b", 1L, 25.0), ("b", 2L, 2.0), ("b", 3L, 2.0), ("b", 4L, 40.0))
    val (target, slack, h) = (15.0, 2.0, 10.0)
    val out = AnomalyMath.cusum(rows.toDF("tag", "i", "v"), "v", Seq("tag"),
        Seq(col("i")), target, slack, h)
      .select("tag", "i", "cusum_up", "cusum_dn", "alarm_up", "alarm_dn")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getInt(4), r.getInt(5))))
      .toMap
    rows.groupBy(_._1).foreach { case (tag, group) =>
      var up = 0.0; var dn = 0.0
      group.sortBy(_._2).foreach { case (_, i, v) =>
        up = math.max(0.0, up + (v - target - slack))
        dn = math.max(0.0, dn + (target - slack - v))
        val (gu, gd, au, ad) = out((tag, i))
        assert(math.abs(gu - up) < 1e-9, s"up($tag,$i): got $gu want $up")
        assert(math.abs(gd - dn) < 1e-9, s"dn($tag,$i): got $gd want $dn")
        assert((au == 1) == (up > h), s"alarm_up($tag,$i)")
        assert((ad == 1) == (dn > h), s"alarm_dn($tag,$i)")
      }
    }
  }

  test("cusum plans one exchange: all windows share the (key, order) sort") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0)).toDF("tag", "i", "v")
    val plan = AnomalyMath.cusum(df, "v", Seq("tag"), Seq(col("i")),
      0.0, 0.0, 1.0).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("rollingAutocorr: trend -> +1, alternation -> -1, constant -> null") {
    // tag a: strictly increasing (x_t perfectly correlates with x_{t-1});
    // tag b: alternating (perfect anti-correlation); tag c: constant
    val rows =
      (1 to 8).map(i => ("a", i.toLong, i * 10.0)) ++
      (1 to 8).map(i => ("b", i.toLong, if (i % 2 == 0) 20.0 else 10.0)) ++
      (1 to 8).map(i => ("c", i.toLong, 7.0))
    val out = AnomalyMath.rollingAutocorr(rows.toDF("tag", "i", "v"), "v",
        Seq("tag"), Seq(col("i")), k = 6)
      .select("tag", "i", "autocorr").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // first row of every tag has no lag pair; second has n=1 < 2 -> null
    Seq("a", "b", "c").foreach { t =>
      assert(out((t, 1L)).isEmpty && out((t, 2L)).isEmpty)
    }
    assert(math.abs(out(("a", 8L)).get - 1.0) < 1e-9)
    assert(math.abs(out(("b", 8L)).get + 1.0) < 1e-9)
    assert(out(("c", 8L)).isEmpty) // zero variance -> null, not a crash
  }

  test("rollingAutocorr plans one exchange (lag + frame sums share the sort)") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0)).toDF("tag", "i", "v")
    val plan = AnomalyMath.rollingAutocorr(df, "v", Seq("tag"), Seq(col("i")),
      k = 3).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("exact detectors are bit-identical across partition layouts") {
    // the integer/decimal sufficient-statistic discipline claims layout
    // independence — pin it: 1 vs 13 input partitions must agree EXACTLY
    val rows = (1 to 200).map(i => (s"t${i % 3}", i.toLong, (i * 7 % 1000) / 100.0))
    def run(parts: Int): (Seq[Row], Seq[Row]) = {
      val df = rows.toDF("tag", "i", "v").repartition(parts)
      val c = AnomalyMath.cusum(df, "v", Seq("tag"), Seq(col("i")), 5.0, 1.0, 3.0)
        .orderBy("tag", "i").collect().toSeq
      val a = AnomalyMath.rollingAutocorr(df, "v", Seq("tag"), Seq(col("i")), k = 7)
        .orderBy("tag", "i").collect().toSeq
      (c, a)
    }
    val (c1, a1) = run(1)
    val (c13, a13) = run(13)
    assert(c1.map(_.toSeq) == c13.map(_.toSeq))
    assert(a1.map(_.toSeq) == a13.map(_.toSeq))
  }

  test("robustZScore centers on the median and scales by MAD") {
    // values 1..5 + outlier 100: median 3.5? no — 1,2,3,4,5,100: med=(3+4)/2=3.5,
    // |x-med| = 2.5,1.5,.5,.5,1.5,96.5 -> MAD = 1.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("a", 100.0)).toDF("tag", "v")
    val out = AnomalyMath.robustZScore(df, "v", Seq("tag"))
      .select("v", "robust_z").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(3.0) - 0.6745 * (3.0 - 3.5) / 1.5) < 1e-12)
    assert(math.abs(out(100.0) - 0.6745 * 96.5 / 1.5) < 1e-12)
    // the outlier's score stays huge BECAUSE median/MAD ignore it; a
    // mean/stddev z-score would have been dragged to ~2.2
    assert(out(100.0) > 40.0)
  }

  test("robustZScore yields null (not a crash) on constant keys") {
    val df = Seq(("c", 7.0), ("c", 7.0), ("c", 7.0)).toDF("tag", "v")
    val rows = AnomalyMath.robustZScore(df, "v", Seq("tag"))
      .select("robust_z").collect()
    assert(rows.forall(_.isNullAt(0)))
  }
}
