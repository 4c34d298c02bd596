package graft.ops

import graft.SparkSpec
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
}
