package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ForecastSpec extends SparkSpec {
  import spark.implicits._

  test("AR model learns an exactly-linear series and predicts it perfectly") {
    // v_t = 2t: any lb>=2 window determines the next value exactly
    val df = (1 to 40).map(t => ("m1", t.toLong, 2.0 * t)).toDF("key", "t", "v")
    val m = Forecast.fit(df, Seq("v"), lb = 3, "t", Seq("key"))
    val scored = m.forecast(df, "t", Seq("key"))
    val maxErr = scored.agg(max(col("v_anomaly"))).as[Double].collect().head
    assert(maxErr < 1e-6, s"max |y-yhat| = $maxErr")
  }

  test("multivariate forecast: each target gets its own coefficients") {
    // v = 3t, w = -t: independent linear series, both exactly learnable
    val df = (1 to 40).map(t => ("m1", t.toLong, 3.0 * t, -1.0 * t)).toDF("key", "t", "v", "w")
    val m = Forecast.fit(df, Seq("v", "w"), lb = 2, "t", Seq("key"))
    assert(m.coefs.map(_._1) == Seq("v", "w"))
    val scored = m.forecast(df, "t", Seq("key"))
    val errs = scored.agg(max(col("v_anomaly")), max(col("w_anomaly")))
      .as[(Double, Double)].collect().head
    assert(errs._1 < 1e-6 && errs._2 < 1e-6, errs.toString)
  }

  test("sequences never cross partition keys: per-key series stay exact") {
    // two machines with wildly different scales — a window leaking across
    // keys would poison the boundary rows and break exactness
    val a = (1 to 30).map(t => ("a", t.toLong, 1.0 * t))
    val b = (1 to 30).map(t => ("b", t.toLong, 1000.0 * t))
    val df = (a ++ b).toDF("key", "t", "v")
    val m = Forecast.fit(df, Seq("v"), lb = 2, "t", Seq("key"))
    val maxErr = m.forecast(df, "t", Seq("key"))
      .agg(max(col("v_anomaly"))).as[Double].collect().head
    // ridge bias on the 30000-magnitude series is ~1e-4; a window leaking
    // across keys would poison boundary rows by ~1000s
    assert(maxErr < 1.0, s"max |y-yhat| = $maxErr")
  }

  test("fitPerKey: one model per key, each exact on its own linear series") {
    val a = (1 to 30).map(t => ("a", t.toLong, 2.0 * t))
    val b = (1 to 30).map(t => ("b", t.toLong, 5.0 * t + 7))
    val df = (a ++ b).toDF("key", "t", "v")
    val m = Forecast.fitPerKey(df, "key", "v", lb = 3, "t")
    assert(m.coefs.map(_._1) == Seq("a", "b"))
    val scored = m.forecast(df, "t")
    val maxErr = scored.groupBy("key").agg(max(col("v_anomaly")).as("e"))
      .select("e").as[Double].collect().max
    assert(maxErr < 1e-6, s"max per-key |y-yhat| = $maxErr")
  }

  test("fitPerKey normal-equations solve agrees with the MLlib solver") {
    // noisy-ish but well-conditioned series: deterministic pseudo-noise
    val df = (1 to 60).map { t =>
      ("m1", t.toLong, 3.0 * t + math.sin(t * 0.7) * 5)
    }.toDF("key", "t", "v")
    val mllib = Forecast.fit(df, Seq("v"), lb = 3, "t", Seq("key"))
    val closed = Forecast.fitPerKey(df, "key", "v", lb = 3, "t")
    // lag features are near-collinear, so coefficient VECTORS are
    // ill-conditioned (the two solvers regularize slightly differently);
    // the fitted PREDICTIONS are the well-conditioned comparison
    val pM = mllib.forecast(df, "t", Seq("key"))
      .select(col("t"), col("v_hat").as("hm"))
    val pC = closed.forecast(df, "t")
      .select(col("t").as("t2"), col("v_hat").as("hc"))
    val maxDiff = pM.join(pC, pM("t") === pC("t2"))
      .agg(max(abs(col("hm") - col("hc")))).as[Double].collect().head
    assert(maxDiff < 1e-3, s"max |mllib - closed-form| prediction diff = $maxDiff")
  }

  test("X is strictly before y — no target leakage in the training layout") {
    val df = (1 to 10).map(t => ("m1", t.toLong, t * 1.0)).toDF("key", "t", "v")
    val seqs = Sequences.forecastTarget(df, Seq("v"), lb = 2, "t", Seq("key"))
    val row = seqs.filter(col("t") === 5).select("x_sequence", "y").collect().head
    val x = row.getSeq[scala.collection.Seq[Double]](0).map(_.head)
    assert(x == Seq(3.0, 4.0)) // rows t-2, t-1 only
    assert(row.getSeq[Double](1) == Seq(5.0))
  }
}
