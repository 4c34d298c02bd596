package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The millions-of-keys fit fork and the nonlinear sequence forecaster. */
class ForecastScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fleet = {
    // 20 machines, each its own AR(2) process with distinct coefficients
    val rows = for {
      k <- 0 until 20
      series = {
        val buf = scala.collection.mutable.ArrayBuffer(1.0, 2.0)
        while (buf.length < 40)
          buf += 0.5 * buf(buf.length - 1) + (0.3 + k * 0.01) * buf(buf.length - 2) + 1.0
        buf.toSeq
      }
      (v, t) <- series.zipWithIndex
    } yield (s"m$k", t.toLong, v)
    rows.toDF("key", "t", "v")
  }

  test("distributed fit produces bit-identical coefficients to the driver fit") {
    val driver = Forecast.fitPerKey(fleet, "key", "v", lb = 2, "t")
    val dist = Forecast.fitPerKeyDistributed(fleet, "key", "v", lb = 2, "t")
      .orderBy("tag").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    assert(dist == driver.coefs, "coefficient tables must match exactly")
  }

  test("forecastJoined scores identically to the CASE-literal path") {
    val driver = Forecast.fitPerKey(fleet, "key", "v", lb = 2, "t")
    val coefs = Forecast.fitPerKeyDistributed(fleet, "key", "v", lb = 2, "t")
    val a = driver.forecast(fleet, "t")
      .select("key", "t", "v_hat", "v_anomaly").orderBy("key", "t").collect()
    val b = Forecast.forecastJoined(fleet, coefs, "key", "v", lb = 2, "t")
      .select("key", "t", "v_hat", "v_anomaly").orderBy("key", "t").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("distributed coefficient table rehydrates into a KeyedForecastModel") {
    val coefs = Forecast.fitPerKeyDistributed(fleet, "key", "v", lb = 2, "t")
    val m = Forecast.KeyedForecastModel.fromDF(coefs)
    assert(m.lb == 2 && m.keyCol == "key" && m.coefs.length == 20)
  }

  test("nonlinear forecaster fits the logistic map where linear AR cannot") {
    // v' = 3.8 v (1-v): deterministic chaos, purely a NONLINEAR function
    // of the previous value — the structural blind spot of a linear AR
    val buf = scala.collection.mutable.ArrayBuffer(0.3)
    while (buf.length < 400) {
      val v = buf.last; buf += 3.8 * v * (1 - v)
    }
    val df = buf.toSeq.zipWithIndex.map { case (v, t) => ("s", t.toLong, v) }
      .toDF("key", "t", "v")
    val linear = Forecast.fit(df, Seq("v"), lb = 3, "t", Seq("key"))
      .forecast(df, "t", Seq("key"))
      .agg(avg("v_anomaly")).head().getDouble(0)
    val nl = Forecast.fitNonlinear(df, Seq("v"), lb = 3, "t", Seq("key"), hidden = 32)
      .forecast(df, "t", Seq("key"))
      .agg(avg("v_anomaly")).head().getDouble(0)
    assert(nl < 0.3 * linear,
      s"nonlinear MAE ($nl) should be far below linear AR MAE ($linear)")
  }

  test("nonlinear forecaster is seed-deterministic and key-isolated") {
    val a = Forecast.fitNonlinear(fleet, Seq("v"), lb = 2, "t", Seq("key"),
      hidden = 8, seed = 5L)
    val b = Forecast.fitNonlinear(fleet, Seq("v"), lb = 2, "t", Seq("key"),
      hidden = 8, seed = 5L)
    assert(a.beta.flatten.toSeq == b.beta.flatten.toSeq)
    // scoring a single key's frame uses only that key's sequences
    val one = fleet.filter(col("key") === "m3")
    val scored = a.forecast(one, "t", Seq("key"))
    assert(scored.count() == 38) // 40 rows - lb
  }
}
