package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Holt-Winters additive triple exponential smoothing, per key — the
  * classic seasonal forecaster for operational series (hourly sensor /
  * traffic aggregates with a daily cycle), complementing [[Forecast]]'s
  * AR models (lag regression, no explicit seasonal state) and
  * [[EchoState]] (nonlinear, no interpretable components).
  *
  *   level_t = α·(y_t − s_{t−m}) + (1−α)·(level_{t−1} + trend_{t−1})
  *   trend_t = β·(level_t − level_{t−1}) + (1−β)·trend_{t−1}
  *   s_t     = γ·(y_t − level_t) + (1−γ)·s_{t−m}
  *   ŷ_{n+k} = level_n + k·trend_n + s_{n−m+1+((k−1) mod m)}
  *
  * Initialization (the standard textbook scheme): level₀ = mean of the
  * first season, trend₀ = (mean of season 2 − mean of season 1)/m,
  * s_i = y_i − level₀ for the first season.
  *
  * Spark shape: the recursion is inherently sequential IN TIME but
  * embarrassingly parallel ACROSS keys — exactly Spark's
  * `groupBy(key).agg(sort_array(collect_list(...)))` + a per-row (=
  * per-key) executor-side smoothing pass. Per-key state is the RESAMPLED
  * series (range/resolution points — thousands), never the raw events,
  * so a 100 TB fleet fits: one shuffle keyed by machine, each executor
  * smoothing its keys independently. Deterministic: sort_array fixes the
  * time order, the recursion is pure arithmetic — no seeds.
  */
object HoltWinters {

  final case class HwParams(alpha: Double = 0.3, beta: Double = 0.05,
      gamma: Double = 0.2, period: Int = 24)

  /** Smooth one series; returns (finalLevel, finalTrend, finalSeason[m],
    * oneStepResiduals). Requires ≥ 2 full seasons.
    */
  private[ml] def smooth(y: Array[Double], p: HwParams):
      (Double, Double, Array[Double], Array[Double]) = {
    val m = p.period
    require(y.length >= 2 * m, s"need >= ${2 * m} points, got ${y.length}")
    val mean1 = y.slice(0, m).sum / m
    val mean2 = y.slice(m, 2 * m).sum / m
    var level = mean1
    var trend = (mean2 - mean1) / m
    // seasonal ring buffer: s(i) holds the most recent seasonal estimate
    // for position i mod m; seeded from season 1 deviations.
    val s = Array.tabulate(m)(i => y(i) - mean1)
    val resid = new Array[Double](y.length - m)
    var t = m
    while (t < y.length) {
      val sOld = s(t % m)
      val yHat = level + trend + sOld
      resid(t - m) = y(t) - yHat
      val lOld = level
      level = p.alpha * (y(t) - sOld) + (1 - p.alpha) * (level + trend)
      trend = p.beta * (level - lOld) + (1 - p.beta) * trend
      s(t % m) = p.gamma * (y(t) - level) + (1 - p.gamma) * sOld
      t += 1
    }
    (level, trend, s, resid)
  }

  /** h-step-ahead forecast per key over a keyed long frame
    * `(keyCol, bucketCol, valueCol)` (one row per resample bucket, e.g.
    * from [[graft.ops.Timeseries.resample]]). Output: one row per
    * (key, step 1..h) — `(keyCol, step, yhat, level, trend)` with the
    * smoothed terminal level/trend carried for interpretability.
    * Gap policy: missing buckets are the caller's concern (interpolate or
    * densify first); the smoother consumes the rows that exist in bucket
    * order.
    */
  def forecast(resampled: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, horizon: Int, params: HwParams = HwParams()): DataFrame = {
    val spark = resampled.sparkSession
    import spark.implicits._
    val series = resampled
      .filter(col(valueCol).isNotNull)
      .groupBy(keyCol)
      .agg(sort_array(collect_list(struct(col(bucketCol).as("b"),
        col(valueCol).cast("double").as("v")))).as("ys"))
      // keys with fewer than 2 full seasons are SKIPPED, not fatal: one
      // newly-onboarded short series must not fail the whole fleet's
      // forecast job (smooth() itself stays strict for direct callers)
      .filter(size(col("ys")) >= 2 * params.period)
      .select(col(keyCol).cast("string"), col("ys").getField("v").as("ys"))
      .as[(String, Seq[Double])]
    series.flatMap { case (key, ys) =>
      val (level, trend, s, _) = smooth(ys.toArray, params)
      val n = ys.length
      val m = params.period
      (1 to horizon).map { k =>
        // seasonal index of forecast step k: the ring slot that position
        // (n + k − 1) mod m will read — the most recent estimate for that
        // position-in-period.
        val yhat = level + k * trend + s((n + k - 1) % m)
        (key, k, yhat, level, trend)
      }
    }.toDF(keyCol, "step", "yhat", "level", "trend")
  }
}
