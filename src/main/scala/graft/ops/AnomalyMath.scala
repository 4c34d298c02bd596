package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diff-based anomaly scoring + model-evaluation metrics, as pure Column
  * expressions (whole-stage-codegen friendly — no UDFs).
  *
  * Reference: `gordo_components/model/anomaly/diff.py::DiffBasedAnomalyDetector`
  *   - per-tag error e_i = y_i - ŷ_i; unscaled anomaly = |e_i|
  *   - scaled anomaly     = |scale(y_i) - scale(ŷ_i)|
  *   - total anomaly      = L2 norm across tags sqrt(Σ e_i²)
  *   - thresholds         = high percentile of validation-fold scores
  * and `builder/build_model.py` cross-validation metrics
  * (explained_variance, r2, MAE, MSE). Local mount empty — public-repo
  * citations, SURVEY.md §0; exact threshold percentile unverifiable, kept
  * as a parameter (default 0.99).
  */
object AnomalyMath {

  /** |y - ŷ| per tag. */
  def tagAnomaly(y: Column, yHat: Column): Column = abs(y - yHat)

  /** sqrt(Σ (y_i - ŷ_i)²) across tag pairs — the total-anomaly L2 norm. */
  def totalAnomaly(pairs: Seq[(Column, Column)]): Column =
    sqrt(pairs.map { case (y, yh) => pow(y - yh, 2) }.reduce(_ + _))

  /** The reference's `tag-anomaly-scaled`: |scale(y) - scale(ŷ)| per tag,
    * where scale is min-max FITTED ON THE ACTUAL y COLUMNS ONLY and applied
    * to both y and ŷ (the detector fits its scaler on the target frame,
    * then transforms y and the prediction with the same parameters).
    *
    * Spark-first: one aggregate job for all per-tag parameters, broadcast
    * cross-joined into the elementwise transform — no window, no second
    * scan. Appends `<y>_anomaly_scaled` per (y, ŷ) pair.
    */
  def scaledTagAnomaly(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val paramExprs = pairs.flatMap { case (y, _) =>
      Seq(min(col(y)).as(s"__mn_$y"), max(col(y)).as(s"__mx_$y"))
    }
    val params = df.agg(paramExprs.head, paramExprs.tail: _*)
    val out = pairs.foldLeft(df.crossJoin(broadcast(params))) { case (d, (y, yh)) =>
      val mn = col(s"__mn_$y")
      val rng = nullif(col(s"__mx_$y") - mn, lit(0.0)) // constant y -> null
      d.withColumn(s"${y}_anomaly_scaled",
        abs((col(y) - mn) / rng - (col(yh) - mn) / rng))
    }
    out.drop(pairs.flatMap { case (y, _) => Seq(s"__mn_$y", s"__mx_$y") }: _*)
  }

  /** Per-group regression metrics of col `y` against prediction `yHat`:
    * mae, rmse, r2 = 1 - MSE/Var(y), and explained_variance =
    * 1 - Var(e)/Var(y) (sklearn's explained_variance_score, the reference's
    * CV scorer). Aggregate expressions only.
    *
    * Every raw sum goes through DECIMAL(28,6) — exact and summation-order
    * independent, so partial/final aggregation in Spark and single-threaded
    * DuckDB produce bit-identical doubles; the derived metrics are then the
    * same short sequence of IEEE double ops on both engines. A raw
    * `avg(e*e)` double aggregate is NOT order-stable and flips the 6th
    * rounded decimal between engines (round-1 agg_metrics failure).
    */
  def metricExprs(y: Column, yHat: Column): Seq[Column] = {
    val e = y - yHat
    // e ~ 1e5, e² ~ 1e10, × 1e8 rows ~ 1e18 — DECIMAL(28,6) holds 1e22.
    def dsum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")
    val n = count(lit(1)).cast("double")
    val mse = dsum(e * e) / n
    val varY = dsum(y * y) / n - (dsum(y) / n) * (dsum(y) / n)
    val varE = dsum(e * e) / n - (dsum(e) / n) * (dsum(e) / n)
    Seq(
      (dsum(abs(e)) / n).as("mae"),
      sqrt(mse).as("rmse"),
      // nullif: constant y yields null r2 instead of an ANSI crash
      (lit(1.0) - mse / nullif(varY, lit(0.0))).as("r2"),
      (lit(1.0) - varE / nullif(varY, lit(0.0))).as("explained_variance")
    )
  }

  /** Anomaly thresholds = exact percentile of scores per group (the
    * reference takes a high percentile of validation-fold anomaly scores).
    * Exact (sort-based) percentile, not approx — required for oracle
    * hash-match; at 100 TB swap for percentile_approx or a t-digest
    * TypedImperativeAggregate (same API, documented trade).
    */
  def threshold(scores: Column, p: Double = 0.99): Column =
    percentile(scores, lit(p))

  /** The 100 TB swap-in for `threshold`: `percentile_approx` with bounded
    * accuracy — single-pass, fixed memory, mergeable across partitions,
    * no global sort of the score column. `accuracy` trades memory for
    * rank error (≤ 1/accuracy of the rank). Same API, documented trade;
    * the exact form stays for oracle hash-match at test scale.
    */
  def thresholdApprox(scores: Column, p: Double = 0.99, accuracy: Int = 10000): Column =
    percentile_approx(scores, lit(p), lit(accuracy))

  /** Rolling smoothing of an anomaly series (later gordo versions smooth
    * the scores before thresholding): trailing mean over `k` rows.
    */
  def smooth(score: Column, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int): Column = {
    import org.apache.spark.sql.expressions.Window
    avg(score).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*).rowsBetween(-(k - 1), 0)
    )
  }
}
