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

  /** Per-group regression metrics of col `y` against prediction `yHat`:
    * mae, rmse, and r2 = 1 - MSE/Var(y). Aggregate expressions only.
    */
  def metricExprs(y: Column, yHat: Column): Seq[Column] = {
    val e = y - yHat
    Seq(
      avg(abs(e)).as("mae"),
      sqrt(avg(e * e)).as("rmse"),
      // nullif: constant y yields null r2 instead of an ANSI crash
      (lit(1.0) - avg(e * e) / nullif(var_pop(y), lit(0.0))).as("r2")
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
