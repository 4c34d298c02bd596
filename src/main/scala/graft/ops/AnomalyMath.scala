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
    * CV scorer). Aggregate expressions only, full double precision — no
    * quantization floor, so small-magnitude residuals (standardized data,
    * well-fit models at ~1e-8) keep their value. The trade: double sums are
    * not summation-order stable, so results can drift by ulps across
    * partition layouts or engines — fine for a metrics API, not for an
    * exact cross-engine compare (for that see [[fixedPointMetrics]],
    * which is bit-stable by construction for fixed-point-exact inputs).
    */
  def metricExprs(y: Column, yHat: Column): Seq[Column] = {
    val e = y - yHat
    val n = count(lit(1)).cast("double")
    val mse = sum(e * e) / n
    val varY = sum(y * y) / n - (sum(y) / n) * (sum(y) / n)
    val varE = mse - (sum(e) / n) * (sum(e) / n)
    Seq(
      (sum(abs(e)) / n).as("mae"),
      sqrt(mse).as("rmse"),
      // nullif: constant y yields null r2 instead of an ANSI crash
      (lit(1.0) - mse / nullif(varY, lit(0.0))).as("r2"),
      (lit(1.0) - varE / nullif(varY, lit(0.0))).as("explained_variance")
    )
  }

  /** mae / rmse / r2 / explained_variance of a fixed-point-exact predictor,
    * bit-identical across engines, partition layouts, and summation orders.
    *
    * Preconditions: y and ŷ are both exactly representable at `scale`
    * decimal places (prices, counts, integer-derived predictions). Then
    * k = value·10^scale is an exact integer, and every sufficient
    * statistic is an INTEGER sum: Σ|k_e|, Σk_e, Σk_y and the SPLIT square
    * sums Σ(k²div 10^8) / Σ(k²mod 10^8). The split is the load-bearing
    * trick: a single Σk² crosses 2^53 at realistic scale, and engines
    * disagree on how to round a >2^53 wide-decimal into a double (one
    * converts the unscaled int128 then divides — two roundings — another
    * parses correctly-rounded). Splitting keeps EVERY number that ever
    * becomes a double below 2^53, where int→double is exact and the
    * reassembly (q·10^8 + r)/10^(2·scale) is the same two IEEE ops on any
    * engine. Valid while each group's Σ(k² div 1e8) < 2^53 — |k| ≤ 1e7
    * holds to ~1e9 rows per group; beyond that, widen the split constant.
    *
    * One hash-aggregate with map-side partial sums over long columns —
    * the cheapest possible 100 TB shape (no second scan, no join).
    */
  def fixedPointMetrics(df: DataFrame, groupCol: String, y: Column,
      yHat: Column, scale: Int = 2): DataFrame = {
    val stats = fixedPointMetricsStats(df, groupCol, y, yHat, scale)
    // reassembly + metrics: a short fixed IEEE op sequence mirrored
    // verbatim in the oracle SQL — do not reassociate
    val k = math.pow(10, scale) // exact for small integer powers
    val hi = math.pow(10, 8 - 2 * scale)
    val lo = math.pow(10, 2 * scale)
    val nD = col("__n").cast("double")
    val sae = col("__s_ae").cast("double") / k
    val se = col("__s_e").cast("double") / k
    val se2 = col("__s_eq").cast("double") * hi + col("__s_er").cast("double") / lo
    val sy = col("__s_y").cast("double") / k
    val sy2 = col("__s_yq").cast("double") * hi + col("__s_yr").cast("double") / lo
    val mse = se2 / nD
    val vy = sy2 / nD - (sy / nD) * (sy / nD)
    val me = se / nD
    stats.select(col(groupCol),
      (sae / nD).as("mae"),
      sqrt(mse).as("rmse"),
      // nullif: constant y yields null r2 instead of an ANSI crash
      (lit(1.0) - mse / nullif(vy, lit(0.0))).as("r2"),
      (lit(1.0) - (mse - me * me) / nullif(vy, lit(0.0))).as("explained_variance"))
  }

  /** The integer sufficient statistics behind [[fixedPointMetrics]]: per
    * group `__n` plus the seven long sums (Σ|k_e|, Σk_e, split Σk_e²,
    * Σk_y, split Σk_y²) with k = value·10^scale. Exposed so staged
    * cross-engine diagnostics can compare each stage pre-double.
    */
  def fixedPointMetricsStats(df: DataFrame, groupCol: String, y: Column,
      yHat: Column, scale: Int = 2): DataFrame = {
    val mul = math.pow(10, scale).toLong
    val ky = (y.cast(s"decimal(18,$scale)") * mul).cast("long")
    val kh = (yHat.cast(s"decimal(18,$scale)") * mul).cast("long")
    df.select(col(groupCol), ky.as("__ky"), (ky - kh).as("__ke"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("__n"),
        sum(abs(col("__ke"))).as("__s_ae"),
        sum(col("__ke")).as("__s_e"),
        sum(expr("__ke * __ke div 100000000L")).as("__s_eq"),
        sum(expr("__ke * __ke % 100000000L")).as("__s_er"),
        sum(col("__ky")).as("__s_y"),
        sum(expr("__ky * __ky div 100000000L")).as("__s_yq"),
        sum(expr("__ky * __ky % 100000000L")).as("__s_yr"))
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

  /** The STREAMING threshold: a native t-digest TypedImperativeAggregate
    * (graft.expressions.TDigestQuantile) — constant memory, mergeable
    * partial sketches, tail-accurate by construction (t-digest centroids
    * shrink toward the extremes, where anomaly thresholds live), and
    * legal inside Structured Streaming aggregations where the exact
    * sort-based `percentile` is not. `compression` trades memory
    * (O(compression) centroids) for rank accuracy.
    */
  def thresholdSketch(scores: Column, p: Double = 0.99,
      compression: Double = 100.0): Column = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    Bridge.column(graft.expressions.TDigestQuantile(
      Bridge.expression(scores.cast("double")), Literal(p), Literal(compression))
      .toAggregateExpression())
  }

  /** Rolling smoothing of an anomaly series (later gordo versions smooth
    * the scores before thresholding): trailing mean over `k` rows.
    */
  def smooth(score: Column, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int): Column = {
    import org.apache.spark.sql.expressions.Window
    avg(score).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*).rowsBetween(-(k - 1), 0)
    )
  }

  /** Two-sided CUSUM drift detection per key (Page's cumulative-sum test,
    * the classic sequential change-point detector for sensor drift). The
    * textbook recursion S⁺_t = max(0, S⁺_{t−1} + x_t − target − slack)
    * cannot be a window expression, but it has an exact closed form:
    * with C_t the plain running sum of deviations, S⁺_t = C_t −
    * min(0, min_{i≤t} C_i) (the 0 is the empty prefix C₀ — dropping it
    * loses alarms whose excursion starts at the first row) — so the
    * whole detector is chained running windows (sums, then
    * mins of those sums) over the SAME (key, order) spec: one shuffle,
    * one sort, the later windows reuse the first's exchange. The downward
    * side runs the same closed form on its own deviation stream
    * x ↦ (target − slack) − x (NOT a sign flip of the up stream — the
    * slack shifts the reference in the opposite direction per side).
    *
    * All arithmetic is DECIMAL end-to-end (values quantized at `scale`
    * decimals), so running sums are exact integers under the hood —
    * bit-stable across engines, partition layouts, and the segment-tree
    * vs sequential window-aggregation strategies, unlike double running
    * sums. Converted to double only at the output (exact below 2^53 of
    * the scaled value).
    *
    * Emits `cusum_up`, `cusum_dn` and integer alarm flags against `h`
    * (the decision interval, in value units).
    */
  def cusum(df: DataFrame, valueCol: String, keyCols: Seq[String],
      orderCols: Seq[Column], target: Double, slack: Double, h: Double,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = s"decimal(18,$scale)"
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // deviations quantized once; exact decimal arithmetic thereafter
    val devUp = col(valueCol).cast(dec) - lit(target + slack).cast(dec)
    val devDn = lit(target - slack).cast(dec) - col(valueCol).cast(dec)
    // running sums first, THEN running mins of the materialized sums —
    // same window spec throughout, so Catalyst plans one Exchange + Sort
    val withC = df
      .withColumn("__cu", sum(devUp).over(w))
      .withColumn("__cd", sum(devDn).over(w))
    val hDec = lit(h).cast(dec)
    val zero = lit(0).cast(dec)
    withC
      .withColumn("__up", col("__cu") - least(zero, min(col("__cu")).over(w)))
      .withColumn("__dn", col("__cd") - least(zero, min(col("__cd")).over(w)))
      .withColumn("cusum_up", col("__up").cast("double"))
      .withColumn("cusum_dn", col("__dn").cast("double"))
      .withColumn("alarm_up", (col("__up") > hDec).cast("int"))
      .withColumn("alarm_dn", (col("__dn") > hDec).cast("int"))
      .drop("__cu", "__cd", "__up", "__dn")
  }

  /** Rolling lag-`lagN` autocorrelation per key over a trailing `k`-row
    * window — the sensor-health statistic that catches a stream whose
    * CORRELATION STRUCTURE drifts while its level stays in band (a stuck
    * sensor goes autocorr→1, a noise fault goes →0; level-based CUSUM and
    * z-scores see neither).
    *
    * Numerics: values quantize once at `scale` decimals to exact integer
    * units; every windowed sufficient statistic (n, Σx, Σy, Σxy, Σx²,
    * Σy²) is then an exact INTEGER sum, and the Pearson combination
    * runs the same fixed IEEE sequence on both engines — the rolling
    * window application of the fixedPointMetrics split-sum discipline
    * (here magnitudes stay < 2^53 outright for scale ≤ 2 and |x| ≤ 5·10⁴,
    * so no split is needed: see the bound in the scaladoc of
    * [[fixedPointMetrics]]). Result is bit-identical across engines,
    * partition layouts, and window-aggregation strategies — no rounding
    * needed. Degenerate windows (n < 2 or zero variance) yield null.
    *
    * One exchange: the lag and every frame aggregate share the (key,
    * order) window spec.
    */
  def rollingAutocorr(df: DataFrame, valueCol: String, keyCols: Seq[String],
      orderCols: Seq[Column], k: Int, lagN: Int = 1, scale: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mul = math.pow(10, scale).toLong
    val wOrder = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val wFrame = wOrder.rowsBetween(-(k - 1), 0)
    val kx = (col(valueCol).cast(s"decimal(18,$scale)") * mul).cast("long")
    val valid = col("__ky").isNotNull
    val stats = df.withColumn("__kx", kx)
      .withColumn("__ky", lag(col("__kx"), lagN).over(wOrder))
      .withColumn("__n", count(col("__ky")).over(wFrame))
      .withColumn("__sx", sum(when(valid, col("__kx"))).over(wFrame))
      .withColumn("__sy", sum(col("__ky")).over(wFrame))
      .withColumn("__sxy", sum(col("__kx") * col("__ky")).over(wFrame))
      .withColumn("__sxx", sum(when(valid, col("__kx") * col("__kx"))).over(wFrame))
      .withColumn("__syy", sum(col("__ky") * col("__ky")).over(wFrame))
    // the combination sequence is mirrored VERBATIM in the oracle SQL —
    // do not reassociate
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val num = n * col("__sxy").cast("double") - sx * sy
    val vx = n * col("__sxx").cast("double") - sx * sx
    val vy = n * col("__syy").cast("double") - sy * sy
    stats
      .withColumn("autocorr",
        when(col("__n") >= 2, num / sqrt(nullif(vx * vy, lit(0.0)))))
      .drop("__kx", "__ky", "__n", "__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** Robust per-key outlier score: z = 0.6745·(x − median) / MAD, with
    * MAD = median(|x − median|) — the median-absolute-deviation scale
    * estimate that, unlike the mean/stddev z-score, is not itself dragged
    * by the outliers it is meant to flag (50% breakdown point).
    *
    * Scale shape: two aggregation passes (median, then MAD of the
    * residuals) with the tiny per-key parameter frames broadcast back —
    * never a per-key window over the raw rows (a 100 TB key would
    * single-partition). Exact percentile at test scale for the oracle;
    * swap `percentile` for `percentile_approx`/t-digest at 100 TB (same
    * shape, documented trade as [[threshold]]/[[thresholdApprox]]).
    * Constant keys (MAD = 0) yield null scores via nullif rather than an
    * ANSI divide error.
    */
  def robustZScore(df: DataFrame, valueCol: String, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val med = df.groupBy(keys: _*).agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val withMed = df.join(broadcast(med), keyCols)
    val mad = withMed.groupBy(keys: _*)
      .agg(percentile(abs(col(valueCol) - col("__med")), lit(0.5)).as("__mad"))
    withMed.join(broadcast(mad), keyCols)
      .withColumn("robust_z",
        lit(0.6745) * (col(valueCol) - col("__med")) / nullif(col("__mad"), lit(0.0)))
      .drop("__med", "__mad")
  }
}
