package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Echo-state network forecaster — the honest recurrent analogue of the
  * reference's `model/models.py::KerasLSTMForecast` (public repo; mount
  * empty, SURVEY.md §0), and the recurrent upgrade of
  * `Forecast.fitNonlinear`: where the feedforward model sees only a fixed
  * lookback window, the reservoir state h_t = (1−α)h_{t−1} +
  * α·tanh(W_in·x_t + W_res·h_{t−1} + b) carries FADING MEMORY OF THE
  * WHOLE SERIES across time steps (echo-state property: ‖W_res‖'s
  * spectral radius < 1 makes old inputs decay geometrically instead of
  * being truncated). Only the linear readout is trained — the published
  * reservoir-computing recipe (Jaeger 2001) — so training stays a ridge
  * solve over sufficient statistics, like every other graft.ml fit.
  *
  * Spark shape: ONE shuffle (repartition by key) + an in-partition sort,
  * then a single sequential scan per key in `mapPartitions` carrying the
  * R-vector state — the one place graft uses imperative per-partition
  * logic, because a recurrence over the full history is genuinely not a
  * window expression (a window would either truncate the memory or
  * re-run O(t) work per row). Emitting (h_{t−1}, y_t) DURING the scan
  * makes one-step-ahead targets line up without any self-join or second
  * shuffle; the readout then fits with [[RandomFeatures.ridgeBeta]]'s
  * single aggregation. Per-key series scan parallelizes across keys —
  * the fleet shape — and costs R·(R+d) flops per row.
  *
  * Determinism: weights come from seeded [[RandomFeatures.randn]],
  * spectral radius from a fixed-iteration power method, and the scan
  * order from `sortWithinPartitions(keys, order)` — two fits are
  * bit-identical. (key, order) must be unique per row.
  */
object EchoState {

  final case class EsnModel(featureCols: Seq[String], reservoir: Int,
      leak: Double, washout: Int,
      means: Array[Double], stds: Array[Double],
      wIn: Array[Array[Double]], // R×d
      wRes: Array[Array[Double]], // R×R, scaled to the target spectral radius
      b: Array[Double], // R
      beta: Array[Array[Double]]) { // (R+1)×d

    /** One-step-ahead predictions for every row: ŷ_t reads the state
      * built from rows strictly before t (the first row of a key reads
      * the zero state → the readout intercept). Appends `<f>_hat` and
      * `<f>_anomaly` per feature.
      */
    def forecast(frame: DataFrame, orderCol: String,
        partitionBy: Seq[String]): DataFrame = {
      val spark = frame.sparkSession
      val d = featureCols.length
      val (scanned, baseFields) =
        statePass(frame, featureCols, orderCol, partitionBy, this, emitFrom = 0)
      val outFields = baseFields ++ featureCols.flatMap(f => Seq(
        StructField(s"${f}_hat", DoubleType), StructField(s"${f}_anomaly", DoubleType)))
      val m = this
      val rows = scanned.map { case (base, h, y) =>
        val preds = Array.tabulate(d) { j =>
          var s = m.beta(m.reservoir)(j)
          var i = 0
          while (i < m.reservoir) { s += m.beta(i)(j) * h(i); i += 1 }
          s
        }
        Row.fromSeq(base ++ preds.indices.flatMap(j =>
          Seq(preds(j), math.abs(y(j) - preds(j)))))
      }
      spark.createDataFrame(rows, StructType(outFields))
    }

    /** Persist as one parquet-able frame: a row per reservoir unit
      * (input weights, recurrent row, bias, readout row) + an intercept
      * row, with the scalar config as constant columns. Exact double
      * round trip — rehydrated scoring is bit-identical.
      */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      (0 to reservoir).map { i =>
        (i,
          if (i < reservoir) Some(wIn(i).toSeq) else None,
          if (i < reservoir) Some(wRes(i).toSeq) else None,
          if (i < reservoir) Some(b(i)) else None,
          beta(i).toSeq)
      }.toDF("unit", "w_in", "w_res", "b", "beta")
        .withColumn("features", typedLit(featureCols))
        .withColumn("means", typedLit(means.toSeq))
        .withColumn("stds", typedLit(stds.toSeq))
        .withColumn("leak", lit(leak))
        .withColumn("washout", lit(washout))
    }
  }

  object EsnModel {
    def fromDF(df: DataFrame): EsnModel = {
      val rows = df.select("unit", "w_in", "w_res", "b", "beta",
        "features", "means", "stds", "leak", "washout")
        .collect().sortBy(_.getInt(0))
      require(rows.length >= 2, "model frame needs >= 1 reservoir unit + intercept row")
      val head = rows.head
      val r = rows.length - 1
      EsnModel(
        head.getSeq[String](5),
        r,
        head.getDouble(8),
        head.getInt(9),
        head.getSeq[Double](6).toArray,
        head.getSeq[Double](7).toArray,
        rows.take(r).map(_.getSeq[Double](1).toArray).toArray,
        rows.take(r).map(_.getSeq[Double](2).toArray).toArray,
        rows.take(r).map(_.getDouble(3)).toArray,
        rows.map(_.getSeq[Double](4).toArray).toArray)
    }
  }

  /** Fit: state scan → ridge readout. `reservoir` is the state size R,
    * `spectralRadius` the memory-depth knob (→1: longer memory),
    * `leak` the state update rate, `washout` initial steps per key
    * excluded from the readout fit (transient from the zero state).
    */
  def fit(frame: DataFrame, featureCols: Seq[String], orderCol: String,
      partitionBy: Seq[String], reservoir: Int = 64, ridge: Double = 1e-4,
      spectralRadius: Double = 0.9, leak: Double = 0.5, washout: Int = 10,
      inputScale: Double = 0.5, seed: Long = 42L): EsnModel = {
    val d = featureCols.length
    require(d > 0 && reservoir > 0)
    val (means, stds) =
      RandomFeatures.standardStats(frame.na.drop("any", featureCols), featureCols)

    // small input scaling keeps tanh near its linear regime — the standard
    // reservoir-computing knob for nearly-linear long-memory tasks
    val inFlat = RandomFeatures.randn(seed, reservoir * d)
    val wIn = Array.tabulate(reservoir, d)((i, j) => inFlat(i * d + j) * inputScale)
    val resFlat = RandomFeatures.randn(seed + 1, reservoir * reservoir)
    val raw = Array.tabulate(reservoir, reservoir)((i, j) => resFlat(i * reservoir + j))
    val scale = spectralRadius / spectralRadiusOf(raw)
    val wRes = raw.map(_.map(_ * scale))
    val b = RandomFeatures.randn(seed + 2, reservoir).map(_ * 0.1)

    val prelim = EsnModel(featureCols, reservoir, leak, washout, means, stds,
      wIn, wRes, b, Array.ofDim[Double](reservoir + 1, d))

    val spark = frame.sparkSession
    val (scanned, _) =
      statePass(frame, featureCols, orderCol, partitionBy, prelim, emitFrom = washout)
    val zFields = (0 until reservoir).map(i => StructField(s"__z$i", DoubleType)) ++
      (0 until d).map(j => StructField(s"__y$j", DoubleType))
    val hidRows = scanned.map { case (_, h, y) => Row.fromSeq(h.toSeq ++ y.toSeq) }
    val hidCols = spark.createDataFrame(hidRows, StructType(zFields))
    val beta = RandomFeatures.ridgeBeta(hidCols, reservoir,
      (0 until d).map(j => s"__y$j"), ridge)
    prelim.copy(beta = beta)
  }

  /** The shared sequential scan: repartition by key, sort by (key,
    * order), run the reservoir recurrence per key (state resets at key
    * boundaries), and for each row past `emitFrom` steps emit (passthrough
    * key+order values, h_{t−1}, y_t). Null feature rows reset nothing —
    * they are skipped for emission but do not advance the state.
    */
  private def statePass(frame: DataFrame, featureCols: Seq[String],
      orderCol: String, partitionBy: Seq[String], m: EsnModel, emitFrom: Int)
    : (org.apache.spark.rdd.RDD[(Seq[Any], Array[Double], Array[Double])], Seq[StructField]) = {
    val keyN = partitionBy.length
    val d = featureCols.length
    val projected = frame
      .select((partitionBy ++ Seq(orderCol)).map(col) ++
        featureCols.map(f => col(f).cast("double")): _*)
      .repartition(partitionBy.map(col): _*)
      .sortWithinPartitions((partitionBy :+ orderCol).map(col): _*)
    val fields = projected.schema.fields.take(keyN + 1).toSeq
    val rdd = projected.rdd.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var h = new Array[Double](m.reservoir)
      var step = 0
      rows.flatMap { r =>
        val key = (0 until keyN).map(r.get)
        if (key != curKey) { curKey = key; h = new Array[Double](m.reservoir); step = 0 }
        val anyNull = (0 until d).exists(j => r.isNullAt(keyN + 1 + j))
        if (anyNull) None
        else {
          val x = Array.tabulate(d)(j =>
            (r.getDouble(keyN + 1 + j) - m.means(j)) / m.stds(j))
          val y = Array.tabulate(d)(j => r.getDouble(keyN + 1 + j))
          val out =
            if (step >= emitFrom)
              Some(((0 to keyN).map(r.get).toSeq: Seq[Any], h.clone(), y))
            else None
          // h_{t} from h_{t−1} and x_t — AFTER emitting h_{t−1} for row t
          val next = new Array[Double](m.reservoir)
          var i = 0
          while (i < m.reservoir) {
            var s = m.b(i)
            var j = 0
            while (j < d) { s += m.wIn(i)(j) * x(j); j += 1 }
            var k = 0
            while (k < m.reservoir) { s += m.wRes(i)(k) * h(k); k += 1 }
            next(i) = (1.0 - m.leak) * h(i) + m.leak * math.tanh(s)
            i += 1
          }
          h = next
          step += 1
          out
        }
      }
    }
    (rdd, fields)
  }

  /** Largest-|eigenvalue| estimate by fixed-iteration power method —
    * driver-side on an R×R array, deterministic.
    */
  private[ml] def spectralRadiusOf(a: Array[Array[Double]]): Double = {
    val n = a.length
    var v = Array.tabulate(n)(i => 1.0 / (i + 1)) // fixed, not random
    var norm = 1.0
    for (_ <- 1 to 100) {
      val next = Array.tabulate(n) { i =>
        var s = 0.0; var j = 0
        while (j < n) { s += a(i)(j) * v(j); j += 1 }
        s
      }
      norm = math.sqrt(next.map(x => x * x).sum)
      require(norm > 1e-300, "degenerate reservoir matrix")
      v = next.map(_ / norm)
    }
    norm
  }
}
