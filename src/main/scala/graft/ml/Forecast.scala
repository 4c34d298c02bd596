package graft.ml

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINABLE one-step-ahead forecaster over lookback sequences — the
  * `model/models.py::KerasLSTMForecast` analogue (public repo; mount empty,
  * SURVEY.md §0) as a vector-autoregressive linear model:
  *
  *   ŷ_tag[t] = b_tag + w_tag · flatten(X[t−lb … t−1])
  *
  * `Sequences.forecastTarget` provides the exact Keras tensor layout
  * (X strictly before y — no target leakage); one MLlib linear regression
  * per target tag, solved with the exact normal-equations solver
  * (deterministic, no SGD seed sensitivity). A linear AR model is the
  * honest Spark-native stand-in for the LSTM: same data contract, same
  * anomaly semantics — round 1 shipped the tensor layout with nothing
  * training on it.
  *
  * Scale design: fitting aggregates through MLlib's distributed least
  * squares (one pass per target over the sequence frame); SCORING is pure
  * column math over coefficient LITERALS — like `Similarity.IvfModel`, no
  * MLlib object at serve time, whole-stage codegen end to end.
  */
object Forecast {

  final case class ForecastModel(lb: Int, featureCols: Seq[String],
      coefs: Seq[(String, Seq[Double], Double)]) {

    /** ŷ for one target tag from the flattened lookback features. */
    def predictExpr(flatX: Column, target: String): Column = {
      val (_, w, b) = coefs.find(_._1 == target).getOrElse(
        throw new IllegalArgumentException(s"no fitted model for tag '$target'"))
      graft.ops.Similarity.dot(flatX.cast("array<double>"), typedLit(w)) + lit(b)
    }

    /** Score a frame: every full-window row gains `<tag>_hat` and
      * `<tag>_anomaly` = |y − ŷ| per target (the diff-detector contract).
      */
    def forecast(frame: DataFrame, orderCol: String, partitionBy: Seq[String]): DataFrame = {
      val seqs = Sequences.forecastTarget(frame, featureCols, lb, orderCol, partitionBy)
        .withColumn("__x", flatten(col("x_sequence")))
      val scored = featureCols.zipWithIndex.foldLeft(seqs) { case (d, (t, j)) =>
        d.withColumn(s"${t}_hat", predictExpr(col("__x"), t))
          .withColumn(s"${t}_anomaly",
            graft.ops.AnomalyMath.tagAnomaly(element_at(col("y"), j + 1), col(s"${t}_hat")))
      }
      scored.drop("x_sequence", "y", "__x")
    }
  }

  /** Fit one AR model per feature column (targets = features, the
    * multi-output forecast shape). `regParam` keeps the normal solver
    * well-posed on collinear lags.
    */
  def fit(frame: DataFrame, featureCols: Seq[String], lb: Int,
      orderCol: String, partitionBy: Seq[String],
      regParam: Double = 1e-6): ForecastModel = {
    val seqs = Sequences.forecastTarget(frame, featureCols, lb, orderCol, partitionBy)
      .withColumn("__features", array_to_vector(flatten(col("x_sequence")).cast("array<double>")))
    val models = featureCols.zipWithIndex.map { case (t, j) =>
      val train = seqs
        .select(col("__features").as("features"), element_at(col("y"), j + 1).as("label"))
        .na.drop()
      val lr = new LinearRegression().setSolver("normal").setRegParam(regParam)
      val m = lr.fit(train)
      (t, m.coefficients.toArray.toSeq, m.intercept)
    }
    ForecastModel(lb, featureCols, models)
  }

  /** Per-key univariate AR models over a keyed LONG frame — the fleet
    * shape (one model per machine/tag, like the reference's per-machine
    * builds). The sequence frame is built ONCE for all keys (one keyed
    * window pass, cached across the per-key fits); scoring is a single
    * pass with the key's coefficients selected by a CASE over key
    * literals. The per-key fit loop is driver-sequenced like
    * `ModelBuilder.buildAll` — each fit is a distributed MLlib job.
    */
  final case class KeyedForecastModel(lb: Int, keyCol: String, valueCol: String,
      coefs: Seq[(String, Seq[Double], Double)]) {

    def forecast(frame: DataFrame, orderCol: String): DataFrame = {
      val seqs = Sequences.forecastTarget(frame, Seq(valueCol), lb, orderCol, Seq(keyCol))
        .withColumn("__x", flatten(col("x_sequence")))
      val pred = coefs.foldLeft(lit(null).cast("double")) { case (acc, (k, w, b)) =>
        when(col(keyCol) === k,
          graft.ops.Similarity.dot(col("__x").cast("array<double>"), typedLit(w)) + lit(b))
          .otherwise(acc)
      }
      seqs.withColumn(s"${valueCol}_hat", pred)
        .withColumn(s"${valueCol}_anomaly",
          graft.ops.AnomalyMath.tagAnomaly(element_at(col("y"), 1), col(s"${valueCol}_hat")))
        .drop("x_sequence", "y", "__x")
    }
  }

  def fitPerKey(frame: DataFrame, keyCol: String, valueCol: String, lb: Int,
      orderCol: String, regParam: Double = 1e-6): KeyedForecastModel = {
    val seqs = Sequences.forecastTarget(frame, Seq(valueCol), lb, orderCol, Seq(keyCol))
      .select(col(keyCol),
        array_to_vector(flatten(col("x_sequence")).cast("array<double>")).as("features"),
        element_at(col("y"), 1).as("label"))
      .na.drop()
      .cache() // reused by every per-key fit; released below
    try {
      val keys = seqs.select(keyCol).distinct().collect().map(_.getString(0)).sorted
      val models = keys.toSeq.map { k =>
        val lr = new LinearRegression().setSolver("normal").setRegParam(regParam)
        val m = lr.fit(seqs.filter(col(keyCol) === k))
        (k, m.coefficients.toArray.toSeq, m.intercept)
      }
      KeyedForecastModel(lb, keyCol, valueCol, models)
    } finally seqs.unpersist()
  }
}
