package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NONLINEAR trainable autoencoder — the closest Spark-native analogue of
  * the reference's `model/models.py::KerasAutoEncoder` (public repo; mount
  * empty, SURVEY.md §0) that trains in ONE distributed pass.
  *
  * Architecture: random-feature encoder + ridge-trained linear decoder
  * (the extreme-learning-machine / random-kitchen-sinks construction,
  * Rahimi & Recht 2007; Huang et al. 2006 — published methods):
  *
  *   z = tanh(W x_std + b)         W, b fixed from a seed (not trained)
  *   x̂_std = Bᵀ [z; 1]             B trained: ridge least squares
  *
  * Why this shape instead of SGD backprop: the ridge solution is a pure
  * function of the sufficient statistics HᵀH and HᵀX (H = [z; 1] row
  * matrix), which are PLAIN SUMS — Spark computes them in one
  * shuffle-free global aggregation (map-side partial agg; the final
  * exchange moves 32 partial rows, not data). A gradient loop would
  * schedule one job per epoch over the full set. At 100 TB the fit cost
  * is one scan; driver work is an (h+1)×(h+1) solve per output column.
  *
  * Scoring is coefficient-literal column math (standardize → h tanh
  * features → d reconstructions → error) — whole-stage codegen, no MLlib
  * object, no shuffle. The nonlinear encoder captures curved manifolds
  * that `PcaAnomaly`'s linear subspace cannot (spec'd on a sine
  * manifold).
  */
object AutoEncoder {

  import RandomFeatures.randn

  case class RfaeModel(tags: Seq[String], means: Array[Double], stds: Array[Double],
      w: Array[Array[Double]], b: Array[Double], // h×d, h
      beta: Array[Array[Double]], // (h+1)×d — last row = intercept
      threshold: Double) extends TagAnomalyScorer {

    override def scoreWithTags(df: DataFrame, requestTags: Seq[String]): DataFrame = {
      // IllegalSTATEException, not require: a serving surface wired with
      // the wrong tag list is a deployment bug — the HTTP layer maps it
      // to 500, never to a client-blaming 400
      if (requestTags != tags)
        throw new IllegalStateException(
          s"model was fitted on tags $tags, serving surface configured for $requestTags")
      score(df)
    }

    private def h = b.length

    /** Standardized-input columns, hidden columns, reconstructions, and
      * the L2 reconstruction error — each layer MATERIALIZED as projected
      * columns before the next references it (an expression referenced h
      * or d times would otherwise re-evaluate that many times per row).
      */
    private def withLayers(df: DataFrame): DataFrame = {
      val xs = df.select(col("*") +: tags.zipWithIndex.map { case (t, j) =>
        ((col(t) - lit(means(j))) / lit(stds(j))).as(s"__xs$j")
      }: _*)
      val hid = xs.select(col("*") +: (0 until h).map { i =>
        tanh((0 until tags.length).map(j => col(s"__xs$j") * lit(w(i)(j)))
          .reduce(_ + _) + lit(b(i))).as(s"__z$i")
      }: _*)
      hid.select(col("*") +: tags.indices.map { j =>
        ((0 until h).map(i => col(s"__z$i") * lit(beta(i)(j))).reduce(_ + _)
          + lit(beta(h)(j))).as(s"__xhat$j")
      }: _*)
    }

    /** Score = √Σ_d (x_std − x̂_std)² plus per-tag |x_std − x̂_std|
      * decomposition (`tag_anomaly_<tag>`), layer scratch dropped.
      */
    def score(df: DataFrame): DataFrame = {
      val layered = withLayers(df)
      val perTag = tags.zipWithIndex.map { case (t, j) =>
        abs(col(s"__xs$j") - col(s"__xhat$j")).as(s"tag_anomaly_$t")
      }
      val total = sqrt(tags.indices.map(j =>
        (col(s"__xs$j") - col(s"__xhat$j")) * (col(s"__xs$j") - col(s"__xhat$j")))
        .reduce(_ + _)).as("anomaly_score")
      val scratch = (0 until tags.length).map(j => s"__xs$j") ++
        (0 until h).map(i => s"__z$i") ++ tags.indices.map(j => s"__xhat$j")
      layered.select((col("*") +: (perTag :+ total)): _*)
        .drop(scratch: _*)
    }

    def anomaly(df: DataFrame): DataFrame =
      score(df).withColumn("anomalous", col("anomaly_score") > lit(threshold))

    /** Persistable form: one row per hidden unit carrying that unit's
      * encoder row and decoder row, plus the scalar/per-tag parameters as
      * repeated columns — flat enough for parquet, exact for doubles.
      * Row h (index == hidden) holds the decoder intercept with a null
      * encoder row.
      */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      (0 to h).map { i =>
        (i,
          if (i < h) Some(w(i).toSeq) else None,
          if (i < h) Some(b(i)) else None,
          beta(i).toSeq)
      }.toDF("unit", "w", "b", "beta")
        .withColumn("tags", typedLit(tags))
        .withColumn("means", typedLit(means.toSeq))
        .withColumn("stds", typedLit(stds.toSeq))
        .withColumn("threshold", lit(threshold))
    }
  }

  object RfaeModel {
    /** Rehydrate from a persisted frame — scoring with the result is
      * bit-identical to the in-memory model (exact double round trip).
      */
    def fromDF(df: DataFrame): RfaeModel = {
      val rows = df.select("unit", "w", "b", "beta", "tags", "means", "stds", "threshold")
        .collect().sortBy(_.getInt(0))
      require(rows.length >= 2, "model frame needs >= 1 hidden unit + intercept row")
      val head = rows.head
      val tags = head.getSeq[String](4)
      val hidden = rows.length - 1
      RfaeModel(
        tags,
        head.getSeq[Double](5).toArray,
        head.getSeq[Double](6).toArray,
        rows.take(hidden).map(_.getSeq[Double](1).toArray).toArray,
        rows.take(hidden).map(_.getDouble(2)).toArray,
        rows.map(_.getSeq[Double](3).toArray).toArray,
        head.getDouble(7))
    }
  }

  /** Fit: two scans (mean/std, then the H statistics), one small driver
    * solve. `hidden` sets encoder width; agg state is O(hidden²) doubles
    * per partition — 32 → ~4.5 KB, far under any executor budget.
    */
  def fit(train: DataFrame, tags: Seq[String], hidden: Int = 16,
      ridge: Double = 1e-3, pctl: Double = 0.99, seed: Long = 42L): RfaeModel = {
    val prelim = fitParams(train, tags, hidden, ridge, seed)
    val thr = prelim.score(train.na.drop("any", tags))
      .agg(percentile(col("anomaly_score"), lit(pctl))).head().getDouble(0)
    prelim.copy(threshold = thr)
  }

  /** The parameter fit alone — no threshold pass (threshold = NaN). Used
    * directly when the caller only needs the coefficients (e.g. the
    * [[AutoEncoderSGD]] warm start, whose percentile would be thrown
    * away: the scoring plan it skips is a full layered codegen job).
    */
  def fitParams(train: DataFrame, tags: Seq[String], hidden: Int = 16,
      ridge: Double = 1e-3, seed: Long = 42L): RfaeModel = {
    require(tags.nonEmpty && hidden > 0)
    val d = tags.length

    // pass 1: standardization stats
    val (means, stds) = RandomFeatures.standardStats(train.na.drop("any", tags), tags)

    // fixed random encoder: rows scaled by 1/√d so tanh stays in its
    // responsive range for standardized inputs
    val flat = randn(seed, hidden * d)
    val w = Array.tabulate(hidden, d)((i, j) => flat(i * d + j) / math.sqrt(d.toDouble))
    val b = randn(seed + 1, hidden).map(_ * 0.5)

    // pass 2: sufficient statistics over H = [z; 1].
    // Materialize xs then z as projections (not nested expressions) so
    // each is evaluated once per row.
    val clean = train.na.drop("any", tags)
    val xs = clean.select(tags.zipWithIndex.map { case (t, j) =>
      ((col(t) - lit(means(j))) / lit(stds(j))).as(s"__xs$j")
    }: _*)
    val hidCols = xs.select(col("*") +: (0 until hidden).map { i =>
      tanh((0 until d).map(j => col(s"__xs$j") * lit(w(i)(j))).reduce(_ + _)
        + lit(b(i))).as(s"__z$i")
    }: _*)
    val beta = RandomFeatures.ridgeBeta(hidCols, hidden,
      (0 until d).map(j => s"__xs$j"), ridge)

    RfaeModel(tags, means, stds, w, b, beta, Double.NaN)
  }
}
