package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SEQUENCE autoencoder — the analogue of the reference's
  * `model/models.py::KerasLSTMAutoEncoder` (public repo; mount empty,
  * SURVEY.md §0), which consumes `(samples, lookback, n_features)`
  * tensors from `create_keras_timeseriesgenerator` and reconstructs the
  * whole window, so TEMPORAL structure (how values move across steps)
  * becomes part of the learned manifold — a per-row autoencoder
  * ([[AutoEncoder]]/[[AutoEncoderSGD]]) only ever sees one timestep and
  * is blind to it by construction (spec'd: on a scrambled-order segment
  * whose marginal values are indistinguishable from clean data, the
  * sequence model separates while the row model cannot — SequenceAeSpec).
  *
  * Spark-first shape: instead of a 3-D tensor, the lookback window is
  * LAG-EMBEDDED — one keyed window (`lag(tag, l)` for l = lb−1 … 0 over
  * a single `Window.partitionBy(keys).orderBy(orderCol)`) flattens each
  * row's trailing window into lb·d plain double columns. One shuffle by
  * the partition keys + an in-partition sort, then everything downstream
  * (standardize → tanh layer → reconstruction → error) is the SAME
  * whole-stage-codegen column math as the dense models: the inner model
  * IS an [[AutoEncoder.RfaeModel]] over the embedded columns, trained by
  * [[AutoEncoderSGD]]'s distributed mini-batch descent. Takens-style
  * delay embedding as a published basis: a window autoencoder over the
  * delay coordinates is the standard non-recurrent reading of an
  * LSTM-AE's job (reconstruct the window, flag windows that don't fit).
  *
  * Scale: the embed is one shuffle — by the sequence keys when the
  * caller has them (at 100 TB that is the same exchange the
  * resample/align already produced, so AQE/exchange reuse elides it in
  * the composed pipeline), or by a coarse time CHUNK with an explicit
  * lb−1-row carry when it doesn't (see [[embed]] — never an empty
  * partitionSpec window); the lb·d column fan-out is plan-width, not
  * data-width. Scoring a served window
  * needs only the lb rows the client posts — [[SeqAeModel.scoreWithTags]]
  * embeds inside the request frame, exactly the LSTM serving contract
  * (first lb−1 rows of a cold window carry no score).
  */
object SequenceAE {

  /** Embedded column for `tag` at `l` steps back (l = 0 is the row
    * itself). Ordered oldest-step first, matching the tensor layout.
    */
  def lagCols(tags: Seq[String], lb: Int): Seq[String] =
    for (l <- (lb - 1) to 0 by -1; t <- tags) yield s"${t}__m$l"

  /** Lag-embed `wide`: each surviving row carries its full trailing
    * window as flat columns; rows without lb complete steps drop (the
    * generator skipping the first lb−1 samples). One window spec —
    * Catalyst plans a single sort under all lb·d lag projections.
    *
    * With no `partitionBy`, a naive `Window.orderBy` would be an empty
    * partitionSpec — ALL rows through one Exchange SinglePartition, the
    * exact shape PlanAuditSpec bans. Instead the keyless path CHUNKS the
    * series by a coarse time span and carries each chunk's last lb−1
    * ROWS into the next chunk as tagged duplicates, so every window is
    * computable chunk-locally and the carry copies drop after the lag:
    * output identical to the single-partition embed whenever each
    * nonempty chunk holds ≥ lb−1 rows (carry reaches ONE chunk back; at
    * the 30-day default over any near-hourly series that is ~720 ≫ lb —
    * a sparser-than-lb chunk loses at most lb−1 boundary windows, the
    * same rows a Keras generator loses at a file split). Cost: one
    * hash exchange by chunk (reused by the tail pass) instead of the
    * single-partition funnel.
    */
  def embed(wide: DataFrame, tags: Seq[String], lb: Int, orderCol: String,
      partitionBy: Seq[String] = Seq.empty,
      chunkSeconds: Long = 30L * 86400): DataFrame = {
    require(tags.nonEmpty && lb >= 2, "sequence embed needs >= 2 steps")
    if (partitionBy.nonEmpty) {
      val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderCol))
      val cols = for (l <- (lb - 1) to 0 by -1; t <- tags)
        yield lag(col(t).cast("double"), l).over(w).as(s"${t}__m$l")
      wide.select(col("*") +: cols: _*).na.drop("any", lagCols(tags, lb))
    } else {
      require(chunkSeconds > 0, "chunkSeconds must be positive")
      val base = wide.withColumn("__chunk",
        floor(graft.sources.Events.epochMicros(col(orderCol)) / lit(chunkSeconds * 1000000L)))
      val tails = base
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__chunk").orderBy(col(orderCol).desc)))
        .filter(col("__rn") < lb).drop("__rn")
        .withColumn("__chunk", col("__chunk") + 1)
        .withColumn("__carry", lit(true))
      val w = Window.partitionBy("__chunk").orderBy(col(orderCol))
      val cols = for (l <- (lb - 1) to 0 by -1; t <- tags)
        yield lag(col(t).cast("double"), l).over(w).as(s"${t}__m$l")
      base.withColumn("__carry", lit(false)).unionByName(tails)
        .select(col("*") +: cols: _*)
        .filter(!col("__carry")).drop("__chunk", "__carry")
        .na.drop("any", lagCols(tags, lb))
    }
  }

  /** Fitted sequence model: the inner dense model over the embedded
    * columns plus the embedding recipe (base tags, lookback, order
    * column) needed to reproduce it at serve time.
    */
  case class SeqAeModel(baseTags: Seq[String], lb: Int, orderCol: String,
      inner: AutoEncoder.RfaeModel) extends TagAnomalyScorer {

    override def threshold: Double = inner.threshold

    /** Score a wide frame: embed (keyed by `partitionBy`), run the inner
      * column-math scorer, then roll the per-embedded-column errors up to
      * one `tag_anomaly_<tag>` per BASE tag (max over the window's steps
      * — the step that fits worst is the evidence a human inspects).
      */
    def score(wide: DataFrame, partitionBy: Seq[String] = Seq.empty): DataFrame = {
      val scored = inner.score(embed(wide, baseTags, lb, orderCol, partitionBy))
      val rollup = baseTags.map { t =>
        greatest(((lb - 1) to 0 by -1).map(l => col(s"tag_anomaly_${t}__m$l")): _*)
          .as(s"tag_anomaly_$t")
      }
      val scratch = lagCols(baseTags, lb).flatMap(c => Seq(c, s"tag_anomaly_$c"))
      scored.select((col("*") +: rollup): _*).drop(scratch: _*)
    }

    def anomaly(wide: DataFrame, partitionBy: Seq[String] = Seq.empty): DataFrame =
      score(wide, partitionBy).withColumn("anomalous",
        col("anomaly_score") > lit(inner.threshold))

    /** Serving contract: the embed runs INSIDE the request frame in
      * PAYLOAD order (`req_idx` when the frame carries it — the posted
      * window IS the sequence, exactly how an LSTM server consumes X
      * rows; `orderCol` otherwise), and every input row comes back: the
      * first lb−1 rows of a cold window return NULL scores via the
      * left join instead of disappearing, preserving Serve.scoreFrame's
      * one-response-row-per-record alignment. A request payload is
      * bounded by contract (the parquet path collects it), so one
      * request = ONE window partition, keyed by a literal — request-
      * sized by definition, not an unbounded global window. Tag-list
      * mismatch is a deployment bug (500, not 400), same rule as the
      * dense scorer.
      */
    override def scoreWithTags(df: DataFrame, requestTags: Seq[String]): DataFrame = {
      if (requestTags != baseTags)
        throw new IllegalStateException(
          s"model was fitted on tags $baseTags, serving surface configured for $requestTags")
      val ord = if (df.columns.contains("req_idx")) "req_idx" else orderCol
      require(df.columns.contains(ord),
        s"request frame carries neither req_idx nor '$orderCol' — no sequence order to embed by")
      val emb = embed(df.withColumn("__req", lit(0)), baseTags, lb, ord,
        partitionBy = Seq("__req"))
      val scored = inner.score(emb)
      val rollup = baseTags.map { t =>
        greatest(((lb - 1) to 0 by -1).map(l => col(s"tag_anomaly_${t}__m$l")): _*)
          .as(s"tag_anomaly_$t")
      }
      df.join(scored.select(col(ord) +: col("anomaly_score") +: rollup: _*),
        Seq(ord), "left")
    }

    /** Persistable form: the inner coefficient frame (whose `tags` are
      * the embedded column names) plus the embedding recipe as repeated
      * columns. Round trip is bit-exact (doubles pass through parquet
      * unchanged).
      */
    def toDF(spark: SparkSession): DataFrame =
      inner.toDF(spark)
        .withColumn("base_tags", typedLit(baseTags))
        .withColumn("lookback", lit(lb))
        .withColumn("order_col", lit(orderCol))
  }

  object SeqAeModel {
    def fromDF(df: DataFrame): SeqAeModel = {
      val head = df.select("base_tags", "lookback", "order_col").head()
      SeqAeModel(head.getSeq[String](0), head.getInt(1), head.getString(2),
        AutoEncoder.RfaeModel.fromDF(df))
    }
  }

  /** Fit: lag-embed, then [[AutoEncoderSGD]] over the embedded columns
    * (warm-started at the ELM optimum, Adam descent — see that file for
    * the distributed-gradient shape). Returns the model plus the
    * per-epoch loss trajectory for build metadata.
    */
  def fitWithHistory(wide: DataFrame, tags: Seq[String], lb: Int,
      orderCol: String, partitionBy: Seq[String] = Seq.empty,
      hidden: Int = 12, epochs: Int = 120, lr: Double = 0.02,
      batchFraction: Double = 0.5, pctl: Double = 0.99,
      seed: Long = 42L): (SeqAeModel, Array[Double]) = {
    val emb = embed(wide, tags, lb, orderCol, partitionBy)
    val (inner, losses) = AutoEncoderSGD.fitWithHistory(emb, lagCols(tags, lb),
      hidden = hidden, epochs = epochs, lr = lr, batchFraction = batchFraction,
      pctl = pctl, seed = seed)
    (SeqAeModel(tags, lb, orderCol, inner), losses)
  }

  def fit(wide: DataFrame, tags: Seq[String], lb: Int, orderCol: String,
      partitionBy: Seq[String] = Seq.empty, hidden: Int = 12,
      epochs: Int = 120, lr: Double = 0.02, batchFraction: Double = 0.5,
      pctl: Double = 0.99, seed: Long = 42L): SeqAeModel =
    fitWithHistory(wide, tags, lb, orderCol, partitionBy, hidden, epochs,
      lr, batchFraction, pctl, seed)._1
}
