package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA-reconstruction anomaly detector — the native MLlib analogue of the
  * reference's Keras autoencoder + DiffBasedAnomalyDetector
  * (`model/anomaly/diff.py::DiffBasedAnomalyDetector`, public repo; mount
  * empty, SURVEY.md §0): project the standardized feature vector onto k
  * principal components and score each row by the reconstruction error.
  *
  * With an orthonormal component matrix W and standardized input x, the
  * reconstruction error collapses to a column expression —
  * ||x - W·Wᵀx||² = ||x||² − ||Wᵀx||² — so scoring is pure codegen'd math
  * on top of MLlib's PCA transform (no per-row matrix multiply, no UDF).
  *
  * Threshold discipline mirrors the reference: a high exact percentile of
  * the training-fold scores (default 0.99; the exact reference value is
  * unverifiable offline — kept as a parameter).
  */
case class PcaAnomalyModel(pipeline: PipelineModel, threshold: Double)
  extends TagAnomalyScorer {

  override def scoreWithTags(df: DataFrame, tags: Seq[String]): DataFrame =
    PcaAnomaly.perTagScores(this, df, tags)

  /** Score = sqrt(max(0, ||x_scaled||² − ||z||²)) per row. */
  def score(df: DataFrame): DataFrame =
    PcaAnomaly.withScore(pipeline.transform(df))

  /** Score + boolean flag against the fitted threshold. */
  def anomaly(df: DataFrame): DataFrame =
    score(df).withColumn("anomalous", col("anomaly_score") > lit(threshold))
}

object PcaAnomaly {

  private def sumSq(arr: Column): Column =
    aggregate(transform(arr, x => x * x), lit(0.0), (acc, v) => acc + v)

  private[ml] def withScore(transformed: DataFrame): DataFrame = {
    val x = vector_to_array(col(PipelineFactory.ScaledCol))
    val z = vector_to_array(col("pca_features"))
    transformed.withColumn("anomaly_score",
      sqrt(greatest(sumSq(x) - sumSq(z), lit(0.0))))
  }

  /** Per-tag anomaly decomposition — the reference's `tag-anomaly-scaled`
    * columns: |x_j − x̂_j| where x̂ = W·Wᵀx is the PCA reconstruction of
    * the standardized input. W is k×d and tiny (gordo tag lists are tens
    * of columns), so the reconstruction is d·k multiply-adds of LITERAL
    * coefficients per row — pure codegen'd column math, no matrix library
    * in the row path.
    */
  def perTagScores(model: PcaAnomalyModel, df: DataFrame, tags: Seq[String]): DataFrame = {
    import org.apache.spark.ml.feature.PCAModel
    val pcaModel = model.pipeline.stages.collectFirst { case p: PCAModel => p }
      .getOrElse(throw new IllegalStateException("pipeline has no PCA stage"))
    val pc = pcaModel.pc // d x k, column-major principal components
    val d = pc.numRows
    val k = pc.numCols
    // withScore first: the per-tag frame also carries the total
    // anomaly_score (the serving response needs both in one pass)
    val transformed = withScore(model.pipeline.transform(df))
    val x = vector_to_array(col(PipelineFactory.ScaledCol))
    val z = vector_to_array(col("pca_features"))
    val withErr = tags.zipWithIndex.foldLeft(transformed) { case (acc, (tag, j)) =>
      require(j < d, s"tag index $j out of range for ${d}x$k component matrix")
      val reconstructed = (0 until k)
        .map(c => element_at(z, c + 1) * lit(pc(j, c)))
        .reduce(_ + _)
      acc.withColumn(s"tag_anomaly_$tag", abs(element_at(x, j + 1) - reconstructed))
    }
    withErr.drop(PipelineFactory.FeaturesCol, PipelineFactory.ScaledCol, "pca_features")
  }

  /** Fit scaler+PCA on `train`, then fit the anomaly threshold as the
    * `pctl` exact percentile of the training scores. Two jobs total: one
    * MLlib fit, one percentile aggregate — nothing collects except the
    * single threshold value.
    */
  def fit(train: DataFrame, featureCols: Seq[String], k: Int,
      pctl: Double = 0.99): PcaAnomalyModel = {
    val pipeline = PipelineFactory.fromDefinition(Map(
      "steps" -> Seq(
        Map("type" -> "assembler", "inputCols" -> featureCols),
        Map("type" -> "standard_scaler"),
        Map("type" -> "pca", "k" -> k))))
    val model = pipeline.fit(train)
    val thr = withScore(model.transform(train))
      .agg(percentile(col("anomaly_score"), lit(pctl)).as("thr"))
      .head().getDouble(0)
    PcaAnomalyModel(model, thr)
  }
}
