package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lookback-sequence construction — the analogue of the reference's
  * `model/models.py::create_keras_timeseriesgenerator` (public repo;
  * mount empty, SURVEY.md §0), which turns the wide matrix into LSTM
  * input tensors `(samples, lookback, n_features)`:
  *
  *   - `lookback`: rows t-lb+1 … t as `array<array<double>>` per row
  *     (only rows with a full window survive — same as the generator
  *     skipping the first lb-1 samples);
  *   - `forecastTarget`: X = rows t-lb … t-1, y = row t (1-step-ahead,
  *     the KerasLSTMForecast layout).
  *
  * Scale note: the window is ordered per machine/partition key; pass the
  * machine id as `partitionBy` so sequences never cross machines and no
  * global sort appears.
  */
object Sequences {

  def lookback(wide: DataFrame, featureCols: Seq[String], lb: Int,
      orderCol: String, partitionBy: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-(lb - 1), 0)
    wide
      .withColumn("sequence",
        collect_list(array(featureCols.map(c => col(c).cast("double")): _*)).over(w))
      .filter(size(col("sequence")) === lb)
  }

  def forecastTarget(wide: DataFrame, featureCols: Seq[String], lb: Int,
      orderCol: String, partitionBy: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-lb, -1) // strictly-before window: X never sees y's row
    wide
      .withColumn("x_sequence",
        collect_list(array(featureCols.map(c => col(c).cast("double")): _*)).over(w))
      .withColumn("y", array(featureCols.map(c => col(c).cast("double")): _*))
      .filter(size(col("x_sequence")) === lb)
  }
}
