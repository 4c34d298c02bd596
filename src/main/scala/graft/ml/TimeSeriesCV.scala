package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Expanding-window time-series cross validation — the analogue of the
  * reference's `sklearn.model_selection.TimeSeriesSplit(n_splits=3)` used
  * in `builder/build_model.py` (public repo; mount empty, SURVEY.md §0):
  * fold i trains on the first i chunks of the timeline and validates on
  * chunk i+1, so validation data is always strictly later than training
  * data.
  *
  * Scale design: chunk boundaries are exact percentiles of the time column
  * — ONE aggregate job collecting only (nSplits) timestamps to the driver;
  * folds are then plain ts-range filters pushed to the scan. Never a
  * global sort, never a row_number over one partition.
  */
object TimeSeriesCV {

  /** The fold boundaries: cut timestamps at i/(n+1) quantiles of tsCol. */
  def cutpoints(df: DataFrame, tsCol: String, nSplits: Int): Seq[java.sql.Timestamp] = {
    val fracs = (1 to nSplits).map(i => i.toDouble / (nSplits + 1))
    val row = df.agg(
      percentile(unix_micros(col(tsCol)), lit(fracs.toArray)).as("cuts")
    ).head()
    // percentile over zero rows (or all-null ts) is null — fail with a
    // clear message instead of an opaque NPE deep inside a build
    require(!row.isNullAt(0),
      s"cannot compute CV cutpoints: no non-null '$tsCol' rows in the dataset")
    row.getSeq[Double](0).map(us => new java.sql.Timestamp(us.toLong / 1000L))
  }

  /** (train, validation) fold pairs. Lazy frames — each fold is a filter
    * over the input, no materialization here.
    */
  def folds(df: DataFrame, tsCol: String, nSplits: Int = 3): Seq[(DataFrame, DataFrame)] = {
    val cuts = cutpoints(df, tsCol, nSplits)
    val bounds = cuts :+ null // last validation fold is unbounded above
    (0 until nSplits).map { i =>
      val train = df.filter(col(tsCol) <= lit(cuts(i)))
      val valid =
        if (bounds(i + 1) == null) df.filter(col(tsCol) > lit(cuts(i)))
        else df.filter(col(tsCol) > lit(cuts(i)) && col(tsCol) <= lit(bounds(i + 1)))
      (train, valid)
    }
  }
}
