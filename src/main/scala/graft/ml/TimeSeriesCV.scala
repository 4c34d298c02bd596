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

  /** Microsecond-exact Timestamp from epoch micros: java.sql.Timestamp's
    * millisecond constructor would truncate the fractional micros Spark
    * timestamps carry, shifting fold boundaries by up to 1 ms on
    * sub-millisecond-grained data (an embargoed row could leak into
    * validation). setNanos carries the full fraction.
    */
  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def tsToMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The fold boundaries: cut timestamps at i/(n+1) quantiles of tsCol. */
  def cutpoints(df: DataFrame, tsCol: String, nSplits: Int): Seq[java.sql.Timestamp] =
    cutpointsWithMax(df, tsCol, nSplits)._1

  /** Cutpoints plus the data's max timestamp — one extra scalar in the
    * SAME aggregate job, used to validate the (otherwise unbounded) last
    * fold's embargo.
    */
  private[ml] def cutpointsWithMax(df: DataFrame, tsCol: String,
      nSplits: Int): (Seq[java.sql.Timestamp], java.sql.Timestamp) = {
    val fracs = (1 to nSplits).map(i => i.toDouble / (nSplits + 1))
    val row = df.agg(
      percentile(graft.sources.Events.epochMicros(col(tsCol)), lit(fracs.toArray)).as("cuts"),
      max(graft.sources.Events.epochMicros(col(tsCol))).as("mx")
    ).head()
    // percentile over zero rows (or all-null ts) is null — fail with a
    // clear message instead of an opaque NPE deep inside a build
    require(!row.isNullAt(0),
      s"cannot compute CV cutpoints: no non-null '$tsCol' rows in the dataset")
    (row.getSeq[Double](0).map(us => tsFromMicros(us.toLong)),
      tsFromMicros(row.getLong(1)))
  }

  /** (train, validation) fold pairs. Lazy frames — each fold is a filter
    * over the input, no materialization here.
    */
  def folds(df: DataFrame, tsCol: String, nSplits: Int = 3): Seq[(DataFrame, DataFrame)] =
    foldsWithGap(df, tsCol, nSplits, gapSeconds = 0L)

  /** PURGED folds: leave an embargo of `gapSeconds` between the train
    * window's end and the validation window's start — the `gap` of
    * sklearn's `TimeSeriesSplit` and the purged-CV discipline for
    * financial/sensor series. The leak it closes: with lookback windows,
    * trailing smoothing, or resampled features, a validation row just
    * after the cut still CONTAINS training-period values inside its
    * feature window, so plain expanding-window CV scores optimistically;
    * embargoed rows in `(cut, cut + gap]` belong to neither side. Size
    * the gap to the feature horizon (lookback span, smoothing window).
    * Same scale shape as [[folds]]: plain ts-range filters off one
    * cutpoint aggregate.
    */
  def foldsWithGap(df: DataFrame, tsCol: String, nSplits: Int,
      gapSeconds: Long): Seq[(DataFrame, DataFrame)] = {
    require(gapSeconds >= 0, "gapSeconds must be non-negative")
    val (cuts, maxTs) = cutpointsWithMax(df, tsCol, nSplits)
    val bounds = cuts :+ null // last validation fold is unbounded above
    (0 until nSplits).map { i =>
      val train = df.filter(col(tsCol) <= lit(cuts(i)))
      // microsecond arithmetic — getTime-based math would truncate the
      // fractional millisecond and start validation up to ~1ms early
      val vStart = tsFromMicros(tsToMicros(cuts(i)) + gapSeconds * 1000000L)
      // an embargo that swallows the whole validation window is a config
      // error — fail here, not as null/NaN fold metrics deep in a build.
      // The last fold's effective upper bound is the data's max timestamp
      // (one extra scalar from the same cutpoints aggregate), so a gap
      // that swallows ALL remaining rows fails too instead of silently
      // yielding an empty validation frame.
      val upper = if (bounds(i + 1) == null) maxTs else bounds(i + 1)
      require(vStart.before(upper),
        s"gapSeconds=$gapSeconds leaves fold ${i + 1} with an empty validation " +
          s"window (${cuts(i)} + gap reaches past $upper); shrink the " +
          "gap or use fewer splits")
      val valid =
        if (bounds(i + 1) == null) df.filter(col(tsCol) > lit(vStart))
        else df.filter(col(tsCol) > lit(vStart) && col(tsCol) <= lit(bounds(i + 1)))
      (train, valid)
    }
  }
}
