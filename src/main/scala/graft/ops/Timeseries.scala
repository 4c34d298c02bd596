package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core time-series feature engineering: resample + align into the "wide
  * matrix" that the reference builds per machine.
  *
  * Reference semantics (equinor/gordo-components, public repo; the local
  * mount was empty — see SURVEY.md §0):
  *   - `gordo_components/dataset/base.py::join_timeseries` resamples each
  *     per-tag series to a fixed resolution (default "10T" mean) and
  *     inner-joins the resampled series on the bucket timestamp.
  *   - `gordo_components/dataset/datasets.py::TimeSeriesDataset.get_data`
  *     then applies row filters / dropna to produce (X, y).
  *
  * Spark-first design: the N-way "join" is NOT executed as N joins — a
  * single `groupBy(window(ts, res)).agg(when(tag = t, value) per tag)`
  * (conditional aggregation) produces the wide matrix in exactly ONE
  * shuffle, and the inner-join semantics fall out of `dropna` on the
  * pivoted columns. The tag list is always explicit
  * (never an inferred pivot), so no extra distinct scan and the schema is
  * deterministic at plan time. At 100 TB the shuffle is keyed on
  * (bucket, …) which is high-cardinality and evenly distributed — no skew,
  * no driver-side collection, and AQE can coalesce post-shuffle partitions.
  */
object Timeseries {

  /** Tumbling-window bucket start for `ts` at `resolution` (e.g. "10 minutes").
    * Equivalent to pandas `series.resample(res, closed="left", label="left")`
    * bucket labels: left-closed, labeled by window start, epoch-aligned.
    */
  def bucket(ts: Column, resolution: String): Column =
    window(ts, resolution).getField("start")

  /** Bucket with a shifted ORIGIN — pandas' `resample(origin=/offset=)`:
    * boundaries land at epoch-alignment + `offset` (e.g. 10-minute
    * buckets cut at :05, :15, …), the shape shift-plan sensor data needs
    * when the plant's reporting window does not start on the hour.
    * Spark's `window(startTime=)` is exactly this semantic; DuckDB's
    * `time_bucket(width, ts, offset)` mirrors it for the oracle.
    */
  def bucketWithOffset(ts: Column, resolution: String, offset: String): Column =
    window(ts, resolution, resolution, offset).getField("start")

  /** Long-format resample: one row per (bucket, key…) with the requested
    * aggregations of `value`. Mirrors `series.resample(res).agg(methods)`.
    */
  def resample(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      resolution: String,
      keyCols: Seq[String],
      aggs: Map[String, Column => Column] = Map("avg" -> avg)
  ): DataFrame = {
    val aggExprs = aggs.toSeq.sortBy(_._1).map { case (name, fn) =>
      fn(col(valueCol)).as(s"${name}_$valueCol")
    }
    df.groupBy(bucket(col(tsCol), resolution).as("bucket") +: keyCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** The gordo core: N per-tag series → resampled → aligned wide matrix.
    *
    * @param df         long-format input (tsCol, tagCol, valueCol)
    * @param tags       explicit tag list = the wide matrix's columns
    * @param resolution tumbling window size, e.g. "10 minutes"
    * @param dropIncomplete inner-join semantics: drop buckets missing any tag
    *                       (reference's post-align `dropna`); false = outer.
    *
    * One shuffle total; at scale the bucket×tag key space is uniform.
    */
  def align(
      df: DataFrame,
      tsCol: String,
      tagCol: String,
      valueCol: String,
      tags: Seq[String],
      resolution: String,
      agg: Column => Column = avg,
      dropIncomplete: Boolean = true
  ): DataFrame = {
    // Conditional aggregation, NOT `.pivot`: DataFrame pivot plans TWO
    // shuffles (groupBy(bucket, tag) partial agg, then pivotfirst on
    // bucket). `agg(when(tag = t, value)) AS t` per tag groups by bucket
    // alone — exactly one shuffle, full map-side partial aggregation, and
    // the same null-ignoring mean semantics as pandas' per-tag resample.
    val aggExprs = tags.map(t => agg(when(col(tagCol) === t, col(valueCol))).as(t))
    val wide = df
      .filter(col(tagCol).isin(tags: _*))
      .groupBy(bucket(col(tsCol), resolution).as("bucket"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    if (dropIncomplete) wide.na.drop("any", tags) else wide
  }

  /** Wide → long unpivot — the inverse of [[align]] (pandas `melt`): each
    * (id…, valueCol) cell becomes a `(tagName, valueName)` row. The
    * reference's workflow moves between wide matrices (model I/O) and
    * long series (providers, forwarders) constantly; this is the return
    * leg. Delegates to Spark's built-in `Dataset.unpivot` (an Expand
    * node: row-local, no shuffle, ~|valueCols|× row expansion) — columns
    * are passed as Columns, so names with quotes/keywords cannot break a
    * generated SQL string. Names are backtick-quoted on the way in:
    * tag-derived wide columns routinely contain dots ("1000.temp"),
    * which a bare col() would parse as a struct-field path.
    */
  def melt(wide: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      tagName: String = "tag", valueName: String = "value"): DataFrame = {
    // Spark's own quoting convention: embedded backticks double
    def q(c: String) = col(s"`${c.replace("`", "``")}`")
    wide.unpivot(idCols.map(q).toArray, valueCols.map(q).toArray,
      tagName, valueName)
  }

  /** Dense (bucket × key) grid: every observed bucket crossed with every
    * requested key, left-joined back onto the long frame so gaps appear as
    * null rows — the precondition for KEYED ffill/interpolate (window
    * partitioned by the key, never a global sort). The bucket set grows
    * with the time range, not the data volume, and the key list is an
    * explicit broadcast literal, so the grid is |buckets| × |keys| —
    * never data-sized.
    */
  def densify(long: DataFrame, bucketCol: String, keyCol: String,
      keys: Seq[String]): DataFrame = {
    val spark = long.sparkSession
    import spark.implicits._
    val grid = long.select(bucketCol).distinct()
      .crossJoin(broadcast(keys.toDF(keyCol)))
    grid.join(long, Seq(bucketCol, keyCol), "left")
  }

  /** Forward-fill nulls within each partition key, ordered by `orderCol` —
    * the resample-gap padding analogue (`win_ffill`).
    *
    * Scale caveat: with `partitionBy = Seq.empty` the window is a single
    * global sort partition — fine for one machine's wide matrix (gordo's
    * unit of work, bounded by resolution × time range), WRONG for a 100 TB
    * frame. At scale run on the LONG format partitioned by tag/machine
    * (see `densify`) or use `streaming.Streams.scoreOnline`-style stateful
    * processing where the carry-over is explicit state.
    */
  def ffill(df: DataFrame, cols: Seq[String], partitionBy: Seq[String], orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Linear interpolation of gaps: a null at position t between the
    * nearest non-null neighbors (t0, v0) and (t1, v1) becomes
    * v0 + (v1 - v0)·(t - t0)/(t1 - t0); leading/trailing nulls stay null
    * (pandas `interpolate(method="time")`-style, limit_area="inside").
    * Two windows (backward + forward ignore-nulls) per column — same
    * single-partition caveat as ffill when partitionBy is empty.
    */
  def interpolate(df: DataFrame, cols: Seq[String], partitionBy: Seq[String],
      orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderCol))
    val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = unix_micros(col(orderCol).cast("timestamp")).cast("double")
    cols.foldLeft(df) { (d, c) =>
      val vPrev = last(col(c), ignoreNulls = true).over(back)
      val vNext = first(col(c), ignoreNulls = true).over(fwd)
      val tPrev = last(when(col(c).isNotNull, t), ignoreNulls = true).over(back)
      val tNext = first(when(col(c).isNotNull, t), ignoreNulls = true).over(fwd)
      d.withColumn(c,
        when(col(c).isNotNull, col(c))
          .when(vPrev.isNotNull && vNext.isNotNull,
            vPrev + (vNext - vPrev) * (t - tPrev) / (tNext - tPrev)))
    }
  }

  /** Classical additive seasonal decomposition of a keyed resampled
    * series (the statsmodels `seasonal_decompose(model="additive")`
    * shape, moving-average flavor):
    *   trend_t    = centered moving average over `2·halfWindow+1` rows
    *   seasonal_t = mean of (v − trend) across all rows sharing the same
    *                position-in-period (`periodCol`, e.g. hour-of-day)
    *   resid_t    = v − trend − seasonal
    * A diff-based anomaly detector watches `resid`; a capacity planner
    * reads `trend`; the seasonal profile is the per-key fingerprint.
    *
    * Edge semantics: the trend at the series edges averages the rows that
    * exist (ROWS-framed window, not a null-padded convolution) — both
    * engines agree because the frame is row-count-based, and no rows are
    * dropped (statsmodels nulls the edge trend instead; keeping the
    * truncated average keeps every bucket scoreable).
    *
    * Scale: two window passes keyed on (key) ordered by bucket + one
    * partition-framed mean — all three shuffle on the key column only,
    * and per-key state is the resampled series (len = range/resolution,
    * thousands of rows), not the raw events.
    */
  def seasonalDecompose(resampled: DataFrame, keyCols: Seq[String],
      bucketCol: String, valueCol: String, periodCol: Column,
      halfWindow: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val trendW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(bucketCol)).rowsBetween(-halfWindow, halfWindow)
    val seasonW = Window.partitionBy(keyCols.map(col) :+ periodCol: _*)
    resampled
      .withColumn("trend", avg(col(valueCol)).over(trendW))
      .withColumn("seasonal",
        avg(col(valueCol) - col("trend")).over(seasonW))
      .withColumn("resid", col(valueCol) - col("trend") - col("seasonal"))
  }
}
