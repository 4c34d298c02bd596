package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for every left row, the latest right
  * row with `right.ts <= left.ts` within the same key group.
  *
  * The reference never needed an as-of join — it resamples both sides to a
  * shared grid and equi-joins (SURVEY.md §2.3) — but training-data
  * pipelines joining events to slowly-changing state need the real thing.
  *
  * Spark-first design: NOT a range join (which explodes to a
  * per-pair comparison and falls back to broadcast-nested-loop). Both
  * sides are unioned with a side marker and processed by ONE window over
  * (keys, ts): each left row picks up `last(right value, ignoreNulls)` at
  * that point in time — a single shuffle on the keys, linear work,
  * identical to the classic sort-merge as-of at 100 TB. Right rows sort
  * before left rows at equal timestamps, so an exactly-simultaneous right
  * row matches (`>=` semantics, like DuckDB ASOF JOIN).
  *
  * Matching is ROW-level — pandas `merge_asof` / DuckDB ASOF JOIN
  * semantics: the latest preceding right ROW wins and its values carry
  * through unchanged, nulls included (a null-valued right row replaces an
  * older match rather than being skipped). For per-column
  * last-OBSERVATION-carried-forward semantics use `Timeseries.ffill`.
  * `inner` drops left rows with NO matching row (none precedes, or the
  * match is older than `tolerance`) — a matched row with null values is
  * still a match and is kept.
  *
  * Right timestamps should be unique per key (pre-aggregate if not); with
  * duplicates the latest row in (ts, input order) wins, which is
  * deterministic only if the caller makes it so.
  */
object AsOf {

  /** @param left      probe side; keeps all its columns
    * @param right     build side: (keyCols, tsCol, valueCols) only
    * @param tsCol     event-time column name present on both sides
    * @param keyCols   equality keys (empty = global as-of — single
    *                  partition, same caveat as ffill; always pass keys at
    *                  scale)
    * @param valueCols right columns to carry; emitted as `asof_<name>`
    * @param inner     drop left rows with no preceding right row (ASOF
    *                  JOIN semantics); false keeps them with nulls
    * @param tolerance pandas `merge_asof(tolerance=...)` analogue: an
    *                  interval string (e.g. "5 MINUTES"); a match further
    *                  than `tolerance` from `left.ts` is treated as no
    *                  match
    * @param direction `"backward"` (default — latest right row with
    *                  rt <= lt, the classic as-of), `"forward"` (EARLIEST
    *                  right row with rt >= lt — joining events to the
    *                  next scheduled state change instead of the last
    *                  one), or `"nearest"` (whichever side is closer in
    *                  time; distance ties go backward — full pandas
    *                  `merge_asof` direction parity). Every direction is
    *                  the same single-shuffle window plan: the frames are
    *                  preceding/`last`, following/`first`, or both over
    *                  ONE shared sort
    */
  def join(left: DataFrame, right: DataFrame, tsCol: String, keyCols: Seq[String],
      valueCols: Seq[String], inner: Boolean = true,
      tolerance: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
    val leftCols = left.columns.toSeq
    // side ordering puts the equal-ts right row INSIDE the frame that
    // should see it: backward/nearest use the preceding frame (right
    // before left — nearest is safe because an equal-ts row has distance
    // 0 and backward wins ties anyway); forward uses the following frame
    // (right after left)
    val (lSide, rSide) = if (direction == "forward") (0, 1) else (1, 0)
    val l = left
      .withColumn("__side", lit(lSide))
      .select((leftCols.map(col) :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__side", lit(rSide))
      .select((leftCols.map(c =>
        if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side")) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w0 = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
    val wB = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // ROW-level matching (pandas merge_asof / DuckDB ASOF JOIN semantics):
    // the nearest right ROW wins and its values come through as-is — nulls
    // included. Carrying the whole row as one struct makes that exact (a
    // struct of null fields is itself non-null, so a null-valued right row
    // still REPLACES a farther match instead of being skipped the way a
    // per-column last(value, ignoreNulls) would skip it) and costs two
    // window expressions total instead of two per value column.
    val rightRow = when(col("__side") === rSide,
      struct(valueCols.map(c => col(s"__r_$c")): _*))
    val rightTs = when(col("__side") === rSide, col(tsCol))
    val base = l.unionByName(r)
    val carried = (direction match {
      case "backward" => base
        .withColumn("__asof_row", last(rightRow, ignoreNulls = true).over(wB))
        .withColumn("__asof_ts", last(rightTs, ignoreNulls = true).over(wB))
      case "forward" => base
        .withColumn("__asof_row", first(rightRow, ignoreNulls = true).over(wF))
        .withColumn("__asof_ts", first(rightTs, ignoreNulls = true).over(wF))
      case _ =>
        // nearest: both frames run over the ONE shared sort (no second
        // exchange); distance ties — including the distance-0 equal-ts
        // row, which only the preceding frame sees — choose backward,
        // the pandas rule
        val chooseBack = col("__ts_b").isNotNull && (col("__ts_f").isNull ||
          (col(tsCol) - col("__ts_b")) <= (col("__ts_f") - col(tsCol)))
        base
          .withColumn("__row_b", last(rightRow, ignoreNulls = true).over(wB))
          .withColumn("__ts_b", last(rightTs, ignoreNulls = true).over(wB))
          .withColumn("__row_f", first(rightRow, ignoreNulls = true).over(wF))
          .withColumn("__ts_f", first(rightTs, ignoreNulls = true).over(wF))
          .withColumn("__asof_row",
            when(chooseBack, col("__row_b")).otherwise(col("__row_f")))
          .withColumn("__asof_ts",
            when(chooseBack, col("__ts_b")).otherwise(col("__ts_f")))
          .drop("__row_b", "__ts_b", "__row_f", "__ts_f")
    }).filter(col("__side") === lSide)
    // a match exists if any right row is on the required side (and, with
    // tolerance, near enough); an EXISTING match with null values is
    // still a match — `inner` keeps the row and the null rides through.
    // The |Δt| <= tolerance band covers every direction (backward matches
    // only bind below, forward only above)
    val matched = tolerance match {
      case Some(tol) =>
        col("__asof_row").isNotNull &&
          col("__asof_ts") >= col(tsCol) - expr(s"INTERVAL $tol") &&
          col("__asof_ts") <= col(tsCol) + expr(s"INTERVAL $tol")
      case None => col("__asof_row").isNotNull
    }
    val withVals = carried
      .withColumn("__matched", matched)
      .select(col("*") +: valueCols.map(c =>
        when(col("__matched"), col("__asof_row").getField(s"__r_$c"))
          .as(s"asof_$c")): _*)
    val out = (if (inner) withVals.filter(col("__matched")) else withVals)
      .drop("__side", "__asof_row", "__asof_ts", "__matched")
      .drop(valueCols.map(c => s"__r_$c"): _*)
    out
  }
}
