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
    *                  rt <= lt, the classic as-of) or `"forward"` (pandas
    *                  `merge_asof(direction="forward")`: EARLIEST right
    *                  row with rt >= lt — joining events to the next
    *                  scheduled state change instead of the last one).
    *                  Same single-shuffle window plan either way: the
    *                  frame flips to following and `first` replaces
    *                  `last`, with the side marker swapped so an
    *                  equal-timestamp right row still matches
    */
  def join(left: DataFrame, right: DataFrame, tsCol: String, keyCols: Seq[String],
      valueCols: Seq[String], inner: Boolean = true,
      tolerance: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val back = direction == "backward"
    val leftCols = left.columns.toSeq
    // side ordering makes the equal-ts right row land INSIDE the left
    // row's frame: backward (preceding frame) wants right before left;
    // forward (following frame) wants right after left
    val (lSide, rSide) = if (back) (1, 0) else (0, 1)
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
    val w =
      if (back) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def pick(c: Column): Column =
      if (back) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)
    // ROW-level matching (pandas merge_asof / DuckDB ASOF JOIN semantics):
    // the nearest right ROW wins and its values come through as-is — nulls
    // included. Carrying the whole row as one struct makes that exact (a
    // struct of null fields is itself non-null, so a null-valued right row
    // still REPLACES a farther match instead of being skipped the way a
    // per-column last(value, ignoreNulls) would skip it) and costs two
    // window expressions total instead of two per value column.
    val rightRow = when(col("__side") === rSide,
      struct(valueCols.map(c => col(s"__r_$c")): _*))
    val carried = l.unionByName(r)
      .withColumn("__asof_row", pick(rightRow))
      .withColumn("__asof_ts",
        pick(when(col("__side") === rSide, col(tsCol))))
      .filter(col("__side") === lSide)
    // a match exists if any right row is on the required side (and, with
    // tolerance, near enough); an EXISTING match with null values is
    // still a match — `inner` keeps the row and the null rides through
    val matched = tolerance match {
      case Some(tol) if back =>
        col("__asof_row").isNotNull &&
          col("__asof_ts") >= col(tsCol) - expr(s"INTERVAL $tol")
      case Some(tol) =>
        col("__asof_row").isNotNull &&
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
