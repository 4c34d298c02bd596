package graft.ops

import org.apache.spark.sql.DataFrame
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
    *                  interval string (e.g. "5 MINUTES"); a match older
    *                  than `left.ts − tolerance` is treated as no match
    */
  def join(left: DataFrame, right: DataFrame, tsCol: String, keyCols: Seq[String],
      valueCols: Seq[String], inner: Boolean = true,
      tolerance: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // side: right=0 sorts before left=1 at equal ts -> >= semantics
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c =>
        if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side")) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The matched timestamp must be tracked PER VALUE COLUMN: last(value,
    // ignoreNulls) skips null-valued right rows, so gating every column on
    // the latest right row's timestamp would let a stale value through
    // whenever a newer right row carries a null in that column.
    val carried = l.unionByName(r)
      .select(col("*") +: valueCols.flatMap(c => Seq(
        last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c"),
        last(when(col("__side") === 0 && col(s"__r_$c").isNotNull, col(tsCol)),
          ignoreNulls = true).over(w).as(s"__asof_ts_$c"))): _*)
      .filter(col("__side") === 1)
    val masked = tolerance match {
      case Some(tol) =>
        // same window pass carried each column's matched timestamp; a
        // stale match nulls out here, then the `inner` drop applies
        valueCols.foldLeft(carried) { (d, c) =>
          val within = col(s"__asof_ts_$c") >= col(tsCol) - expr(s"INTERVAL $tol")
          d.withColumn(s"asof_$c", when(within, col(s"asof_$c")))
        }
      case None => carried
    }
    val out = masked
      .drop("__side")
      .drop(valueCols.flatMap(c => Seq(s"__r_$c", s"__asof_ts_$c")): _*)
    if (inner) out.na.drop("any", valueCols.map(c => s"asof_$c")) else out
  }
}
