package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level filtering ops of the reference's dataset layer.
  *
  * Reference: `gordo_components/dataset/filter_rows.py::pandas_filter_rows`
  * (a pandas `df.eval` boolean expression over tag columns),
  * `TimeSeriesDataset.__init__` from_ts/to_ts bounds, post-align dropna, and
  * `model/transformers/imputer.py::InfImputer` (replace ±inf per column with
  * the max/min finite value). Local mount empty — citations are public-repo
  * symbols, see SURVEY.md §0.
  *
  * All of these are plain Catalyst predicates/projections → pushed down to
  * the parquet scan for free; nothing here shuffles.
  */
object Filters {

  /** `row_filter`: the reference accepts a pandas-eval boolean expression
    * (`` `T1` > 0 & `T2` < 1 ``). We translate the pandas operator spelling
    * to SQL and hand it to Catalyst — it lands in PushedFilters.
    */
  def rowFilter(df: DataFrame, pandasExpr: String): DataFrame =
    df.filter(expr(translatePandasExpr(pandasExpr)))

  /** pandas-eval → SQL: `&`→AND, `|`→OR, `~`→NOT, backticks kept (valid in
    * Spark SQL identifiers), `==` kept (valid SQL equality in Spark).
    *
    * Single-pass scanner, not a string replace: operators inside 'single'/
    * "double" string literals and backticked identifiers are untouched
    * (`` name == 'a&b' `` must not become `name == 'a AND b'`), with
    * backslash escapes honored inside quotes. `&&`/`||` (accepted by some
    * pandas versions) collapse to one AND/OR.
    */
  private[graft] def translatePandasExpr(e: String): String = {
    val out = new StringBuilder
    var i = 0
    var quote: Char = 0 // 0 = outside any literal; otherwise ' " or `
    while (i < e.length) {
      val c = e.charAt(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`' && i + 1 < e.length) {
          out.append(c).append(e.charAt(i + 1)); i += 2
        } else {
          if (c == quote) quote = 0
          out.append(c); i += 1
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c; out.append(c); i += 1
        case '&' => out.append(" AND "); i += (if (i + 1 < e.length && e.charAt(i + 1) == '&') 2 else 1)
        case '|' => out.append(" OR "); i += (if (i + 1 < e.length && e.charAt(i + 1) == '|') 2 else 1)
        case '~' => out.append(" NOT "); i += 1
        case _ => out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Keep rows with `from <= ts < to`; the reference requires tz-aware
    * bounds (raises on naive timestamps).
    */
  def timeRange(df: DataFrame, tsCol: String, fromTs: String, toTs: String): DataFrame =
    df.filter(col(tsCol) >= to_timestamp(lit(fromTs)) && col(tsCol) < to_timestamp(lit(toTs)))

  /** Post-alignment inner-join semantics: drop rows missing any tag value. */
  def dropna(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop("any", cols)

  /** InfImputer: replace +inf with the column's max finite value and -inf
    * with its min finite value (strategy="minmax" in the reference); the
    * bounds are computed in one aggregate pass and attached via a broadcast
    * single-row cross join — scale-safe (no window over the whole table,
    * which would single-partition at 100 TB).
    */
  def imputeInf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val finite: String => Column = c =>
      when(!col(c).isin(Double.PositiveInfinity, Double.NegativeInfinity) && !isnan(col(c)), col(c))
    val boundExprs = cols.flatMap { c =>
      Seq(max(finite(c)).as(s"__max_$c"), min(finite(c)).as(s"__min_$c"))
    }
    val bounds = df.agg(boundExprs.head, boundExprs.tail: _*)
    val joined = df.crossJoin(broadcast(bounds))
    val imputed = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(
        c,
        when(col(c) === Double.PositiveInfinity, col(s"__max_$c"))
          .when(col(c) === Double.NegativeInfinity, col(s"__min_$c"))
          .otherwise(col(c))
      )
    }
    imputed.drop(cols.flatMap(c => Seq(s"__max_$c", s"__min_$c")): _*)
  }

  /** filter_periods: drop configured known-bad timestamp ranges. */
  def excludePeriods(df: DataFrame, tsCol: String, periods: Seq[(String, String)]): DataFrame =
    periods.foldLeft(df) { case (d, (from, to)) =>
      d.filter(!(col(tsCol) >= to_timestamp(lit(from)) && col(tsCol) < to_timestamp(lit(to))))
    }
}
