package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scaler fit/transform as plain aggregates + broadcast scalars.
  *
  * Reference: the sklearn scalers the serializer instantiates into every
  * pipeline (`serializer/pipeline_from_definition.py` →
  * `sklearn.preprocessing.MinMaxScaler` / `StandardScaler`). Fit = global
  * per-column statistics; transform = elementwise.
  *
  * Spark-first: fit is ONE aggregate job (partial+final hash agg, no
  * shuffle of the data itself); the fitted parameters are a single row,
  * broadcast cross-joined for transform. Never a window over the whole
  * table (that would serialize to one partition at scale). For the ML
  * pipeline path, MLlib's MinMaxScaler/StandardScaler are used instead —
  * this object is the relational form the t2 oracle exercises.
  */
object Scalers {

  /** (x - min) / (max - min), parameters fitted on `fitDf` (usually the
    * same frame). Columns get suffix `_scaled`.
    */
  def minMax(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exprs = cols.flatMap(c => Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val bounds = df.agg(exprs.head, exprs.tail: _*)
    val joined = df.crossJoin(broadcast(bounds))
    val out = cols.foldLeft(joined) { (d, c) =>
      // nullif: a constant column scales to null, not a DIVIDE_BY_ZERO
      // crash (ANSI mode throws on 0-divisor)
      d.withColumn(s"${c}_scaled",
        (col(c) - col(s"__min_$c")) / nullif(col(s"__max_$c") - col(s"__min_$c"), lit(0.0)))
    }
    out.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** (x - mean) / stddev_samp — StandardScaler analogue. */
  def standard(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exprs = cols.flatMap(c => Seq(avg(col(c)).as(s"__avg_$c"), stddev_samp(col(c)).as(s"__std_$c")))
    val stats = df.agg(exprs.head, exprs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val out = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_scaled",
        (col(c) - col(s"__avg_$c")) / nullif(col(s"__std_$c"), lit(0.0)))
    }
    out.drop(cols.flatMap(c => Seq(s"__avg_$c", s"__std_$c")): _*)
  }
}
