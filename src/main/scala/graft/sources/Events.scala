package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Canonical reader for the `events` fixture table.
  *
  * The fixture has shipped with `ts` as parquet TIMESTAMP(NANOS) in some
  * generations and TIMESTAMP(MICROS) in others. Spark cannot read
  * TIMESTAMP(NANOS) as a timestamp ([PARQUET_TYPE_ILLEGAL]); with
  * `spark.sql.legacy.parquet.nanosAsLong` it surfaces as a ns-since-epoch
  * LONG instead, while a MICROS column is unaffected by the flag and
  * arrives as a proper TimestampType. Rather than hard-code one
  * generation's physical type (a silent analysis failure on the other),
  * adapt to what the footer actually says and always emit a µs-precision
  * `ts` TIMESTAMP — the type every downstream operator and every DuckDB
  * oracle (`CAST(ts AS TIMESTAMP)`, a µs no-op there) agrees on.
  */
object Events {

  private def raw(s: SparkSession, path: String): DataFrame = {
    // Harmless for µs files; required before planning a ns file.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path)
  }

  private def isNanosLong(df: DataFrame): Boolean =
    df.schema("ts").dataType == LongType

  /** Full scan with `ts` normalized to a µs timestamp. */
  def read(s: SparkSession, path: String): DataFrame = {
    val df = raw(s, path)
    if (isNanosLong(df)) df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Time-bounded scan `[fromDate, toDate)` (dates at UTC midnight) with
    * the range predicate applied to the COLUMN AS STORED, so it lands in
    * the parquet scan's PushedFilters (row-group/page pruning — the thing
    * that matters at 100 TB):
    *   - ns-long generation: bound the raw long; exact because
    *     `ts div 1000 >= F ⟺ ts >= F*1000` for positive longs;
    *   - µs generation: bound the timestamp with Instant literals
    *     (timezone-fixed — no dependence on session or JVM zone).
    */
  def readBetween(s: SparkSession, path: String,
      fromDate: String, toDate: String): DataFrame = {
    def instant(d: String): java.time.Instant =
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    val df = raw(s, path)
    if (isNanosLong(df)) {
      def ns(d: String): Long = instant(d).toEpochMilli * 1000000L
      df.filter(col("ts") >= ns(fromDate) && col("ts") < ns(toDate))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      df.filter(col("ts") >= lit(instant(fromDate)) && col("ts") < lit(instant(toDate)))
    }
  }
}
