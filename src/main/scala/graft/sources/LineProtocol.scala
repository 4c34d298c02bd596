package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol codec — the wire format behind the reference's
  * provider/forwarder pair (`data_provider/providers.py::InfluxDataProvider`
  * and `client/forwarders.py::ForwardPredictionsIntoInflux`, public repo;
  * mount empty, SURVEY.md §0). The environment has no network egress, so
  * the TRANSPORT (HTTP POST /write, GET /query) stays out of scope — but
  * the format/parse halves are pure text and fully provable offline, and
  * they are the part a forwarder actually has to get right (escaping,
  * ns timestamps, batch shape).
  *
  * Everything is column expressions (regexp_replace / concat /
  * regexp_extract) — codegen'd, executor-parallel, no UDF, no shuffle.
  * One line per point:
  *
  *   measurement,tag=<tag-escaped> value=<double> <ns-since-epoch>
  *
  * Escaping per the public line-protocol spec: in tag values `,`, `=`,
  * ` ` and `\` are backslash-escaped; in the measurement `,` and ` `.
  */
object LineProtocol {

  /** Escape a tag value as a column: backslash first, then `,` `=` ` `. */
  private def escTag(c: Column): Column =
    regexp_replace(c, "([\\\\,= ])", "\\\\$1")

  private def escMeasurement(s: String): String =
    s.replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ")

  /** Long-format `(ts timestamp, tag string, value double)` → line
    * protocol, one string per point. Timestamps are emitted at ns
    * precision (µs from Spark × 1000 — parquet/Spark carry µs).
    */
  def toLines(df: DataFrame, measurement: String,
      tsCol: String = "ts", tagCol: String = "tag",
      valueCol: String = "value"): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(concat(
      lit(escMeasurement(measurement) + ",tag="),
      escTag(col(tagCol)),
      lit(" value="),
      col(valueCol).cast("double").cast("string"),
      lit(" "),
      (Events.epochMicros(col(tsCol)) * 1000L).cast("string")
    ).as("line")).as[String]
  }

  /** Parse lines of the shape `toLines` emits back to the canonical long
    * format. Lines for other measurements (or malformed lines) are
    * dropped, mirroring a server-side `FROM <measurement>`. The tag group
    * is lazy (`.*?`) so an escaped `\ value=` inside a tag value cannot
    * swallow the field section; unescaping strips the backslash before
    * `\` `,` `=` ` `.
    */
  def parseLines(lines: Dataset[String], measurement: String): DataFrame = {
    val m = java.util.regex.Pattern.quote(escMeasurement(measurement))
    val rx = "^" + m + ",tag=(.*?) value=([^ ]+) ([0-9]+)$"
    lines.toDF("line")
      .withColumn("__tag_raw", regexp_extract(col("line"), rx, 1))
      .withColumn("__val", regexp_extract(col("line"), rx, 2))
      .withColumn("__ns", regexp_extract(col("line"), rx, 3))
      .filter(col("__ns") =!= "")
      .select(
        // try_cast, not cast: under Spark 4's default ANSI mode a
        // regex-matching but unparseable field (value=nope, >19-digit
        // timestamp) would otherwise crash the job — and a poisoned spool
        // file would crash a streaming reader on every restart. integer
        // `div`, not `/`: ns-since-epoch (~1.7e18) exceeds double's 2^53
        // exact range, so float division drifts by ±1 µs.
        expr("timestamp_micros(try_cast(__ns AS BIGINT) div 1000)").as("ts"),
        regexp_replace(col("__tag_raw"), "\\\\([\\\\,= ])", "$1").as("tag"),
        expr("try_cast(__val AS DOUBLE)").as("value"))
      .filter(col("ts").isNotNull && col("value").isNotNull)
  }
}

/** Line-protocol spool store: `write` renders line protocol and appends it
  * as text files, `loadSeries` parses the spool back with tag/time
  * predicates. This is `InfluxStore` with the HTTP transport swapped for a
  * directory — every byte that WOULD go over the wire is produced and
  * consumed for real, so the codec and the partition-parallel batch shape
  * (one text file per executor partition, exactly the forwarder's POST
  * batching) are proven end-to-end offline.
  */
class InfluxLineStore(dir: String, measurement: String)
  extends TimeSeriesReader with TimeSeriesWriter {

  override def loadSeries(spark: SparkSession, tags: Seq[String],
      from: java.sql.Timestamp, to: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    val parsed = LineProtocol.parseLines(spark.read.textFile(dir), measurement)
    // a server-side store would push these into the query (see
    // JdbcTimeSeriesStore for the pushed shape); a text spool can only
    // filter post-parse
    parsed.filter(col("tag").isin(tags: _*) &&
      col("ts") >= lit(from) && col("ts") < lit(to))
  }

  override def canHandleTag(tag: String): Boolean = tag.nonEmpty

  override def write(df: DataFrame): Unit =
    LineProtocol.toLines(df, measurement).write.mode("append").text(dir)
}
