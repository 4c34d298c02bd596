package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connector contract for external time-series stores — the reference's
  * provider/forwarder pair (`data_provider/providers.py::InfluxDataProvider
  * .load_series` and `client/forwarders.py::ForwardPredictionsIntoInflux`,
  * public repo; mount empty, SURVEY.md §0) as Spark-shaped interfaces.
  *
  * Everything returns/accepts the canonical long format
  * `(ts timestamp, tag string, value double)`. Implementations must be
  * partition-parallel (e.g. JDBC with per-tag or time-range predicates as
  * partition bounds) — a driver-side fetch loop would serialize the whole
  * read.
  */
trait TimeSeriesReader {

  /** Load the requested tags over `[from, to)` as one long-format frame.
    * Must push tag and time predicates into the store query.
    */
  def loadSeries(spark: SparkSession, tags: Seq[String],
      from: Timestamp, to: Timestamp): DataFrame

  /** Cheap existence probe — the "can_handle_tag" analogue. */
  def canHandleTag(tag: String): Boolean
}

trait TimeSeriesWriter {

  /** Persist a long-format (or prediction) frame into the store. Must be
    * executor-parallel (`df.foreachPartition` over a pooled client or a
    * DataSourceV2 sink) — never `collect()`-then-write.
    */
  def write(df: DataFrame): Unit
}

/** InfluxDB-backed reader/writer — OPTIONAL INTERFACE STUB: this
  * environment has no network egress and no Influx client jar, so the
  * methods are unimplemented. The contract itself is REAL and proven
  * three times over: `ParquetLakeStore` (lake files), `JdbcTimeSeriesStore`
  * (partition-parallel predicate-pushdown reads against an embedded
  * Derby, the offline stand-in for any server-side store), and
  * `InfluxLineStore` (the actual Influx WIRE FORMAT — `LineProtocol`
  * renders/parses every byte that would cross the wire, oracle-checked
  * via the `sink_influx_lines` round-trip query). An Influx
  * implementation maps `loadSeries` to one `SELECT value FROM
  * <measurement> WHERE time >= … AND time < … AND tag =~ …` per partition
  * bound — exactly `JdbcTimeSeriesStore`'s predicate shape — and `write`
  * to `LineProtocol.toLines` batches POSTed per executor partition.
  */
class InfluxStore(url: String, database: String, measurement: String,
    user: Option[String] = None, password: Option[String] = None)
  extends TimeSeriesReader with TimeSeriesWriter {

  override def loadSeries(spark: SparkSession, tags: Seq[String],
      from: Timestamp, to: Timestamp): DataFrame =
    throw new UnsupportedOperationException(
      s"InfluxStore($url/$database/$measurement) is an offline interface stub")

  override def canHandleTag(tag: String): Boolean = tag.nonEmpty

  override def write(df: DataFrame): Unit =
    throw new UnsupportedOperationException(
      s"InfluxStore($url/$database/$measurement) is an offline interface stub")
}

/** Parquet-lake-backed implementation of the same contract — proves the
  * interface is implementable and gives tests a real instance.
  */
class ParquetLakeStore(dir: String) extends TimeSeriesReader with TimeSeriesWriter {
  import org.apache.spark.sql.functions._

  override def loadSeries(spark: SparkSession, tags: Seq[String],
      from: Timestamp, to: Timestamp): DataFrame = {
    val years = from.toLocalDateTime.getYear to to.toLocalDateTime.getYear
    TagSources.readTagParquet(spark, dir, tags, years)
      .filter(col("ts") >= lit(from) && col("ts") < lit(to))
      .select("ts", "tag", "value")
  }

  override def canHandleTag(tag: String): Boolean = {
    // Hadoop FileSystem, not java.io.File: works on object stores too
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf)
    fs.exists(base) &&
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(base, s"${tag}_*")))
        .exists(_.nonEmpty)
  }

  override def write(df: DataFrame): Unit =
    df.write.mode("append").parquet(s"$dir/_out")
}
