package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

/** InfluxDB 1.x-backed reader/writer over the REAL HTTP API — the
  * reference's provider/forwarder pair (`data_provider/providers.py::
  * InfluxDataProvider.load_series`, `client/forwarders.py::
  * ForwardPredictionsIntoInflux`; public repo, mount empty SURVEY.md §0)
  * as a Spark connector. Transport is the JDK's HttpURLConnection — no
  * client jar — and both legs are live-socket-proven offline against
  * [[InfluxEmulator]] (InfluxStoreSpec) and oracle-checked end to end by
  * the `scan_influx_http` round-trip query.
  *
  * Scale shape:
  *   - `write` renders [[LineProtocol]] lines and POSTs them in bounded
  *     batches FROM EACH EXECUTOR PARTITION (`foreachPartition`) — the
  *     forwarder's batch shape, parallel across the cluster, never a
  *     driver-side collect;
  *   - `loadSeries` issues one InfluxQL time+tag-bounded query per tag
  *     from a task (`mapPartitions` over the tag list — the per-tag
  *     partition-bound pattern of `JdbcTimeSeriesStore`), so reads
  *     parallelize across tags; the JSON response is parsed by Spark
  *     `from_json` column expressions (codegen, no driver parsing);
  *   - timestamps travel as ns in line protocol and come back as
  *     `epoch=u` µs — integers under 2^53, exact through the JSON double.
  */
class InfluxStore(url: String, database: String, measurement: String,
    user: Option[String] = None, password: Option[String] = None,
    writeBatchSize: Int = 5000)
  extends TimeSeriesReader with TimeSeriesWriter {

  private val base = url.stripSuffix("/")
  private def auth: String =
    (user, password) match {
      case (Some(u), Some(p)) =>
        s"&u=${InfluxHttp.enc(u)}&p=${InfluxHttp.enc(p)}"
      case _ => ""
    }

  override def loadSeries(spark: SparkSession, tags: Seq[String],
      from: Timestamp, to: Timestamp): DataFrame = {
    import spark.implicits._
    def ns(t: Timestamp): Long = (t.getTime / 1000L) * 1000000000L + t.getNanos
    val (fromNs, toNs) = (ns(from), ns(to))
    val (b, db, m, a) = (base, database, measurement, auth)
    // one HTTP query per tag, issued from tasks: reads parallelize across
    // tags exactly like JdbcTimeSeriesStore's partition bounds
    val bodies = spark.createDataset(tags)
      .repartition(math.max(1, math.min(tags.size, 32)))
      .mapPartitions { it =>
        it.map { tag =>
          val lit = tag.replace("\\", "\\\\").replace("'", "\\'")
          val q = s"""SELECT "value" FROM "$m" WHERE "tag" = '$lit'""" +
            s" AND time >= $fromNs AND time < $toNs"
          (tag, InfluxHttp.get(
            s"$b/query?db=${InfluxHttp.enc(db)}&epoch=u&q=${InfluxHttp.enc(q)}$a"))
        }
      }.toDF("tag", "body")
    val schema = "results ARRAY<STRUCT<statement_id: INT, series: " +
      "ARRAY<STRUCT<name: STRING, columns: ARRAY<STRING>, values: ARRAY<ARRAY<DOUBLE>>>>>>"
    // series absent (no data) → null values → explode emits nothing
    bodies
      .withColumn("__r", from_json(col("body"), schema, Map.empty[String, String]))
      .select(col("tag"),
        explode(col("__r").getField("results").getItem(0)
          .getField("series").getItem(0).getField("values")).as("__p"))
      .select(
        expr("timestamp_micros(CAST(__p[0] AS BIGINT))").as("ts"),
        col("tag"),
        col("__p").getItem(1).as("value"))
  }

  override def canHandleTag(tag: String): Boolean =
    tag.nonEmpty && InfluxHttp.ping(s"$base/ping")

  override def write(df: DataFrame): Unit = {
    val target = s"$base/write?db=${InfluxHttp.enc(database)}&precision=ns$auth"
    val batch = writeBatchSize
    LineProtocol.toLines(df, measurement).foreachPartition {
      (it: Iterator[String]) =>
        it.grouped(batch).foreach(lines => InfluxHttp.post(target, lines.mkString("\n")))
    }
  }
}

/** Minimal JDK-only HTTP helpers shared by the Influx transport — static
  * so executor closures capture nothing but strings.
  */
object InfluxHttp {

  def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def drain(conn: java.net.HttpURLConnection): String = {
    val is = if (conn.getResponseCode >= 400) conn.getErrorStream else conn.getInputStream
    if (is == null) "" else
      try new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally is.close()
  }

  def post(url: String, body: String): Unit = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "text/plain; charset=utf-8")
    val os = conn.getOutputStream
    try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    val code = conn.getResponseCode
    val resp = drain(conn)
    conn.disconnect()
    if (code < 200 || code >= 300)
      throw new java.io.IOException(s"influx write failed: HTTP $code $resp")
  }

  def get(url: String): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val resp = drain(conn)
    conn.disconnect()
    if (code < 200 || code >= 300)
      throw new java.io.IOException(s"influx query failed: HTTP $code $resp")
    resp
  }

  def ping(url: String): Boolean =
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(2000)
      conn.setRequestMethod("GET")
      val ok = conn.getResponseCode == 204
      conn.disconnect()
      ok
    } catch { case _: java.io.IOException => false }
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
