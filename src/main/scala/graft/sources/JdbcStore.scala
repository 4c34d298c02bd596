package graft.sources

import java.sql.{DriverManager, Timestamp}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** JDBC-backed realization of the external-store contract — the
  * offline-provable analogue of the reference's TSDB provider/forwarder
  * pair (`data_provider/providers.py::InfluxDataProvider.load_series`,
  * `client/forwarders.py::ForwardPredictionsIntoInflux`; public repo,
  * mount empty — SURVEY.md §0). An embedded Derby instance stands in for
  * the time-series store in tests; against a real server the SAME code
  * path applies because every predicate executes inside the store.
  *
  * Scale design:
  *   - `loadSeries` issues ONE JDBC partition per (tag × time-slice)
  *     predicate: N executors run N bounded `WHERE tag = … AND ts ∈ […)`
  *     store queries in parallel — predicate pushdown by construction,
  *     and nothing funnels through the driver;
  *   - `write` is Spark's executor-parallel batched JDBC sink (each
  *     partition inserts through its own connection) — never
  *     collect-then-write;
  *   - `canHandleTag` is a FETCH FIRST 1 probe, not a scan.
  */
class JdbcTimeSeriesStore(url: String, table: String,
    properties: Properties = new Properties(),
    timeSlicesPerTag: Int = 1)
  extends TimeSeriesReader with TimeSeriesWriter {

  require(timeSlicesPerTag >= 1, "timeSlicesPerTag must be >= 1")

  // JDBC escape syntax: every conformant driver (Derby, PostgreSQL, ...)
  // rewrites {ts '...'} to its native timestamp literal — the
  // Derby-specific TIMESTAMP('...') function form would fail elsewhere
  private def sqlLit(t: Timestamp): String = s"{ts '${t.toString}'}"

  /** [from, to) split into `timeSlicesPerTag` half-open micro-ranges. */
  private[sources] def timeSlices(from: Timestamp, to: Timestamp): Seq[(Timestamp, Timestamp)] = {
    val lo = from.getTime
    val hi = to.getTime
    val span = math.max(hi - lo, 0L)
    (0 until timeSlicesPerTag).map { i =>
      val a = lo + span * i / timeSlicesPerTag
      val b = if (i == timeSlicesPerTag - 1) hi else lo + span * (i + 1) / timeSlicesPerTag
      (new Timestamp(a), new Timestamp(b))
    }.filter { case (a, b) => b.after(a) }
  }

  override def loadSeries(spark: SparkSession, tags: Seq[String],
      from: Timestamp, to: Timestamp): DataFrame = {
    val predicates = for {
      t <- tags
      (lo, hi) <- timeSlices(from, to)
    } yield s"tag = '${t.replace("'", "''")}' AND ts >= ${sqlLit(lo)} AND ts < ${sqlLit(hi)}"
    spark.read.jdbc(url, table, predicates.toArray, properties)
      .select(col("ts"), col("tag"), col("value"))
  }

  override def canHandleTag(tag: String): Boolean = {
    val conn = DriverManager.getConnection(url, properties)
    try {
      val ps = conn.prepareStatement(
        s"SELECT 1 FROM $table WHERE tag = ? FETCH FIRST 1 ROWS ONLY")
      try {
        ps.setString(1, tag)
        val rs = ps.executeQuery()
        try rs.next() finally rs.close()
      } finally ps.close()
    } finally conn.close()
  }

  override def write(df: DataFrame): Unit =
    df.select("ts", "tag", "value").write.mode("append").jdbc(url, table, properties)
}
