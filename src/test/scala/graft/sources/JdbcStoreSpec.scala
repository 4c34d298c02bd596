package graft.sources

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}
import java.util.Properties

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integration spec for the JDBC store contract against an embedded Derby
  * database — the offline stand-in for any server-side time-series store.
  */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = Files.createTempDirectory("graft-derby").toString
  private lazy val url = s"jdbc:derby:$dbDir/tsdb;create=true"
  private lazy val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val store: JdbcTimeSeriesStore = {
    // create the table explicitly: Spark's Derby dialect would map
    // StringType to CLOB, which Derby refuses to compare with `tag = ?`
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE series (ts TIMESTAMP, tag VARCHAR(64), value DOUBLE)")
    } finally conn.close()
    new JdbcTimeSeriesStore(url, "series", props, timeSlicesPerTag = 2)
  }

  private lazy val seeded: JdbcTimeSeriesStore = {
    val rows = for {
      tag <- Seq("a", "b")
      h <- 0 until 10
    } yield (ts(f"2024-01-01 $h%02d:00:00"), tag, h * 1.0)
    store.write(rows.toDF("ts", "tag", "value"))
    store
  }

  test("write then loadSeries round-trips through the store") {
    val out = seeded.loadSeries(spark, Seq("a", "b"),
      ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    assert(out.count() == 20)
    val a3 = out.filter(col("tag") === "a" && col("value") === 3.0).collect()
    assert(a3.length == 1 && a3.head.getTimestamp(0) == ts("2024-01-01 03:00:00"))
  }

  test("loadSeries pushes tag and time predicates into the store") {
    // half-open [02:00, 08:00) keeps hours 2..7; tag filter excludes b
    val out = seeded.loadSeries(spark, Seq("a"),
      ts("2024-01-01 02:00:00"), ts("2024-01-01 08:00:00"))
    assert(out.select("tag").distinct().as[String].collect().toSeq == Seq("a"))
    assert(out.agg(min("value"), max("value")).as[(Double, Double)].collect().head == ((2.0, 7.0)))
    assert(out.count() == 6)
  }

  test("one JDBC partition per (tag x time slice) — parallel bounded reads") {
    val out = seeded.loadSeries(spark, Seq("a", "b"),
      ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    assert(out.rdd.getNumPartitions == 4) // 2 tags x 2 slices
    // slices partition the range: no row lost or duplicated at the seam
    assert(out.count() == 20)
  }

  test("canHandleTag probes without scanning") {
    assert(seeded.canHandleTag("a"))
    assert(!seeded.canHandleTag("zzz"))
  }

  test("timeSlices covers [from, to) exactly, last slice absorbs remainder") {
    val s = new JdbcTimeSeriesStore(url, "series", props, timeSlicesPerTag = 3)
    val slices = s.timeSlices(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:10"))
    assert(slices.head._1 == ts("2024-01-01 00:00:00"))
    assert(slices.last._2 == ts("2024-01-01 00:00:10"))
    // contiguous: each slice starts where the previous ended
    slices.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi == lo)
      case _ =>
    }
  }
}
