package graft.sources

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full HTTP round trip for [[InfluxStore]] against a LIVE loopback
  * [[InfluxEmulator]] socket: executor-side POST batches in, per-tag
  * InfluxQL queries out — every byte crosses a real TCP connection.
  */
class InfluxStoreSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("write → HTTP → loadSeries round trip with escaping, bounds, and parallel batches") {
    import spark.implicits._
    val em = new InfluxEmulator().start()
    try {
      val store = new InfluxStore(s"http://127.0.0.1:${em.boundPort}", "graft", "sensors")
      val nasty = "t a,g=1\\x" // space, comma, equals, backslash in the tag
      val rows = Seq(
        (ts("2024-01-01 00:00:00.000123"), "temp", 1.5),
        (ts("2024-01-01 01:00:00"), "temp", -2.25),
        (ts("2024-01-01 02:00:00"), nasty, 7.0),
        (ts("2024-01-02 00:00:00"), "temp", 99.0), // outside the read window
        (ts("2024-01-01 03:00:00"), "unrequested", 3.0))
      // 3 partitions: the write path must POST from several tasks
      store.write(rows.toDF("ts", "tag", "value").repartition(3))
      assert(em.size == 5)

      val out = store.loadSeries(spark, Seq("temp", nasty, "absent"),
          ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
        .orderBy("ts", "tag")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
      assert(out.toSeq == Seq(
        (ts("2024-01-01 00:00:00.000123"), "temp", 1.5), // µs precision survives
        (ts("2024-01-01 01:00:00"), "temp", -2.25),
        (ts("2024-01-01 02:00:00"), nasty, 7.0)))

      assert(store.canHandleTag("temp"))
      assert(!store.canHandleTag(""))
    } finally em.stop()
  }

  test("streaming sinkTo forwards micro-batches through the live HTTP store") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val em = new InfluxEmulator().start()
    try {
      val store = new InfluxStore(s"http://127.0.0.1:${em.boundPort}", "graft", "stream_m")
      implicit val sq = spark.sqlContext
      val mem = MemoryStream[graft.streaming.Reading]
      val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt").toString
      val q = graft.streaming.Streams.sinkTo(
        mem.toDF().select(col("ts"), col("tag"), col("value")), store, ckpt)
      try {
        mem.addData(graft.streaming.Reading("a", ts("2024-01-01 00:00:00"), 1.0))
        q.processAllAvailable()
        mem.addData(graft.streaming.Reading("a", ts("2024-01-01 00:01:00"), 2.0),
          graft.streaming.Reading("b", ts("2024-01-01 00:02:00"), 3.0))
        q.processAllAvailable()
      } finally q.stop()
      // every micro-batch crossed the socket; read the union back
      val out = store.loadSeries(spark, Seq("a", "b"),
          ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
        .orderBy("ts").collect()
        .map(r => (r.getString(1), r.getDouble(2))).toSeq
      assert(out == Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)))
    } finally em.stop()
  }

  test("second write appends; absent measurement and dead server behave") {
    import spark.implicits._
    val em = new InfluxEmulator().start()
    try {
      val store = new InfluxStore(s"http://127.0.0.1:${em.boundPort}", "graft", "m1")
      store.write(Seq((ts("2024-01-01 00:00:00"), "a", 1.0)).toDF("ts", "tag", "value"))
      store.write(Seq((ts("2024-01-01 00:00:01"), "a", 2.0)).toDF("ts", "tag", "value"))
      val got = store.loadSeries(spark, Seq("a"),
          ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
        .orderBy("ts").collect().map(_.getDouble(2)).toSeq
      assert(got == Seq(1.0, 2.0))
      // same emulator, different measurement: empty, not an error
      val other = new InfluxStore(s"http://127.0.0.1:${em.boundPort}", "graft", "m2")
      assert(other.loadSeries(spark, Seq("a"),
        ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")).isEmpty)
    } finally em.stop()
    // server gone: canHandleTag is false rather than an exception
    val dead = new InfluxStore("http://127.0.0.1:1", "graft", "m1")
    assert(!dead.canHandleTag("a"))
  }
}
