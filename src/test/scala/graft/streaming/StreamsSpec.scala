package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val readings = Seq(
    Reading("a", ts("2024-01-01 00:01:00"), 1.0),
    Reading("a", ts("2024-01-01 00:04:00"), 3.0),
    Reading("b", ts("2024-01-01 00:02:00"), 10.0),
    Reading("a", ts("2024-01-01 00:11:00"), 5.0),
    Reading("b", ts("2024-01-01 00:12:00"), 20.0),
    Reading("a", ts("2024-01-01 00:31:00"), 7.0)
  )

  /** Run a streaming transform over a MemoryStream fed in `batches`,
    * collect the complete output via a memory sink.
    */
  private def runStream(name: String, batches: Seq[Seq[Reading]],
      f: DataFrame => DataFrame, outputMode: String): Array[org.apache.spark.sql.Row] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = f(mem.toDF).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
  }

  test("stream resample replays identically to the batch resample") {
    val streamed = runStream("resample_out", Seq(readings.take(3), readings.drop(3)),
      df => Streams.resample(df, "ts", "tag", "value", "10 minutes", "0 seconds"),
      "append")
    // Append mode only emits windows closed by the watermark; with the
    // final event at 00:31 the first three 10-min windows are closed.
    val batch = Streams.resample(readings.toDF, "ts", "tag", "value", "10 minutes", "0 seconds")
    val key = (r: org.apache.spark.sql.Row) => (r.getTimestamp(0), r.getString(1))
    val batchMap = batch.collect().map(r => key(r) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      assert(batchMap(key(r)) == ((r.getDouble(2), r.getLong(3))),
        s"bucket ${key(r)} differs from batch")
    }
  }

  test("stream-stream interval join matches the batch interval join") {
    implicit val sq = spark.sqlContext
    val clicks = Seq(
      (1L, "u1", ts("2024-01-01 00:10:00")),
      (2L, "u1", ts("2024-01-01 00:30:00")),
      (3L, "u2", ts("2024-01-01 00:10:00")))
    val views = Seq(
      (11L, "u1", ts("2024-01-01 00:05:00")), // within 10m of click 1
      (12L, "u1", ts("2024-01-01 00:29:00")), // within 10m of click 2
      (13L, "u1", ts("2024-01-01 00:45:00")), // after every click
      (14L, "u2", ts("2024-01-01 00:01:00"))) // within 10m of click 3
    val memC = MemoryStream[(Long, String, Timestamp)]
    val memV = MemoryStream[(Long, String, Timestamp)]
    val joined = Streams.intervalJoin(
      memC.toDF.toDF("click_id", "user_id", "cts"),
      memV.toDF.toDF("view_id", "user_id", "vts"),
      "user_id", "cts", "vts", "10 MINUTES", "30 minutes")
      .select(col("click_id"), col("view_id"))
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      memC.addData(clicks); memV.addData(views.take(2))
      q.processAllAvailable()
      memV.addData(views.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ij_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Streams.intervalJoin(
      clicks.toDF("click_id", "user_id", "cts"),
      views.toDF("view_id", "user_id", "vts"),
      "user_id", "cts", "vts", "10 MINUTES", "30 minutes")
      .select(col("click_id"), col("view_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((1L, 11L), (2L, 12L), (3L, 14L)))
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("stream dedup drops duplicate event ids within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = Streams.dedup(
        mem.toDF.toDF("event_id", "ts", "value"), "ts", Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(Seq((1L, ts("2024-01-01 00:01:00"), 1.0), (2L, ts("2024-01-01 00:02:00"), 2.0)))
      q.processAllAvailable()
      mem.addData(Seq((1L, ts("2024-01-01 00:01:00"), 1.0), (3L, ts("2024-01-01 00:03:00"), 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("sessionize groups events by gap windows per key") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:10:00")), // same session (gap 30m)
      (1L, ts("2024-01-01 01:00:00")), // new session
      (2L, ts("2024-01-01 00:05:00"))
    ).toDF("user_id", "ts")
    val out = Streams.sessionize(df, "ts", "user_id", "30 minutes", "0 seconds")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("line-protocol spool streams through the same codec as batch") {
    val root = java.nio.file.Files.createTempDirectory("graft-lp-stream").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    val store = new graft.sources.InfluxLineStore(in, "sensors")
    // a forwarder's first POST batch lands as spool text
    store.write(readings.take(3).toDF.select(col("ts"), col("tag"), col("value")))
    val parsed = Streams.readLineProtocol(spark, in, "sensors")
    assert(parsed.isStreaming)
    val q = Streams.resample(parsed, "ts", "tag", "value", "10 minutes", "0 seconds")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk).outputMode("append").start()
    val sentinel = Reading("a", ts("2024-01-01 02:00:00"), 0.0)
    try {
      q.processAllAvailable()
      store.write(readings.drop(3).toDF.select(col("ts"), col("tag"), col("value")))
      q.processAllAvailable()
      store.write(Seq(sentinel).toDF.select(col("ts"), col("tag"), col("value")))
      q.processAllAvailable()
    } finally q.stop()
    // every emitted window must match the batch replay over the SAME spool
    val batchParsed = graft.sources.LineProtocol.parseLines(
      spark.read.textFile(in), "sensors")
    val batch = Streams.resample(batchParsed, "ts", "tag", "value",
      "10 minutes", "0 seconds")
    val key = (r: org.apache.spark.sql.Row) => (r.getTimestamp(0), r.getString(1))
    val batchMap = batch.collect().map(r => key(r) -> (r.getDouble(2), r.getLong(3))).toMap
    val rows = spark.read.parquet(out).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(batchMap(key(r)) == ((r.getDouble(2), r.getLong(3)))))
  }

  test("file-source pipeline: readStream parquet -> resample -> parquet sink with checkpoint") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    // files arriving over time: append part-files into the watched dir
    // (the file stream source does not recurse into subdirectories)
    readings.take(3).toDF.coalesce(1).write.mode("append").parquet(in)
    val schema = readings.toDF.schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val q = Streams.resample(stream, "ts", "tag", "value", "10 minutes", "0 seconds")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk).outputMode("append").start()
    val sentinel = Reading("a", ts("2024-01-01 02:00:00"), 0.0)
    try {
      q.processAllAvailable()
      readings.drop(3).toDF.coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      // the watermark advances at batch END and emits in the NEXT batch —
      // a late sentinel file forces that final emitting batch
      Seq(sentinel).toDF.coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()
    val result = spark.read.parquet(out)
    val batch = Streams.resample((readings :+ sentinel).toDF,
      "ts", "tag", "value", "10 minutes", "0 seconds")
    // append mode emits watermark-closed windows; each must match batch
    val key = (r: org.apache.spark.sql.Row) => (r.getTimestamp(0), r.getString(1))
    val batchMap = batch.collect().map(r => key(r) -> (r.getDouble(2), r.getLong(3))).toMap
    val rows = result.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(batchMap(key(r)) == ((r.getDouble(2), r.getLong(3)))))
  }

  test("crash recovery: restart over a crashed nio checkpoint (orphan tmps + " +
      "uncommitted offsets) still matches the batch oracle") {
    // The nio manager sits under every streaming commit; this pins the
    // RECOVERY half of its contract. A killed driver leaves exactly two
    // kinds of debris: (a) orphaned `.name.<uuid>.tmp` siblings from
    // in-flight createAtomic writers (never renamed — invisible to
    // readers, reclaimed only when the checkpoint dir is deleted; the
    // manager does no proactive orphan cleanup, by design), and (b) an
    // offsets/<n+1> entry whose batch never wrote its commits/<n+1>
    // marker — the canonical crash point (offset durable first). On
    // restart Spark must re-run batch n+1 from the recorded offsets and
    // the resumed output must equal the one-shot batch computation.
    val root = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    readings.take(3).toDF.coalesce(1).write.mode("append").parquet(in)
    val schema = readings.toDF.schema
    def start() = Streams.resample(
        spark.readStream.schema(schema).parquet(in),
        "ts", "tag", "value", "10 minutes", "0 seconds")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk).outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // crash debris (the manager's own tmp naming, garbage payloads)
    def orphan(dir: java.nio.file.Path, name: String): Unit = {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve(
        s".$name.${java.util.UUID.randomUUID()}.tmp"),
        Array.fill[Byte](64)(0x5a))
    }
    val ck = java.nio.file.Paths.get(chk)
    orphan(ck.resolve("offsets"), "99")
    orphan(ck.resolve("commits"), "99")
    val stateDirs = {
      val s = java.nio.file.Files.walk(ck.resolve("state"))
      try {
        val ds = s.filter(p => java.nio.file.Files.isDirectory(p))
          .toArray(n => new Array[java.nio.file.Path](n))
        ds.toSeq
      } finally s.close()
    }
    stateDirs.takeRight(2).foreach(d => orphan(d, "7.delta"))
    // batch n+1: offsets written (same source log offset as n — a crash
    // before any new file was picked up), commit never written
    val offsets = ck.resolve("offsets")
    val ids = {
      val s = java.nio.file.Files.list(offsets)
      try s.toArray(n => new Array[java.nio.file.Path](n)).toSeq
        .map(_.getFileName.toString).filter(_.forall(_.isDigit)).map(_.toLong)
      finally s.close()
    }
    val last = ids.max
    java.nio.file.Files.copy(offsets.resolve(last.toString),
      offsets.resolve((last + 1).toString))
    assert(!java.nio.file.Files.exists(
      ck.resolve("commits").resolve((last + 1).toString)),
      "fixture bug: the uncommitted batch already has a commit marker")

    // restart: finish the uncommitted batch, then take new data
    val sentinel = Reading("a", ts("2024-01-01 02:00:00"), 0.0)
    val q2 = start()
    try {
      q2.processAllAvailable()
      readings.drop(3).toDF.coalesce(1).write.mode("append").parquet(in)
      q2.processAllAvailable()
      Seq(sentinel).toDF.coalesce(1).write.mode("append").parquet(in)
      q2.processAllAvailable()
    } finally q2.stop()

    val batch = Streams.resample((readings :+ sentinel).toDF,
      "ts", "tag", "value", "10 minutes", "0 seconds")
    val key = (r: org.apache.spark.sql.Row) => (r.getTimestamp(0), r.getString(1))
    val batchMap = batch.collect()
      .map(r => key(r) -> ((r.getDouble(2), r.getLong(3)))).toMap
    val rows = spark.read.parquet(out).collect()
    assert(rows.nonEmpty)
    // exactly-once across the crash: no duplicated window rows either
    assert(rows.map(key).distinct.length == rows.length,
      s"duplicate windows after recovery: ${rows.mkString(",")}")
    rows.foreach(r => assert(batchMap(key(r)) == ((r.getDouble(2), r.getLong(3))),
      s"window ${key(r)} diverged after recovery"))
  }

  test("scoreOnline is prequential and identical between batch and two-batch stream") {
    // batch (single pass over a static Dataset)
    val batchScores = Streams.scoreOnline(readings.toDS, 1.5)
      .collect().map(s => (s.tag, s.ts, s.z)).sortBy(x => (x._1, x._2.getTime))

    // hand-check tag a: scores 0, 0, then z of 5 vs mean(1,3)=2, std=sqrt(2)
    val aScores = batchScores.filter(_._1 == "a").map(_._3)
    assert(aScores(0) == 0.0 && aScores(1) == 0.0)
    assert(math.abs(aScores(2) - (5.0 - 2.0) / math.sqrt(2.0)) < 1e-12)

    // streaming replay in two batches must produce the same scores
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.scoreOnline(mem.toDS, 1.5)
      .writeStream.format("memory").queryName("score_out").outputMode("append").start()
    try {
      mem.addData(readings.take(3)); q.processAllAvailable()
      mem.addData(readings.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamScores = spark.table("score_out").as[Scored]
      .collect().map(s => (s.tag, s.ts, s.z)).sortBy(x => (x._1, x._2.getTime))
    assert(streamScores.toSeq == batchScores.toSeq)
  }

  test("ewmaOnline follows the adjust=False recursion and survives replay") {
    val alpha = 0.5
    // total-order sort key incl. value AND score: the fixture has no
    // (tag, ts) ties today, but the spec must not start failing if it
    // gains one (the operator's processing order is (ts, nanos, value))
    def key(x: (String, Timestamp, Double, Double)) =
      (x._1, x._2.getTime, x._3, x._4)
    val batch = Streams.ewmaOnline(readings.toDS, alpha)
      .collect().map(d => (d.tag, d.ts, d.value, d.ewma)).sortBy(key)
    // hand recursion per tag in the operator's own processing order
    val expected = readings.groupBy(_.tag).toSeq.flatMap { case (tag, rs) =>
      val sorted = rs.sortBy(r => (r.ts.getTime, r.ts.getNanos, r.value))
      sorted.tail.scanLeft(
        (tag, sorted.head.ts, sorted.head.value, sorted.head.value)) {
        case ((_, _, _, prev), r) =>
          (tag, r.ts, r.value, alpha * r.value + (1 - alpha) * prev)
      }
    }.sortBy(key)
    assert(batch.toSeq == expected)
    // streaming replay across two batches carries the state
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.ewmaOnline(mem.toDS, alpha)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      mem.addData(readings.take(3)); q.processAllAvailable()
      mem.addData(readings.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ewma_out").as[Smoothed]
      .collect().map(d => (d.tag, d.ts, d.value, d.ewma)).sortBy(key)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("autocorrOnline is bit-identical to the batch rolling autocorrelation " +
      "and to a two-batch streaming replay") {
    val batch = graft.ops.AnomalyMath.rollingAutocorr(readings.toDF(), "value",
        Seq("tag"), Seq(col("ts"), col("value")), k = 3)
      .select("tag", "ts", "autocorr").collect()
      .map(r => (r.getString(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(x => (x._1, x._2.getTime))
    val online = Streams.autocorrOnline(readings.toDS, k = 3)
      .collect().map(d => (d.tag, d.ts, d.autocorr))
      .sortBy(x => (x._1, x._2.getTime))
    assert(online.toSeq == batch.toSeq) // EXACT — same integer stats + IEEE ops
    // tag a is strictly increasing -> once enough pairs exist, autocorr = 1
    val a = online.filter(_._1 == "a")
    assert(a.take(2).forall(_._3.isEmpty)) // 0 then 1 pair -> undefined
    assert(a.drop(2).forall(v => math.abs(v._3.get - 1.0) < 1e-9))
    // two-batch streaming replay carries the ring buffer identically
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.autocorrOnline(mem.toDS, k = 3)
      .writeStream.format("memory").queryName("ac_out")
      .outputMode("append").start()
    try {
      mem.addData(readings.take(3)); q.processAllAvailable()
      mem.addData(readings.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ac_out").as[AutoCorrScored]
      .collect().map(d => (d.tag, d.ts, d.autocorr))
      .sortBy(x => (x._1, x._2.getTime))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("cusumOnline is bit-identical to the batch closed form and to a " +
      "two-batch streaming replay") {
    val (target, slack, h) = (4.0, 0.5, 3.0)
    // batch closed form over the same readings (tag/ts/value columns)
    val asDf = readings.toDF()
    val batch = graft.ops.AnomalyMath.cusum(asDf, "value", Seq("tag"),
        Seq(col("ts"), col("value")), target, slack, h)
      .select("tag", "ts", "cusum_up", "cusum_dn", "alarm_up", "alarm_dn")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4), r.getInt(5)))
      .sortBy(x => (x._1, x._2.getTime))
    // single-pass stateful form on a static Dataset
    val online = Streams.cusumOnline(readings.toDS, target, slack, h)
      .collect()
      .map(d => (d.tag, d.ts, d.cusum_up, d.cusum_dn, d.alarm_up, d.alarm_dn))
      .sortBy(x => (x._1, x._2.getTime))
    assert(online.toSeq == batch.toSeq) // EXACT equality — micro-unit state
    // hand check: tag a devs vs 4.5 are (-3.5, -1.5, 0.5, 2.5) ->
    // up = 0, 0, 0.5, 3.0; dn devs vs 3.5: (2.5, 0.5, -1.5, -3.5)
    val a = online.filter(_._1 == "a")
    assert(a.map(_._3).toSeq == Seq(0.0, 0.0, 0.5, 3.0))
    assert(a.map(_._4).toSeq == Seq(2.5, 3.0, 1.5, 0.0))
    assert(a.map(_._6).toSeq == Seq(0, 0, 0, 0)) // dn never EXCEEDS h=3.0
    // streaming replay across two batches carries state identically
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.cusumOnline(mem.toDS, target, slack, h)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    try {
      mem.addData(readings.take(3)); q.processAllAvailable()
      mem.addData(readings.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cusum_out").as[Drifted]
      .collect()
      .map(d => (d.tag, d.ts, d.cusum_up, d.cusum_dn, d.alarm_up, d.alarm_dn))
      .sortBy(x => (x._1, x._2.getTime))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming t-digest threshold tracks the exact percentile across micro-batches") {
    // 3000 values uniform in [0, 1000): exact p99 = ~990; the digest's
    // state must carry and merge across three micro-batches
    val vals = (0 until 3000).map(i => ("a", (i * 997 % 3000) / 3.0))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF.toDF("tag", "v")
      .groupBy("tag")
      .agg(graft.ops.AnomalyMath.thresholdSketch(col("v"), 0.99).as("thr"))
      .writeStream.format("memory").queryName("thr_out")
      .outputMode("complete").start()
    try {
      vals.grouped(1000).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("thr_out").select("thr").as[Double].head()
    val exact = vals.map(_._2).sorted.apply((3000 * 0.99).toInt)
    assert(math.abs(streamed - exact) / exact < 0.02,
      s"streaming p99 $streamed vs exact $exact drifted > 2%")
  }

  test("streaming Misra-Gries keeps its guarantees across micro-batch state merges") {
    // A word stream with a known skew: "alpha" 40×, "beta" 25×, tail
    // words 1× each. Split into three micro-batches so the state store
    // must carry and MERGE the sketch buffer between batches.
    val words = (Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      (0 until 35).map(i => s"tail$i"))
    val shuffled = new scala.util.Random(7).shuffle(words).map(w => ("en", w))
    val batches = shuffled.grouped(34).toSeq
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF.toDF("lang", "w")
      .groupBy("lang")
      .agg(graft.ops.TextAnalysis.heavyHitters(col("w"), 5).as("hh"))
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val counters = spark.table("hh_out")
      .select(explode(col("hh")).as("c"))
      .select(col("c.item"), col("c.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = words.size // 100, k=5 → error bound n/k = 20
    // Misra-Gries guarantee: true ≥ est ≥ true − n/k, and any item with
    // true count > n/k MUST survive — both alpha (40) and beta (25) do
    val truth = Map("alpha" -> 40L, "beta" -> 25L)
    for ((item, t) <- truth) {
      assert(counters.contains(item), s"$item (true $t > n/k=${n / 5}) evicted")
      val est = counters(item)
      assert(est <= t && est >= t - n / 5, s"$item est $est outside [${t - n / 5}, $t]")
    }
  }

  test("asofOnline matches the batch as-of join on a single-batch replay " +
      "and carries state across time-ordered micro-batches") {
    def in(user: Long, tsm: Long, right: Boolean, id: Long, v: Option[Double]) =
      AsOfIn(user, tsm, right, id, v)
    val events = Seq(
      in(1, 100, right = true, -1, Some(10.0)),
      in(1, 150, right = false, 1, Some(0.5)), // joins vv=10
      in(1, 200, right = true, -1, Some(20.0)),
      in(1, 200, right = false, 2, Some(0.6)), // tie: inclusive -> vv=20
      in(1, 300, right = false, 3, None), // null probe value still joins
      in(2, 50, right = false, 4, Some(9.9)), // probe before ANY ref: dropped
      in(2, 60, right = true, -1, None), // ref with null value
      in(2, 70, right = false, 5, Some(1.0)) // joins vv=null
    )
    def key(o: AsOfOut) = (o.event_id, o.user_id, o.value, o.asof_vv)
    val single = Streams.asofOnline(events.toDS).collect().map(key).sortBy(_._1)
    assert(single.toSeq == Seq(
      (1L, 1L, Some(0.5), Some(10.0)),
      (2L, 1L, Some(0.6), Some(20.0)),
      (3L, 1L, None, Some(20.0)),
      (5L, 2L, Some(1.0), None)))
    // incremental: split at t=175 (time-ordered batches) — state carries
    // the latest reference across the boundary and the result is identical
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[AsOfIn]
    val q = Streams.asofOnline(mem.toDS)
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      mem.addData(events.filter(_.tsMicros < 175)); q.processAllAvailable()
      mem.addData(events.filter(_.tsMicros >= 175)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("asof_out").as[AsOfOut]
      .collect().map(key).sortBy(_._1)
    assert(streamed.toSeq == single.toSeq)
  }

  test("gapsOnline emits each outage once, carries state across batches") {
    // tag a: hours 0, 1, 4 (gap: start 2, missing 2), then 5 (no gap),
    //        then 9 in a LATER batch (gap spanning the boundary: 6..8)
    // tag b: hours 0, 2 (gap: start 1, missing 1)
    def r(tag: String, hour: Int) =
      Reading(tag, new Timestamp(hour * 3600L * 1000L), 1.0)
    val batch1 = Seq(r("a", 0), r("a", 1), r("a", 4), r("a", 5),
      r("b", 0), r("b", 2))
    val batch2 = Seq(r("a", 9))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.gapsOnline(mem.toDS, 3600L)
      .writeStream.format("memory").queryName("gaps_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("gaps_out").as[GapOut].collect()
      .map(g => (g.tag, g.gap_start_hb, g.missing)).sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq(
      ("a", 2L, 2L),  // within batch 1
      ("a", 6L, 3L),  // across the batch boundary (state-carried lastHb=5)
      ("b", 1L, 1L)))
    // duplicate/unordered arrivals within a batch change nothing
    val mem2 = MemoryStream[Reading]
    val q2 = Streams.gapsOnline(mem2.toDS, 3600L)
      .writeStream.format("memory").queryName("gaps_out2")
      .outputMode("append").start()
    try {
      mem2.addData(Seq(r("a", 4), r("a", 0), r("a", 4), r("a", 1), r("a", 5)))
      q2.processAllAvailable()
    } finally q2.stop()
    val out2 = spark.table("gaps_out2").as[GapOut].collect()
      .map(g => (g.tag, g.gap_start_hb, g.missing)).toSeq
    assert(out2 == Seq(("a", 2L, 2L)))
  }

  test("transitionsOnline orders within a batch and stitches across batches") {
    def e(user: Long, t: Long, id: Long, ty: String) = UserEvent(user, t, id, ty)
    // user 1: view(t1) → click(t2) → purchase(t3 in batch 2, stitched)
    //   batch 1 arrives UNORDERED (click before view) — must sort by (ts,id)
    // user 2: same-timestamp tie broken by event_id: a(id=1) → b(id=2)
    val batch1 = Seq(e(1, 2000L, 11, "click"), e(1, 1000L, 10, "view"),
      e(2, 500L, 2, "b"), e(2, 500L, 1, "a"))
    val batch2 = Seq(e(1, 3000L, 12, "purchase"))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = Streams.transitionsOnline(mem.toDS)
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("trans_out").as[TransitionOut].collect()
      .map(t => (t.user_id, t.prev_type, t.next_type))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(out == Seq(
      (1L, "click", "purchase"), // across the batch boundary (carried state)
      (1L, "view", "click"),     // in-batch, after sorting the unordered pair
      (2L, "a", "b")))           // same-ts tie broken by event_id
  }

  test("kalmanOnline: multi-batch replay is bit-identical to one batch, gain settles") {
    def r(t: Long, v: Double) = Reading("a", new Timestamp(t), v)
    val all = (1 to 40).map(i => r(i * 1000L, if (i % 2 == 0) 10.0 else 12.0))
    implicit val sq = spark.sqlContext
    def run(batches: Seq[Seq[Reading]]): Seq[KalmanOut] = {
      val mem = MemoryStream[Reading]
      val name = s"kal_out_${batches.size}"
      val q = Streams.kalmanOnline(mem.toDS, q = 1.0, r = 10.0)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[KalmanOut].collect().sortBy(_.ts.getTime).toSeq
    }
    val one = run(Seq(all))
    val split = run(Seq(all.take(13), all.slice(13, 14), all.drop(14)))
    assert(one == split) // state carries across batches bit-exactly
    assert(one.size == 40)
    // the gain adapts: high at start (uncertain), settling later
    assert(one(1).k > one.last.k)
    // steady-state gain of (Q=1, R=10) local-level model ≈ 0.27
    assert(math.abs(one.last.k - 0.27) < 0.02)
    // filtered level sits between the two alternating observations
    assert(one.last.level > 10.0 && one.last.level < 12.0)
  }

  test("funnelOnline stitches stages across batches and excludes equal-µs ties") {
    def e(user: Long, t: Long, id: Long, ty: String) = UserEvent(user, t, id, ty)
    // user 1: click in batch 1, view + purchase in batch 2 (cross-batch
    //   stitch); the view BEFORE the click (t=500) must not count.
    // user 2: view at the SAME µs as the click — strictly-after excludes
    //   it, so user 2 never leaves stage 1 (state unchanged in batch 2 →
    //   no second snapshot emitted).
    val batch1 = Seq(e(1, 500L, 9, "view"), e(1, 1000L, 10, "click"),
      e(2, 1000L, 20, "click"))
    val batch2 = Seq(e(1, 2000L, 11, "view"), e(1, 3000L, 12, "purchase"),
      e(2, 1000L, 21, "view"))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = Streams.funnelOnline(mem.toDS)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("funnel_out").as[FunnelOut].collect().toSeq
    // latest snapshot per user is current
    val latest = rows.groupBy(_.user_id).map { case (u, rs) => u -> rs.last }
    assert(latest(1L) == FunnelOut(1L, Some(1000L), Some(2000L), Some(3000L)))
    assert(latest(2L) == FunnelOut(2L, Some(1000L), None, None))
    // user 2's batch 2 advanced nothing → exactly one snapshot ever
    assert(rows.count(_.user_id == 2L) == 1)
    // user 1 emitted one snapshot per advancing batch
    assert(rows.count(_.user_id == 1L) == 2)
  }
}
