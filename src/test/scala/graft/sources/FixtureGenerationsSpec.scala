package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The fixture-physical-type contract.
  *
  * The events fixture has now shipped in three physical generations
  * (ns→long, naive-µs/NTZ, UTC-µs) and two rounds were lost to a
  * regeneration outrunning the code: round 5's ns→µs regen broke 42
  * queries, round 6's NTZ residue broke 5 more plus 7 test suites.
  * This spec writes a tiny events table ALL THREE ways and runs every
  * type-sensitive consumer against each generation:
  *   - `Events.read` — one normalized output type (µs TimestampType);
  *   - `Events.readBetween` — correct rows AND the range predicate in
  *     the parquet scan's PushedFilters *on the column as stored* (the
  *     row-group-pruning property that matters at 100 TB);
  *   - `LineProtocol.toLines` — epoch arithmetic that rejects NTZ;
  *   - `TimeSeriesCV.cutpoints` — the ModelBuilder CV lifecycle;
  *   - the `sort_time` / `win_smooth_time` epoch shapes.
  * A fourth generation can only break this spec, not the fleet.
  */
class FixtureGenerationsSpec extends SparkSpec {
  import spark.implicits._

  // 48 hourly events over 2021-01-01/02, two users — big enough for
  // 2 CV splits and a one-day readBetween slice, small enough for ms.
  private def base: DataFrame =
    spark.range(48).select(
      (col("id") % 2).cast("int").as("user_id"),
      col("id").as("event_id"),
      lit("view").as("event_type"),
      (col("id") * 1.5).as("value"),
      // µs since epoch at hour granularity from 2021-01-01T00:00Z
      (lit(1609459200000000L) + col("id") * 3600L * 1000000L).as("us"))

  private val gens: Seq[(String, DataFrame => DataFrame)] = Seq(
    // parquet TIMESTAMP(NANOS) is unwritable from Spark, but with
    // nanosAsLong it *reads* as a plain long — indistinguishable from
    // int64, so an int64 write exercises the identical reader branch.
    "ns-long" -> (df => df.withColumn("ts", col("us") * 1000L)),
    "ntz-us" -> (df => df.withColumn("ts",
      timestamp_micros(col("us")).cast("timestamp_ntz"))),
    "utc-us" -> (df => df.withColumn("ts", timestamp_micros(col("us")))))

  private def write(gen: String, make: DataFrame => DataFrame): String = {
    val out = java.nio.file.Files
      .createTempDirectory(s"fixturegen-$gen").toString + "/events.parquet"
    make(base).drop("us").write.mode("overwrite").parquet(out)
    out
  }

  for ((gen, make) <- gens) {
    test(s"[$gen] Events.read normalizes ts to µs TimestampType") {
      val df = Events.read(spark, write(gen, make))
      assert(df.schema("ts").dataType == TimestampType,
        s"$gen read as ${df.schema("ts").dataType}")
      assert(df.count() == 48)
      // value preservation: first event is exactly 2021-01-01T00:00:00Z
      val lo = df.agg(min(unix_micros(col("ts")))).head().getLong(0)
      assert(lo == 1609459200000000L, s"$gen min ts drifted: $lo")
    }

    test(s"[$gen] readBetween slices exactly and pushes the bound to the scan") {
      val path = write(gen, make)
      val df = Events.readBetween(spark, path, "2021-01-01", "2021-01-02")
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.count() == 24, s"$gen day slice wrong")
      val plan = df.queryExecution.explainString(FormattedMode)
      val pushed = plan.linesIterator
        .filter(_.contains("PushedFilters")).mkString("\n")
      assert(pushed.contains("GreaterThanOrEqual(ts"),
        s"$gen time bound NOT in PushedFilters — row-group pruning dead:\n$plan")
    }

    test(s"[$gen] every unix_* consumer plans and runs") {
      val df = Events.read(spark, write(gen, make))
      // LineProtocol round trip (sink_influx / scan_influx shape)
      val lines = LineProtocol.toLines(
        df.select(col("ts"), col("event_type").as("tag"), col("value")),
        "events")
      assert(lines.count() == 48)
      // ModelBuilder CV lifecycle (TimeSeriesCVSpec covers semantics;
      // here only that it ANALYZES against this generation)
      val cuts = graft.ml.TimeSeriesCV.cutpoints(df, "ts", 2)
      assert(cuts.length == 2)
      // sort_time / win_smooth_time epoch shapes
      assert(df.select(unix_micros(col("ts").cast("timestamp"))).count() == 48)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_seconds(col("ts").cast("timestamp")))
        .rangeBetween(-7200, 0)
      assert(df.select(avg(col("value")).over(w)).count() == 48)
    }
  }

  test("all three generations agree row-for-row after normalization") {
    val read = gens.map { case (g, m) => Events.read(spark, write(g, m)) }
    val hashes = read.map(_.select(col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .orderBy("event_id")
      .agg(sum(hash(col("event_id"), col("us"), col("value")).cast("long")))
      .head().getLong(0))
    assert(hashes.distinct.size == 1,
      s"generations hash-diverge after normalization: $hashes")
  }
}
