package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TagSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() = Files.createTempDirectory("graft-src").toString

  test("readTagParquet unions per-tag per-year files and recovers the tag from the path") {
    val dir = tmpDir()
    Seq(("2024-01-01 00:00:00", 1.0)).toDF("s", "value")
      .select(to_timestamp(col("s")).as("ts"), col("value"))
      .write.parquet(s"$dir/T1_2024.parquet")
    Seq(("2023-06-01 00:00:00", 2.0)).toDF("s", "value")
      .select(to_timestamp(col("s")).as("ts"), col("value"))
      .write.parquet(s"$dir/T1_2023.parquet")
    Seq(("2024-02-01 00:00:00", 3.0)).toDF("s", "value")
      .select(to_timestamp(col("s")).as("ts"), col("value"))
      .write.parquet(s"$dir/T2_2024.parquet")

    val out = TagSources.readTagParquet(spark, dir, Seq("T1", "T2"), Seq(2023, 2024))
    val byTag = out.groupBy("tag").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag == Map("T1" -> 2L, "T2" -> 1L))
    // missing (tag, year) combinations are skipped, absent tags yield nothing
    val sparse = TagSources.readTagParquet(spark, dir, Seq("T2", "NOPE"), Seq(2024))
    assert(sparse.count() == 1)
  }

  test("readTagCsv reads ;-separated ts/value files with explicit schema") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(s"$dir/t1.csv"),
      "2024-01-01 00:00:00;1.5\n2024-01-01 00:10:00;2.5\n")
    val out = TagSources.readTagCsv(spark, Map("T1" -> Seq(s"$dir/t1.csv")))
    assert(out.count() == 2)
    assert(out.select("tag").distinct().as[String].collect().toSeq == Seq("T1"))
    assert(out.agg(sum("value")).head().getDouble(0) == 4.0)
  }

  test("tags with spaces and '+' survive the input_file_name URI encoding") {
    val dir = tmpDir()
    Seq(("2024-01-01 00:00:00", 1.0)).toDF("s", "value")
      .select(to_timestamp(col("s")).as("ts"), col("value"))
      .write.parquet(s"$dir/pump 01_2024.parquet")
    Seq(("2024-01-01 00:00:00", 2.0)).toDF("s", "value")
      .select(to_timestamp(col("s")).as("ts"), col("value"))
      .write.parquet(s"$dir/a+b_2024.parquet")
    val out = TagSources.readTagParquet(spark, dir, Seq("pump 01", "a+b"), Seq(2024))
    val tags = out.select("tag").as[String].collect().sorted.toSeq
    assert(tags == Seq("a+b", "pump 01"), tags.toString) // not "pump%2001" / "a b"
  }

  test("CSV and parquet twins of the same series parse to identical frames") {
    val dir = tmpDir()
    // same series in both formats: fractional seconds, negative and
    // missing values — a `;`-parse bug (wrong sep, schema drift, locale
    // decimal) would break the equality
    val rows = Seq(
      ("2024-05-01 00:00:00", Some(1.25)),
      ("2024-05-01 00:10:00.5", Some(-3.5)),
      ("2024-05-01 00:20:00", None),
      ("2024-05-01 00:30:00", Some(1e6)))
    Files.writeString(java.nio.file.Paths.get(s"$dir/twin.csv"),
      rows.map { case (t, v) => s"$t;${v.map(_.toString).getOrElse("")}" }.mkString("\n"))
    rows.toDF("s", "value")
      .select(to_timestamp(col("s")).as("ts"), col("value"))
      .write.parquet(s"$dir/TW_2024.parquet")

    val fromCsv = TagSources.readTagCsv(spark, Map("TW" -> Seq(s"$dir/twin.csv")))
      .select("ts", "value", "tag")
    val fromParquet = TagSources.readTagParquet(spark, dir, Seq("TW"), Seq(2024))
      .select("ts", "value", "tag")
    // names + types must match; nullability flags are planner metadata
    // (url_decode marks the parquet path's tag nullable, lit() does not)
    assert(fromCsv.schema.map(f => (f.name, f.dataType))
      == fromParquet.schema.map(f => (f.name, f.dataType)))
    assert(fromCsv.exceptAll(fromParquet).isEmpty && fromParquet.exceptAll(fromCsv).isEmpty)
  }

  test("readIrocCsv filters to requested tags at the scan") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(s"$dir/iroc.csv"),
      "T1,2024-01-01 00:00:00,1.0\nT2,2024-01-01 00:00:00,2.0\nT3,2024-01-01 00:00:00,3.0\n")
    val out = TagSources.readIrocCsv(spark, Seq(s"$dir/iroc.csv"), Seq("T1", "T3"))
    assert(out.select("tag").as[String].collect().sorted.toSeq == Seq("T1", "T3"))
  }

  test("randomSeries is deterministic, uniform-ish, distributed") {
    val a = TagSources.randomSeries(spark, Seq("t1", "t2"), 500L, 1704067200L, 60L)
    val b = TagSources.randomSeries(spark, Seq("t1", "t2"), 500L, 1704067200L, 60L)
    assert(a.count() == 1000)
    assert(a.exceptAll(b).isEmpty) // same call -> identical rows
    val stats = a.agg(min("value"), max("value"), avg("value"))
      .as[(Double, Double, Double)].collect().head
    assert(stats._1 >= 0.0 && stats._2 < 1.0)
    assert(math.abs(stats._3 - 0.5) < 0.05, s"mean ${stats._3}") // uniform-ish
    // values differ across tags at the same index
    val byTag = a.filter(col("i") === 0).select("value").as[Double].collect()
    assert(byTag.distinct.length == 2)
  }

  test("ParquetLakeStore implements the TimeSeriesReader contract") {
    val dir = tmpDir()
    Seq(("2024-03-01 00:00:00", 7.0)).toDF("s", "value")
      .select(to_timestamp(col("s")).as("ts"), col("value"))
      .write.parquet(s"$dir/T9_2024.parquet")
    val store = new ParquetLakeStore(dir)
    assert(store.canHandleTag("T9") && !store.canHandleTag("NOPE"))
    val out = store.loadSeries(spark, Seq("T9"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    assert(out.columns.toSeq == Seq("ts", "tag", "value"))
    assert(out.count() == 1)
  }

  test("InfluxStore is a real transport: an unreachable server is an IO error, not a stub") {
    // the round-2 stub threw UnsupportedOperationException; the real HTTP
    // client surfaces the network failure when the read materializes
    // (full live-socket behavior is covered by InfluxStoreSpec)
    val store = new InfluxStore("http://127.0.0.1:1", "db", "m")
    val e = intercept[org.apache.spark.SparkException] {
      store.loadSeries(spark, Seq("T1"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00")).collect()
    }
    assert(!e.toString.contains("UnsupportedOperation"))
  }

  test("missingTags reports requested tags that yielded no rows") {
    val longDf = Seq(("2024-01-01 00:00:00", 1.0, "T1")).toDF("s", "value", "tag")
    val missing = TagSources.missingTags(spark, longDf, Seq("T1", "T2", "T3"))
      .as[String].collect().sorted
    assert(missing.toSeq == Seq("T2", "T3"))
  }
}
