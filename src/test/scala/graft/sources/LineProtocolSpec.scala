package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // gnarly tag names: spaces, commas, equals, backslash — everything the
  // escaper has to survive
  private lazy val points = Seq(
    (ts("2024-01-01 00:00:00"), "plain", 1.5),
    (ts("2024-01-01 00:10:00"), "has space", -2.25),
    (ts("2024-01-01 00:20:00"), "c,omma=eq", 1e-7),
    (ts("2024-01-01 00:30:00"), "back\\slash", 42.0),
    (ts("2024-01-01 00:40:00"), "plain", 3.0)
  ).toDF("ts", "tag", "value")

  test("toLines emits the documented shape for a plain tag") {
    val lines = LineProtocol.toLines(points.filter($"tag" === "plain" &&
        $"value" === 1.5), "m1").collect()
    assert(lines.toSeq === Seq("m1,tag=plain value=1.5 1704067200000000000"))
  }

  test("special characters in tag values are escaped") {
    val line = LineProtocol.toLines(points.filter($"tag" === "c,omma=eq"), "m1")
      .collect().head
    assert(line.startsWith("m1,tag=c\\,omma\\=eq value="))
    val sp = LineProtocol.toLines(points.filter($"tag" === "has space"), "m1")
      .collect().head
    assert(sp.startsWith("m1,tag=has\\ space value="))
  }

  test("format -> parse round-trips every point exactly") {
    val lines = LineProtocol.toLines(points, "graft metrics,prod")
    val back = LineProtocol.parseLines(lines, "graft metrics,prod")
      .orderBy("ts").collect().map(r =>
        (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    val expect = points.orderBy("ts").collect().map(r =>
      (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq === expect.toSeq)
  }

  test("parseLines drops other measurements and malformed lines") {
    val mixed = spark.createDataset(Seq(
      "m1,tag=a value=1.0 1704067200000000000",
      "other,tag=a value=9.0 1704067200000000000",
      "garbage line",
      // regex-matching but unparseable fields: under ANSI mode a plain
      // cast here would crash the job (and permanently poison a
      // streaming spool) instead of dropping the line
      "m1,tag=bad value=nope 1704067200000000000",
      "m1,tag=bad value=1.0 99999999999999999999999",
      "m1,tag=b value=2.0 1704067800000000000"))
    val out = LineProtocol.parseLines(mixed, "m1").orderBy("ts").collect()
    assert(out.length === 2)
    assert(out.map(_.getString(1)).toSeq === Seq("a", "b"))
  }

  test("InfluxLineStore write/loadSeries round-trip with predicates") {
    val dir = Files.createTempDirectory("graft-lines").toString + "/spool"
    val store = new InfluxLineStore(dir, "sensors")
    store.write(points)
    val got = store.loadSeries(spark, Seq("plain", "has space"),
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:40:00"))
      .orderBy("ts").collect().map(r => (r.getString(1), r.getDouble(2)))
    // "plain"@00:40 is outside [from, to); "c,omma=eq" not requested
    assert(got.toSeq === Seq(("plain", 1.5), ("has space", -2.25)))
    assert(store.canHandleTag("plain"))
  }
}
