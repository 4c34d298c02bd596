package graft

import org.apache.spark.sql.functions._

/** Lake-maintenance sinks: compaction layout (file count + disjoint ts
  * ranges per file — the property that makes parquet min/max stats prune
  * time-range scans) and the JSONL text round trip under hostile payloads.
  */
class LakeSinksSpec extends SparkSpec {
  import spark.implicits._

  test("sink_compact lays out exactly N files with disjoint ts ranges") {
    SparkEntry.queries("sink_compact")(spark, "/root/testdata/sf0.001").count()
    val root = SparkEntry.compactRoot(spark, "/root/testdata/sf0.001")
    val perFile = spark.read.parquet(root)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .orderBy("lo")
      .collect()
    assert(perFile.length == 8, s"expected 8 compacted files, got ${perFile.length}")
    perFile.sliding(2).foreach { case Array(a, b) =>
      assert(!b.getTimestamp(1).before(a.getTimestamp(2)),
        s"file ranges overlap: ${a.toSeq} vs ${b.toSeq}")
    case _ => ()
    }
  }

  test("JSONL round trip is lossless for quotes, newlines, tabs, unicode, and nulls") {
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "line\nbreak and \"quotes\" and \\backslash"),
      (3L, "tab\there, controlchar"),
      (4L, "unicodé — 中文 🚀 ligature ﬁ"),
      (5L, null.asInstanceOf[String]))
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    rows.toDF("doc_id", "text")
      .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
      .write.mode("overwrite").text(out)
    val back = spark.read.schema("doc_id BIGINT, text STRING").json(out)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("text")))
    assert(back.toSeq == rows)
  }
}
