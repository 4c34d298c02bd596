package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def cnt(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(SortedIntersectCount(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  test("hand-computed counts on sorted sets, including empty and disjoint") {
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d"), 2),
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3),
      (Seq("a", "b"), Seq("c", "d"), 0),
      (Seq.empty[String], Seq("a"), 0),
      (Seq("a"), Seq.empty[String], 0),
      // unequal lengths, interleaved
      (Seq("apple", "mango", "zebra"), Seq("ant", "mango", "pear", "zebra"), 2))
    val df = rows.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(cnt(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq == rows.map(_._3))
  }

  test("long-array form matches size(array_intersect) incl. negatives") {
    // xxhash64 keys are full-range signed longs — the sort order the
    // merge walks must be SIGNED numeric (sort_array's), negatives first
    val rows = Seq(
      (Seq(-9L, -2L, 0L, 7L), Seq(-2L, 7L, 8L), 2),
      (Seq(Long.MinValue, -1L, Long.MaxValue), Seq(Long.MinValue, 0L, Long.MaxValue), 2),
      (Seq(1L, 2L, 3L), Seq(4L, 5L), 0),
      (Seq.empty[Long], Seq(1L), 0))
    val df = rows.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(cnt(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq == rows.map(_._3))
    val viaBuiltin = df.select(size(array_intersect(col("a"), col("b"))))
      .as[Int].collect()
    assert(got.toSeq == viaBuiltin.toSeq)
  }

  test("agrees with size(array_intersect) on real corpus shingle sets") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val sets = docs.select(col("doc_id"),
      sort_array(array_distinct(split(lower(trim(col("text"))), "\\s+"))).as("ws"))
    val pairs = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(cnt(col("a.ws"), col("b.ws")).as("merge"),
        size(array_intersect(col("a.ws"), col("b.ws"))).as("builtin"))
    assert(pairs.filter(col("merge") =!= col("builtin")).count() == 0)
    // and the comparison actually exercised non-trivial overlaps
    assert(pairs.filter(col("merge") > 0).count() > 0)
  }

  test("null arrays yield null; null elements are rejected") {
    val df = Seq((Some(Seq("a")), None: Option[Seq[String]]))
      .toDF("a", "b")
    assert(df.select(cnt(col("a"), col("b"))).collect().head.isNullAt(0))
    val withNullElem = Seq((Seq(None, Some("a")), Seq(Some("a"))))
      .toDF("a", "b")
    val e = intercept[Exception] {
      withNullElem.select(cnt(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("SQL registration: graft_sorted_intersect is callable") {
    val got = spark.sql(
      "SELECT graft_sorted_intersect(array('a','b','c'), array('b','x'))")
      .collect().head.getInt(0)
    assert(got == 1)
  }
}
