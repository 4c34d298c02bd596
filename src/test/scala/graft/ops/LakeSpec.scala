package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "kind", "v")

  test("upsert: updates win on collision, inserts append, others pass through") {
    val updates = Seq(
      (2L, "b", 99.0), // overwrite
      (4L, "d", 40.0)  // insert
    ).toDF("id", "kind", "v")
    val out = Lake.upsert(base, updates, Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out.size == 4)
    assert(out(1L) == ("a", 10.0))
    assert(out(2L) == ("b", 99.0)) // updated, not duplicated
    assert(out(3L) == ("c", 30.0))
    assert(out(4L) == ("d", 40.0)) // inserted
  }

  test("composite merge keys match on ALL key columns") {
    val b2 = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("id", "kind", "v")
    val u2 = Seq((1L, "x", 9.0)).toDF("id", "kind", "v")
    val out = Lake.upsert(b2, u2, Seq("id", "kind"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out((1L, "x")) == 9.0)
    assert(out((1L, "y")) == 2.0) // same id, different kind → untouched
  }

  test("empty update batch is the identity") {
    val out = Lake.upsert(base, base.limit(0), Seq("id"))
    assert(out.exceptAll(base).isEmpty && base.exceptAll(out).isEmpty)
  }

  test("column order of updates does not matter (unionByName)") {
    val updates = Seq(("e", 5L, 50.0)).toDF("kind", "id", "v")
      .select("kind", "id", "v")
    val out = Lake.upsert(base, updates.select("id", "kind", "v").select("kind", "id", "v"), Seq("id"))
    assert(out.filter($"id" === 5L).select("kind").head().getString(0) == "e")
  }

  test("schema mismatch is an explicit error, not silent column loss") {
    intercept[IllegalArgumentException] {
      Lake.upsert(base, base.drop("v"), Seq("id"))
    }
  }

  test("TYPE mismatch is an explicit error too — unionByName would " +
      "silently widen the persisted schema") {
    val intUpdates = Seq((9L, "z", 5)).toDF("id", "kind", "v") // v: INT
    intercept[IllegalArgumentException] {
      Lake.upsert(base, intUpdates, Seq("id"))
    }
  }

  test("scd2Merge: change closes+reopens, no-op keeps, new key inserts, " +
      "null-valued update is a CHANGE not a miss, closed history untouched") {
    import org.apache.spark.sql.functions.col
    val current = Seq(
      (1L, Option("a"), 1L, Option(2L)), // closed history row
      (1L, Option("b"), 2L, None),       // open: will change to "c"
      (2L, Option("x"), 1L, None),       // open: no-op re-statement
      (3L, Option("y"), 1L, None),       // open: untouched (no update)
      (4L, Option("q"), 1L, None)        // open: update sets value NULL
    ).toDF("id", "kind", "v_from", "v_to")
    val updates = Seq(
      (1L, Option("c")),  // change
      (2L, Option("x")),  // no-op
      (4L, None: Option[String]), // null-valued update: still a change
      (9L, Option("new")) // new key
    ).toDF("id", "kind")
    val out = Lake.scd2Merge(current, updates, Seq("id"),
        "v_from", "v_to", version = 3L)
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    assert(out == Set(
      (1L, Some("a"), 1L, Some(2L)), // history verbatim
      (1L, Some("b"), 2L, Some(3L)), // closed at v3
      (1L, Some("c"), 3L, None),     // reopened
      (2L, Some("x"), 1L, None),     // no churn for the no-op
      (3L, Some("y"), 1L, None),     // untouched
      (4L, Some("q"), 1L, Some(3L)), // null-update closed it...
      (4L, None, 3L, None),          // ...and opened the null state
      (9L, Some("new"), 3L, None)))  // first open row
    // exactly one open row per live key
    val opens = out.toSeq.filter(_._4.isEmpty).groupBy(_._1).view.mapValues(_.size)
    assert(opens.values.forall(_ == 1))
  }

  test("partitioned copy-on-write: untouched partition files are never rewritten") {
    // the q_stream_upsert commit shape: id-range partitions, merge
    // semi-joined to the batch's partition set, stage-then-rename. The
    // CONTRACT this spec pins: a batch touching partition 0 must leave
    // partition 3's files bit-identical AND un-recreated (same mtime —
    // a rewrite-with-same-bytes would still be O(table) I/O at 100 TB).
    val dir = java.nio.file.Files.createTempDirectory("cowtest").toString
    val table = s"$dir/t"
    val rows = (0L until 40L).map(i => (i, s"k$i", i * 1.0))
      .toDF("id", "kind", "v").withColumn("__p", expr("id div 10"))
    rows.repartition(4, col("__p"))
      .write.partitionBy("__p").mode("overwrite").parquet(table)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileState(p: Long) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$table/__p=$p"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
    val before3 = fileState(3L)
    Thread.sleep(1100) // mtime resolution guard
    // batch updates ids 1 and 12 (partitions 0 and 1 only)
    val batch = Seq((1L, "K1", 100.0), (12L, "K12", 200.0))
      .toDF("id", "kind", "v").withColumn("__p", expr("id div 10"))
    val current = spark.read.option("basePath", table).parquet(table)
      .withColumn("__p", col("__p").cast("long"))
    val merged = Lake.upsert(current, batch, Seq("id"))
      .join(batch.select("__p").distinct(), Seq("__p"), "left_semi")
    val staging = s"$dir/stage"
    merged.repartition(2, col("__p"))
      .write.mode("overwrite").partitionBy("__p").parquet(staging)
    for (st <- fs.listStatus(new org.apache.hadoop.fs.Path(staging))
         if st.getPath.getName.startsWith("__p=")) {
      val dst = new org.apache.hadoop.fs.Path(table, st.getPath.getName)
      if (fs.exists(dst)) fs.delete(dst, true)
      fs.rename(st.getPath, dst)
    }
    // partition 3: same files, same bytes, same mtimes — untouched
    assert(fileState(3L) == before3)
    // the merge result is exactly the batch-merge algebra
    val out = spark.read.parquet(table)
      .select("id", "kind", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expected = (0L until 40L).map(i => (i, s"k$i", i * 1.0)).toSet --
      Set((1L, "k1", 1.0), (12L, "k12", 12.0)) ++
      Set((1L, "K1", 100.0), (12L, "K12", 200.0))
    assert(out == expected)
  }
}
