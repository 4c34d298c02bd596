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
}
