package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL++ sketch cardinality vs exact distinct counts — accuracy contract
  * for the `agg_hll_distinct` query (the sketch's register bits are
  * engine-specific, so the driver records rows only; the error bound is
  * pinned here instead).
  */
class CardinalitySpec extends SparkSpec {

  test("approx_count_distinct tracks exact distinct within the rsd bound") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("exact"),
        approx_count_distinct("l_partkey").as("approx"), // default rsd 5%
        approx_count_distinct("l_partkey", 0.01).as("approx_fine"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      // default-precision sketch: generous 3×rsd envelope (~15%)
      assert(math.abs(r.getLong(2) - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx=${r.getLong(2)} exact=$exact")
      // rsd 1% sketch: 5% envelope
      assert(math.abs(r.getLong(3) - exact) / exact <= 0.05,
        s"${r.getString(0)}: fine=${r.getLong(3)} exact=$exact")
    }
  }

  test("sketches merge: union of per-partition sketches equals one global pass") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val global = li.agg(approx_count_distinct("l_partkey")).head.getLong(0)
    // same aggregate through a repartition: merge path must not change the
    // estimate (mergeability is the whole point of the sketch at scale)
    val merged = li.repartition(16).agg(approx_count_distinct("l_partkey"))
      .head.getLong(0)
    assert(global == merged)
  }
}
