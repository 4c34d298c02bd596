package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton16 interleaves bits exactly (reference implementation parity)") {
    def ref(a: Long, b: Long): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (0x5555L, 0xAAAAL), (12345L, 54321L))
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.morton16(col("a"), col("b")).as("z"))
      .collect()
    out.foreach { r =>
      val expected = ref(r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == expected,
        s"morton16(${r.getLong(0)}, ${r.getLong(1)}) = ${r.getLong(2)}, want $expected")
    }
  }

  test("morton16 z-values of adjacent cells differ only in low bits (locality)") {
    // points in the same 2x2 cell share all but the lowest 2 z-bits
    val z = Seq((4L, 8L), (5L, 8L), (4L, 9L), (5L, 9L)).toDF("a", "b")
      .select(ZOrder.morton16(col("a"), col("b"))).as[Long].collect()
    assert(z.map(_ >> 2).distinct.length == 1, s"cell not contiguous in z: ${z.toSeq}")
  }

  test("layout is lossless and handles a degenerate (constant) dimension") {
    val df = spark.range(100).select(col("id"),
      (col("id") % 7).as("k"), lit(5L).as("const"))
    val out = ZOrder.layout(df, col("k"), col("const"), 4)
    // row-for-row lossless
    assert(out.count() == 100)
    assert(out.agg(sum(col("id"))).head.getLong(0) == (0L until 100L).sum)
    // constant dimension degrades to a plain range layout, no crash
    val out2 = ZOrder.layout(df, col("const"), col("k"), 4)
    assert(out2.count() == 100)
  }
}
