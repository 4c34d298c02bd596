package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String

class RollingAnchorsSpec extends SparkSpec {
  import spark.implicits._

  private def anchorsOf(text: String, gram: Int = 16, mod: Int = 16,
      spanLen: Int = 64): Seq[Int] =
    RollingAnchors.anchors(UTF8String.fromString(text), gram, mod, spanLen)
      .toIntArray().toSeq

  private val para = "the quick brown fox jumps over the lazy dog while " +
    "seventy solemn penguins recite prime numbers near the glacier edge " +
    "and a distant lighthouse blinks twice for every passing cargo ship"

  test("deterministic, ~1/mod density, positions within the span cap") {
    val text = para * 4
    val a = anchorsOf(text)
    assert(a == anchorsOf(text)) // pure function of content
    val maxStart = text.length - 64 + 1
    assert(a.forall(p => p >= 1 && p <= maxStart), s"$a")
    // splitmix-mixed selection behaves like a 1/16 draw on content
    val density = a.size.toDouble / maxStart
    assert(density > 0.02 && density < 0.15, s"density $density")
  }

  test("anchors are content-local: a shared run anchors at the same " +
      "in-run offsets regardless of surrounding text and alignment") {
    val doc1 = "x" * 7 + para + "y" * 30
    val doc2 = "z" * 20 + para + "w" * 100
    // compare in-run anchor offsets (relative to the para start), away
    // from the tail where the spanLen cap (relative to each doc's own
    // end) differs between the docs
    def inRun(doc: String, off: Int) =
      anchorsOf(doc, spanLen = 16).map(_ - off - 1)
        .filter(p => p >= 0 && p <= para.length - 16)
    assert(inRun(doc1, 7) == inRun(doc2, 20))
    assert(inRun(doc1, 7).nonEmpty, "para must contain at least one anchor")
  }

  test("code-point positions: anchors of multibyte text align with substr") {
    val zh = "机器学习模型的训练数据质量决定了下游任务的表现," * 6
    val a = anchorsOf(zh, gram = 4, mod = 4, spanLen = 8)
    assert(a.nonEmpty)
    // the anchor's 4-gram re-extracted by CODE POINT index must rehash to
    // an anchor again — i.e., positions are code-point-true
    val cps = zh.codePoints().toArray
    for (p <- a.take(5)) {
      val window = new String(cps, p - 1, 4)
      val again = anchorsOf(window + "padpadpad", gram = 4, mod = 4, spanLen = 1)
      assert(again.contains(1), s"window at $p did not rehash as an anchor")
    }
  }

  test("codegen path agrees with the interpreted static helper") {
    val viaPlan = Seq(Tuple1(para * 3)).toDF("text")
      .select(Bridge.column(RollingAnchors(
        Bridge.expression(col("text")), Bridge.expression(lit(16)),
        Bridge.expression(lit(16)), Bridge.expression(lit(64)))).as("a"))
      .as[Seq[Int]].head()
    assert(viaPlan == anchorsOf(para * 3))
  }

  test("short text (< gram) has no anchors; null in, null out") {
    assert(anchorsOf("tiny", gram = 16).isEmpty)
    val out = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(Bridge.column(RollingAnchors(
        Bridge.expression(col("text")), Bridge.expression(lit(16)),
        Bridge.expression(lit(16)), Bridge.expression(lit(64)))).as("a"))
      .head()
    assert(out.isNullAt(0))
  }

  test("a foldable NULL parameter is an analysis error, not a codegen NPE") {
    val s = spark.newSession()
    Bridge.registerFunctions(s)
    val e = intercept[Exception] {
      s.sql("SELECT size(graft_anchors('abc', CAST(NULL AS INT), 16, 64))")
        .collect()
    }
    assert(e.getMessage.contains("non-null"), e.getMessage)
  }

  test("graft_anchors is SQL-registered") {
    val s = spark.newSession()
    Bridge.registerFunctions(s)
    val r = s.sql(s"SELECT size(graft_anchors('${para}', 16, 16, 64)) AS n")
      .head().getInt(0)
    assert(r == anchorsOf(para).size)
  }
}
