package graft.ops

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 200-char base paragraph reused verbatim across docs
  private val para = ("the quick brown fox jumps over the lazy dog while " +
    "seventy solemn penguins recite prime numbers near the glacier edge " +
    "and a distant lighthouse blinks twice for every passing cargo ship tonight") * 1

  private def uniq(i: Int) =
    s"totally unrelated filler number $i " * 8 + s"terminal token $i"

  test("verbatim shared paragraphs are found; unique docs are not flagged") {
    val docs = Seq(
      (1L, uniq(1) + para + uniq(11)),   // shares para with 2
      (2L, uniq(2) + para + uniq(12)),
      (3L, uniq(3)),                      // unique
      (4L, uniq(4))
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(1L) && out.contains(2L), s"$out")
    assert(!out.contains(3L) && !out.contains(4L), s"$out")
  }

  test("periodic shared runs collide at ANY offset via strided spans " +
      "(content collision, not position collision)") {
    val shared = "z" * 95 // spanLen 64 + stride 32 - 1 = 95
    val docs = Seq(
      (1L, "a" * 17 + shared + "b" * 40),
      (2L, "c" * 53 + shared + "d" * 10)
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text").count()
    assert(out == 2, "both docs must be flagged")
  }

  test("MISALIGNED non-periodic shared paragraph is caught by the " +
      "content-defined anchors (offsets differ mod stride)") {
    // prefixes of coprime-to-32 different lengths: no strided position
    // in doc 1 lines up with one in doc 2 inside the shared run, so the
    // strided spans alone CANNOT collide on non-periodic content; the
    // CDC anchors are content-local and fire at the same in-run spots.
    val docs = Seq(
      (1L, "p" * 7 + para + para + "q" * 5),
      (2L, "r" * 20 + para + para + "s" * 9)
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L), s"got $out")
  }

  test("a shorter shared run than the guarantee bound may be missed " +
      "(documents are otherwise distinct)") {
    val shared = "y" * 40 // < spanLen: no single span can lie inside it
    val docs = Seq(
      (1L, uniq(21) + shared + uniq(22)),
      (2L, uniq(23) + shared + uniq(24))
    ).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(docs, "doc_id", "text").count() == 0)
  }

  test("short docs (< spanLen) hash their whole text — exact duplicates collide") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("rolling-hash variant finds the same duplicate docs as the md5 " +
      "variant — aligned AND misaligned") {
    val docs = Seq(
      (1L, uniq(31) + para + uniq(32)),        // aligned with 2
      (2L, uniq(33) + para + uniq(34)),
      (3L, "p" * 7 + para + para + "q" * 5),   // misaligned with 4
      (4L, "r" * 20 + para + para + "s" * 9),
      (5L, uniq(35)),                           // unique
      (6L, uniq(36))
    ).toDF("doc_id", "text")
    val md5Docs = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val rollDocs = Dedup.duplicatedSpansRolling(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(md5Docs == Set(1L, 2L, 3L, 4L), s"md5: $md5Docs")
    assert(rollDocs == Set(1L, 2L, 3L, 4L), s"rolling: $rollDocs")
  }

  test("span counts are per-occurrence: a doc repeating the shared span " +
      "counts each strided window") {
    val docs = Seq(
      (1L, para + para), // para appears twice
      (2L, para)
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > out(2L), s"$out")
  }
}
