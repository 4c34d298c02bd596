package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newest newest"),
    (3L, "newest newest newest newest widest widest widest")
  ).toDF("doc_id", "text")

  test("training is deterministic and frequent words collapse to one token") {
    val m1 = Bpe.train(corpus, "text", numMerges = 60)
    val m2 = Bpe.train(corpus, "text", numMerges = 60)
    assert(m1 == m2)
    // with enough merges every training word reaches its fixpoint — the
    // frequent whole word becomes a single symbol
    assert(m1.encodeWord("low") == Seq("low" + Bpe.EndMark))
    assert(m1.encodeWord("newest") == Seq("newest" + Bpe.EndMark))
  }

  test("encode round-trips: concatenated tokens reproduce the word") {
    val m = Bpe.train(corpus, "text", numMerges = 10)
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "news", "zzz")) {
      val toks = m.encodeWord(w)
      assert(toks.mkString.stripSuffix(Bpe.EndMark) == w, s"$w -> $toks")
      assert(toks.last.endsWith(Bpe.EndMark))
    }
    // unseen characters fall back to single symbols, never an error
    assert(m.encodeWord("zzz").size >= 2)
  }

  test("subword sharing: an UNSEEN word reuses merges learned from seen words") {
    val m = Bpe.train(corpus, "text", numMerges = 30)
    // "lowest" never occurs, but "low" (very frequent) and the "est</w>"
    // suffix (newest/widest) do — the encoding must be shorter than chars
    val toks = m.encodeWord("lowest")
    assert(toks.size < "lowest".length + 1, s"no subword reuse: $toks")
  }

  test("tokenCounts aggregates the per-occurrence token stream per doc") {
    val m = Bpe.train(corpus, "text", numMerges = 20)
    val out = Bpe.tokenCounts(m, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == 5L) // five whitespace words
    assert(out(2L)._1 == 4L)
    // token count bounded below by word count, above by chars + end marks
    out.foreach { case (_, (nw, nb)) => assert(nb >= nw) }
    // doc 1 is five copies of a fully-merged word -> exactly one token each
    assert(out(1L)._2 == 5L)
  }

  test("supplementary-plane characters stay whole code points through the DataFrame path") {
    val emoji = "data😀x" // 😀 is outside the BMP
    val docs = Seq((1L, s"$emoji $emoji plain")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 5)
    // driver-side: round-trips with the emoji intact, one symbol per code point
    assert(m.encodeWord(emoji).mkString.stripSuffix(Bpe.EndMark) == emoji)
    // distributed path: no '?' mangling from unpaired surrogates
    val toks = Bpe.tokenize(m, docs, "doc_id", "text")
      .filter(col("w") === emoji).select("toks")
      .collect().head.getSeq[String](0)
    assert(toks.mkString.stripSuffix(Bpe.EndMark) == emoji, toks.toString)
    assert(!toks.exists(_.contains("?")))
  }

  test("tokenCounts emits a (0, 0) row for docs whose text has no words") {
    val m = Bpe.train(corpus, "text", numMerges = 10)
    val withEmpty = corpus.unionByName(Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text"))
    val out = Bpe.tokenCounts(m, withEmpty, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 9L, 10L))
    assert(out(9L) == (0L, 0L) && out(10L) == (0L, 0L))
  }

  test("distributed tokenize equals the driver-side encode, occurrence by occurrence") {
    val m = Bpe.train(corpus, "text", numMerges = 20)
    val dist = Bpe.tokenize(m, corpus, "doc_id", "text")
      .select(col("w"), col("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    dist.foreach { case (w, toks) =>
      assert(toks == m.encodeWord(w), s"$w: $toks vs ${m.encodeWord(w)}")
    }
  }
}
