package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "cat cat cat cat cat cat cat cat"), // tf-saturation probe
    (3L, "dogs and more dogs, no feline content here at all today"),
    (4L, "a cat"), // short doc: length normalization boost
    (5L, "CAT Mat! cat-mat?") // case/punct folding
  ).toDF("doc_id", "text")

  test("tokens lowercases and splits on non-alphanumerics") {
    val t = Search.tokens(docs.filter($"doc_id" === 5), "doc_id", "text")
      .collect().map(_.getString(1)).toSeq
    assert(t == Seq("cat", "mat", "cat", "mat"))
  }

  test("bm25 scores only matching docs; more query terms score higher") {
    val out = Search.bm25(docs, "doc_id", "text", Seq("cat", "mat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(3L)) // no query term → absent
    // doc 1 and 5 match both terms; doc 4 matches one
    assert(out(1L) > out(4L), s"$out")
    assert(out(5L) > out(4L))
    assert(out.values.forall(_ > 0))
  }

  test("tf saturates: 8 repeats is not 8x the score of one occurrence") {
    val out = Search.bm25(docs, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k1 = 1.2 caps the tf term at (k1+1) = 2.2x the tf=1 asymptote
    assert(out(2L) < out(4L) * 3.0, s"$out")
  }

  test("rarer terms carry higher idf: a unique term outranks a common one") {
    val corpus = (Seq((10L, "unique word here")) ++
      (11L to 20L).map(i => (i, "common word everywhere"))).toDF("doc_id", "text")
    val out = Search.bm25(corpus, "doc_id", "text", Seq("unique", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 10 matches the rare term (df=1), docs 11.. the common (df=11)
    assert(out(10L) > out(11L), s"$out")
  }

  test("query terms are normalized with the corpus tokenization: case " +
      "and punctuation cannot silently zero the recall") {
    val raw = Search.bm25(docs, "doc_id", "text", Seq("cat", "mat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val messy = Search.bm25(docs, "doc_id", "text", Seq("CAT", "Mat!"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(messy == raw, s"$messy vs $raw")
    // a hyphenated query splits into the tokens it indexes as
    val hyph = Search.bm25(docs, "doc_id", "text", Seq("cat-mat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hyph == raw)
  }

  test("tfidfTopTerms surfaces distinctive terms above ubiquitous ones") {
    val corpus = Seq(
      (1L, "zebra zebra zebra common common"),
      (2L, "common words only here"),
      (3L, "more common words again"),
      (4L, "common here again words")
    ).toDF("doc_id", "text")
    val top = Search.tfidfTopTerms(corpus, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // doc 1's signature term is its df=1 'zebra', not the df=4 'common'
    assert(top((1L, 1L)) == "zebra", s"$top")
    // every doc gets at most k ranked rows, rnk starts at 1
    val byDoc = Search.tfidfTopTerms(corpus, "doc_id", "text", 2)
      .collect().groupBy(_.getLong(0))
    byDoc.values.foreach { rows =>
      assert(rows.length <= 2)
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("tfidfTopTerms is deterministic under ties: equal scores order by term") {
    val corpus = Seq((1L, "aaa bbb"), (2L, "ccc ddd")).toDF("doc_id", "text")
    // within doc 1, 'aaa' and 'bbb' have identical tf and df → identical
    // score; rank must break the tie lexicographically
    val rows = Search.tfidfTopTerms(corpus, "doc_id", "text", 2)
      .filter($"doc_id" === 1L).orderBy("rnk")
      .collect().map(_.getString(2)).toSeq
    assert(rows == Seq("aaa", "bbb"))
  }

  test("deterministic under repartition") {
    val a = Search.bm25(docs, "doc_id", "text", Seq("cat", "mat")).collect()
    val b = Search.bm25(docs.repartition(7), "doc_id", "text", Seq("cat", "mat"))
      .collect()
    assert(a.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq ==
      b.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq)
  }
}
