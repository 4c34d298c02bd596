package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox and the lazy dog"),
    (2L, "one two three")
  ).toDF("doc_id", "text")

  test("qualityScore computes word stats and ratios") {
    val r = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .filter(col("doc_id") === 1).collect().head
    assert(r.getAs[Long]("n_words") == 8)
    assert(r.getAs[Long]("n_distinct") == 7) // 'the' twice
    assert(r.getAs[Double]("stopword_ratio") == 0.375) // the, and, the
    assert(r.getAs[Double]("ttr") == 0.875)
  }

  test("tokenCounts counts whitespace and regex token classes") {
    val punct = Seq((3L, "hello, world! x2")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(punct, "doc_id", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") == 3)
    // hello , world ! x 2 -> 6
    assert(r.getAs[Long]("bpe_ish_tokens") == 6)
  }

  test("fingerprint collapses word order and duplication") {
    val perm = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta alpha"),
      (3L, "alpha beta delta")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(perm, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("Cavnar-Trenkle profiles classify held-out synthetic languages") {
    // four synthetic languages with disjoint alphabets — the documents
    // fixture's text is language-independent, so quality is proven here
    // on genuinely separable data
    val alphabets = Seq(
      "la" -> ("bcd", "ae"), "lb" -> ("fgh", "io"),
      "lc" -> ("klm", "uy"), "ld" -> ("pqr", "ei"))
    def mkDocs(seed: Long, perLang: Int, idBase: Long) = {
      val r = new java.util.SplittableRandom(seed)
      alphabets.zipWithIndex.flatMap { case ((lang, (cons, vows)), li) =>
        (0 until perLang).map { d =>
          val words = Seq.fill(12 + r.nextInt(12)) {
            Seq.fill(2 + r.nextInt(2)) {
              s"${cons(r.nextInt(cons.length))}${vows(r.nextInt(vows.length))}"
            }.mkString
          }
          (idBase + li * perLang + d, lang, words.mkString(" "))
        }
      }.toDF("doc_id", "lang", "text")
    }
    val train = mkDocs(seed = 1L, perLang = 40, idBase = 0L)
    val test = mkDocs(seed = 2L, perLang = 10, idBase = 1000L)
    val profiles = TextAnalysis.langProfiles(train, "lang", "text", k = 100)
    val pred = TextAnalysis.classifyLang(test, "doc_id", "text", profiles, k = 100)
      .join(test.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val (hits, total) = (pred.filter(col("lang_pred") === col("lang")).count(),
      pred.count())
    assert(total == 40L)
    assert(hits >= 38L, s"accuracy ${hits.toDouble / total} below 0.95")
    // integer distances: rerunning classification is bit-identical
    val again = TextAnalysis.classifyLang(test, "doc_id", "text", profiles, k = 100)
    assert(pred.select("doc_id", "lang_pred", "dist").orderBy("doc_id").collect().toSeq ==
      again.select("doc_id", "lang_pred", "dist").orderBy("doc_id").collect().toSeq)
  }

  test("hashed-vocab Naive Bayes classifies held-out synthetic languages") {
    // same disjoint-alphabet corpus as the Cavnar-Trenkle spec: word
    // hash buckets are class-separable by construction
    val alphabets = Seq(
      "la" -> ("bcd", "ae"), "lb" -> ("fgh", "io"),
      "lc" -> ("klm", "uy"), "ld" -> ("pqr", "ei"))
    def mkDocs(seed: Long, perLang: Int, idBase: Long) = {
      val r = new java.util.SplittableRandom(seed)
      alphabets.zipWithIndex.flatMap { case ((lang, (cons, vows)), li) =>
        (0 until perLang).map { d =>
          val ws = Seq.fill(12 + r.nextInt(12)) {
            Seq.fill(2 + r.nextInt(2)) {
              s"${cons(r.nextInt(cons.length))}${vows(r.nextInt(vows.length))}"
            }.mkString
          }
          (idBase + li * perLang + d, lang, ws.mkString(" "))
        }
      }.toDF("doc_id", "lang", "text")
    }
    val train = mkDocs(seed = 1L, perLang = 40, idBase = 0L)
    val test0 = mkDocs(seed = 2L, perLang = 10, idBase = 1000L)
    val model = TextAnalysis.fitNaiveBayes(train, "lang", "text", buckets = 256)
    val pred = model.classify(test0, "doc_id", "text")
      .join(test0.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val (hits, total) = (pred.filter(col("label_pred") === col("lang")).count(),
      pred.count())
    assert(total == 40L)
    assert(hits >= 38L, s"NB accuracy ${hits.toDouble / total} below 0.95")

    // persistence: toDF -> fromDF scores bit-identically
    val reloaded = TextAnalysis.NbTextModel.fromDF(model.toDF(spark))
    assert(reloaded == model)
    val again = reloaded.classify(test0, "doc_id", "text")
      .select("doc_id", "label_pred", "score").orderBy("doc_id").collect().toSeq
    assert(pred.select("doc_id", "label_pred", "score").orderBy("doc_id")
      .collect().toSeq == again)
  }

  test("NB classify covers every input doc (tokenless docs get the prior)") {
    val train = Seq((1L, "a", "xx yy xx"), (2L, "a", "yy xx"),
      (3L, "b", "zz ww"), (4L, "b", "ww zz zz")).toDF("doc_id", "lang", "text")
    val model = TextAnalysis.fitNaiveBayes(train, "lang", "text", buckets = 64)
    val out = model.classify(
      Seq((10L, "xx xx yy"), (11L, ""), (12L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(10L, 11L, 12L))
    assert(out(10L) == "a")
    // empty AND whitespace-only docs take the max-prior label (classes
    // are balanced here -> alphabetical tie-break), never the noise at
    // the empty-string hash bucket
    assert(out(11L) == "a" && out(12L) == "a")
  }

  test("logLikelihood: in-domain text scores above junk under a reference LM") {
    val ref = Seq.tabulate(30)(i =>
      (i.toLong, "ref", "the plant sensor stream reports steady values today"))
      .toDF("doc_id", "lang", "text")
    val lm = TextAnalysis.fitNaiveBayes(ref, "lang", "text", buckets = 256)
    val probes = Seq(
      (100L, "the sensor reports steady values"),  // in-domain
      (101L, "zxqv gkkw pffj mmnb aaa11 bbb22"),   // junk, all unseen
      (102L, "")                                    // nothing to judge
    ).toDF("doc_id", "text")
    val out = lm.logLikelihood(probes, "doc_id", "text", "ref")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(100L)._2.get > out(101L)._2.get + 1.0,
      s"in-domain ${out(100L)} should beat junk ${out(101L)} clearly")
    assert(out(102L) == (0L, None)) // no tokens -> null score, not -inf
  }

  test("language profiles gram exactly: L-2 trigrams, short texts none") {
    // "abcd" → abc, bcd (each once); "ab" → no grams
    val corpus = Seq((1L, "x", "abcd"), (2L, "x", "ab")).toDF("doc_id", "lang", "text")
    val prof = TextAnalysis.langProfiles(corpus, "lang", "text", k = 10)
      .orderBy("rnk").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(prof.toSeq == Seq(("abc", 1L), ("bcd", 2L)))
  }

  test("topTerms ranks by document frequency, not term frequency") {
    val corpus = Seq(
      (1L, "en", "spam spam spam spam unique"),
      (2L, "en", "word unique other"),
      (3L, "en", "word unique extra"),
      (4L, "de", "wort wort hallo")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.topTerms(corpus, "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val en = out.filter(_._1 == "en")
    // "unique" appears in 3 docs (df=3) and wins despite "spam" having the
    // highest raw term frequency (df=1)
    assert(en.head == (("en", "unique", 3L, 1L)))
    assert(en(1) == (("en", "word", 2L, 2L)))
    val de = out.filter(_._1 == "de")
    assert(de.map(_._2).toSet == Set("wort", "hallo"))
    assert(de.forall(_._3 == 1L)) // df counts docs, one doc each
  }

  test("langId emits one deterministic prediction per doc from the lang set") {
    val out = TextAnalysis.langId(docs, "doc_id", "text").collect()
    assert(out.length == 2)
    val langs = Set("en", "de", "fr", "es", "zh")
    assert(out.forall(r => langs.contains(r.getAs[String]("lang_pred"))))
    // deterministic across runs
    val again = TextAnalysis.langId(docs, "doc_id", "text").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("repetitionSignals computes top-/dup-n-gram fractions (Gopher gate)") {
    val corpus = Seq(
      // bigrams: "a b"×3, "b a"×2 -> total 5, top 3/5, dup 5/5
      // trigrams: "a b a"×2, "b a b"×2 -> total 4, top 2/4, dup 4/4
      (1L, "a b a b a b"),
      // all bigrams distinct -> top 1/4, dup 0
      (2L, "v w x y z"),
      // "sp sp": bigram "sp sp"×4 of 5... words: sp sp sp sp sp sp ->
      // bigram "sp sp"×5 -> top 1.0, dup 1.0
      (3L, "sp sp sp sp sp sp")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((0.6, 1.0, 0.5, 1.0)))
    assert(out(2L) == ((0.25, 0.0, 0.333333, 0.0))) // round(1/3, 6)
    assert(out(3L) == ((1.0, 1.0, 1.0, 1.0)))
  }

  test("repetitionSignals omits docs shorter than the largest n-gram order") {
    val corpus = Seq((1L, "solo"), (2L, "two words"), (3L, "now three words"))
      .toDF("doc_id", "text")
    val ids = TextAnalysis.repetitionSignals(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // doc 1 has no bigrams, doc 2 no trigrams; only doc 3 carries both
    assert(ids == Set(3L))
  }

  test("diversity: Gini-Simpson is 0 for monoculture, rises with balance") {
    val corpus = Seq(
      ("mono", "en"), ("mono", "en"), ("mono", "en"), ("mono", "en"),
      ("flat", "en"), ("flat", "de"), ("flat", "fr"), ("flat", "zh"),
      ("half", "en"), ("half", "en"), ("half", "de"), ("half", "de")
    ).toDF("source", "lang")
    val out = TextAnalysis.diversity(corpus, "source", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("mono") == ((4L, 1L, 0.0)))
    assert(out("flat") == ((4L, 4L, 0.75))) // 1 - 4/16
    assert(out("half") == ((4L, 2L, 0.5)))  // 1 - 8/16
  }

  test("chunkWindows explodes overlapping word windows with short-doc fallback") {
    val corpus = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // 10 words, width 4 stride 2
      (2L, "a b")                             // shorter than width -> 1 chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(corpus, "doc_id", "text",
        width = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 1,3,5,7 (last full window starts at 10-4+1=7)
    assert(d1.map(_._3).toSeq == Seq(1L, 3L, 5L, 7L))
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L)) // chunk ids
    assert(d1.forall(_._4 == 4L)) // every chunk full width
    assert(d1.head._5 == "w1 w2 w3 w4")
    assert(d1.last._5 == "w7 w8 w9 w10")
    // 50% overlap: consecutive chunks share half their words
    assert(d1(1)._5 == "w3 w4 w5 w6")
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._4 == 2L && d2.head._5 == "a b")
  }

  test("pseudonymize hashes stably, masks digits, and buckets numerics") {
    val df = Seq((1L, "Customer#000000007", 123.45), (2L, "Customer#000000007", -9.99))
      .toDF("id", "name", "bal")
    val out = TextAnalysis.pseudonymize(df, hashCols = Seq("name"),
        maskCols = Seq("name"), generalizeCols = Seq(("bal", 100.0)))
      .orderBy("id").collect()
    // same input -> same pseudonym (joinability), and it is not the input
    assert(out(0).getAs[String]("name_pseud") == out(1).getAs[String]("name_pseud"))
    assert(out(0).getAs[String]("name_pseud") != "Customer#000000007")
    assert(out(0).getAs[String]("name_masked") == "Customer##########")
    assert(out(0).getAs[Double]("bal_bucket") == 100.0)
    assert(out(1).getAs[Double]("bal_bucket") == -100.0) // floor, not trunc
  }

  test("gopherRules: each gate fires on its own pathology") {
    val good = ("clean words " * 30).trim + " the be to of and" // 65 words, stopwords present
    val bad = Seq(
      (1L, good),
      (2L, "too short to pass the word count"),
      (3L, ("- bullet line\n" * 10).trim + "\nthe be of " + ("word " * 60)),
      (4L, (("trailing dots...\n" * 10).trim + "\n" + "the be of " + ("w " * 60)).trim),
      (5L, "### " * 40 + "the be of " + ("word " * 50)),
      (6L, "12 34 " * 40 + "the be of " + ("word " * 10)))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(bad, "doc_id", "text", minWords = 50)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("pass"), r(0).toSeq.toString)
    assert(!r(1).getAs[Boolean]("ok_words") && !r(1).getAs[Boolean]("pass"))
    assert(!r(2).getAs[Boolean]("ok_bullets"), r(2).toSeq.toString)
    assert(!r(3).getAs[Boolean]("ok_ellipsis"), r(3).toSeq.toString)
    assert(!r(4).getAs[Boolean]("ok_symbols"), r(4).toSeq.toString)
    assert(!r(5).getAs[Boolean]("ok_alpha"), r(5).toSeq.toString)
  }

  test("textrankTop: fixed points, ties, center dominance, empty docs") {
    // doc 1: two segments sharing one word — symmetric graph, the
    // iteration's fixed point is pi = 150000 + 850*1000000/1000 = 1e6
    // every round; tie resolves to the smaller segment.
    val sym = (1L, (Seq("shared") ++ Seq.fill(9)("filler") ++ // seg 0
      Seq("shared") ++ Seq.tabulate(9)(i => s"u$i")).mkString(" ")) // seg 1
    // doc 2: 3-segment chain, middle segment shares words with both
    // ends (1 with seg0, 2 with seg2) — the center accumulates the most
    // inflow and must rank top.
    val chain = (2L,
      (Seq("x") ++ Seq.tabulate(9)(i => s"a$i") ++ // seg 0: x
        Seq("x", "y", "z") ++ Seq.tabulate(7)(i => s"b$i") ++ // seg 1: x y z
        Seq("y", "z") ++ Seq.tabulate(8)(i => s"c$i")).mkString(" ")) // seg 2
    // doc 3: single segment, no edges — pi = 150000 + 0 after round 1
    val single = (3L, "just one short segment here")
    // doc 4: empty text — splits to one empty-string word, i.e. one
    // isolated segment (the relational form's semantics, mirrored by
    // the SQL oracle): present with the no-edges fixed point.
    val empty = (4L, "")
    val out = TextAnalysis.textrankTop(
        Seq(sym, chain, single, empty).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 4, out.mkString("; "))
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 1000000L,
      out(0).toSeq.toString)
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 1L,
      out(1).toSeq.toString)
    assert(out(2).getLong(1) == 0L && out(2).getLong(2) == 150000L,
      out(2).toSeq.toString)
    assert(out(3).getLong(1) == 0L && out(3).getLong(2) == 150000L,
      out(3).toSeq.toString)
    // determinism under repartitioning (pure per-doc function)
    val re = TextAnalysis.textrankTop(
        Seq(sym, chain, single, empty).toDF("doc_id", "text").repartition(7),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(re.map(_.toSeq.toList).toList == out.map(_.toSeq.toList).toList)
  }

  test("textrankTop: string ids pass through verbatim (no null-cast merge)") {
    // non-numeric ids used to cast to null and merge every such doc into
    // one graph; they must survive verbatim with per-doc results intact
    val docs = Seq(
      ("doc-alpha", "just one short segment here"),
      ("doc-beta", "another lone segment of text"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textrankTop(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2, out.mkString("; "))
    assert(out(0).getString(0) == "doc-alpha" && out(0).getLong(2) == 150000L)
    assert(out(1).getString(0) == "doc-beta" && out(1).getLong(2) == 150000L)
    // the output id column keeps the source column's type
    assert(TextAnalysis.textrankTop(docs, "doc_id", "text")
      .schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("textrankTop: sparse edge accumulation is bit-identical to dense") {
    // denseMax = 0 forces every doc through the sparse pair-keyed map
    // (the guard against a pathological 100k-segment doc allocating an
    // 80 GB dense matrix in one task); integer adds are order-free, so
    // the two paths must agree exactly
    val docs = Seq(
      (1L, (Seq("x") ++ Seq.tabulate(9)(i => s"a$i") ++
        Seq("x", "y", "z") ++ Seq.tabulate(7)(i => s"b$i") ++
        Seq("y", "z") ++ Seq.tabulate(8)(i => s"c$i")).mkString(" ")),
      (2L, Seq.tabulate(200)(i => s"w${i % 37}").mkString(" ")))
      .toDF("doc_id", "text")
    val dense = TextAnalysis.textrankTop(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq.toList).toList
    val sparse = TextAnalysis.textrankTop(docs, "doc_id", "text",
        denseMax = 0)
      .orderBy("doc_id").collect().map(_.toSeq.toList).toList
    assert(dense == sparse, s"dense=$dense sparse=$sparse")
  }
}
