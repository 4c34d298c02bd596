package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-corpus analysis for training-data pipelines: language-ID,
  * quality scoring, token counting, and document fingerprinting.
  *
  * North-star extension (not in the reference). All operators are pure
  * Column expressions over one scan — no UDFs, no shuffles except where a
  * groupBy is semantically required (langid's per-doc vote).
  */
object TextAnalysis {

  /** Text scrub/normalization for training-data hygiene: ordered
    * (pattern → replacement) regex rewrites, e.g. PII masking (emails,
    * phone numbers → placeholder tokens), digit folding, whitespace
    * collapse. Pure `regexp_replace` chain — codegen'd, no shuffle, and
    * mirrored 1:1 by SQL `regexp_replace(..., 'g')`.
    */
  def scrub(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (c, (pattern, replacement)) =>
      regexp_replace(c, pattern, replacement)
    }

  import Dedup.words

  /** Deterministic language-ID by hashed word voting: each token votes for
    * the language whose index is md5(token) mod nLangs; a doc's predicted
    * language is its modal vote (count desc, index tie-break). This is the
    * *plumbing* of an n-gram language identifier — in production the vote
    * table is a broadcast dictionary of real n-gram→language weights; the
    * md5 stand-in keeps the pipeline deterministic and oracle-checkable
    * offline (no model files in this environment).
    */
  def langId(docs: DataFrame, idCol: String, textCol: String,
      langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")): DataFrame = {
    val tokens = docs.select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("t"))
    val li = pmod(conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"), lit(langs.size))
    val votes = tokens.select(col("doc_id"), li.as("li"))
      .groupBy("doc_id", "li").agg(count(lit(1)).as("n"))
    val top = votes.withColumn("rn",
      row_number().over(Window.partitionBy("doc_id").orderBy(col("n").desc, col("li"))))
      .filter(col("rn") === 1)
    val langExpr = langs.zipWithIndex.foldLeft(lit(langs.last)) { case (acc, (l, i)) =>
      when(col("li") === i, lit(l)).otherwise(acc)
    }
    top.select(col("doc_id"), langExpr.as("lang_pred"))
  }

  /** Quality metrics in one narrow projection: word count, distinct word
    * count, stopword ratio, type-token ratio, average word length.
    * `passThrough = true` keeps every input column alongside the metrics
    * (no id rename) — a downstream gate then filters in place instead of
    * joining the metrics back on the id (an avoidable shuffle AND a
    * second evaluation of whatever produced the text).
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "of", "to", "and"),
      passThrough: Boolean = false): DataFrame = {
    // project the tokenization once — the expression is referenced five
    // times below and would otherwise re-split per reference
    val carried =
      if (passThrough) docs.select(col("*"), col(textCol).as("__text"),
        words(col(textCol)).as("__ws"))
      else docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        words(col(textCol)).as("__ws"))
    val ws = col("__ws")
    val nWords = size(ws)
    val nDistinct = size(array_distinct(ws))
    val nStop = size(filter(ws, w => w.isInCollection(stopwords)))
    val metrics = Seq(
      nWords.cast("long").as("n_words"),
      nDistinct.cast("long").as("n_distinct"),
      round(nStop * lit(1.0) / nWords, 6).as("stopword_ratio"),
      round(nDistinct * lit(1.0) / nWords, 6).as("ttr"),
      round(length(regexp_replace(col("__text"), " ", "")) * lit(1.0) / nWords, 6)
        .as("avg_word_len"))
    if (passThrough)
      carried.select(col("*") +: metrics: _*).drop("__text", "__ws")
    else
      carried.select(col("doc_id") +: metrics: _*)
  }

  /** Gopher-style document-quality gates (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 — public paper): the rule set
    * web-scale curation applies BEFORE model-based scoring. Per doc: the
    * raw signals, one boolean per rule, and the conjunction `pass`. Pure
    * single-scan column math (higher-order array functions, no UDF, no
    * shuffle) — at 100 TB this is a map-only pass that feeds a filter.
    * Word-count bounds are parameters because the paper's 50..100k is
    * corpus-calibrated.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that",
        "have", "with")): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("__text"), words(col(textCol)).as("__ws"),
      split(col(textCol), "\n").as("__lines"))
    val ws = col("__ws")
    val lines = col("__lines")
    val nWords = size(ws)
    val nLines = size(lines)
    // non-overlapping occurrence counts via length deltas — replace()
    // scans left-to-right greedily in both Spark and the SQL oracle
    def occurrences(c: Column, lit0: String): Column =
      (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(lit0), ""))) / lit0.length
    val nSymbols = occurrences(col("__text"), "#") +
      occurrences(col("__text"), "...") + occurrences(col("__text"), "…")
    val meanWordLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWords
    val bulletFrac = size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines, l =>
      trim(l).endsWith("...") || trim(l).endsWith("…")))
      .cast("double") / nLines
    val alphaFrac = size(filter(ws, w => w.rlike("[a-z]"))).cast("double") / nWords
    val nStopDistinct = size(array_distinct(filter(ws, w => w.isInCollection(stopwords))))
    base.select(col("doc_id"),
      nWords.cast("long").as("n_words"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(nSymbols.cast("double") / nWords, 6).as("symbol_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaFrac, 6).as("alpha_frac"),
      nStopDistinct.cast("long").as("n_stop_distinct"),
      (nWords >= minWords && nWords <= maxWords).as("ok_words"),
      (meanWordLen >= 3 && meanWordLen <= 10).as("ok_word_len"),
      (nSymbols.cast("double") / nWords < 0.1).as("ok_symbols"),
      (bulletFrac < 0.9).as("ok_bullets"),
      (ellipsisFrac < 0.3).as("ok_ellipsis"),
      (alphaFrac >= 0.8).as("ok_alpha"),
      (nStopDistinct >= 2).as("ok_stopwords"))
      .withColumn("pass",
        col("ok_words") && col("ok_word_len") && col("ok_symbols") &&
          col("ok_bullets") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stopwords"))
  }

  /** Token counts: plain whitespace tokens and a BPE-ish regex token class
    * count (letter runs, digit runs, single punctuation).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("bpe_ish_tokens"))

  /** Key-collision fingerprint: md5 of the sorted distinct token set.
    * Documents that differ only in word order/duplication collide — the
    * classic "fingerprint" clustering key.
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(words(col(textCol)))))).as("fingerprint"))

  /** Char n-grams as ROWS `(key, g)` — the form both langid passes
    * consume. One scan-side `regexp_extract_all` over the whole text
    * (round 14), after THREE discarded designs: per-position
    * `substr(text, i, n)` re-scans UTF8String bytes from offset 0
    * (O(len²) per doc); an array+`transform` HOF evaluates its lambda
    * INTERPRETED per element (~µs each — 4 s just to gram the sf0.1
    * corpus); and the rounds-5–13 posexplode + `lead`-window form, which
    * was codegen'd but paid a full EXCHANGE of the per-CHARACTER table
    * (hash by a synthetic row id) before the window — the heaviest
    * shuffle in both langid plans, moving ~|corpus chars| rows to
    * reassemble adjacency the source row already had.
    *
    * The pattern `(?s)(?=(.{n})).` consumes one character per match and
    * CAPTURES the n chars starting there (lookahead), so the extracted
    * group list is exactly every doc-local n-gram in order — identical
    * rows to the lead-window form (the DuckDB oracle derives the gram
    * set independently and hash-gates this). `(?s)` keeps `.` matching
    * newlines, matching split-based adjacency across line breaks. The
    * regex runs per doc inside the scan: no synthetic id, no window, no
    * exchange — doc-local work stays in the row (the textrank lesson).
    */
  private def gramRows(docs: DataFrame, keyExpr: Column, textCol: String,
      n: Int): DataFrame =
    docs.select(keyExpr.as("__key"),
      explode(regexp_extract_all(lower(col(textCol)),
        lit(s"(?s)(?=(.{$n}))."), lit(1))).as("g"))

  /** TRAINED language identification — Cavnar-Trenkle n-gram text
    * categorization (published method: per-class ranked n-gram profiles,
    * out-of-place distance). Deliberately the RANK variant, not naive
    * Bayes: every score is integer arithmetic (ranks, counts, |Δrank|
    * sums), so classification is bit-identical across engines and the
    * whole train+classify pipeline oracle-checks — a log-probability
    * model would hang cross-engine equality on `ln` ulp agreement.
    *
    * `langProfiles` = one groupBy + a per-language rank window over the
    * AGGREGATED gram table (|langs|·|grams| rows). The profile is tiny
    * (k rows per language) — broadcast it.
    */
  def langProfiles(docs: DataFrame, langCol: String, textCol: String,
      k: Int = 200, n: Int = 3): DataFrame = {
    val grams = gramRows(docs, col(langCol), textCol, n)
      .select(col("__key").as("lang"), col("g"))
    grams.groupBy("lang", "g").agg(count(lit(1)).as("c"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("g"))))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("g"), col("rnk").cast("long").as("rnk"))
  }

  /** Corpus-level char-gram statistics per key (language or doc) — the
    * audit/diagnostic view of the gram stage: total and distinct trigram
    * counts per key.
    */
  def gramStats(docs: DataFrame, keyCol: String, textCol: String,
      n: Int = 3): DataFrame =
    gramRows(docs, col(keyCol), textCol, n)
      .groupBy(col("__key").as(keyCol))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_distinct"))

  /** Per-document top-k gram ranking — the classify-side half of the
    * Cavnar-Trenkle model, exposed for staged diagnostics and reuse by
    * [[classifyLang]]: one groupBy + per-doc rank window, ties on the gram.
    */
  def docGramRanks(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 200, n: Int = 3): DataFrame =
    gramRows(docs, col(idCol), textCol, n)
      .select(col("__key").as("doc_id"), col("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .withColumn("drnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("c").desc, col("g"))))
      .filter(col("drnk") <= k)
      .select(col("doc_id"), col("g"), col("drnk").cast("long").as("drnk"))

  /** Classify by out-of-place distance against ranked profiles: each doc
    * builds its own top-k gram ranking, matched grams cost |rank_doc −
    * rank_lang|, unmatched cost the penalty k. Ties break on the
    * language name. Scale shape: doc ranks = one groupBy + per-doc
    * window; the distances are |langs| aggregate columns over plan-time
    * profile map literals in ONE groupBy(doc) — no doc×lang row
    * explosion, never a corpus×corpus product. Docs shorter than n
    * chars have no grams and are absent from the output
    * (unclassifiable).
    */
  def classifyLang(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, k: Int = 200, n: Int = 3): DataFrame = {
    // The profile IS the fitted model: ≤ k·|langs| rows. Materialize it
    // ONCE into a local relation (the IvfModel-centroid pattern) —
    // leaving it as a plan would re-run the train subtree (corpus-wide
    // explode→agg→rank) for every reference below, and this O(model)
    // collect is the same class as every fitted model in graft.ml.
    val spark = docs.sparkSession
    import spark.implicits._
    val prof = profiles.select("lang", "g", "rnk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    require(prof.nonEmpty, "empty language profile table")
    val langs = prof.map(_._1).distinct.sorted
    val byLang = prof.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val docRank = docGramRanks(docs, idCol, textCol, k, n)
    // dist = Σ over doc-profile grams of (|Δrank| if the language ranks
    // the gram, else the penalty k). The profile is PLAN-TIME literals
    // (the IVF centroid-literal trick): each language becomes a map
    // literal gram→rank and ONE sum column, so every language's distance
    // accumulates in the SAME groupBy(doc) — one shuffle of k rows per
    // doc, no doc×lang candidate explosion, no second aggregation, no
    // per-doc rank window. The former crossJoin(langs)+join(profiles)
    // shape shuffled |langs|× the rows through two extra exchanges and
    // measured ~2× slower at sf0.1.
    val distCols = langs.map { lang =>
      val m = map(byLang(lang).flatMap { case (g, r) =>
        Seq(lit(g), lit(r)) }: _*)
      sum(coalesce(abs(col("drnk") - element_at(m, col("g"))), lit(k.toLong)))
        .as(s"__dist_$lang")
    }
    val agg = docRank.groupBy(col("doc_id"))
      .agg(distCols.head, distCols.tail: _*)
    // column-wise argmin, langs iterated in ascending order with a STRICT
    // < — ties keep the earliest language, the same tie-break as the
    // former orderBy(dist, lang) row_number
    val best = langs.tail.foldLeft(
        (lit(langs.head), col(s"__dist_${langs.head}"))) {
      case ((pl, pd), lang) =>
        val d = col(s"__dist_$lang")
        (when(d < pd, lit(lang)).otherwise(pl), when(d < pd, d).otherwise(pd))
    }
    agg.select(col("doc_id"), best._1.as("lang_pred"), best._2.as("dist"))
  }

  /** Word n-grams as rows `(doc_id, g)` — positional adjacency via
    * posexplode + lead, the same codegen-friendly shape as [[gramRows]]
    * (HOF lambdas are interpreted per element; `substr`-loops rescan
    * UTF8 bytes). The lead window partitions by the doc id, which IS
    * unique here (unlike gramRows' training keys), so no synthetic row
    * id is needed and per-doc partitions stay bounded by document
    * length — never corpus-sized.
    */
  private def wordGramRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("__p")
    docs.select(col(idCol).as("doc_id"),
        posexplode(words(col(textCol))).as(Seq("__p", "__w")))
      // concat (not concat_ws): a null lead at the doc tail must null the
      // whole gram, not silently emit a shorter one
      .withColumn("g", concat((col("__w") +:
        (1 until n).flatMap(o => Seq(lit(" "), lead(col("__w"), o).over(w)))): _*))
      .filter(col("g").isNotNull)
      .select(col("doc_id"), col("g"))
  }

  /** Repetition signals for training-data quality gates (the Gopher /
    * MassiveText repetition filters, Rae et al. 2021 §A1.1): per document
    * and per n-gram order, the fraction of n-gram occurrences inside the
    * single most frequent n-gram (`top{n}_frac` — catches "the same
    * phrase over and over") and inside any n-gram occurring more than
    * once (`dup{n}_frac` — catches templated/boilerplate text). Count
    * fractions over word n-grams; documents shorter than max(ns) words
    * carry no signal and are absent.
    *
    * Scale shape per order: explode → one hash-agg on (doc, gram) with
    * map-side partials → one per-doc agg; the per-order frames join on
    * the unique doc id. No windows over raw rows, no driver work.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty, "at least one n-gram order")
    val perN = ns.map { n =>
      wordGramRows(docs, idCol, textCol, n)
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("total"), max(col("c")).as("mx"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"))
        .select(col("doc_id"),
          round(col("mx") * lit(1.0) / col("total"), 6).as(s"top${n}_frac"),
          round(col("dup") * lit(1.0) / col("total"), 6).as(s"dup${n}_frac"))
    }
    perN.reduce(_.join(_, "doc_id"))
  }

  /** Overlapping token-window chunking — the RAG / training-window prep
    * step: each document explodes into fixed-`width` word windows
    * advancing by `stride` (stride < width ⇒ overlap). Documents shorter
    * than `width` yield one chunk of all their words. Emits (doc_id,
    * chunk_id, strt [1-based word offset], n_tokens, chunk).
    *
    * Pure generator projections (sequence → posexplode → slice) — no
    * shuffle, no UDFs; the row expansion is ~n_words/stride per doc and
    * partition-local, so the plan scales like the scan.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("__ws"))
      .select(col("doc_id"), col("__ws"),
        explode(sequence(lit(1),
          greatest(size(col("__ws")) - (width - 1), lit(1)),
          lit(stride))).as("strt"))
      .withColumn("__chunk", slice(col("__ws"), col("strt"), lit(width)))
      .select(col("doc_id"),
        ((col("strt") - 1) / stride).cast("long").as("chunk_id"),
        col("strt").cast("long").as("strt"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk"))
  }

  /** PII-safe pseudonymization for sharing/training hygiene: identifier
    * columns become stable md5 pseudonyms (irreversible but still
    * joinable across tables — the property plain dropping loses), masked
    * columns get regex rewrites (digits → '#' by default), and numeric
    * quasi-identifiers are generalized to bucket floors (k-anonymity-style
    * coarsening). Pure projections — codegen'd, no shuffle, pushdown-safe.
    */
  def pseudonymize(df: DataFrame, hashCols: Seq[String],
      maskCols: Seq[String] = Nil, maskPattern: String = "[0-9]",
      maskWith: String = "#",
      generalizeCols: Seq[(String, Double)] = Nil): DataFrame = {
    val hashed = hashCols.foldLeft(df)((d, c) =>
      d.withColumn(s"${c}_pseud", md5(col(c).cast("string"))))
    val masked = maskCols.foldLeft(hashed)((d, c) =>
      d.withColumn(s"${c}_masked", regexp_replace(col(c), maskPattern, maskWith)))
    generalizeCols.foldLeft(masked) { case (d, (c, width)) =>
      d.withColumn(s"${c}_bucket", floor(col(c) / width) * width)
    }
  }

  /** Sketch-based frequent terms: the Misra-Gries heavy-hitters aggregate
    * (graft.expressions.HeavyHitters) as a Column — O(k) memory per
    * group, mergeable partial sketches, streaming-legal. The sketch
    * answer to [[topTerms]] at 100 TB, where the exact per-group
    * vocabulary aggregate no longer fits: every term with frequency
    * > n/(k+1) is guaranteed present; counts are lower bounds.
    */
  def heavyHitters(item: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    Bridge.column(graft.expressions.HeavyHitters(
      Bridge.expression(item), Literal(k)).toAggregateExpression())
  }

  /** Compressibility quality signal — DEFLATE compressed/raw byte ratio
    * per document (graft.expressions.DeflateRatio, a native codegen
    * expression): repetitive machine junk compresses far below natural
    * prose, binary-ish noise barely compresses — the cheap
    * language-agnostic gate of published web-corpus pipelines, applied
    * beside [[repetitionSignals]]'s n-gram gates. Pure row-local
    * projection, no shuffle.
    */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.expressions.DeflateRatio(Bridge.expression(text)))
  }

  /** Corpus diversity audit per group — the before/after-curation check
    * that a filtering pipeline did not collapse a source onto one
    * language (or one domain): Gini-Simpson index 1 − Σ(c/n)² (the
    * probability two random docs differ in class). Deliberately NOT
    * Shannon entropy: the index needs no transcendental function, so
    * cross-engine equality never hangs on `ln` ulp agreement — every
    * term is an integer-valued double (sums of which are EXACT and
    * order-independent below 2^53) and the combination is one short
    * IEEE sequence mirrored verbatim in the oracle SQL.
    *
    * Overflow discipline: both c² and n² move to double BEFORE the
    * multiply — in LongType either overflows once one class holds
    * ~3·10⁹ docs (an ANSI crash at exactly the curation-collapse scale
    * this operator exists to detect).
    *
    * Two chained hash-aggs on (group, class) then (group) — map-side
    * partials, no windows, no skew (class cardinality per group is tiny).
    */
  def diversity(docs: DataFrame, groupCol: String, classCol: String): DataFrame =
    docs.groupBy(col(groupCol), col(classCol)).agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("__n"), count(lit(1)).as("n_classes"),
        sum(col("c").cast("double") * col("c").cast("double")).as("__sc2"))
      .select(col(groupCol),
        col("__n").as("n_docs"), col("n_classes"),
        ((col("__n").cast("double") * col("__n").cast("double") -
            col("__sc2")) /
          (col("__n").cast("double") * col("__n").cast("double")))
          .as("gini_simpson"))

  /** Corpus reporting: top-k terms per group (language) by DOCUMENT
    * frequency — the vocabulary audit a curation pipeline runs before and
    * after filtering. `array_distinct` before the explode makes the count
    * a document frequency, not a term frequency, and bounds each doc's
    * contribution to any term at 1 (a single spammy doc cannot promote a
    * term).
    *
    * Scale shape: explode → one hash-agg on (group, term) with map-side
    * partial counts, then the top-k window runs on the AGGREGATED
    * vocabulary (|langs| × |vocab| rows, not corpus rows) — the window's
    * per-group partition is fine because vocabularies are ≪ corpus size.
    * Rank ties break on the term for cross-engine determinism.
    */
  def topTerms(docs: DataFrame, groupCol: String, textCol: String,
      k: Int = 10, minTermLen: Int = 3): DataFrame = {
    val terms = docs.select(col(groupCol).as("grp"),
        explode(array_distinct(words(col(textCol)))).as("term"))
      .filter(length(col("term")) >= minTermLen)
    val df = terms.groupBy("grp", "term").agg(count(lit(1)).as("doc_freq"))
    df.withColumn("rnk", row_number().over(
        Window.partitionBy("grp").orderBy(col("doc_freq").desc, col("term"))))
      .filter(col("rnk") <= k)
      .select(col("grp").as(groupCol), col("term"), col("doc_freq"),
        col("rnk").cast("long").as("rnk"))
  }

  /** PMI collocation extraction — the classic corpus-linguistics
    * "significant word pair" measure: pointwise mutual information
    * ln(P(a,b) / (P(a)·P(b))) over adjacent-word bigrams, high when a
    * pair co-occurs far above chance ("machine learning", "new york").
    * A `minCount` floor drops the unstable low-count tail (the textbook
    * PMI failure mode: hapax pairs score highest), and the top-k is
    * selected by the TOTAL order (rounded PMI desc, then both terms) —
    * the bm25/tfidf float-tie discipline.
    *
    * Exactness: every ln argument is an exact integer-valued double
    * (the agg_entropy portable-ln discipline) and the six-term ln
    * combination is verbatim-mirrorable. Scale shape: bigrams generate
    * MAP-SIDE (one transform+explode projection, no per-doc window
    * shuffle); the only wide stages are the two count hash-aggs and the
    * vocabulary-keyed joins; totals are broadcast 1-row frames.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Int = 5, k: Int = 50): DataFrame = {
    val base = docs.select(words(col(textCol)).as("ws"))
    val uni = base.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val totals = base.agg(
      sum(size(col("ws"))).cast("long").as("nn"),
      sum(greatest(size(col("ws")) - 1, lit(0))).cast("long").as("bb"))
    val big = base.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))"))
        .as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("nab"))
      .filter(col("nab") >= minCount)
      .withColumn("term_a", substring_index(col("bg"), " ", 1))
      .withColumn("term_b", substring_index(col("bg"), " ", -1))
    val joined = big
      .join(uni.select(col("w").as("term_a"), col("n").as("na")), "term_a")
      .join(uni.select(col("w").as("term_b"), col("n").as("nb")), "term_b")
      .crossJoin(broadcast(totals))
    val pmi = log(col("nab").cast("double")) - log(col("bb").cast("double")) -
      log(col("na").cast("double")) - log(col("nb").cast("double")) +
      log(col("nn").cast("double")) + log(col("nn").cast("double"))
    joined.select(col("term_a"), col("term_b"), col("nab"),
        round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  // --------------------------------------------------------------------
  // Trained quality classifier: multinomial Naive Bayes over a hashed
  // vocabulary — the classic corpus-filter model (train "good" vs "bad"
  // source corpora, score the crawl; the same machinery classifies any
  // label column). Beside the Cavnar-Trenkle language ID this is the
  // second trained text model: NB's sufficient statistics are per-class
  // token counts — one hash-aggregate, additive across batches, bounded
  // by classes × buckets regardless of corpus size.
  // --------------------------------------------------------------------

  /** Stable hashed-vocabulary bucket for a token — the same md5-derived
    * integer trick as the LSH planes (portable, layout-independent).
    */
  def tokenBucket(w: Column, buckets: Int): Column =
    pmod(conv(substring(md5(w), 1, 15), 16, 10).cast("long"), lit(buckets.toLong))

  /** Fitted NB model: DENSE per-class log-probabilities over every hash
    * bucket (classes × buckets rows — complete, so serving never misses
    * an unseen bucket; the smoothed floor is materialized). Persistable
    * via toDF/fromDF like every other fitted model in the library.
    */
  final case class NbTextModel(buckets: Int,
      priors: Seq[(String, Double)], // (label, logPrior), label-sorted
      probs: Seq[(String, Long, Double)]) { // (label, bucket, logProb)

    /** Predicted label per doc: argmax over classes of
      * logPrior + Σ_tokens logProb[bucket(token)]. Relational serving
      * shape: explode tokens → broadcast-join the dense prob table →
      * one (doc, label) sum — no per-class literal arrays, no UDFs; at
      * 100 TB the only wide shuffle is the (doc, label) aggregation.
      * Docs whose text yields no tokens fall back to the max-prior label.
      */
    def classify(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      val probsDf = probs.toDF("lbl", "bk", "lp")
      val priorExpr = priors.foldLeft(lit(Double.NegativeInfinity)) {
        case (acc, (l, p)) => when(col("lbl") === l, lit(p)).otherwise(acc)
      }
      // drop the empty pseudo-token: words("") is [""], so without the
      // filter an empty/whitespace doc would be scored by the smoothed
      // noise at bucket(md5("")) instead of reaching the prior fallback.
      // Tokens reduce to (doc, bucket, cnt) BEFORE the prob join — the
      // doc-label sum is then Σ cnt·lp over ≤ min(tokens, buckets)
      // distinct-bucket terms instead of one term per occurrence: fewer
      // join rows, and few enough float adds that the DuckDB oracle's
      // independent recomputation agrees after round(_, 6) (the
      // portable-ln discipline — every ln input is an exact integer
      // count, mirrored term for term in SQL).
      val toks = docs.select(col(idCol), explode(words(col(textCol))).as("w"))
        .filter(col("w") =!= "")
        .select(col(idCol), tokenBucket(col("w"), buckets).as("bk"))
        .groupBy(col(idCol), col("bk")).agg(count(lit(1)).as("cnt"))
      val scored = toks.join(broadcast(probsDf), Seq("bk"))
        .groupBy(col(idCol), col("lbl"))
        .agg(sum(col("cnt") * col("lp")).as("ll"))
        .withColumn("score", col("ll") + priorExpr)
        .withColumn("rn", row_number().over(
          Window.partitionBy(idCol).orderBy(col("score").desc, col("lbl"))))
        .filter(col("rn") === 1)
        .select(col(idCol), col("lbl").as("label_pred"), col("score"))
      // ties → lowest label, mirroring the argmax window's tie-break
      val fallback = priors.minBy { case (l, p) => (-p, l) }._1
      docs.select(col(idCol))
        .join(scored, Seq(idCol), "left")
        .select(col(idCol), coalesce(col("label_pred"), lit(fallback)).as("label_pred"),
          col("score"))
    }

    /** Per-doc mean token log-probability under ONE class's distribution
      * — the perplexity-style quality gate (CCNet's shape: score the
      * crawl under a model fitted on a clean reference corpus; junk and
      * out-of-domain text land far below the reference's own range).
      * Fit the model single-class on the reference corpus for the pure
      * "LM filter" form; `perplexity = exp(-avg_logprob)` if a
      * perplexity axis is preferred. Same serving plan as classify —
      * explode → broadcast probs → one sum; docs with no tokens score
      * null (nothing to judge, distinct from "very unlikely").
      */
    def logLikelihood(docs: DataFrame, idCol: String, textCol: String,
        label: String): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      require(priors.exists(_._1 == label), s"model has no class '$label'")
      val probsDf = probs.filter(_._1 == label).map(p => (p._2, p._3))
        .toDF("bk", "lp")
      // same (doc, bucket, cnt) reduction as classify — see the
      // portable-ln note there; n_tokens = Σ cnt is integer-exact
      val toks = docs.select(col(idCol), explode(words(col(textCol))).as("w"))
        .filter(col("w") =!= "")
        .select(col(idCol), tokenBucket(col("w"), buckets).as("bk"))
        .groupBy(col(idCol), col("bk")).agg(count(lit(1)).as("cnt"))
      val scored = toks.join(broadcast(probsDf), Seq("bk"))
        .groupBy(col(idCol))
        .agg(sum(col("cnt")).cast("long").as("n_tokens"),
          (sum(col("cnt") * col("lp")) / sum(col("cnt"))).as("avg_logprob"))
      docs.select(col(idCol))
        .join(scored, Seq(idCol), "left")
        .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          col("avg_logprob"))
    }

    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      probs.toDF("label", "bucket", "log_prob")
        .withColumn("buckets", lit(buckets))
        .join(broadcast(priors.toDF("label", "log_prior")), Seq("label"))
    }
  }

  object NbTextModel {
    def fromDF(df: DataFrame): NbTextModel = {
      val rows = df.select("label", "bucket", "log_prob", "buckets", "log_prior")
        .collect()
      require(rows.nonEmpty, "empty NB model frame")
      val buckets = rows.head.getInt(3)
      val priors = rows.map(r => r.getString(0) -> r.getDouble(4))
        .distinct.sortBy(_._1).toSeq
      val probs = rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      NbTextModel(buckets, priors, probs)
    }
  }

  /** Fit multinomial NB with Laplace smoothing `alpha`. ONE token-count
    * shuffle on (label, bucket) — map-side partial counts, output bounded
    * by classes × buckets (the model-sized collect, never data-sized);
    * priors from one doc count per label. The count statistics are
    * additive, so refitting on a grown corpus merges trivially.
    */
  def fitNaiveBayes(docs: DataFrame, labelCol: String, textCol: String,
      buckets: Int = 1024, alpha: Double = 1.0): NbTextModel = {
    require(buckets > 0 && alpha > 0)
    val docCounts = docs.groupBy(col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(docCounts.nonEmpty, "no training docs")
    val totalDocs = docCounts.map(_._2).sum.toDouble
    val priors = docCounts.map { case (l, n) => l -> math.log(n / totalDocs) }.toSeq

    val counts = docs
      .select(col(labelCol).as("lbl"), explode(words(col(textCol))).as("w"))
      .filter(col("w") =!= "") // symmetric with classify's empty-token drop
      .select(col("lbl"), tokenBucket(col("w"), buckets).as("bk"))
      .groupBy("lbl", "bk").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totals = counts.toSeq.groupBy(_._1._1)
      .map { case (l, cs) => l -> cs.map(_._2).sum }
    val probs = for {
      (l, _) <- docCounts.toSeq
      b <- 0L until buckets.toLong
    } yield {
      val c = counts.getOrElse((l, b), 0L)
      val tot = totals.getOrElse(l, 0L)
      (l, b, math.log((c + alpha) / (tot + alpha * buckets)))
    }
    NbTextModel(buckets, priors, probs)
  }

  /** Per-document TextRank over fixed `segWords`-word segments (Mihalcea
    * & Tarau 2004, the integer fixed-point variant): segments are graph
    * nodes, edge weight = number of distinct words two segments share,
    * `iters` damped power iterations with pi₀ = 10⁶, damping 0.85 in
    * 10⁻³ fixed point, every division an integer floor. Returns the
    * top-ranked segment per doc (ties → smallest segment index).
    *
    * The graph is PER-DOCUMENT and tiny (≤ ~dozens of segments), so the
    * whole iteration runs inside one typed map over a per-doc row of
    * word→segment-set arrays: TWO skinny shuffles total (the
    * (doc, word) seg-set agg and the per-doc collect), zero per-
    * iteration exchanges. The previous relational form — a corpus-wide
    * segment self-join plus 8 iterations of global m⋈pi joins — was
    * correct but shuffled the whole corpus 10+ times per run; the 100×
    * scale probe measured >70 GB of shuffle on a 500 MB corpus before
    * filling the box's disk. Embarrassingly-parallel-by-doc work
    * belongs inside the row, not across the cluster.
    */
  def textrankTop(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10, iters: Int = 8, denseMax: Int = 1024): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // ids travel as STRINGS through the typed map and cast back to the
    // source column's type on exit: a long→string→long round trip is
    // lossless, and a string doc_id (non-numeric ids are legal) passes
    // through verbatim instead of casting to null and silently merging
    // every such doc into one graph
    val idType = docs.schema(idCol).dataType
    val perDoc = docs
      .select(col(idCol).cast("string").as("doc_id"),
        posexplode(words(col(textCol))).as(Seq("pos", "w")))
      .select(col("doc_id"), expr(s"pos div $segWords").as("seg"), col("w"))
      .groupBy("doc_id", "w").agg(collect_set(col("seg")).as("ss"))
      .groupBy("doc_id").agg(collect_list(col("ss")).as("wss"))
    perDoc.as[(String, Seq[Seq[Long]])].map { case (docId, wss) =>
      val segs = wss.flatten.distinct.sorted.toArray
      val idx = segs.zipWithIndex.toMap
      val k = segs.length
      // Edge accumulation: wt(i)(j) = #distinct words segments i and j
      // share. Dense k×k for ordinary docs; a sparse pair-keyed map past
      // denseMax segments — a pathological 1M-word doc (100k segments)
      // would otherwise allocate an 80 GB dense matrix inside one task.
      // Both paths are pure integer adds, so results are bit-identical
      // (spec'd: the sparse-forced run must equal the dense run).
      val dense = k <= denseMax
      val wt = if (dense) Array.ofDim[Long](k, k) else null
      val sparse = if (dense) null
        else new scala.collection.mutable.LongMap[Long]()
      val ws = new Array[Long](k) // out-strength
      wss.foreach { ss =>
        val is = ss.map(idx).toArray
        var i = 0
        while (i < is.length) {
          var j = 0
          while (j < is.length) {
            if (i != j) {
              if (dense) wt(is(i))(is(j)) += 1L
              else {
                val key = (is(i).toLong << 32) | is(j).toLong
                sparse.update(key, sparse.getOrElse(key, 0L) + 1L)
              }
              ws(is(i)) += 1L
            }
            j += 1
          }
          i += 1
        }
      }
      var pi = Array.fill(k)(1000000L)
      var it = 0
      while (it < iters) {
        val inflow = new Array[Long](k)
        if (dense) {
          var i = 0
          while (i < k) {
            if (ws(i) > 0L) {
              var j = 0
              while (j < k) {
                // per-edge integer floor division — bit-identical to the
                // SQL mirror's (pi * wt) div ws (all operands positive)
                if (wt(i)(j) > 0L) inflow(j) += pi(i) * wt(i)(j) / ws(i)
                j += 1
              }
            }
            i += 1
          }
        } else {
          sparse.foreachEntry { (key, w) =>
            val i = (key >>> 32).toInt
            val j = (key & 0xffffffffL).toInt
            inflow(j) += pi(i) * w / ws(i)
          }
        }
        pi = Array.tabulate(k)(j => 150000L + 850L * inflow(j) / 1000L)
        it += 1
      }
      var best = 0
      var i = 1
      while (i < k) { if (pi(i) > pi(best)) best = i; i += 1 }
      (docId, segs(best), pi(best))
    }.toDF("doc_id", "top_segment", "pi")
      .select(col("doc_id").cast(idType).as("doc_id"),
        col("top_segment"), col("pi"))
  }
}
