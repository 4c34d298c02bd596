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
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "of", "to", "and")): DataFrame = {
    // project the tokenization once — the expression is referenced five
    // times below and would otherwise re-split per reference
    val projected = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
      words(col(textCol)).as("__ws"))
    val ws = col("__ws")
    val nWords = size(ws)
    val nDistinct = size(array_distinct(ws))
    val nStop = size(filter(ws, w => w.isInCollection(stopwords)))
    projected.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      nDistinct.cast("long").as("n_distinct"),
      round(nStop * lit(1.0) / nWords, 6).as("stopword_ratio"),
      round(nDistinct * lit(1.0) / nWords, 6).as("ttr"),
      round(length(regexp_replace(col("__text"), " ", "")) * lit(1.0) / nWords, 6)
        .as("avg_word_len"))
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
}
