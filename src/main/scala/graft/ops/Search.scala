package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical relevance search over a document corpus — BM25, the ranking
  * function behind every classic retrieval stack (and the lexical half of
  * hybrid retrieval next to [[Similarity]]'s dense ANN). A training-data
  * pipeline uses the same scorer for corpus triage: "rank the crawl
  * against this topic query" without an embedding pass.
  *
  * Okapi BM25 with the standard (k1=1.2, b=0.75) defaults:
  *   idf(t)     = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
  *   score(d,q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *
  * Spark-first shape — the inverted-index build as declarative algebra:
  * ONE tokenize-explode scan of the corpus feeds both the per-doc length
  * table and the postings; the query-term filter lands BEFORE the
  * tf groupBy (postings for non-query terms never shuffle — at 100 TB the
  * shuffle is |matching postings|, not |tokens|); df and the corpus stats
  * are tiny aggregates joined back by broadcast. No UDFs — tokenization is
  * `regexp_extract_all`, the rest is codegen'd column math.
  */
object Search {

  /** (doc_id, term) token stream — lowercased alphanumeric runs, one row
    * per occurrence. The DuckDB oracle mirrors it verbatim
    * (`unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))`).
    */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("term"))

  /** Per-document TF-IDF top-k terms — the classic document-signature /
    * keyword-extraction primitive (what "this doc is about X" audits and
    * sparse retrieval indexes store). Smooth idf (the sklearn form):
    * idf(t) = ln((N+1)/(df(t)+1)) + 1, score = tf·idf, top k per doc by
    * (rounded score desc, term) — a TOTAL order, so ranking is
    * cross-engine deterministic. Plan: one tokenize-explode → (doc,term)
    * tf groupBy → term df groupBy (vocabulary-sized) joined back → one
    * doc-partitioned rank window. All shuffles keyed; nothing global.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    // ONE explode instead of three (round 14): tf rows are distinct
    // (doc, term) by construction, so df(term) is a plain count window
    // over term (the text_novelty shape — no second tokenize pass, no
    // vocabulary join), and N (docs with ≥ 1 token) is a scan-side
    // size() count that never explodes at all. Values identical.
    val n = docs.agg(sum(when(size(regexp_extract_all(
        lower(col(textCol)), lit("[a-z0-9]+"), lit(0))) > 0, 1L)
      .otherwise(0L)).as("__n"))
    tf.withColumn("__df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("__tf") *
        (log((col("__n") + lit(1.0)) / (col("__df") + lit(1.0))) + lit(1.0)), 6))
      .withColumn("rnk", row_number().over(Window.partitionBy(idCol)
        .orderBy(col("tfidf").desc, col("term"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("tfidf"))
  }

  /** Full BM25 ranking of the corpus against `query` terms: one row per
    * document matching ≥1 term — (idCol, bm25 DOUBLE rounded to 6).
    * Emitted for EVERY matching doc ordered by id (a top-k is a `limit`
    * away; the full ranking keeps the result set deterministic under
    * cross-engine float ties, which a score-ordered limit is not).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = tokens(docs, idCol, textCol)
    // per-doc length WITHOUT a second tokenize-explode-shuffle pass
    // (round 14): |d| is size() of the same extraction, a scan-side
    // projection; the > 0 filter reproduces the groupBy's row set
    // exactly (a token-less doc had no toks rows, hence no dl row).
    val dl = docs.select(col(idCol), size(regexp_extract_all(
        lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).cast("long").as("__dl"))
      .filter(col("__dl") > 0)
    val stats = dl.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    // normalize the query with the SAME tokenization as the corpus: a
    // capitalized or hyphenated query term would otherwise silently match
    // nothing ("Training" vs the lowercased postings; "machine-learning"
    // becomes the two tokens it indexes as)
    val q = query.flatMap(_.toLowerCase.split("[^a-z0-9]+"))
      .filter(_.nonEmpty).distinct.toDF("term")
    val tf = toks.join(broadcast(q), Seq("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    val df = tf.groupBy("term").agg(countDistinct(idCol).as("__df"))
    val idf: Column =
      log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__sterm",
        idf * col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(idCol)
      .agg(round(sum(col("__sterm")), 6).as("bm25"))
  }
}
