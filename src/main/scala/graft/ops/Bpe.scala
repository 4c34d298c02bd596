package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — train + encode, the real thing behind
  * `text_tokens`' "BPE-ish" token estimate (Sennrich et al. 2016, the
  * published subword algorithm LLM pipelines tokenize with).
  *
  * Scale split, by design:
  *   - TRAINING touches the corpus through ONE word-count shuffle; the
  *     merge loop itself runs on the driver over the top-`maxWords`
  *     word-frequency table (the standard practice — BPE is trained on a
  *     bounded vocabulary/sample, not streamed over petabytes; the
  *     Zipf head carries virtually all pair mass).
  *   - ENCODING is the 100 TB path: each DISTINCT word is encoded once
  *     (vocabulary ≪ corpus occurrences, again Zipf), in mapPartitions —
  *     the merge-rank loop is genuinely imperative, same justification
  *     class as the ESN recurrence — and occurrences get their tokens by
  *     an equi-join on the word (AQE broadcasts when the vocab is small).
  *
  * Determinism: pair-count ties break on the lexicographically smallest
  * pair, so a fit is a pure function of the word-frequency table.
  */
object Bpe {

  /** End-of-word sentinel appended to every symbol sequence — makes
    * "low " vs the "low" inside "lower" distinct merge contexts (the
    * paper's `</w>`).
    */
  val EndMark = "</w>"

  final case class BpeModel(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy encode: repeatedly merge the lowest-rank adjacent pair —
      * exactly the training merge order, so training words round-trip to
      * their final training segmentation.
      */
    def encodeWord(w: String): Seq[String] = {
      if (w.isEmpty) return Seq.empty
      var syms = Bpe.symbols(w) :+ EndMark
      var done = false
      while (!done && syms.size > 1) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < syms.size - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
        else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
      }
      syms
    }
  }

  /** Train `numMerges` merges. Corpus cost: one count shuffle + a
    * top-`maxWords` collect (bounded, freq-desc with word tie-break);
    * the loop is O(numMerges × vocab symbols) on the driver.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000): BpeModel = {
    require(numMerges > 0 && maxWords > 0)
    val wc = docs.select(explode(Dedup.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    var words: Array[(Vector[String], Long)] =
      wc.map { case (w, c) => (symbols(w) :+ EndMark, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, c) <- words; i <- 0 until syms.size - 1)
        pairCounts((syms(i), syms(i + 1))) += c
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.minBy { case (p, c) => (-c, p) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Initial symbols = Unicode CODE POINTS, not UTF-16 units: splitting
    * at char level would cut a supplementary-plane character (emoji, rare
    * CJK) into two lone surrogates, which UTF8String replaces with '?'
    * the moment a token crosses into a DataFrame — breaking the
    * round-trip on real multilingual text.
    */
  private[ops] def symbols(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def mergeOnce(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.size) {
      if (i < syms.size - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode every DISTINCT word of `words("w")` once: `(w, toks)`. */
  def encodeWords(model: BpeModel, words: DataFrame): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(model)
    words.select("w").distinct().as[String]
      .mapPartitions { it => val m = b.value; it.map(w => (w, m.encodeWord(w))) }
      .toDF("w", "toks")
  }

  /** Token stream per word occurrence: `(id, w, toks)` — aggregate
    * downstream (token counts, vocab stats, packing inputs). The join
    * attaches each occurrence's tokens from the once-per-distinct-word
    * encode table, which is MATERIALIZED (vocab-sized, cheap) so repeated
    * actions never re-run the distinct+encode subtree; AQE broadcasts it.
    * The occurrence side rescans the source per action like any lazy
    * plan — at scale a second columnar scan of one column is far cheaper
    * than shuffling (or caching) the full exploded occurrence stream,
    * which is why the plan joins rather than repartitioning by word.
    */
  def tokenize(model: BpeModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val occ = docs.select(col(idCol), explode(Dedup.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    occ.join(encodeWords(model, occ).localCheckpoint(), Seq("w"))
      .select(col(idCol), col("w"), col("toks"))
  }

  /** Per-doc BPE token counts beside the whitespace word count — the
    * trained replacement for `TextAnalysis.tokenCounts`' regex estimate.
    * EVERY input doc gets a row: a doc whose text yields no words counts
    * (0, 0) instead of silently vanishing from the output (per-doc
    * outputs must stay joinable against the corpus).
    */
  def tokenCounts(model: BpeModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val agg = tokenize(model, docs, idCol, textCol)
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(size(col("toks"))).cast("long").as("n_bpe_tokens"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
