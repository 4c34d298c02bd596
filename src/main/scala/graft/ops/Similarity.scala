package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity: exact cosine (sequential double fold, bit-portable
  * across engines), brute-force top-k search, and a random-hyperplane LSH
  * bucketing as the approximate scale path.
  *
  * North-star extension (not in the reference). Scale design:
  *   - top-k always broadcasts the (small) query set and streams the
  *     corpus — the corpus side never shuffles for scoring, only the
  *     per-query top-k reduction shuffles (tiny);
  *   - pairwise near-dup at 100 TB must NOT cross-join: route through
  *     `hyperplaneBuckets` (LSH) and re-score only within-bucket pairs;
  *   - all arithmetic is Column expressions inside codegen — no UDFs.
  */
object Similarity {

  /** Sequential-fold double dot product. `aggregate` folds left-to-right,
    * exactly like DuckDB's `list_sum` over the same array (verified
    * bit-identical), so results are deterministically portable without any
    * decimal arithmetic — and stay inside codegen.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm via the same sequential fold. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity — bit-exact across engines for identical float
    * arrays (same products, same fold order, IEEE doubles throughout).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** All pairs with cosine >= threshold. Quadratic — exact small-corpus
    * baseline and the within-bucket re-scorer for the LSH path.
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = vecs.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    val cos = cosine(col("va"), col("vb"))
    // Unrounded for the same reason as bruteForceTopK: identical doubles
    // on both engines; round(x, 6) could split half-way ties.
    a.join(b, col("vec_a") < col("vec_b"))
      .filter(cos >= threshold)
      .select(col("vec_a"), col("vec_b"), cos.as("cos_sim"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), ranked by similarity desc with id
    * tie-break. The query side is broadcast; the corpus streams.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val cos = cosine(col("qv"), col("nv"))
    val ranked = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cos.as("cos_raw"))
      .withColumn("rnk",
        row_number().over(Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("nid"))))
    // cos_sim stays unrounded: both engines derive bit-identical doubles,
    // while round(x, 6) can split on half-way ties (Spark HALF_UP on the
    // decimal expansion vs DuckDB's scaled-multiply rounding).
    ranked.filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("cos_raw").as("cos_sim"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Deterministic pseudo-random hyperplane component for (table t, plane
    * p, dim d): md5-derived value uniform in [-1, 1). Reproducible
    * everywhere without any RNG state.
    */
  private def planeComponent(t: Int, p: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(s"t${t}p$p#"), d)), 1, 15), 16, 10).cast("double")
      / lit(math.pow(2.0, 59)) - lit(1.0))

  /** Random-hyperplane LSH bucket for one table: the `nPlanes` sign bits
    * of deterministic hyperplane dot products, packed into a long.
    */
  private def bucketExpr(v: Column, table: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * planeComponent(table, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Single-table bucketing (table 0) — the building block; vectors in the
    * same bucket are near-neighbor candidates.
    */
  def hyperplaneBuckets(vecs: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 8): DataFrame =
    vecs.select(col(idCol), col(vecCol), bucketExpr(col(vecCol), 0, nPlanes).as("bucket"))

  /** Approximate near-neighbor pairs: `nTables` independent LSH tables
    * (candidate = same bucket in ANY table — recall 1-(1-p^k)^L like
    * MinHash banding), then exact re-score within buckets only. The scale
    * path for pairwise similarity: one narrow map to compute buckets, an
    * equi-join keyed on (table, bucket), never an all-pairs product.
    */
  def lshCosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 8, nTables: Int = 8): DataFrame = {
    val tb = vecs.select(col(idCol), col(vecCol),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("tbl"), bucketExpr(col(vecCol), t, nPlanes).as("bucket"))): _*)).as("b"))
      .select(col(idCol), col(vecCol), col("b.tbl").as("tbl"), col("b.bucket").as("bucket"))
    val a = tb.select(col("tbl"), col("bucket"), col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = tb.select(col("tbl").as("tbl_b"), col("bucket").as("bucket_b"),
      col(idCol).as("vec_b"), col(vecCol).as("vb"))
    val cand = a.join(b,
        col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b") &&
          col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b", "va", "vb")
      .distinct() // a pair can collide in several tables; score it once
    val cos = cosine(col("va"), col("vb"))
    cand.filter(cos >= threshold)
      .select(col("vec_a"), col("vec_b"), round(cos, 6).as("cos_sim"))
  }
}
