package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"), // case dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different words entirely here now today"),
    (5L, "ab") // shorter than one shingle
  ).toDF("doc_id", "text")

  test("exact dedup groups case-normalized duplicates under the min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("canonical_id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[Long]("canonical_id") == 1L)
    assert(out(0).getAs[Long]("n_members") == 2L)
  }

  test("shingles produces word 3-grams and is empty for short docs") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(Dedup.words(col("text"))).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(sh(1L).head == "the quick brown")
    assert(sh(1L).length == 7) // 9 words -> 7 shingles
    assert(sh(5L).isEmpty)
  }

  test("minhash LSH finds the case dup and the near dup, not the unrelated doc") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical normalized docs share a signature; hamming small for near dups") {
    val sig = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L)) // case-insensitive tokens identical
    val hamming = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    assert(hamming <= 15, s"near-dup hamming was $hamming")
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(4L)) > hamming)
  }

  test("nearDuplicates (LSH -> exact re-score) agrees with all-pairs jaccard on its candidates") {
    val viaLsh = Dedup.nearDuplicates(docs, "doc_id", "text", 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // no false positives, identical scores on recovered pairs
    viaLsh.foreach { case (pair, j) => assert(exact(pair) == j) }
    assert(viaLsh.contains((1L, 2L)))
  }

  test("incremental near-dup over a new batch equals the full-corpus run") {
    import spark.implicits._
    val batch2 = Seq(
      (6L, "the quick brown fox jumps over the lazy dog today"), // near dup of 1/2/3
      (7L, "nothing in common with anything else at all whatsoever")
    ).toDF("doc_id", "text")
    val all = docs.unionByName(batch2)
    val full = Dedup.nearDuplicates(all, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val existingPairs = Dedup.nearDuplicates(docs, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incr = Dedup.incrementalNearDuplicates(all,
        Dedup.bandTable(docs, "doc_id", "text"), batch2, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // processing only the new batch reproduces exactly the full run
    assert(existingPairs.union(incr) == full, s"existing=$existingPairs incr=$incr full=$full")
    // and the incremental pairs all involve a new doc
    assert(incr.forall { case (a, b, _) => a >= 6L || b >= 6L })
  }

  test("duplicateClusters assigns every node the component-min canonical id") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {7,9}, isolated pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L, 20L -> 20L, 21L -> 20L))
    // a long chain still converges (min travels one hop per round)
    val chain = (1L to 15L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    val chainOut = Dedup.duplicateClusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainOut.values.forall(_ == 1L))
  }

  test("maxDocFreq drops corpus-boilerplate shingles before pair generation") {
    import spark.implicits._
    // "x y z" appears in every doc (df=4) + each doc has a unique tail
    val boiler = Seq(
      (1L, "x y z a1 b1 c1"), (2L, "x y z a2 b2 c2"),
      (3L, "x y z a3 b3 c3"), (4L, "x y z a4 b4 c4")).toDF("doc_id", "text")
    val capped = Dedup.shingleTable(boiler, "doc_id", "text", maxDocFreq = 3)
    assert(!capped.select("s").distinct().as[String].collect().contains("x y z"))
    // with the hot shingle capped, the only shared shingle is gone -> no pairs
    assert(Dedup.ngramJaccardPairs(boiler, "doc_id", "text", 0.1, maxDocFreq = 3).isEmpty)
    // uncapped, every pair shares "x y z"
    assert(!Dedup.ngramJaccardPairs(boiler, "doc_id", "text", 0.1).isEmpty)
  }

  test("duplicateClusters works with string doc ids (lexicographic min label)") {
    import spark.implicits._
    val pairs = Seq(("docB", "docA"), ("docB", "docC"), ("z1", "z2"))
      .toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA",
      "z1" -> "z1", "z2" -> "z1"))
  }

  test("the DEFAULT df cap is finite and engages without being asked for") {
    import spark.implicits._
    assert(Dedup.DefaultMaxDocFreq < Int.MaxValue)
    // one boilerplate shingle shared by cap+1 docs: the default-capped run
    // must refuse to explode it into ~cap²/2 pairs
    val n = Dedup.DefaultMaxDocFreq + 1
    val boiler = (1 to n).map(i => (i.toLong, "x y z")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(boiler, "doc_id", "text", 0.1).isEmpty)
    assert(Dedup.shingleTable(boiler, "doc_id", "text").isEmpty)
    // and the explicit opt-out still explodes
    assert(!Dedup.ngramJaccardPairs(boiler, "doc_id", "text", 0.1,
      maxDocFreq = Int.MaxValue).isEmpty)
  }

  test("ngram jaccard scores the near dup high and excludes disjoint docs") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out.contains((1L, 3L)))
    assert(out((1L, 3L)) > 0.3 && out((1L, 3L)) < 1.0)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("containmentPairs flags the subset duplicate Jaccard misses") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon"
    val long = short + " zeta eta theta iota kappa lambda mu nu xi omicron " +
      "pi rho sigma tau upsilon phi chi psi omega one two"
    val corpus = Seq((1L, short), (2L, long), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    // doc 1's shingles all appear in doc 2 -> containment 1.0 for A
    val cont = Dedup.containmentPairs(corpus, "doc_id", "text", 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(cont.contains((1L, 2L)))
    assert(cont((1L, 2L))._1 == 1.0) // A fully inside B
    assert(cont((1L, 2L))._2 < 0.5)  // B mostly NOT inside A
    // ... while Jaccard at the same confidence bar misses the pair
    val jac = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)))
    // disjoint docs never pair either way
    assert(!cont.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("fuzzyPairs matches within blocks by edit distance, never across") {
    import spark.implicits._
    val people = Seq(
      (1L, "smith, john"), (2L, "smith, jon"),   // dist 1, same block 's'
      (3L, "smyth, john"),                       // dist 1 from #1, block 's'
      (4L, "jones, mary"), (5L, "jones, marie"), // dist 2, block 'j'
      (6L, "smith, john")                        // exact dup of #1, block 's'
    ).toDF("id", "name")
    val blk = org.apache.spark.sql.functions.substring(
      org.apache.spark.sql.functions.col("name"), 1, 1)
    val out = Dedup.fuzzyPairs(people, "id", "name", blk, maxDist = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(out((1L, 2L)) == 1L && out((1L, 3L)) == 1L && out((1L, 6L)) == 0L)
    assert(out((4L, 5L)) == 2L)
    // 2-3: "smith, jon" vs "smyth, john" = 2 edits -> present at maxDist 2
    assert(out.contains((2L, 3L)))
    // nothing pairs across the s/j blocks even when distance would allow it
    assert(!out.keys.exists { case (a, b) => Set(a, b) == Set(1L, 4L) })
    // tighter cap drops the dist-2 pairs
    val tight = Dedup.fuzzyPairs(people, "id", "name", blk, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == Set((1L, 2L), (1L, 3L), (1L, 6L), (2L, 6L), (3L, 6L)))
  }
}
