package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** SURVEY §5.3 algebraic properties, checked on generated frames. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val rowGen = for {
    minute <- Gen.choose(0, 59)
    tag <- Gen.oneOf("a", "b")
    v <- Gen.choose(-1000.0, 1000.0)
  } yield (Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), tag, v)

  test("resample row count equals the number of non-empty (bucket, tag) groups") {
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val df = rows.toDF("ts", "tag", "value")
      val resampled = Timeseries.resample(df, "ts", "value", "10 minutes", Seq("tag"))
      val expected = rows.map { case (ts, tag, _) =>
        (ts.getTime / 600000L, tag)
      }.distinct.size
      resampled.count() == expected
    }, n = 10)
  }

  test("filter composition: filter(p) ∘ filter(q) ≡ filter(p AND q)") {
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val df = rows.toDF("ts", "tag", "value")
      val chained = Filters.rowFilter(Filters.rowFilter(df, "`value` > 0"), "`value` < 500")
      val conj = Filters.rowFilter(df, "`value` > 0 & `value` < 500")
      chained.count() == conj.count()
    }, n = 10)
  }

  test("union is associative on row multisets") {
    check(Prop.forAll(Gen.listOf(rowGen), Gen.listOf(rowGen), Gen.listOf(rowGen)) { (x, y, z) =>
      val (a, b, c) = (x.toDF("ts", "tag", "v"), y.toDF("ts", "tag", "v"), z.toDF("ts", "tag", "v"))
      a.unionByName(b).unionByName(c).count() == a.unionByName(b.unionByName(c)).count()
    }, n = 10)
  }

  test("align inner-join semantics: every kept bucket has all tags present") {
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val df = rows.toDF("ts", "tag", "value")
      val wide = Timeseries.align(df, "ts", "tag", "value", Seq("a", "b"), "10 minutes")
      wide.filter(col("a").isNull || col("b").isNull).count() == 0
    }, n = 10)
  }

  test("cusum closed form equals the clamped recursion on random series") {
    // 2-decimal values (the operator's quantization precondition)
    val seriesGen = Gen.nonEmptyListOf(
      Gen.choose(-50000, 50000).map(_ / 100.0)).map(_.take(40))
    val paramGen = for {
      target <- Gen.choose(-100, 100).map(_ / 10.0)
      slack <- Gen.choose(0, 50).map(_ / 10.0)
    } yield (target, slack)
    check(Prop.forAll(seriesGen, paramGen) { case (vs, (target, slack)) =>
      val df = vs.zipWithIndex.map { case (v, i) => ("t", i.toLong, v) }
        .toDF("tag", "i", "v")
      val got = AnomalyMath.cusum(df, "v", Seq("tag"), Seq(col("i")),
          target, slack, h = 1.0)
        .select("i", "cusum_up", "cusum_dn").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      // reference recursion over the SAME quantized units the operator uses
      def q(d: Double): Long = java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue.longValueExact
      var up = 0L; var dn = 0L
      vs.zipWithIndex.forall { case (v, i) =>
        up = math.max(0L, up + (q(v) - q(target + slack)))
        dn = math.max(0L, dn + (q(target - slack) - q(v)))
        got(i.toLong) == ((up / 1e6, dn / 1e6))
      }
    }, n = 15)
  }

  test("rollingAutocorr equals a direct Pearson over the trailing pairs") {
    val seriesGen = Gen.listOfN(20, Gen.choose(-50000, 50000).map(_ / 100.0))
    check(Prop.forAll(seriesGen, Gen.choose(2, 8)) { (vs, k) =>
      val df = vs.zipWithIndex.map { case (v, i) => ("t", i.toLong, v) }
        .toDF("tag", "i", "v")
      val got = AnomalyMath.rollingAutocorr(df, "v", Seq("tag"), Seq(col("i")), k)
        .select("i", "autocorr").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      def q(d: Double): Long = java.math.BigDecimal.valueOf(d)
        .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue.longValueExact
      val ks = vs.map(q)
      vs.indices.forall { t =>
        // pairs (x_{i-1}, x_i) for rows i in the trailing k-row frame
        val pairs = (math.max(1, t - k + 1) to t).map(i => (ks(i - 1), ks(i)))
        val n = pairs.length.toDouble
        val expected =
          if (pairs.length < 2) None
          else {
            val sx = pairs.map(_._2).sum.toDouble // x = current row's value
            val sy = pairs.map(_._1).sum.toDouble
            val num = n * pairs.map(p => p._1 * p._2).sum.toDouble - sx * sy
            val vx = n * pairs.map(p => p._2 * p._2).sum.toDouble - sx * sx
            val vy = n * pairs.map(p => p._1 * p._1).sum.toDouble - sy * sy
            if (vx * vy == 0.0) None else Some(num / math.sqrt(vx * vy))
          }
        (got(t.toLong), expected) match {
          case (None, None) => true
          case (Some(g), Some(e)) => math.abs(g - e) < 1e-9
          case _ => false
        }
      }
    }, n = 15)
  }

  test("duplicateClusters equals union-find components on random pair graphs") {
    // local union-find reference with path compression
    def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val pairGen = for {
      a <- Gen.choose(1L, 25L); b <- Gen.choose(1L, 25L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    check(Prop.forAll(Gen.nonEmptyListOf(pairGen)) { pairs =>
      val got = Dedup.duplicateClusters(pairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-by-min keeps the smaller root on every merge, so the final
      // root IS the component minimum — directly comparable
      got == components(pairs)
    }, n = 8)
  }

  test("BPE encode round-trips every word of an arbitrary training corpus") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
    val corpusGen = for {
      words <- Gen.nonEmptyListOf(wordGen)
      merges <- Gen.choose(1, 30)
    } yield (words, merges)
    check(Prop.forAll(corpusGen) { case (words, merges) =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val m = Bpe.train(docs, "text", numMerges = merges)
      // round-trip on training words AND on mutations never seen in training
      val probes = words ++ words.map(_.reverse) ++ Seq("zqjx")
      probes.forall { w =>
        val toks = m.encodeWord(w)
        toks.mkString.stripSuffix(Bpe.EndMark) == w && toks.nonEmpty
      }
    }, n = 10)
  }
}
