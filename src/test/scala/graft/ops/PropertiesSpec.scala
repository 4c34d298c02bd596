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
}
