package graft.sources

import java.sql.Timestamp

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based codec guarantees: format→parse is the identity for any
  * point whose tag respects the wire contract (printable, newline-free —
  * the line protocol's record separator is the newline, so tags
  * containing one are unrepresentable in the format itself, exactly as
  * in the public spec).
  */
class LineProtocolPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // printable ASCII incl. every escape-relevant char, no newline/CR
  private val charGen: Gen[Char] =
    Gen.frequency(
      3 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ',', '=', '\\', '"', '\'', '#', '|'))

  private val tagGen: Gen[String] =
    Gen.nonEmptyListOf(charGen).map(_.mkString).suchThat(_.trim.nonEmpty)

  private val pointGen: Gen[(Long, String, Double)] = for {
    us <- Gen.choose(0L, 4102444800000000L) // 1970..2100 in µs
    tag <- tagGen
    v <- Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.oneOf(0.0, -0.0, 1e-300, -1e300,
      Double.MaxValue, Double.MinPositiveValue))
  } yield (us, tag, v.asInstanceOf[Double])

  test("format -> parse is the identity on arbitrary wire-legal points") {
    check(Prop.forAll(Gen.nonEmptyListOf(pointGen)) { pts =>
      val df = pts.zipWithIndex.map { case ((us, tag, v), i) =>
        (Timestamp.from(java.time.Instant.ofEpochSecond(
          us / 1000000L, (us % 1000000L) * 1000L)),
          s"$i#$tag", v) // unique prefix: identity check is per-point
      }.toDF("ts", "tag", "value")
      val back = LineProtocol.parseLines(LineProtocol.toLines(df, "m"), "m")
      val a = df.orderBy("tag").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq
      val b = back.orderBy("tag").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq
      a == b
    }, n = 15)
  }
}
