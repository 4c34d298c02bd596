package graft.expressions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  private val prose =
    "the committee reviewed seventeen distinct proposals before narrowing " +
    "the field to a shortlist of four candidates with varied backgrounds"
  private val junk = "buy now " * 40
  private val noise = (0 until 200).map(i =>
    java.lang.Integer.toString(i * 2654435761L.toInt, 36)).mkString("")

  test("repetitive text compresses far below prose; noise barely compresses") {
    val out = Seq(("prose", prose), ("junk", junk), ("noise", noise))
      .toDF("kind", "text")
      .select(col("kind"), TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("junk") < 0.2, s"junk ratio ${out("junk")}")
    assert(out("prose") > out("junk") * 2, s"prose ${out("prose")} vs junk ${out("junk")}")
    assert(out("noise") > out("junk") * 2, s"noise ${out("noise")} vs junk ${out("junk")}")
    out.values.foreach(r => assert(r > 0.0 && r < 2.0, s"ratio $r out of sane bounds"))
  }

  test("empty text is 1.0 by definition; null in, null out") {
    val out = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.compressionRatio(col("text")).as("r"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 1.0)
    assert(out(1).isNullAt(1))
  }

  test("codegen path agrees with the interpreted static helper") {
    val viaPlan = Seq(Tuple1(prose)).toDF("text")
      .select(TextAnalysis.compressionRatio(col("text")).as("r"))
      .as[Double].head()
    val direct = DeflateRatio.ratio(
      prose.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(viaPlan == direct)
  }

  test("graft_deflate_ratio is SQL-registered") {
    // newSession: keep the SHARED session's registry pristine (the
    // extensions spec asserts the parent is untouched by registration)
    val s = spark.newSession()
    org.apache.spark.sql.graft.Bridge.registerFunctions(s)
    val r = s.sql(s"SELECT graft_deflate_ratio('${"ha " * 50}') AS r")
      .head().getDouble(0)
    assert(r < 0.3, s"sql ratio $r")
  }
}
