package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Jaro-Winkler similarity — the entity-resolution scoring
  * primitive (Winkler 1990, the US Census Bureau record-linkage metric).
  * Classic semantics, pinned against DuckDB's `jaro_winkler_similarity`
  * so the oracle compare is bit-exact:
  *
  *   - Jaro: match window `max(|a|,|b|)/2 − 1` (floor, min 0); matches
  *     are greedy left-to-right; transpositions are half the count of
  *     matched characters that differ in order;
  *     `jaro = (m/|a| + m/|b| + (m−t)/m) / 3`, 0 when m = 0.
  *   - Winkler boost ONLY when jaro > 0.7 (the classic boost threshold —
  *     verified against the oracle engine on sub-threshold prefixed
  *     pairs): `jw = jaro + min(prefix,4) · 0.1 · (1 − jaro)`.
  *
  * Codegen is a single static call ([[JaroWinkler.sim]]) inside
  * whole-stage codegen — the same shape as Spark's built-in
  * `levenshtein` (a static `UTF8String` helper), so a blocked
  * fuzzy-match join keeps one fused loop per candidate pair with zero
  * boxing. The helper walks UTF-16 chars of the decoded strings; the
  * scratch is two boolean arrays sized to the inputs, O(|a|·|b|) time —
  * fine because every caller bounds pair length (names, titles), and
  * the JOIN bounds pair COUNT by blocking before any scoring.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two strings, got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinkler.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static scoring helper referenced from generated code. */
  def sim(a: UTF8String, b: UTF8String): Double = simStr(a.toString, b.toString)

  def simStr(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk matched chars of both strings in order
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
