package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_anchors(text, gram, mod, spanLen)` — content-defined anchor
  * positions for substring-dedup fingerprinting: the 1-based CHAR
  * positions `p` where the polynomial rolling hash of the `gram` code
  * points starting at `p` mixes to ≡ 0 (mod `mod`), capped at
  * `max(len − spanLen + 1, 1)` so a `spanLen`-char fingerprint window
  * always fits.
  *
  * This is the production twin of [[graft.ops.Dedup.duplicatedSpans]]'
  * md5-per-position anchor scan (which pays one digest + one substring
  * allocation per corpus CHARACTER to stay DuckDB-oracle-portable): ONE
  * forward pass, O(1) per code point — the hash slides
  * (h·B + c_in − c_out·B^g), nothing allocates per position. Anchor
  * selection is a pure function of the local `gram` window either way,
  * so the alignment-free duplicate-detection guarantee is identical;
  * the two hash families simply select different (equally content-local)
  * anchor sets.
  *
  * The fifth native expression: codegen calls one static helper and the
  * row stays inside whole-stage codegen (no UDF boxing). gram/mod/spanLen
  * must be foldable positive ints — plan-time constants, like the LSH
  * plane literals.
  */
case class RollingAnchors(text: Expression, gram: Expression,
    mod: Expression, spanLen: Expression) extends QuaternaryExpression {

  override def first: Expression = text
  override def second: Expression = gram
  override def third: Expression = mod
  override def fourth: Expression = spanLen

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = text.nullable
  override def prettyName: String = "graft_anchors"

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string column")
    else if (!Seq(gram, mod, spanLen).forall(e =>
        e.dataType == IntegerType && e.foldable && e.eval() != null))
      // non-null required: a foldable NULL int would make the null-
      // intolerant eval return null while `nullable` (text-only) claims
      // non-null — parent codegen would then skip its null check and NPE
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs foldable non-null int gram/mod/spanLen")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(t: Any, g: Any, m: Any, sl: Any): Any =
    RollingAnchors.anchors(t.asInstanceOf[UTF8String],
      g.asInstanceOf[Int], m.asInstanceOf[Int], sl.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, g, m, sl) =>
      s"graft.expressions.RollingAnchors.anchors($t, $g, $m, $sl)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(text = newFirst, gram = newSecond, mod = newThird, spanLen = newFourth)
}

object RollingAnchors {

  /** Polynomial base — odd, large, the usual string-hash choice; 64-bit
    * wraparound arithmetic makes the sliding subtraction exact.
    */
  private val B = 0x100000001b3L // the FNV prime: odd, well-dispersed

  /** splitmix64 finalizer — the raw polynomial's low bits are too regular
    * for a `% mod` test (consecutive integers would anchor periodically);
    * the mix makes anchor selection behave like a 1/mod Bernoulli draw on
    * content.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static helper the generated code calls. One pass over the code
    * points (positions are CODE-POINT positions, matching Spark's
    * `substr` semantics for supplementary-plane safety), O(1) work per
    * step, one int array of output positions — no per-position substring
    * or digest allocation.
    */
  def anchors(text: UTF8String, gram: Int, mod: Int, spanLen: Int): ArrayData = {
    require(gram > 0 && mod > 0 && spanLen > 0,
      s"graft_anchors needs positive gram/mod/spanLen, got $gram/$mod/$spanLen")
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < gram) return new GenericArrayData(Array.emptyIntArray)
    val maxStart = math.max(n - spanLen + 1, 1) // 1-based cap
    // B^(gram-1) with wraparound — exact under the same modulus 2^64
    var bg = 1L
    var i = 1
    while (i < gram) { bg *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < gram) { h = h * B + cps(i); i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var p = 0 // 0-based window start; nothing past maxStart can emit, so
    // don't slide the hash through the dead tail (over half the per-doc
    // work for short documents at the default spanLen)
    while (p < maxStart && p + gram <= n) {
      if (java.lang.Long.remainderUnsigned(mix(h), mod) == 0L)
        out += p + 1
      if (p + gram < n) h = (h - cps(p) * bg) * B + cps(p + gram)
      p += 1
    }
    new GenericArrayData(out.toArray)
  }
}
