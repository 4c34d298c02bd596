package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_deflate_ratio(text)` — compressed/raw byte ratio under DEFLATE,
  * the compressibility quality signal of published web-corpus pipelines
  * (Gopher/MassiveText-family curation: machine-generated and highly
  * repetitive text compresses far below natural prose, so a low ratio is
  * a cheap, language-agnostic junk gate; the complementary high-ratio
  * tail flags binary-ish noise that barely compresses).
  *
  * A native unary expression whose codegen calls one static helper — the
  * row stays inside whole-stage codegen like any builtin (no UDF
  * serialization, no Row boxing). Deflate runs at the default level with
  * a per-call Deflater; the work is O(bytes) per row, embarrassingly
  * row-local, nothing to shuffle — the right 100 TB shape for a scan
  * gate. Spark-only verification (the oracle engine has no zlib surface;
  * monotonicity and bounds are spec'd instead).
  *
  * Null in → null out; empty text → 1.0 by definition (nothing to
  * compress — neutral, not infinitely compressible).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string or binary column, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => DeflateRatio.ratio(v.asInstanceOf[UTF8String].getBytes)
    case _ => DeflateRatio.ratio(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"graft.expressions.DeflateRatio.ratio($c.getBytes())"
      case _ => s"graft.expressions.DeflateRatio.ratio($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {

  /** Static helper the generated code calls (Scala emits a static
    * forwarder on the companion class, so this is a plain Java static
    * call inside codegen). Deterministic for a given payload: fixed
    * level, fixed zlib-wrapped framing (`Deflater(level)` is nowrap=false,
    * so the ratio includes the 2-byte zlib header + 4-byte Adler32 —
    * constant per payload, irrelevant to the compressibility signal),
    * single-shot deflate.
    */
  def ratio(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}
