package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Dunning's t-digest (the MERGING variant): a bounded-size quantile
  * sketch whose centroids are kept small near the tails (scale function
  * k1(q) = δ/2π · asin(2q−1)), so extreme percentiles — exactly the
  * anomaly-threshold regime — stay accurate while memory is O(δ)
  * regardless of input size. Published algorithm (Dunning & Ertl,
  * "Computing extremely accurate quantiles using t-digests").
  *
  * Mutable, driver/executor-local; the Spark surface is
  * [[TDigestQuantile]].
  */
final class TDigest(val compression: Double) extends Serializable {
  require(compression >= 10, "compression must be >= 10")

  private val maxBuffered = math.max(32, (5 * compression).toInt)
  // sorted centroids after compress(); incoming points are buffered raw
  private var means = new Array[Double](16)
  private var weights = new Array[Double](16)
  private var n = 0
  private var bufMeans = new Array[Double](maxBuffered)
  private var bufWeights = new Array[Double](maxBuffered)
  private var bufN = 0
  private var total = 0.0

  def totalWeight: Double = total
  def centroidCount: Int = { compress(); n }

  def add(x: Double, w: Double = 1.0): Unit = {
    require(!x.isNaN && w > 0)
    if (bufN == maxBuffered) compress()
    bufMeans(bufN) = x; bufWeights(bufN) = w; bufN += 1
    total += w
  }

  def merge(other: TDigest): Unit = {
    other.compress()
    var i = 0
    while (i < other.n) {
      if (bufN == maxBuffered) compress()
      bufMeans(bufN) = other.means(i); bufWeights(bufN) = other.weights(i)
      bufN += 1
      total += other.weights(i)
      i += 1
    }
  }

  private def k(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  /** Fold the raw buffer into the centroid list: sort everything, then
    * greedily merge neighbors while the k1 bound allows — the standard
    * merging-digest compression.
    */
  def compress(): Unit = {
    if (bufN == 0) return
    val m = n + bufN
    val am = new Array[Double](m); val aw = new Array[Double](m)
    System.arraycopy(means, 0, am, 0, n); System.arraycopy(weights, 0, aw, 0, n)
    System.arraycopy(bufMeans, 0, am, n, bufN); System.arraycopy(bufWeights, 0, aw, n, bufN)
    val idx = (0 until m).sortBy(i => am(i))
    val outM = new Array[Double](m); val outW = new Array[Double](m)
    var out = 0
    var qLeft = 0.0
    var accM = am(idx.head) * aw(idx.head); var accW = aw(idx.head)
    for (j <- 1 until m) {
      val i = idx(j)
      val projected = (qLeft * total + accW + aw(i)) / total
      if (k(projected) - k(qLeft) <= 1.0) {
        accM += am(i) * aw(i); accW += aw(i)
      } else {
        outM(out) = accM / accW; outW(out) = accW; out += 1
        qLeft += accW / total
        accM = am(i) * aw(i); accW = aw(i)
      }
    }
    outM(out) = accM / accW; outW(out) = accW; out += 1
    means = outM; weights = outW; n = out; bufN = 0
  }

  /** Quantile estimate by linear interpolation between centroid centers
    * (each centroid spans [cum, cum + w), centered at cum + w/2).
    */
  def quantile(q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    compress()
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val center = cum + weights(i) / 2
      if (target < center) {
        if (i == 0) return means(0)
        val prevCenter = cum - weights(i - 1) / 2
        val f = (target - prevCenter) / (center - prevCenter)
        return means(i - 1) + f * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  def serialize(): Array[Byte] = {
    compress()
    val bb = ByteBuffer.allocate(8 + 4 + 16 * n)
    bb.putDouble(compression)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    val n = bb.getInt
    var i = 0
    while (i < n) { val m = bb.getDouble; val w = bb.getDouble; d.add(m, w); i += 1 }
    d
  }
}

/** `graft_tdigest_quantile(value, q[, compression])` — a native
  * TypedImperativeAggregate over the t-digest: constant memory per
  * group, mergeable across partitions (map-side partial sketches), and
  * usable in STRUCTURED STREAMING aggregations, which the exact
  * sort-based `percentile` cannot be. This is the streaming/100 TB
  * leg of the threshold-fitting story (`AnomalyMath.threshold` = exact
  * oracle-grade; `thresholdSketch` = this).
  */
case class TDigestQuantile(child: Expression, percentageExpr: Expression,
    compressionExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  def this(child: Expression, percentageExpr: Expression) =
    this(child, percentageExpr, Literal(100.0))

  override def children: Seq[Expression] = Seq(child, percentageExpr, compressionExpr)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tdigest_quantile"

  override def checkInputDataTypes(): TypeCheckResult = {
    // AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4 —
    // manual check, numeric children accepted (evaluated as double)
    if (!children.forall(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs numeric arguments, got " +
          children.map(_.dataType.sql).mkString(", "))
    else if (!percentageExpr.foldable || !compressionExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: percentage and compression must be constants")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def asDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
  }

  private lazy val percentage: Double = asDouble(percentageExpr.eval())
  private lazy val compression: Double = asDouble(compressionExpr.eval())

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) {
      val d = asDouble(v)
      // nulls and NaNs are absent values, matching percentile()'s contract
      if (!d.isNaN) buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: TDigest, input: TDigest): TDigest = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: TDigest): Any =
    if (buffer.totalWeight == 0) null else buffer.quantile(percentage)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantile =
    copy(child = newChildren(0), percentageExpr = newChildren(1),
      compressionExpr = newChildren(2))
}
