package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise vector-sum buffer: a dims-length running sum plus the
  * accumulated row count. On ragged input the aggregate sums the rows
  * of the MAXIMAL length present and skips shorter ones (and empty
  * ones) — "longest length wins" is commutative and associative across
  * both per-row adds and buffer merges, so the result is independent
  * of partitioning and merge order (the repo's bit-identical-across-
  * parallelism invariant; a "first length seen wins" rule would be
  * schedule-dependent). Malformed rows degrade the count, never the
  * job — a bad row must not kill a 100 TB scan.
  */
final class VectorSumBuffer {
  private[functions] var n: Long = 0L
  private[functions] var sums: Array[Double] = null

  def add(v: ArrayData): Unit = {
    val len = v.numElements()
    if (len > 0) {
      if (sums == null || len > sums.length) { sums = new Array[Double](len); n = 0L }
      if (sums.length == len) {
        var i = 0
        while (i < len) { sums(i) += v.getDouble(i); i += 1 }
        n += 1
      }
    }
  }

  def merge(other: VectorSumBuffer): Unit = {
    if (other.sums != null) {
      if (sums == null || other.sums.length > sums.length) {
        sums = other.sums.clone(); n = other.n
      } else if (sums.length == other.sums.length) {
        var i = 0
        while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
        n += other.n
      } // shorter-length buffer: dropped (longest length wins)
    }
  }
}

/** Partial elementwise vector sum: `graft_vector_sum(vec)` over an
  * `array<double>` column returns `struct<sum array<double>, n bigint>`.
  *
  * This is the scale-correct shape for centroid math: each partition
  * accumulates ONE dims-length array and the exchange moves one buffer
  * per partition per group — versus the posexplode + groupBy(dim)
  * formulation, which pushes n x dims rows through the shuffle (64x
  * row amplification for 64-dim embeddings, the q36 round-2 caveat).
  * Same pattern as [[TopKByScore]].
  */
case class VectorSum(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSumBuffer] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sum", ArrayType(DoubleType, containsNull = false)),
    StructField("n", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum expects array<double>, got $other")
  }

  override def createAggregationBuffer(): VectorSumBuffer = new VectorSumBuffer

  override def update(buf: VectorSumBuffer, input: InternalRow): VectorSumBuffer = {
    val v = vec.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VectorSumBuffer, other: VectorSumBuffer): VectorSumBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: VectorSumBuffer): Any =
    if (buf.sums == null) null
    else InternalRow(new GenericArrayData(buf.sums.map(x => x: Any)), buf.n)

  override def serialize(buf: VectorSumBuffer): Array[Byte] = {
    val len = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(12 + math.max(len, 0) * 8)
    bb.putLong(buf.n).putInt(len)
    var i = 0
    while (i < len) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VectorSumBuffer
    buf.n = bb.getLong()
    val len = bb.getInt()
    if (len >= 0) {
      buf.sums = new Array[Double](len)
      var i = 0
      while (i < len) { buf.sums(i) = bb.getDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSum =
    copy(vec = c(0))
  override def prettyName: String = "vector_sum"
}
