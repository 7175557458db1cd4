package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs, "best" =
  * higher score, ties broken toward the smaller id (matching
  * `ORDER BY score DESC, id ASC`). Binary min-heap with the *worst*
  * kept pair at the root for O(log k) eviction.
  */
final class TopKBuffer(val k: Int) {
  private[functions] var size = 0
  private[functions] val scores = new Array[Double](k)
  private[functions] val ids = new Array[Long](k)

  // a "worse-than" b under (score asc, id desc) — heap root is worst.
  // Double.compare gives total order with NaN greatest, matching
  // Spark's and DuckDB's DESC sort placement of NaN (e.g. 0/0 cosine
  // of a zero vector must rank first, not be silently dropped).
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs, best first (NaN greatest, as in SQL DESC). */
  def sortedDesc: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((s1, i1), (s2, i2)) =>
        val c = java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && i1 < i2)
      }
}

/** Partial top-k aggregate: `graft_topk_by_score(score, id, k)` keeps
  * only k (score, id) pairs per partition and merges k-sized buffers —
  * the scale-correct top-k-per-group. A `row_number()` window computes
  * the same answer but shuffles *every* scored row; at 10^9-candidate
  * ANN fan-outs that difference is the whole game. Returns
  * array<struct<score double, id bigint>> sorted best-first.
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects (double, bigint), got $other")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "topk_by_score"
}

/** String-keyed twin of [[TopKBuffer]]: k best (score, id) pairs with
  * ties toward the binary-smaller UTF8 string (`ORDER BY score DESC,
  * id ASC` — UTF8String.compareTo is byte-lexicographic, matching both
  * Spark's string sort and DuckDB's default collation). Kept separate
  * from the Long-specialized buffer so the ANN hot path stays
  * primitive-array-only.
  */
final class TopKStrBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  private[functions] var size = 0
  private[functions] val scores = new Array[Double](k)
  private[functions] val ids = new Array[UTF8String](k)

  private def worse(s1: Double, i1: UTF8String, s2: Double, i2: UTF8String): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1.compareTo(i2) > 0)
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** Whether add(score, id) would retain the pair — checked BEFORE
    * the caller pays a defensive copy of a row-buffer-aliased
    * UTF8String; on the scan path nearly every row loses to the heap
    * root and must not allocate. */
  def wouldAdmit(score: Double, id: UTF8String): Boolean =
    size < k || (k > 0 && worse(scores(0), ids(0), score, id))

  def add(score: Double, id: UTF8String): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      var i = size - 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }

  def merge(other: TopKStrBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs, best first (NaN greatest, as in SQL DESC). */
  def sortedDesc: Array[(Double, UTF8String)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((s1, i1), (s2, i2)) =>
        val c = java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && i1.compareTo(i2) < 0)
      }
}

/** `graft_topk_by_score_str(score, id, k)` — [[TopKByScore]] for
  * STRING ids: top-k ngrams/domains/tokens per group without a
  * `row_number()` window. The window shape is the corpus-stats scale
  * trap (round 3 verdict, q62): partitioned on a low-cardinality key
  * (~5 languages) it sorts every (group, term, count) row of a
  * language in ONE task; this aggregate moves k rows per partition
  * per group through the exchange instead. Returns
  * array<struct<score double, id string>> sorted best-first.
  */
case class TopKByScoreStr(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] {
  import org.apache.spark.unsafe.types.UTF8String

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score_str expects (double, string), got $other")
    }

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sc = s.asInstanceOf[Double]
      val id8 = i.asInstanceOf[UTF8String]
      // clone only on admission: the evaluated UTF8String may alias a
      // reused row buffer, but most rows lose to the heap root and
      // must not pay a per-row byte-array copy on the scan path
      if (buf.wouldAdmit(sc, id8)) buf.add(sc, id8.clone())
    }
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKStrBuffer): Any = {
    val rows: Array[Any] = buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    var bytes = 8
    var i = 0
    while (i < buf.size) { bytes += 12 + buf.ids(i).numBytes; i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.k).putInt(buf.size)
    i = 0
    while (i < buf.size) {
      val b = buf.ids(i).getBytes
      bb.putDouble(buf.scores(i)).putInt(b.length).put(b)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKStrBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val b = new Array[Byte](bb.getInt())
      bb.get(b)
      buf.add(s, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScoreStr =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "topk_by_score_str"
}
