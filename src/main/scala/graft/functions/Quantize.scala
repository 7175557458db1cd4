package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 scalar quantization for embedding
  * columns — the standard 4x storage/bandwidth reduction for vector
  * corpora (float32 -> int8): scale = max|x| / 127, code_i =
  * round(x_i / scale) in [-127, 127]. Zero/empty vectors quantize to
  * scale 1.0 with all-zero codes (no 0/0).
  *
  * Rounding is HALF-AWAY-FROM-ZERO (`copySign(floor(|v| + 0.5), v)`),
  * matching both Spark SQL's and DuckDB's `round()` so the driver
  * oracle can mirror the arithmetic exactly.
  *
  * One fused per-row loop (the transform/array_max lambda composition
  * is interpreted per element — the q36/SimHash lesson). CodegenFallback:
  * the dims-length loop is the row's entire work, like
  * [[NearestCentroids]].
  */
case class Int8Quantize(vec: Expression)
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize expects array<double>, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false))))
  override def prettyName: String = "int8_quantize"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(x.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs > 0) maxAbs / 127.0 else 1.0
    val codes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val v = x.getDouble(i) / scale
      codes(i) = Math.copySign(Math.floor(Math.abs(v) + 0.5), v).toByte
      i += 1
    }
    InternalRow(scale, ArrayData.toArrayData(codes))
  }

  override protected def withNewChildInternal(c: Expression): Int8Quantize =
    copy(vec = c)
}

/** Inverse of [[Int8Quantize]]: struct(scale, codes) ->
  * array<double> of code_i * scale. Reconstruction error per element
  * is bounded by scale/2. */
case class Int8Dequantize(q: Expression)
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = q

  override def checkInputDataTypes(): TypeCheckResult = q.dataType match {
    case StructType(Array(StructField(_, DoubleType, _, _),
                          StructField(_, ArrayType(ByteType, _), _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_dequantize expects struct<scale double, codes array<tinyint>>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "int8_dequantize"

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val scale = row.getDouble(0)
    val codes = row.getArray(1)
    val n = codes.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = codes.getByte(i) * scale; i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Int8Dequantize =
    copy(q = c)
}

/** Asymmetric int8-x-float cosine: similarity between a QUANTIZED
  * corpus vector (struct<scale, codes> from [[Int8Quantize]]) and a
  * float query vector, without dequantizing — the scan-bandwidth form
  * of quantized ANN scoring (the index reads 1/4 the bytes and the
  * hot loop is int8 loads + double FMA).
  *
  * The positive per-vector scale cancels out of cosine
  * (cos(s·c, v) == cos(c, v)), so the scorer ignores it and
  * accumulates raw code products: dot = Σ code_i·v_i,
  * ||c|| = sqrt(Σ code_i²). Mathematically equal to the cosine of
  * the dequantized vector; numerically within a few ulp (scale
  * factors out of each sum only up to IEEE rounding — the spec pins
  * agreement at 1e-12). Length mismatch returns NULL (corrupt codes
  * must not pass as a truncated similarity); zero-norm inputs yield
  * NaN/Inf, never an ANSI error. CodegenFallback: the dims-length
  * loop is the row's entire work.
  */
case class Int8CosineSim(q: Expression, vec: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def left: Expression = q
  override def right: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult =
    (q.dataType, vec.dataType) match {
      case (StructType(Array(StructField(_, DoubleType, _, _),
                             StructField(_, ArrayType(ByteType, _), _, _))),
            ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"int8_cosine expects (struct<scale double, codes array<tinyint>>, array<double>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_cosine"

  override protected def nullSafeEval(qv: Any, v: Any): Any = {
    val codes = qv.asInstanceOf[InternalRow].getArray(1)
    val x = v.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != x.numElements()) return null
    var dot = 0.0; var nc = 0.0; var nx = 0.0
    var i = 0
    while (i < n) {
      // a null element would read as 0.0 and silently skew the score;
      // surface corrupt input as NULL (same contract as length mismatch)
      if (codes.isNullAt(i) || x.isNullAt(i)) return null
      val c = codes.getByte(i).toDouble
      val xi = x.getDouble(i)
      dot += c * xi; nc += c * c; nx += xi * xi
      i += 1
    }
    dot / (math.sqrt(nc) * math.sqrt(nx))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8CosineSim =
    copy(q = l, vec = r)
}
