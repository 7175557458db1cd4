package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The actual byte decoding (JPEG/WAV/MP4 parsing) requires media
  * libraries not present in this environment, so `Decoder` is the
  * extension point and `StubDecoder` is a clearly-marked deterministic
  * fake. Everything Spark-side — the binary schema, the mapPartitions
  * batch shape (the JVM analogue of a Pandas-UDF iterator-of-batches),
  * metadata structs, and the partitioning guidance — is real and
  * tested.
  *
  * Scale notes: binaries are heavy; always project/aggregate metadata
  * *before* any shuffle, never groupBy/join on a plan that carries the
  * binary column through an exchange. Decode is CPU-bound and
  * embarrassingly parallel: size input partitions by bytes
  * (spark.sql.files.maxPartitionBytes), not row count.
  */
object Multimodal {

  /** Typed metadata produced per asset. */
  case class MediaMeta(n_bytes: Long, format: String, width: Int, height: Int,
                       n_frames: Int, valid: Boolean)

  /** Decode extension point — one call per asset, invoked inside
    * mapPartitions so implementations can amortize per-batch setup
    * (codec contexts, model handles) across a partition. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** STUB: deterministic fake decode (no media libs in this env).
    * Derives plausible dimensions from the byte content so tests are
    * stable. Swap for a real JPEG/PNG/WAV parser in production. */
  object StubDecoder extends Decoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.isEmpty)
        return MediaMeta(0L, "empty", 0, 0, 0, valid = false)
      val fmt = bytes(0) match {
        case b if (b & 0xff) == 0xff => "jpeg-like"
        case b if (b & 0xff) == 0x89 => "png-like"
        case _ => "raw"
      }
      val n = bytes.length
      MediaMeta(n.toLong, fmt, 64 + n % 576, 64 + (n * 7) % 416, 1 + n % 29,
        valid = true)
    }
  }

  private val metaSchema = ScalaReflection.metaStruct

  private object ScalaReflection {
    val metaStruct: StructType = StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("valid", BooleanType, nullable = false)))
  }

  /** Attach decoded metadata for a binary column, batch-wise per
    * partition. The binary column itself is passed through untouched;
    * callers should `.drop(binCol)` before any wide operation. */
  def withDecodedMeta(df: DataFrame, binCol: String,
                      decoder: Decoder = StubDecoder,
                      out: String = "media_meta"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(out, metaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = decoder.decode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ Row(m.n_bytes, m.format, m.width, m.height,
          m.n_frames, m.valid))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `stride`-th frame of n_frames). The Spark-side shape of video
    * frame extraction — the explode happens before decode so each
    * frame decode can be distributed independently. */
  def sampleFrames(df: DataFrame, metaCol: String, stride: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col(s"$metaCol.n_frames") - 1, lit(0)),
          lit(stride))))

  /** Partition-level byte budget: repartition assets so each task
    * handles roughly `targetBytes` of media (decode-time balancing —
    * row-count partitioning would skew on mixed asset sizes). */
  def repartitionByBytes(df: DataFrame, binCol: String, targetBytes: Long): DataFrame = {
    val row = df.agg(sum(octet_length(col(binCol)).cast("long"))).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0) // empty/all-null input
    val parts = math.max(1, (total / math.max(1L, targetBytes)).toInt)
    df.repartition(parts)
  }
}
