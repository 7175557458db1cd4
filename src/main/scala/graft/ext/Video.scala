package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Video-column plumbing with REAL frame extraction: a minimal
  * length-prefixed frame container ([[Container]] — the structural
  * skeleton of MJPEG/AVI-style formats: magic + frame count + one
  * length-prefixed payload per frame), a deterministic synthetic
  * generator whose frames are real BMPs an SQL oracle replays
  * pixel-exactly, and [[extractFrames]] — the explode-then-decode
  * shape of video frame sampling where each sampled frame becomes its
  * own row BEFORE pixel work, so decode/resize/checksum distribute
  * per frame, not per video.
  *
  * This upgrades [[Multimodal.sampleFrames]] (metadata-level index
  * explosion) to the real thing: sampled frame PAYLOADS surface as
  * binary rows that flow straight into the existing pixel operators
  * ([[Multimodal.withDecodedMeta]], [[Multimodal.withBmpPixelChecksum]],
  * [[Multimodal.resizeBmp]]). Codec-compressed containers (MP4/H.264)
  * need a library not in this container and plug in behind the same
  * two seams: a container walk that yields per-frame bytes, and a
  * per-frame payload decoder.
  *
  * Scale notes: sampling happens INSIDE the container walk (skipped
  * frames are seeked over by their length prefix, never materialized),
  * the explode multiplies rows before any exchange so frame work needs
  * no shuffle at all, and videos are heavy — feed this through
  * [[Multimodal.repartitionByBytes]] and project frame bytes away
  * before anything wide.
  */
object Video {

  /** "GVID" container codec: magic `GVID`, be32 frame count, then per
    * frame be32 payload length + payload bytes. Truncated or
    * non-matching input yields None — corrupt assets must not kill a
    * scan. */
  object Container {

    private def be32b(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val total = 8L + frames.map(f => 4L + f.length).sum
      require(total <= Int.MaxValue, "container exceeds 2^31-1 bytes")
      val out = new java.io.ByteArrayOutputStream(total.toInt)
      out.write('G'); out.write('V'); out.write('I'); out.write('D')
      out.write(be32b(frames.size))
      frames.foreach { f => out.write(be32b(f.length)); out.write(f) }
      out.toByteArray
    }

    /** Walk the container, returning only frames whose index is a
      * multiple of `stride` as (frameIdx, payload) plus the declared
      * frame count — skipped frames are seeked over by their length
      * prefix without copying a byte. None on bad magic, a declared
      * length escaping the buffer, or fewer frames than declared. */
    def sampledFrames(bytes: Array[Byte], stride: Int)
        : Option[(Int, Vector[(Int, Array[Byte])])] = {
      if (bytes == null || bytes.length < 8 || bytes(0) != 'G' ||
          bytes(1) != 'V' || bytes(2) != 'I' || bytes(3) != 'D') return None
      val declared = be32(bytes, 4)
      if (declared > Int.MaxValue) return None
      val n = declared.toInt
      var i = 8
      var f = 0
      val out = Vector.newBuilder[(Int, Array[Byte])]
      while (f < n) {
        if (i + 4 > bytes.length) return None
        val len = be32(bytes, i)
        if (len > (bytes.length - i - 4).toLong) return None
        if (f % stride == 0)
          out += ((f, java.util.Arrays.copyOfRange(bytes, i + 4, i + 4 + len.toInt)))
        i += 4 + len.toInt
        f += 1
      }
      Some((n, out.result()))
    }

    def decodeFrames(bytes: Array[Byte]): Option[Vector[Array[Byte]]] =
      sampledFrames(bytes, 1).map(_._2.map(_._2))
  }

  /** Deterministic video fixture generator (the moving-picture twin of
    * [[Multimodal.withSyntheticBmp]]): `nfCol` real BMP frames of
    * `wCol`×`hCol`, where frame f's pixel (x, y) channel c is
    * `(id + 11f + 7x + 13y + 29c) mod 256` — pure integer arithmetic
    * a SQL oracle replays exactly. Map-side per partition. */
  def withSyntheticVideo(df: DataFrame, idCol: String, nfCol: String,
                         wCol: String, hCol: String,
                         out: String = "video"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(out, BinaryType))
    val iI = df.schema.fieldIndex(idCol)
    val nI = df.schema.fieldIndex(nfCol)
    val wI = df.schema.fieldIndex(wCol)
    val hI = df.schema.fieldIndex(hCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(iI); val nf = r.getInt(nI)
        val w = r.getInt(wI); val h = r.getInt(hI)
        val frames = (0 until nf).map { f =>
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val base = (y * w + x) * 3
              var c = 0
              while (c < 3) {
                rgb(base + c) =
                  ((id + 11L * f + 7L * x + 13L * y + 29L * c) % 256).toByte
                c += 1
              }
              x += 1
            }
            y += 1
          }
          Multimodal.Bmp.encode(w, h, rgb)
        }
        Row.fromSeq(r.toSeq :+ Container.encode(frames))
      }
    }(enc)
  }

  /** REAL frame sampling: one output row per kept frame (every
    * `stride`-th), carrying the frame PAYLOAD (`<out>`, binary), its
    * index (`<out>_idx`) and the container's declared frame count
    * (`<out>_count`). Downstream pixel work composes with the existing
    * image operators row-wise. Undecodable containers emit a single
    * row with null payload and idx/count = -1/-1 (distinct from a
    * legitimate zero-frame container, which emits no rows) so corrupt
    * assets stay visible to quality gates instead of vanishing. */
  def extractFrames(df: DataFrame, binCol: String, stride: Int,
                    out: String = "frame"): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(out, BinaryType),
      StructField(s"${out}_idx", IntegerType, nullable = false),
      StructField(s"${out}_count", IntegerType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Container.sampledFrames(r.getAs[Array[Byte]](binIdx), stride) match {
          case Some((n, kept)) =>
            kept.map { case (f, payload) =>
              Row.fromSeq(r.toSeq ++ Seq[Any](payload, f, n))
            }
          case None =>
            Seq(Row.fromSeq(r.toSeq ++ Seq[Any](null, -1, -1)))
        }
      }
    }(enc)
  }
}
