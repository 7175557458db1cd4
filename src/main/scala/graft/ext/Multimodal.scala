package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Header metadata decode (PNG/JPEG/GIF/WAV/BMP) is real pure-JVM
  * parsing ([[HeaderDecoder]]), and the PIXEL path is real for both
  * 24-bit BMP ([[Bmp]]) and 8-bit truecolor PNG ([[Png]] — zlib via
  * `java.util.zip`, full Sub/Up/Average/Paeth filter reconstruction):
  * decode → [[resizeImage]] resample → re-encode. Lossy-compressed
  * payload decode (JPEG DCT, MP4) still needs a library not in this
  * container; `Decoder` is that extension point and `StubDecoder` a
  * clearly-marked deterministic fake for shape tests. Everything
  * Spark-side — the binary schema, the mapPartitions batch shape (the
  * JVM analogue of a Pandas-UDF iterator-of-batches), metadata
  * structs, and the partitioning guidance — is real and tested.
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

  /** Real pure-JVM container-header decode for the formats whose
    * metadata lives in fixed header structures: JPEG (SOFn segment
    * scan), PNG (IHDR), GIF (logical screen descriptor), WAV (RIFF
    * fmt/data chunks — n_frames = sample frames). No media libraries
    * needed: only the pixel/sample PAYLOAD needs a codec, and this
    * operator extracts metadata, not pixels. Unknown or truncated
    * bytes yield valid=false rather than throwing — corrupt assets
    * must not kill a 100 TB scan.
    */
  object HeaderDecoder extends Decoder {

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.isEmpty)
        return MediaMeta(0L, "empty", 0, 0, 0, valid = false)
      val n = bytes.length
      try {
        if (n >= 24 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
            bytes(2) == 'N' && bytes(3) == 'G') {
          // PNG: 8-byte signature, IHDR chunk: len(4) "IHDR" w(4) h(4).
          MediaMeta(n.toLong, "png",
            be32(bytes, 16).toInt, be32(bytes, 20).toInt, 1, valid = true)
        } else if (n >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
          // JPEG: scan segments for a SOFn frame header.
          var i = 2
          while (i + 3 < n) {
            if ((bytes(i) & 0xff) != 0xff) return MediaMeta(n.toLong, "jpeg", 0, 0, 0, valid = false)
            var m = bytes(i + 1) & 0xff
            var j = i + 1
            while (m == 0xff && j + 1 < n) { j += 1; m = bytes(j) & 0xff } // fill bytes
            val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof) {
              if (j + 8 >= n) return MediaMeta(n.toLong, "jpeg", 0, 0, 0, valid = false)
              val h = be16(bytes, j + 4)
              val w = be16(bytes, j + 6)
              return MediaMeta(n.toLong, "jpeg", w, h, 1, valid = true)
            } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
              i = j + 1 // standalone marker, no length field
            } else if (m == 0xd9) {
              return MediaMeta(n.toLong, "jpeg", 0, 0, 0, valid = false) // EOI before SOF
            } else {
              if (j + 3 >= n) return MediaMeta(n.toLong, "jpeg", 0, 0, 0, valid = false)
              i = j + 1 + be16(bytes, j + 1) // length includes its own 2 bytes
            }
          }
          MediaMeta(n.toLong, "jpeg", 0, 0, 0, valid = false)
        } else if (n >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') {
          // GIF87a/89a logical screen descriptor: width/height LE at 6/8.
          MediaMeta(n.toLong, "gif", le16(bytes, 6), le16(bytes, 8), 1, valid = true)
        } else if (n >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
                   bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
                   bytes(10) == 'V' && bytes(11) == 'E') {
          // WAV: walk chunks for fmt (blockAlign) and data (byte size);
          // n_frames = data bytes / block align (sample frames).
          var i = 12
          var blockAlign = 0
          var dataBytes = -1L
          var walking = true
          while (walking && i + 8 <= n && (blockAlign == 0 || dataBytes < 0)) {
            val id = new String(bytes, i, 4, "US-ASCII")
            val sz = le32(bytes, i + 4)
            if (id == "fmt " && i + 8 + 14 <= n) blockAlign = le16(bytes, i + 8 + 12)
            else if (id == "data") dataBytes = sz
            // Advance only while the DECLARED size stays inside the
            // buffer: a size >= 2^31 (valid in the unsigned le32
            // field, negative as .toInt) would drive i backwards and
            // walk out of bounds (ADVICE r2). Chunk metadata already
            // recorded above still stands — header-only assets whose
            // data payload is truncated/absent are legitimate input
            // for a metadata decoder; valid=false only if fmt/data
            // were never both seen.
            if (sz > (n - i - 8).toLong) walking = false
            else i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
          }
          // n_frames must fit an Int: a data chunk declaring ~2^32
          // bytes with blockAlign=1 would overflow .toInt to a
          // negative frame count with valid=true — treat it as the
          // corrupt header it is instead.
          if (blockAlign > 0 && dataBytes >= 0 &&
              dataBytes / blockAlign <= Int.MaxValue)
            MediaMeta(n.toLong, "wav", 0, 0, (dataBytes / blockAlign).toInt, valid = true)
          else MediaMeta(n.toLong, "wav", 0, 0, 0, valid = false)
        } else if (n >= 34 && bytes(0) == 'B' && bytes(1) == 'M') {
          // BMP: BITMAPINFOHEADER width/height LE32 at 18/22 (height
          // may be negative = top-down row order; magnitude is the
          // pixel height either way).
          val w = le32(bytes, 18).toInt
          val h = le32(bytes, 22).toInt
          MediaMeta(n.toLong, "bmp", w, math.abs(h), 1,
            valid = w > 0 && h != 0)
        } else MediaMeta(n.toLong, "unknown", 0, 0, 0, valid = false)
      } catch {
        // Any malformed header must degrade to valid=false, never kill
        // a 100 TB scan — IndexOutOfBounds covers both Array and
        // String index walks (a crafted RIFF escaped the narrower
        // Array-only catch in round 2; ADVICE r2).
        case _: IndexOutOfBoundsException | _: NegativeArraySizeException =>
          MediaMeta(n.toLong, "corrupt", 0, 0, 0, valid = false)
      }
    }
  }

  /** STUB: deterministic fake decode kept for shape tests only — the
    * production decoder is [[HeaderDecoder]]. Derives plausible
    * dimensions from the byte content so tests are stable. */
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
                      decoder: Decoder = HeaderDecoder,
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
    df.filter(col(s"$metaCol.n_frames") > 0) // frameless assets emit no rows
      .withColumn("frame_idx",
        explode(sequence(lit(0), col(s"$metaCol.n_frames") - 1, lit(stride))))

  /** REAL feature extraction (no media library needed): the
    * normalized 256-bin byte histogram per asset — the classic
    * content-signature feature (format detection, corruption
    * screening, cheap near-dup blocking), emitted as `array<float>`
    * so it flows directly into the embedding stack
    * ([[Similarity.bruteForceTopK]], the LSH/IVF paths, [[IvfIndex]]).
    * Batch path: one histogram buffer per PARTITION, reused across
    * rows — the same Iterator→Iterator shape a library-backed
    * extractor would use. Empty/null payloads get the zero vector.
    * UTF-8 note the oracle relies on: ASCII byte values in a UTF-8
    * stream always denote those ASCII characters (continuation bytes
    * are 0x80–0xBF), so bin 0x20 IS the space count even for
    * multi-byte text. */
  def withByteHistogram(df: DataFrame, binCol: String,
                        out: String = "features"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val counts = new Array[Long](256) // one buffer per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val hist = new Array[Float](256)
        if (bytes != null && bytes.nonEmpty) {
          java.util.Arrays.fill(counts, 0L)
          var i = 0
          while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
          val n = bytes.length.toDouble
          i = 0
          while (i < 256) { hist(i) = (counts(i) / n).toFloat; i += 1 }
        }
        Row.fromSeq(r.toSeq :+ (hist.toSeq: Seq[Float]))
      }
    }(enc)
  }

  /** Pure-JVM codec for 24-bit uncompressed (BI_RGB) BMP — the one
    * mainstream raster format that needs NO media library: the pixel
    * payload is raw bytes behind a 54-byte fixed header. This is what
    * makes a REAL pixel-level resize possible in this container;
    * compressed formats (JPEG/PNG) plug into the same operators once
    * a codec is on the classpath.
    *
    * Layout handled: "BM" signature, BITMAPINFOHEADER, bpp=24,
    * compression=0, rows 4-byte-aligned, stored bottom-up (positive
    * height; negative = top-down also decoded). Pixels surface as
    * top-down row-major RGB triples — padding and the BGR byte order
    * stay inside the codec.
    */
  object Bmp {

    private def le16b(v: Int): Seq[Byte] =
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32b(v: Int): Seq[Byte] =
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** Encode top-down row-major RGB triples (`rgb.length == w*h*3`)
      * as a bottom-up 24-bit BI_RGB BMP. */
    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(width > 0 && height > 0 &&
        width.toLong * height * 3L <= Int.MaxValue,
        "dimensions must be positive with w*h*3 <= 2^31-1")
      require(rgb.length == width * height * 3,
        s"need ${width * height * 3} RGB bytes, got ${rgb.length}")
      val stride = (width * 3 + 3) & ~3
      val fileSize = 54 + stride * height
      val out = new Array[Byte](fileSize)
      val header = Seq[Byte]('B', 'M') ++ le32b(fileSize) ++ le32b(0) ++
        le32b(54) ++ le32b(40) ++ le32b(width) ++ le32b(height) ++
        le16b(1) ++ le16b(24) ++ le32b(0) ++ le32b(stride * height) ++
        le32b(2835) ++ le32b(2835) ++ le32b(0) ++ le32b(0)
      header.copyToArray(out)
      var y = 0
      while (y < height) {
        val dstRow = 54 + (height - 1 - y) * stride // bottom-up
        var x = 0
        while (x < width) {
          val src = (y * width + x) * 3
          out(dstRow + x * 3) = rgb(src + 2)     // B
          out(dstRow + x * 3 + 1) = rgb(src + 1) // G
          out(dstRow + x * 3 + 2) = rgb(src)     // R
          x += 1
        }
        y += 1
      }
      out
    }

    /** Decode a 24-bit BI_RGB BMP to (width, height, top-down RGB);
      * None for anything else (other bpp, compressed, truncated) —
      * corrupt assets degrade, never throw. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes == null || bytes.length < 54 ||
          bytes(0) != 'B' || bytes(1) != 'M') return None
      try {
        val offset = le32(bytes, 10)
        val width = le32(bytes, 18)
        val rawH = le32(bytes, 22)
        val height = math.abs(rawH)
        val bottomUp = rawH > 0
        // the 65535 dim cap keeps every later Int product (stride,
        // w*h*3) overflow-free — a crafted header declaring ~2^30
        // pixels would otherwise wrap the arithmetic past the range
        // guard and allocate garbage-sized buffers
        if (width <= 0 || height == 0 || width > 65535 || height > 65535 ||
            le16(bytes, 28) != 24 || le32(bytes, 30) != 0) return None
        val stride = (width * 3 + 3) & ~3
        if (offset < 54 || offset.toLong + stride.toLong * height > bytes.length)
          return None
        val rgb = new Array[Byte](width * height * 3)
        var y = 0
        while (y < height) {
          val srcRow = offset + (if (bottomUp) (height - 1 - y) else y) * stride
          var x = 0
          while (x < width) {
            val dst = (y * width + x) * 3
            rgb(dst) = bytes(srcRow + x * 3 + 2)     // R
            rgb(dst + 1) = bytes(srcRow + x * 3 + 1) // G
            rgb(dst + 2) = bytes(srcRow + x * 3)     // B
            x += 1
          }
          y += 1
        }
        Some((width, height, rgb))
      } catch {
        case _: IndexOutOfBoundsException | _: NegativeArraySizeException =>
          None
      }
    }

    /** Bilinear resample in EXACT fixed-point arithmetic: the
      * align-corners mapping puts output x at source position
      * x·(sw-1)/(tw-1) — a rational with denominator (tw-1) — so the
      * four corner weights are INTEGERS (rx = x·(sw-1) mod (tw-1),
      * etc.) and the final round-half-up is the integer expression
      * ⌊(2·num + den) / (2·den)⌋. No floating point anywhere, so a
      * SQL oracle replays every output byte exactly — the same
      * property the nearest path gets for free. A 1-wide/1-tall
      * target degenerates to the top-left sample (denominator
      * clamps to 1, remainders 0). */
    def resampleBilinear(sw: Int, sh: Int, rgb: Array[Byte],
                         tw: Int, th: Int): Array[Byte] = {
      val out = new Array[Byte](tw * th * 3)
      val dX = math.max(tw - 1, 1); val dY = math.max(th - 1, 1)
      val den = dX.toLong * dY
      var y = 0
      while (y < th) {
        val ny = y.toLong * (sh - 1)
        val j0 = (ny / dY).toInt; val ry = (ny % dY).toInt
        val j1 = math.min(j0 + 1, sh - 1)
        var x = 0
        while (x < tw) {
          val nx = x.toLong * (sw - 1)
          val i0 = (nx / dX).toInt; val rx = (nx % dX).toInt
          val i1 = math.min(i0 + 1, sw - 1)
          var c = 0
          while (c < 3) {
            val p00 = rgb((j0 * sw + i0) * 3 + c) & 0xff
            val p10 = rgb((j0 * sw + i1) * 3 + c) & 0xff
            val p01 = rgb((j1 * sw + i0) * 3 + c) & 0xff
            val p11 = rgb((j1 * sw + i1) * 3 + c) & 0xff
            val num = (dX - rx).toLong * (dY - ry) * p00 +
              rx.toLong * (dY - ry) * p10 +
              (dX - rx).toLong * ry * p01 +
              rx.toLong * ry * p11
            out((y * tw + x) * 3 + c) = ((2 * num + den) / (2 * den)).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }

    /** Nearest-neighbor resample of top-down RGB triples: output
      * pixel (x, y) copies source (⌊x·sw/tw⌋, ⌊y·sh/th⌋). The plain
      * floor mapping (not center-offset) is deliberate — it is exact
      * integer arithmetic any engine (including a SQL oracle)
      * replays bit-identically. */
    def resampleNearest(sw: Int, sh: Int, rgb: Array[Byte],
                        tw: Int, th: Int): Array[Byte] = {
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        val sy = y * sh / th
        var x = 0
        while (x < tw) {
          val sx = x * sw / tw
          val src = (sy * sw + sx) * 3
          val dst = (y * tw + x) * 3
          out(dst) = rgb(src); out(dst + 1) = rgb(src + 1)
          out(dst + 2) = rgb(src + 2)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Pure-JVM PNG codec — zero external dependencies: the compression
    * layer is `java.util.zip` (Inflater/Deflater, in the JDK since
    * 1.1) and everything else is exact byte arithmetic. Covers
    * non-interlaced 8-bit-per-channel truecolor PNG (color type 2
    * RGB, and type 6 RGBA with alpha dropped on decode) — the shape
    * every screenshot/render pipeline emits. Palette (type 3),
    * 16-bit, and Adam7 interlace return None rather than decode
    * wrongly.
    *
    * Decode is the full spec path: signature check → chunk walk
    * (length/type/CRC32-validated) → IHDR parse → concatenated-IDAT
    * inflate → per-row filter reconstruction (None/Sub/Up/Average/
    * Paeth — exact integer byte arithmetic, PNG spec §9). Corrupt,
    * truncated, or unsupported assets degrade to None, never throw —
    * a 100 TB scan must survive bad bytes.
    *
    * Encode (the fixture/round-trip side) writes spec-correct files:
    * real zlib streams, real CRCs, and a caller-controllable per-row
    * filter choice — the synthetic corpus cycles through ALL FIVE
    * filter types so the driver oracle exercises every reconstruction
    * branch, not just filter 0.
    */
  object Png {

    private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a)

    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be32b(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    /** PNG spec §9.4: the Paeth predictor picks whichever of left/
      * up/upper-left is closest to a + b − c, ties a → b → c. */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      be32b(data.length.toLong) ++ t ++ data ++ be32b(crc.getValue)
    }

    /** Encode top-down row-major RGB triples as a non-interlaced
      * 8-bit truecolor PNG. `rowFilter(y)` picks the filter type
      * (0–4) per scanline — the default cycles through all five so
      * round trips exercise every reconstruction branch; filtering
      * uses the ORIGINAL bytes of the current and prior rows, per
      * spec. */
    def encode(width: Int, height: Int, rgb: Array[Byte],
               rowFilter: Int => Int = _ % 5): Array[Byte] = {
      require(width > 0 && height > 0 && width <= 65535 && height <= 65535 &&
        height.toLong * (1L + width * 3L) <= Int.MaxValue,
        "dimensions must be in [1, 65535] with scanline bytes <= 2^31-1")
      require(rgb.length == width * height * 3,
        s"need ${width * height * 3} RGB bytes, got ${rgb.length}")
      val rowBytes = width * 3
      val raw = new Array[Byte](height * (1 + rowBytes))
      var y = 0
      while (y < height) {
        val ft = rowFilter(y)
        require(ft >= 0 && ft <= 4, s"filter type $ft out of range")
        val o = y * (1 + rowBytes)
        raw(o) = ft.toByte
        var i = 0
        while (i < rowBytes) {
          val x = rgb(y * rowBytes + i) & 0xff
          val a = if (i >= 3) rgb(y * rowBytes + i - 3) & 0xff else 0
          val b = if (y > 0) rgb((y - 1) * rowBytes + i) & 0xff else 0
          val c = if (i >= 3 && y > 0) rgb((y - 1) * rowBytes + i - 3) & 0xff else 0
          val filt = ft match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - ((a + b) >> 1)
            case 4 => x - paeth(a, b, c)
          }
          raw(o + 1 + i) = filt.toByte
          i += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](8192)
      val zOut = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        zOut.write(buf, 0, n)
      }
      deflater.end()
      val ihdr = be32b(width.toLong) ++ be32b(height.toLong) ++
        Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, deflate, adaptive, no interlace
      SIG ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zOut.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Decode an 8-bit truecolor (RGB or RGBA) non-interlaced PNG to
      * (width, height, top-down RGB); RGBA alpha is dropped. None for
      * anything else — palette/16-bit/interlaced, bad CRC, truncated
      * or over-declared IDAT, oversized dims. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes == null || bytes.length < 8) return None
      var k = 0
      while (k < 8) { if (bytes(k) != SIG(k)) return None; k += 1 }
      try {
        var i = 8
        var width = 0; var height = 0; var bpp = 0
        var seenIhdr = false; var seenIend = false
        val idat = new java.io.ByteArrayOutputStream()
        while (!seenIend && i + 8 <= bytes.length) {
          val len = be32(bytes, i)
          if (len > bytes.length - i - 12) return None // truncated chunk
          val n = len.toInt
          val tpe = new String(bytes, i + 4, 4, "US-ASCII")
          val crc = new java.util.zip.CRC32()
          crc.update(bytes, i + 4, 4 + n)
          if (crc.getValue != be32(bytes, i + 8 + n)) return None
          tpe match {
            case "IHDR" =>
              if (seenIhdr || n != 13) return None
              width = be32(bytes, i + 8).toInt
              height = be32(bytes, i + 12).toInt
              val depth = bytes(i + 16) & 0xff
              val color = bytes(i + 17) & 0xff
              // compression 0, filter 0, interlace 0 only
              if (width <= 0 || height <= 0 || width > 65535 ||
                  height > 65535 || depth != 8 ||
                  (color != 2 && color != 6) || bytes(i + 18) != 0 ||
                  bytes(i + 19) != 0 || bytes(i + 20) != 0) return None
              bpp = if (color == 6) 4 else 3
              seenIhdr = true
            case "IDAT" =>
              if (!seenIhdr) return None
              idat.write(bytes, i + 8, n)
            case "IEND" => seenIend = true
            case _ => () // ancillary chunks (tEXt, pHYs, ...) skipped
          }
          i += 12 + n
        }
        if (!seenIhdr || !seenIend) return None
        val rowBytes = width * bpp
        val expected = height.toLong * (1 + rowBytes)
        if (expected > Int.MaxValue) return None
        val raw = new Array[Byte](expected.toInt)
        val inflater = new java.util.zip.Inflater()
        inflater.setInput(idat.toByteArray)
        var off = 0
        while (off < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, off, raw.length - off)
          // n == 0 while unfinished: truncated stream (needsInput) or
          // a preset-dictionary stream (needsDictionary) — both are
          // undecodable here; returning prevents an infinite loop
          if (n == 0 && (inflater.needsInput() || inflater.needsDictionary())) {
            inflater.end(); return None
          }
          off += n
        }
        val complete = off == raw.length &&
          (inflater.finished() || inflater.inflate(new Array[Byte](1)) == 0)
        inflater.end()
        if (!complete) return None
        // per-row filter reconstruction over the RECONSTRUCTED bytes
        // of the current and prior rows (spec §9: Recon, not Filt)
        val px = new Array[Byte](height * rowBytes)
        var y = 0
        while (y < height) {
          val ft = raw(y * (1 + rowBytes)) & 0xff
          if (ft > 4) return None
          val ro = y * (1 + rowBytes) + 1
          var j = 0
          while (j < rowBytes) {
            val a = if (j >= bpp) px(y * rowBytes + j - bpp) & 0xff else 0
            val b = if (y > 0) px((y - 1) * rowBytes + j) & 0xff else 0
            val c = if (j >= bpp && y > 0) px((y - 1) * rowBytes + j - bpp) & 0xff else 0
            val pred = ft match {
              case 0 => 0
              case 1 => a
              case 2 => b
              case 3 => (a + b) >> 1
              case 4 => paeth(a, b, c)
            }
            px(y * rowBytes + j) = ((raw(ro + j) & 0xff) + pred).toByte
            j += 1
          }
          y += 1
        }
        val rgb =
          if (bpp == 3) px
          else { // strip alpha
            val out3 = new Array[Byte](width * height * 3)
            var p = 0
            while (p < width * height) {
              out3(p * 3) = px(p * 4); out3(p * 3 + 1) = px(p * 4 + 1)
              out3(p * 3 + 2) = px(p * 4 + 2)
              p += 1
            }
            out3
          }
        Some((width, height, rgb))
      } catch {
        case _: IndexOutOfBoundsException | _: NegativeArraySizeException |
             _: java.util.zip.DataFormatException => None
      }
    }
  }

  /** Format-sniffing pixel decode: BMP ("BM") via [[Bmp.decode]], PNG
    * (\x89PNG) via [[Png.decode]], GIF ("GIF") via [[Gif.decode]] —
    * the raw, deflate, and LZW compression families respectively. The
    * one entry point resize/checksum operators use, so adding a codec
    * extends every pixel operator at once. */
  def decodeRgb(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 8) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') Bmp.decode(bytes)
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
             bytes(2) == 'N' && bytes(3) == 'G') Png.decode(bytes)
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      Gif.decode(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      Jpeg.decode(bytes)
    else if ((bytes(0) == 'I' && bytes(1) == 'I') ||
             (bytes(0) == 'M' && bytes(1) == 'M'))
      Tiff.decode(bytes)
    else None
  }

  /** REAL pixel-level resize (no media library): decode 24-bit BMP →
    * nearest-neighbor resample → re-encode BMP at the target
    * dimensions. Iterator→Iterator per partition, binary in → binary
    * out; assets that don't decode (wrong format, truncated,
    * compressed) yield null output and (0, 0) dims rather than
    * failing the scan. Other formats ride the same operator once a
    * codec exists — the [[Bmp]] round trip is the real pixel path,
    * not a stub. */
  def resizeBmp(df: DataFrame, binCol: String, width: Int, height: Int,
                out: String = "resized",
                mode: String = "nearest"): DataFrame = {
    // fail fast on the driver for oversized targets (ADVICE r11): the
    // per-dim 65535 cap mirrors decode, and the PRODUCT cap catches
    // what per-dim caps cannot — a 40000x30000 target overflows
    // tw*th*3 in Int and would die with NegativeArraySizeException on
    // EXECUTORS otherwise
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535 &&
      width.toLong * height * 3L <= Int.MaxValue,
      "target dimensions must be in [1, 65535] with w*h*3 <= 2^31-1")
    require(mode == "nearest" || mode == "bilinear",
      s"unknown resample mode '$mode'")
    val bilinear = mode == "bilinear"
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(out, org.apache.spark.sql.types.BinaryType),
      StructField(s"${out}_width", IntegerType, nullable = false),
      StructField(s"${out}_height", IntegerType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Bmp.decode(r.getAs[Array[Byte]](binIdx)) match {
          case Some((sw, sh, rgb)) =>
            val px =
              if (bilinear) Bmp.resampleBilinear(sw, sh, rgb, width, height)
              else Bmp.resampleNearest(sw, sh, rgb, width, height)
            Row.fromSeq(r.toSeq ++ Seq(Bmp.encode(width, height, px),
              width, height))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, 0, 0))
        }
      }
    }(enc)
  }

  /** [[resizeBmp]] generalized over the codec registry
    * ([[decodeRgb]]: BMP, PNG, GIF, or JPEG in), re-encoding the resampled pixels
    * as BMP — the transcode+resize shape of a thumbnail/training-tile
    * pipeline. Besides the resized payload it emits the DECODED
    * source dimensions (`<out>_src_w`/`<out>_src_h`, 0 when
    * undecodable), so a driver oracle can pin the header parse of the
    * INPUT format, not just the output round trip. Same
    * Iterator→Iterator per-partition shape and degrade-to-null
    * contract as [[resizeBmp]]. */
  def resizeImage(df: DataFrame, binCol: String, width: Int, height: Int,
                  out: String = "resized",
                  mode: String = "nearest"): DataFrame = {
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535 &&
      width.toLong * height * 3L <= Int.MaxValue,
      "target dimensions must be in [1, 65535] with w*h*3 <= 2^31-1")
    require(mode == "nearest" || mode == "bilinear",
      s"unknown resample mode '$mode'")
    val bilinear = mode == "bilinear"
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(out, org.apache.spark.sql.types.BinaryType),
      StructField(s"${out}_src_w", IntegerType, nullable = false),
      StructField(s"${out}_src_h", IntegerType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        decodeRgb(r.getAs[Array[Byte]](binIdx)) match {
          case Some((sw, sh, rgb)) =>
            val px =
              if (bilinear) Bmp.resampleBilinear(sw, sh, rgb, width, height)
              else Bmp.resampleNearest(sw, sh, rgb, width, height)
            Row.fromSeq(r.toSeq ++ Seq(Bmp.encode(width, height, px), sw, sh))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, 0, 0))
        }
      }
    }(enc)
  }

  /** 64-bit difference hash (dHash) — the standard perceptual
    * image fingerprint: decode (any registry format), nearest-resample
    * to 9×8, integer-average channels to gray, and set bit (y·8+x)
    * iff gray(x+1,y) > gray(x,y). Robust to re-encoding and scaling
    * (the resample normalizes), cheap (72 pixels per image whatever
    * the source size), and EXACT integer arithmetic end to end — so a
    * SQL oracle replays it and near-dup joins on it are
    * deterministic. Null for undecodable payloads. Pair search goes
    * through 16-bit band blocking (q245): Hamming ≤ 3 with 4 bands
    * guarantees one exact band match, so the banded join is lossless
    * — the brute-force oracle proves it misses nothing.
    */
  def withImageDHash(df: DataFrame, binCol: String,
                     out: String = "dhash"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, org.apache.spark.sql.types.LongType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        decodeRgb(r.getAs[Array[Byte]](binIdx)) match {
          case Some((sw, sh, rgb)) =>
            val px = Bmp.resampleNearest(sw, sh, rgb, 9, 8)
            var hash = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                def gray(i: Int): Int = {
                  val base = (y * 9 + i) * 3
                  ((px(base) & 0xFF) + (px(base + 1) & 0xFF) +
                    (px(base + 2) & 0xFF)) / 3
                }
                if (gray(x + 1) > gray(x)) hash |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            Row.fromSeq(r.toSeq :+ hash)
          case None => Row.fromSeq(r.toSeq :+ null)
        }
      }
    }(enc)
  }

  /** Sum of all decoded RGB byte values (0-255 each) per BMP asset —
    * the sampled-pixel integrity check for resize/transcode
    * pipelines. Exact integer, so a SQL oracle that can predict the
    * pixels verifies the whole decode→transform→encode chain from
    * one BIGINT. Undecodable assets get -1 (distinct from the empty
    * checksum 0). */
  def withBmpPixelChecksum(df: DataFrame, binCol: String,
                           out: String = "pixel_checksum"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, LongType, nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val sum = Bmp.decode(r.getAs[Array[Byte]](binIdx)) match {
          case Some((_, _, rgb)) =>
            var s = 0L; var i = 0
            while (i < rgb.length) { s += rgb(i) & 0xff; i += 1 }
            s
          case None => -1L
        }
        Row.fromSeq(r.toSeq :+ sum)
      }
    }(enc)
  }

  /** Per-image gray histogram equalization census — the classic
    * contrast-normalization step of an image-preprocessing pipeline,
    * kept EXACT so a SQL oracle can replay it: decode (any registry
    * format), integer-average channels to gray (the [[withImageDHash]]
    * rule), bin to 64 levels (`gray / 4`), then remap each pixel to
    * `(cdf_≤(bin) · 255) div n_px` — the floor-division cumulative
    * equalization. Emits `<out>_n_px`, `<out>_gray_checksum` (Σ gray
    * before) and `<out>_eq_checksum` (Σ remapped after); undecodable
    * payloads get (0, −1, −1). Two constant-memory passes over the
    * pixel buffer per image, map-side per partition — zero shuffle,
    * like every codec here; image COUNT scales out, image SIZE
    * streams through the task. */
  def withGrayHistEq(df: DataFrame, binCol: String,
                     out: String = "histeq"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(s"${out}_n_px", LongType, nullable = false),
      StructField(s"${out}_gray_checksum", LongType, nullable = false),
      StructField(s"${out}_eq_checksum", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        decodeRgb(r.getAs[Array[Byte]](binIdx)) match {
          case Some((w, h, rgb)) =>
            val nPx = w.toLong * h
            val counts = new Array[Long](64)
            var graySum = 0L
            var i = 0
            while (i < rgb.length) {
              val g = ((rgb(i) & 0xff) + (rgb(i + 1) & 0xff) +
                (rgb(i + 2) & 0xff)) / 3
              graySum += g
              counts(g / 4) += 1
              i += 3
            }
            var b = 1
            while (b < 64) { counts(b) += counts(b - 1); b += 1 }
            var eqSum = 0L
            i = 0
            while (i < rgb.length) {
              val g = ((rgb(i) & 0xff) + (rgb(i + 1) & 0xff) +
                (rgb(i + 2) & 0xff)) / 3
              eqSum += counts(g / 4) * 255L / nPx
              i += 3
            }
            Row.fromSeq(r.toSeq ++ Seq(nPx, graySum, eqSum))
          case None => Row.fromSeq(r.toSeq ++ Seq(0L, -1L, -1L))
        }
      }
    }(enc)
  }

  /** Deterministic BMP fixture generator: a `wCol`×`hCol` gradient
    * image per row whose pixel (x, y) channel c is
    * `(id + 7x + 13y + 29c) mod 256` — pure integer arithmetic a SQL
    * oracle replays exactly, which is what lets a driver-side checker
    * verify the REAL pixel pipeline ([[resizeBmp]] →
    * [[withBmpPixelChecksum]]) end to end without shipping image
    * fixtures. Generation is map-side per partition like every other
    * operator here. */
  def withSyntheticBmp(df: DataFrame, idCol: String, wCol: String,
                       hCol: String, out: String = "img"): DataFrame =
    withSyntheticImage(df, idCol, wCol, hCol, out,
      (w, h, rgb) => Bmp.encode(w, h, rgb))

  /** PNG twin of [[withSyntheticBmp]]: the same oracle-replayable
    * gradient, encoded through the REAL zlib path with the per-row
    * filter cycle (0..4 by scanline), so a decode downstream
    * exercises every filter-reconstruction branch of [[Png.decode]]
    * on driver-checked data. */
  def withSyntheticPng(df: DataFrame, idCol: String, wCol: String,
                       hCol: String, out: String = "img"): DataFrame =
    withSyntheticImage(df, idCol, wCol, hCol, out,
      (w, h, rgb) => Png.encode(w, h, rgb))

  /** GIF twin of [[withSyntheticBmp]], adapted to GIF's palette
    * model: pixel (x, y) is GRAY value `(id + 7x + 13y) mod 256`
    * (palette index == gray level in the encoder's 256-gray global
    * table), compressed through the REAL LZW path — so a decode
    * downstream exercises dictionary growth, width bumps, and the
    * KwKwK branch on driver-checked data. Decoded RGB is (v, v, v),
    * which an SQL oracle replays exactly. */
  def withSyntheticGif(df: DataFrame, idCol: String, wCol: String,
                       hCol: String, out: String = "img"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, org.apache.spark.sql.types.BinaryType))
    val iI = df.schema.fieldIndex(idCol)
    val wI = df.schema.fieldIndex(wCol)
    val hI = df.schema.fieldIndex(hCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(iI); val w = r.getInt(wI); val h = r.getInt(hI)
        val idx = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            idx(y * w + x) = ((id + 7L * x + 13L * y) % 256).toByte
            x += 1
          }
          y += 1
        }
        Row.fromSeq(r.toSeq :+ Gif.encode(w, h, idx))
      }
    }(enc)
  }

  /** Shared fixture core: pixel (x, y) channel c of row `id` is
    * `(id + 7x + 13y + 29c) mod 256` — pure integer arithmetic a SQL
    * oracle replays exactly; the encoder argument picks the container
    * format. */
  private def withSyntheticImage(df: DataFrame, idCol: String, wCol: String,
                                 hCol: String, out: String,
                                 encodeImg: (Int, Int, Array[Byte]) => Array[Byte])
      : DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, org.apache.spark.sql.types.BinaryType))
    val iI = df.schema.fieldIndex(idCol)
    val wI = df.schema.fieldIndex(wCol)
    val hI = df.schema.fieldIndex(hCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(iI); val w = r.getInt(wI); val h = r.getInt(hI)
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = (y * w + x) * 3
            var c = 0
            while (c < 3) {
              rgb(base + c) = ((id + 7L * x + 13L * y + 29L * c) % 256).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        Row.fromSeq(r.toSeq :+ encodeImg(w, h, rgb))
      }
    }(enc)
  }

  /** TIFF twin of [[withSyntheticBmp]] — the same oracle-replayable
    * classic gradient through the REAL `javax.imageio` TIFF codec,
    * which round-trips RGB losslessly (probed), so downstream
    * checksums stay EXACT like the BMP/PNG legs. */
  def withSyntheticTiff(df: DataFrame, idCol: String, wCol: String,
                        hCol: String, out: String = "img"): DataFrame =
    withSyntheticImage(df, idCol, wCol, hCol, out,
      (w, h, rgb) => Tiff.encode(w, h, rgb))

  /** JPEG twin of [[withSyntheticBmp]], adapted to JPEG's lossy
    * model: pixel (x, y) is GRAY value `min(255, (id mod 64) + 2x +
    * 3y)` — SMOOTH (slope ≤ 3/pixel, no mod-256 wrap), because a
    * discontinuous gradient would ring under the DCT and no fixed
    * error tolerance could pin it. Constant-chroma gray also makes
    * 4:2:0 subsampling lossless on Cb/Cr, so the decoded error is
    * bounded by luma quantization alone (≲ 4 at the default
    * quality). Encoded through the REAL `javax.imageio` codec. */
  def withSyntheticJpeg(df: DataFrame, idCol: String, wCol: String,
                        hCol: String, out: String = "img",
                        quality: Float = 0.92f): DataFrame =
    withSmoothGrayImage(df, idCol, wCol, hCol, out,
      (w, h, rgb) => Jpeg.encode(w, h, rgb, quality))

  /** The same smooth gray gradient as [[withSyntheticJpeg]] in a
    * LOSSLESS container — the reference leg a fidelity audit compares
    * the lossy leg against (see q201). */
  def withSyntheticSmoothBmp(df: DataFrame, idCol: String, wCol: String,
                             hCol: String, out: String = "img"): DataFrame =
    withSmoothGrayImage(df, idCol, wCol, hCol, out,
      (w, h, rgb) => Bmp.encode(w, h, rgb))

  private def withSmoothGrayImage(df: DataFrame, idCol: String, wCol: String,
                                  hCol: String, out: String,
                                  encodeImg: (Int, Int, Array[Byte]) => Array[Byte])
      : DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, org.apache.spark.sql.types.BinaryType))
    val iI = df.schema.fieldIndex(idCol)
    val wI = df.schema.fieldIndex(wCol)
    val hI = df.schema.fieldIndex(hCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(iI); val w = r.getInt(wI); val h = r.getInt(hI)
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = math.min(255L, (id % 64) + 2L * x + 3L * y).toByte
            val base = (y * w + x) * 3
            rgb(base) = g; rgb(base + 1) = g; rgb(base + 2) = g
            x += 1
          }
          y += 1
        }
        Row.fromSeq(r.toSeq :+ encodeImg(w, h, rgb))
      }
    }(enc)
  }

  /** Max absolute per-channel pixel difference between two decodable
    * assets of EQUAL dimensions (any [[decodeRgb]] format) — the
    * perceptual-regression / lossy-fidelity primitive: a lossy
    * transcode pipeline asserts `diff <= tolerance` row by row, and
    * an exact-count oracle predicts how many rows pass. Emits -1 if
    * either side fails to decode or the dimensions disagree (so a
    * silent decode failure can never masquerade as fidelity). */
  def withPixelMaxAbsDiff(df: DataFrame, aCol: String, bCol: String,
                          out: String = "max_abs_diff"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, LongType, nullable = false))
    val aIdx = df.schema.fieldIndex(aCol)
    val bIdx = df.schema.fieldIndex(bCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val d = (decodeRgb(r.getAs[Array[Byte]](aIdx)),
                 decodeRgb(r.getAs[Array[Byte]](bIdx))) match {
          case (Some((aw, ah, a)), Some((bw, bh, b)))
              if aw == bw && ah == bh =>
            var m = 0L; var i = 0
            while (i < a.length) {
              val diff = math.abs((a(i) & 0xff) - (b(i) & 0xff)).toLong
              if (diff > m) m = diff
              i += 1
            }
            m
          case _ => -1L
        }
        Row.fromSeq(r.toSeq :+ d)
      }
    }(enc)
  }

  /** ViT-style patch extraction: decode (any [[decodeRgb]] format),
    * split into a grid of `patchW`×`patchH` tiles (edge tiles
    * partial), and emit ONE ROW PER PATCH carrying the raw row-major
    * RGB patch bytes, its grid position, actual dims, and the exact
    * byte checksum — the vision-transformer preprocessing shape,
    * where per-patch rows distribute downstream embedding/augment
    * work the way [[Video.extractFrames]] distributes frames. The
    * explosion is map-side before any exchange. Undecodable assets
    * emit one row with null patch and (-1, -1) grid position. */
  def extractPatches(df: DataFrame, binCol: String, patchW: Int, patchH: Int,
                     out: String = "patch"): DataFrame = {
    require(patchW >= 1 && patchH >= 1, "patch dims must be >= 1")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(out, org.apache.spark.sql.types.BinaryType),
      StructField(s"${out}_x", IntegerType, nullable = false),
      StructField(s"${out}_y", IntegerType, nullable = false),
      StructField(s"${out}_w", IntegerType, nullable = false),
      StructField(s"${out}_h", IntegerType, nullable = false),
      StructField(s"${out}_checksum", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeRgb(r.getAs[Array[Byte]](binIdx)) match {
          case Some((w, h, rgb)) =>
            val gx = (w + patchW - 1) / patchW
            val gy = (h + patchH - 1) / patchH
            for (py <- 0 until gy; px <- 0 until gx) yield {
              val x0 = px * patchW; val y0 = py * patchH
              val pw = math.min(patchW, w - x0)
              val ph = math.min(patchH, h - y0)
              val patch = new Array[Byte](pw * ph * 3)
              var sum = 0L
              var y = 0
              while (y < ph) {
                var x = 0
                while (x < pw) {
                  val src = ((y0 + y) * w + (x0 + x)) * 3
                  val dst = (y * pw + x) * 3
                  var c = 0
                  while (c < 3) {
                    val b = rgb(src + c)
                    patch(dst + c) = b
                    sum += b & 0xff
                    c += 1
                  }
                  x += 1
                }
                y += 1
              }
              Row.fromSeq(r.toSeq ++ Seq[Any](patch, px, py, pw, ph, sum))
            }
          case None =>
            Seq(Row.fromSeq(r.toSeq ++ Seq[Any](null, -1, -1, 0, 0, -1L)))
        }
      }
    }(enc)
  }

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
