package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio-column plumbing with a REAL sample path: a pure-JVM 16-bit
  * PCM WAV codec (RIFF encode + chunk-walking decode), deterministic
  * synthetic fixtures an SQL oracle replays bit-exactly, integer
  * decimation resample, and frame-feature extraction (energy /
  * zero-crossings / peak) — the audio leg of the multimodal stack,
  * mirroring the image pipeline ([[Multimodal.Bmp]]/[[Multimodal.Png]]):
  * decode → transform → re-encode, all exact integer arithmetic.
  *
  * Reference scope note: the reference engine has no audio surface;
  * this is part of the 100-TB training-pipeline extension (brief:
  * "decode / feature-extract / frame-sample" for audio columns).
  * Lossy codecs (MP3/AAC) need a library not in this container and
  * plug in behind the same operators; PCM WAV needs none.
  *
  * Scale notes: identical to the image path — samples never leave the
  * task that decoded them (features are per-asset scalars), binaries
  * are projected away before any exchange, and the mapPartitions
  * Iterator→Iterator shape batches per partition.
  */
object Audio {

  /** Pure-JVM canonical 16-bit PCM WAV codec. Encode writes the
    * 44-byte canonical layout (RIFF/fmt/data); decode walks chunks
    * like [[Multimodal.HeaderDecoder]] (word-aligned, declared-size
    * bounds-checked) and accepts any PCM 16-bit channel count,
    * returning interleaved samples. Non-PCM / non-16-bit / truncated
    * input yields None — corrupt assets must not kill a scan. */
  object Wav {

    private def le16b(v: Int): Seq[Byte] =
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32b(v: Int): Seq[Byte] =
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

    /** Canonical-layout encode: interleaved 16-bit samples, any
      * channel count. samples.length must be a multiple of channels. */
    def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0 && channels > 0 && samples.length % channels == 0,
        "sampleRate/channels must be positive; samples must align to channels")
      val dataBytes = samples.length * 2
      require(dataBytes.toLong + 44 <= Int.MaxValue, "payload exceeds 2^31-1 bytes")
      val blockAlign = channels * 2
      val out = new Array[Byte](44 + dataBytes)
      val header: Seq[Byte] =
        Seq[Byte]('R', 'I', 'F', 'F') ++ le32b(36 + dataBytes) ++
          Seq[Byte]('W', 'A', 'V', 'E', 'f', 'm', 't', ' ') ++ le32b(16) ++
          le16b(1) ++ le16b(channels) ++ le32b(sampleRate) ++
          le32b(sampleRate * blockAlign) ++ le16b(blockAlign) ++ le16b(16) ++
          Seq[Byte]('d', 'a', 't', 'a') ++ le32b(dataBytes)
      var i = 0
      header.foreach { b => out(i) = b; i += 1 }
      var s = 0
      while (s < samples.length) {
        out(44 + 2 * s) = (samples(s) & 0xff).toByte
        out(44 + 2 * s + 1) = ((samples(s) >> 8) & 0xff).toByte
        s += 1
      }
      out
    }

    /** Decode → (sampleRate, channels, interleaved samples), or None
      * when the payload is not complete 16-bit PCM WAV. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
      if (bytes == null || bytes.length < 44 ||
          bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
          bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
          bytes(10) != 'V' || bytes(11) != 'E') return None
      try {
        val n = bytes.length
        var i = 12
        var fmtOk = false
        var channels = 0
        var sampleRate = 0
        var dataOff = -1
        var dataLen = -1
        while (i + 8 <= n && (!fmtOk || dataOff < 0)) {
          val id = new String(bytes, i, 4, "US-ASCII")
          val sz = le32(bytes, i + 4)
          if (sz > (n - i - 8).toLong) return None // declared size escapes buffer
          if (id == "fmt " && sz >= 16) {
            val audioFormat = le16(bytes, i + 8)
            channels = le16(bytes, i + 10)
            sampleRate = le32(bytes, i + 12).toInt
            val bits = le16(bytes, i + 22)
            fmtOk = audioFormat == 1 && bits == 16 && channels > 0 && sampleRate > 0
            if (!fmtOk) return None
          } else if (id == "data") {
            dataOff = i + 8
            dataLen = sz.toInt
          }
          i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
        }
        if (!fmtOk || dataOff < 0 || dataLen % 2 != 0) return None
        val samples = new Array[Short](dataLen / 2)
        var s = 0
        while (s < samples.length) {
          samples(s) = ((bytes(dataOff + 2 * s) & 0xff) |
            (bytes(dataOff + 2 * s + 1) << 8)).toShort
          s += 1
        }
        Some((sampleRate, channels, samples))
      } catch {
        case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
      }
    }
  }

  /** Deterministic WAV fixture generator (the audio twin of
    * [[Multimodal.withSyntheticBmp]]): mono 16-bit PCM where sample i
    * of row `id` is `((id*31 + i*7919) mod 65536) - 32768` — a
    * full-range signal with sign changes (so zero-crossing counts are
    * non-trivial) in pure integer arithmetic a SQL oracle replays
    * exactly. Map-side per partition. */
  def withSyntheticWav(df: DataFrame, idCol: String, nCol: String,
                       sampleRate: Int, out: String = "wav"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, BinaryType))
    val iI = df.schema.fieldIndex(idCol)
    val nI = df.schema.fieldIndex(nCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(iI); val n = r.getInt(nI)
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = (((id * 31L + i * 7919L) % 65536L) - 32768L).toShort
          i += 1
        }
        Row.fromSeq(r.toSeq :+ Wav.encode(sampleRate, 1, samples))
      }
    }(enc)
  }

  /** Integer decimation resample: keep every `factor`-th sample FRAME
    * (channel-aware), re-encode at sampleRate/factor — the exact
    * downsample whose kept-index mapping (i → i*factor) an oracle
    * replays; interpolating resamplers plug into the same shape.
    * Emits `<out>` (binary), plus `<out>_sr`/`<out>_n` from the
    * re-encoded stream. Undecodable assets yield null/0/0. */
  def decimate(df: DataFrame, binCol: String, factor: Int,
               out: String = "resampled"): DataFrame = {
    require(factor >= 1, "decimation factor must be >= 1")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(out, BinaryType),
      StructField(s"${out}_sr", IntegerType, nullable = false),
      StructField(s"${out}_n", IntegerType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Wav.decode(r.getAs[Array[Byte]](binIdx)) match {
          case Some((sr, ch, samples)) =>
            val nFrames = samples.length / ch
            val kept = (nFrames + factor - 1) / factor
            val outSamples = new Array[Short](kept * ch)
            var f = 0
            while (f < kept) {
              var c = 0
              while (c < ch) {
                outSamples(f * ch + c) = samples(f * factor * ch + c)
                c += 1
              }
              f += 1
            }
            val outSr = math.max(1, sr / factor)
            Row.fromSeq(r.toSeq ++
              Seq(Wav.encode(outSr, ch, outSamples), outSr, kept))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, 0, 0))
        }
      }
    }(enc)
  }

  /** Linear-interpolation resample to `targetRate` — the audio twin of
    * the image path's exact fixed-point bilinear
    * ([[Multimodal.Bmp.resampleBilinear]]): output frame t maps to
    * source position t*(nIn-1)/(nOut-1) (align-corners), the corner
    * weights are the integer remainder mod (nOut-1), and rounding is
    * half-up as floor((2*num + den) / (2*den)) — no floating point
    * anywhere, so an SQL oracle replays every output sample.
    * Signed-sample note: interpolation runs in OFFSET space
    * (u = s + 32768, non-negative), where the truncating integer
    * division both JVM and DuckDB implement IS floor — the offset
    * commutes with linear interpolation exactly, so results equal
    * signed interpolation with true floor rounding. nOut =
    * max(1, nFrames*targetRate/srIn) (integer division); channel-aware
    * like [[decimate]]. Undecodable assets yield null/0/0. */
  def resampleLinear(df: DataFrame, binCol: String, targetRate: Int,
                     out: String = "resampled"): DataFrame = {
    require(targetRate >= 1, "target sample rate must be >= 1")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(out, BinaryType),
      StructField(s"${out}_sr", IntegerType, nullable = false),
      StructField(s"${out}_n", IntegerType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Wav.decode(r.getAs[Array[Byte]](binIdx)) match {
          case Some((sr, ch, samples)) if samples.nonEmpty =>
            val nIn = samples.length / ch
            val nOut = math.max(1, (nIn.toLong * targetRate / sr).toInt)
            val outSamples = new Array[Short](nOut * ch)
            var t = 0
            while (t < nOut) {
              var c = 0
              while (c < ch) {
                val v =
                  if (nOut == 1 || nIn == 1) samples(c)
                  else {
                    val den = nOut - 1
                    val pos = t.toLong * (nIn - 1)
                    val i0 = (pos / den).toInt
                    val rem = (pos % den).toInt
                    val i1 = math.min(i0 + 1, nIn - 1)
                    val u0 = samples(i0 * ch + c) + 32768L
                    val u1 = samples(i1 * ch + c) + 32768L
                    val num = (den - rem) * u0 + rem * u1
                    (((2 * num + den) / (2L * den)) - 32768L).toShort
                  }
                outSamples(t * ch + c) = v
                c += 1
              }
              t += 1
            }
            Row.fromSeq(r.toSeq ++
              Seq[Any](Wav.encode(targetRate, ch, outSamples), targetRate, nOut))
          case _ => Row.fromSeq(r.toSeq ++ Seq[Any](null, 0, 0))
        }
      }
    }(enc)
  }

  /** Frame-level feature TABLE (the spectrogram-shaped output ML
    * pipelines consume): one row per fixed-size frame of channel 0,
    * with exact integer energy (sum of squared samples) and peak —
    * the flatMap row-explosion happens map-side BEFORE any exchange,
    * so frame rows distribute like [[Video.extractFrames]]'s frames.
    * The final frame may be partial (`<out>_n` < frameSize);
    * undecodable assets emit one row with idx = -1 so corrupt input
    * stays visible to quality gates. */
  def frameFeatures(df: DataFrame, binCol: String, frameSize: Int,
                    out: String = "frame"): DataFrame = {
    require(frameSize >= 1, "frameSize must be >= 1")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(s"${out}_idx", IntegerType, nullable = false),
      StructField(s"${out}_n", IntegerType, nullable = false),
      StructField(s"${out}_energy", LongType, nullable = false),
      StructField(s"${out}_peak", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Wav.decode(r.getAs[Array[Byte]](binIdx)) match {
          case Some((_, ch, samples)) =>
            val nFrames = samples.length / ch
            val nOut = (nFrames + frameSize - 1) / frameSize
            (0 until nOut).map { fi =>
              val start = fi * frameSize
              val end = math.min(start + frameSize, nFrames)
              var energy = 0L; var peak = 0L
              var f = start
              while (f < end) {
                val s = samples(f * ch).toLong // channel 0
                energy += s * s
                val a = math.abs(s)
                if (a > peak) peak = a
                f += 1
              }
              Row.fromSeq(r.toSeq ++ Seq[Any](fi, end - start, energy, peak))
            }
          case None =>
            Seq(Row.fromSeq(r.toSeq ++ Seq[Any](-1, 0, -1L, -1L)))
        }
      }
    }(enc)
  }

  /** REAL audio feature extraction over channel 0 (exact integers, so
    * one BIGINT per feature pins the whole decode):
    *  - `<out>_sr` / `<out>_n`: decoded header rate + frame count,
    *  - `<out>_energy`: sum of squared samples (the un-normalized
    *    frame energy; RMS = sqrt(energy/n) downstream),
    *  - `<out>_zero_cross`: count of consecutive-sample sign changes
    *    (negative vs non-negative — the crude pitch/noisiness signal),
    *  - `<out>_peak`: max |sample|.
    * Undecodable assets get sr = n = 0 and -1 features (distinct from
    * the legitimate silent-stream 0). */
  def withWavFeatures(df: DataFrame, binCol: String,
                      out: String = "audio"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(s"${out}_sr", IntegerType, nullable = false),
      StructField(s"${out}_n", IntegerType, nullable = false),
      StructField(s"${out}_energy", LongType, nullable = false),
      StructField(s"${out}_zero_cross", LongType, nullable = false),
      StructField(s"${out}_peak", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Wav.decode(r.getAs[Array[Byte]](binIdx)) match {
          case Some((sr, ch, samples)) =>
            val nFrames = samples.length / ch
            var energy = 0L; var zc = 0L; var peak = 0L
            var prevNeg = false
            var f = 0
            while (f < nFrames) {
              val s = samples(f * ch).toLong // channel 0
              energy += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              val neg = s < 0
              if (f > 0 && neg != prevNeg) zc += 1
              prevNeg = neg
              f += 1
            }
            // Seq[Any]: a plain Seq(Int, Int, Long, ...) would WIDEN
            // the Ints to Long and break the row encoder
            Row.fromSeq(r.toSeq ++ Seq[Any](sr, nFrames, energy, zc, peak))
          case None => Row.fromSeq(r.toSeq ++ Seq[Any](0, 0, -1L, -1L, -1L))
        }
      }
    }(enc)
  }
}
