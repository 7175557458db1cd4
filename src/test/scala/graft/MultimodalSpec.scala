package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal
import graft.ext.Multimodal.{HeaderDecoder, StubDecoder}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val assets = Seq(
    (1L, "hello world"), (2L, ""), (3L, "a much longer payload for the decoder"),
  ).toDF("asset_id", "payload_text")
    .withColumn("media", encode($"payload_text", "UTF-8"))

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---- real header decode (fixture bytes) --------------------------

  test("HeaderDecoder parses a PNG IHDR") {
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ // signature
      bytes(0, 0, 0, 13) ++ "IHDR".getBytes ++
      bytes(0, 0, 2, 0x80) ++ // width 640
      bytes(0, 0, 1, 0xE0) ++ // height 480
      bytes(8, 6, 0, 0, 0)    // bit depth, color type, ...
    val m = HeaderDecoder.decode(png)
    assert(m.format == "png" && m.valid && m.width == 640 && m.height == 480)
  }

  test("HeaderDecoder scans JPEG segments to the SOF frame header") {
    val jpeg = bytes(0xFF, 0xD8) ++                       // SOI
      bytes(0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46) ++        // APP0, len 4
      bytes(0xFF, 0xC0, 0x00, 0x11, 0x08,                 // SOF0, precision 8
            0x01, 0x00,                                   // height 256
            0x02, 0x00,                                   // width 512
            0x03)
    val m = HeaderDecoder.decode(jpeg)
    assert(m.format == "jpeg" && m.valid && m.width == 512 && m.height == 256)
    // progressive marker C2 is also a SOF
    val prog = jpeg.updated(9, 0xC2.toByte) // marker byte follows the 0xFF at 8
    assert(HeaderDecoder.decode(prog).valid)
    // truncated before any SOF -> invalid, no throw
    val trunc = HeaderDecoder.decode(jpeg.take(6))
    assert(trunc.format == "jpeg" && !trunc.valid)
  }

  test("HeaderDecoder parses GIF logical screen descriptor") {
    val gif = "GIF89a".getBytes ++ bytes(0x40, 0x01) ++ bytes(0xF0, 0x00) ++ bytes(0, 0)
    val m = HeaderDecoder.decode(gif)
    assert(m.format == "gif" && m.valid && m.width == 320 && m.height == 240)
  }

  test("HeaderDecoder computes WAV sample frames from fmt/data chunks") {
    val wav = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0) ++
      bytes(1, 0) ++ bytes(2, 0) ++                    // pcm, 2 channels
      bytes(0x44, 0xAC, 0, 0) ++ bytes(0x10, 0xB1, 2, 0) ++ // 44100 Hz, byte rate
      bytes(4, 0) ++ bytes(16, 0) ++                   // block align 4, 16 bits
      "data".getBytes ++ bytes(0x90, 0x01, 0, 0)       // 400 data bytes
    val m = HeaderDecoder.decode(wav)
    assert(m.format == "wav" && m.valid && m.n_frames == 100) // 400 / 4
  }

  test("HeaderDecoder survives a corrupt WAV chunk size >= 2^31 (ADVICE r2)") {
    // A chunk whose unsigned le32 size has the high bit set: .toInt
    // would go negative, drive the walk index backwards, and the
    // String(bytes, i, 4) read threw StringIndexOutOfBoundsException
    // through round 2's narrower catch. Must degrade to valid=false.
    val evil = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ bytes(0xFF, 0xFF, 0xFF, 0xFF) ++ // size 2^32-1
      bytes(1, 2, 3, 4)
    val m = HeaderDecoder.decode(evil)
    assert(m.format == "wav" && !m.valid)
    // size merely larger than the asset (but positive as Int): same
    val tooBig = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ bytes(0x10, 0x27, 0, 0) ++ bytes(1, 0) // claims 10000
    assert(!HeaderDecoder.decode(tooBig).valid)
    // and trailing garbage AFTER valid fmt+data chunks is never read
    // (the walk stops once both are found) — stays valid
    val wavThenJunk = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0) ++
      bytes(1, 0) ++ bytes(2, 0) ++
      bytes(0x44, 0xAC, 0, 0) ++ bytes(0x10, 0xB1, 2, 0) ++
      bytes(4, 0) ++ bytes(16, 0) ++
      "data".getBytes ++ bytes(8, 0, 0, 0) ++ bytes(1, 2, 3, 4, 5, 6, 7, 8) ++
      bytes(0x7F, 0xFF, 0xFF, 0xFF) // truncated garbage chunk header
    assert(HeaderDecoder.decode(wavThenJunk).valid)
  }

  test("HeaderDecoder marks unknown and empty bytes invalid, never throws") {
    assert(!HeaderDecoder.decode("plain text".getBytes).valid)
    assert(!HeaderDecoder.decode(Array.empty[Byte]).valid)
    assert(!HeaderDecoder.decode(null).valid)
    assert(!HeaderDecoder.decode(bytes(0x89, 'P', 'N', 'G')).valid) // truncated PNG
  }

  // ---- distributed plumbing (stub decoder: shape-stable fake) ------

  test("withDecodedMeta attaches typed metadata per asset") {
    val out = Multimodal.withDecodedMeta(assets, "media", StubDecoder)
    val rows = out.select("asset_id", "media_meta.n_bytes", "media_meta.valid",
        "media_meta.width")
      .orderBy("asset_id").collect()
    assert(rows(0).getLong(1) == 11L && rows(0).getBoolean(2))
    assert(!rows(1).getBoolean(2)) // empty payload -> invalid
    assert(rows(2).getLong(1) == 37L)
    assert(rows(0).getInt(3) == 64 + 11 % 576)
  }

  test("withDecodedMeta with the real decoder classifies non-media bytes invalid") {
    val out = Multimodal.withDecodedMeta(assets, "media")
      .select("asset_id", "media_meta.format", "media_meta.valid")
      .orderBy("asset_id").collect()
    assert(out.forall(!_.getBoolean(2)))
    assert(out(0).getString(1) == "unknown" && out(1).getString(1) == "empty")
  }

  test("decode is deterministic across runs") {
    val a = Multimodal.withDecodedMeta(assets, "media", StubDecoder).select("media_meta").collect()
    val b = Multimodal.withDecodedMeta(assets, "media", StubDecoder).select("media_meta").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("withByteHistogram: exact normalized bins, zero vector for empty, ANN-ready floats") {
    val out = Multimodal.withByteHistogram(assets, "media")
      .select("asset_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out.values.forall(_.length == 256))
    // "hello world": 11 bytes, 'l' x3, 'o' x2, ' ' x1
    val h = out(1L)
    assert(math.abs(h('l'.toInt) - 3f / 11f) < 1e-7)
    assert(math.abs(h('o'.toInt) - 2f / 11f) < 1e-7)
    assert(math.abs(h(' '.toInt) - 1f / 11f) < 1e-7)
    assert(math.abs(h.sum - 1f) < 1e-5, "bins of a non-empty payload sum to 1")
    // empty payload: all-zero vector, no NaN from 0/0
    assert(out(2L).forall(_ == 0f))
    // the features feed the embedding stack directly
    val feats = Multimodal.withByteHistogram(assets, "media")
      .filter($"asset_id" =!= 2L).select($"asset_id", $"features")
    val sims = graft.ext.Similarity.bruteForceTopK(
      feats, feats, "asset_id", "features", k = 1)
    assert(sims.count() == 2)
  }

  test("Bmp codec: encode/decode round trip, padding, bottom-up and top-down") {
    import Multimodal.Bmp
    // 3x2 top-down RGB gradient; width 3 -> row stride 12 (padded)
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 11).toByte)
    val bmp = Bmp.encode(3, 2, rgb)
    assert(bmp.length == 54 + 12 * 2)
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    val Some((w, h, back)) = Bmp.decode(bmp)
    assert(w == 3 && h == 2 && back.toSeq == rgb.toSeq)
    // HeaderDecoder reads the same header
    val m = HeaderDecoder.decode(bmp)
    assert(m.format == "bmp" && m.valid && m.width == 3 && m.height == 2)
    // top-down variant (negative height) decodes to the same pixels
    val neg = bmp.clone()
    val td = -2
    neg(22) = (td & 0xff).toByte; neg(23) = ((td >> 8) & 0xff).toByte
    neg(24) = ((td >> 16) & 0xff).toByte; neg(25) = ((td >> 24) & 0xff).toByte
    // swap the two stored rows so the logical image is unchanged
    val rowA = bmp.slice(54, 66); val rowB = bmp.slice(66, 78)
    rowB.copyToArray(neg, 54); rowA.copyToArray(neg, 66)
    val Some((_, h2, back2)) = Bmp.decode(neg)
    assert(h2 == 2 && back2.toSeq == rgb.toSeq)
    // non-BMP / truncated / wrong-bpp degrade to None, never throw
    assert(Bmp.decode("not an image".getBytes).isEmpty)
    assert(Bmp.decode(bmp.take(40)).isEmpty)
    val bpp8 = bmp.clone(); bpp8(28) = 8
    assert(Bmp.decode(bpp8).isEmpty)
    // crafted header declaring ~2^30-pixel dims: the Int products
    // would wrap past the range guard — the dim cap rejects it
    // instead of allocating garbage-sized buffers
    val huge = bmp.clone()
    huge(18) = 0xff.toByte; huge(19) = 0xff.toByte
    huge(20) = 0xff.toByte; huge(21) = 0x3f.toByte // width = 0x3fffffff
    assert(Bmp.decode(huge).isEmpty)
  }

  test("resizeBmp: real nearest-neighbor pixels, undecodable -> null, deterministic") {
    import Multimodal.Bmp
    // 4x4 image with distinct per-pixel values: pixel (x,y) channel c
    // = 16*y + 4*x + c (all < 256)
    val rgb = Array.tabulate(4 * 4 * 3) { i =>
      val p = i / 3; val c = i % 3
      (16 * (p / 4) + 4 * (p % 4) + c).toByte
    }
    val src = Seq(
      (1L, Bmp.encode(4, 4, rgb)),
      (2L, "definitely not a bitmap".getBytes)
    ).toDF("asset_id", "media")
    val out = Multimodal.resizeBmp(src, "media", width = 2, height = 2)
      .select("asset_id", "resized", "resized_width", "resized_height")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3)))).toMap
    val (resized, w, h) = out(1L)
    assert(w == 2 && h == 2)
    // nearest-neighbor floor mapping: output (x,y) <- source (2x, 2y)
    val Some((_, _, px)) = Bmp.decode(resized)
    val expect = for { y <- Seq(0, 2); x <- Seq(0, 2); c <- 0 to 2 }
      yield (16 * y + 4 * x + c).toByte
    assert(px.toSeq == expect)
    // decoded metadata of the output carries the target dims
    val m = HeaderDecoder.decode(resized)
    assert(m.format == "bmp" && m.valid && m.width == 2 && m.height == 2)
    // undecodable input -> null payload, zero dims
    val (bad, bw, bh) = out(2L)
    assert(bad == null && bw == 0 && bh == 0)
    // checksum helper: exact RGB sum for the good asset, -1 for the bad
    val sums = Multimodal.withBmpPixelChecksum(src, "media")
      .select("asset_id", "pixel_checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums(1L) == rgb.map(_ & 0xff).sum.toLong)
    assert(sums(2L) == -1L)
    // upscale works too (1x1 -> 3x2 replicates the single pixel)
    val one = Seq((9L, Bmp.encode(1, 1, Array[Byte](10, 20, 30))))
      .toDF("asset_id", "media")
    val up = Multimodal.resizeBmp(one, "media", 3, 2)
      .select("resized").collect().head.getAs[Array[Byte]](0)
    val Some((uw, uh, upx)) = Bmp.decode(up)
    assert(uw == 3 && uh == 2 &&
      upx.toSeq == Seq.fill(6)(Seq[Byte](10, 20, 30)).flatten)
  }

  test("resampleBilinear: exact fixed-point interpolation, hand-computed") {
    import Multimodal.Bmp
    // 1-D case via a 2x1 image, channels (0,0,0) and (100,100,100):
    // 3-wide target samples positions 0, 1/2, 1 -> 0, 50, 100
    val row = Array[Byte](0, 0, 0, 100, 100, 100)
    val up = Bmp.resampleBilinear(2, 1, row, 3, 1)
    assert(up.toSeq.map(_ & 0xff) == Seq(0, 0, 0, 50, 50, 50, 100, 100, 100))
    // round-half-up: midpoint of 0 and 101 is 50.5 -> 51
    val odd = Bmp.resampleBilinear(2, 1,
      Array[Byte](0, 0, 0, 101, 101, 101), 3, 1)
    assert((odd(3) & 0xff) == 51)
    // 2-D: 2x2 corners 0/40/80/120, center of a 3x3 target averages
    // all four corners -> 60; corners stay exact (align-corners)
    val sq = Array[Byte](0, 0, 0, 40, 40, 40, 80, 80, 80, 120, 120, 120)
    val mid = Bmp.resampleBilinear(2, 2, sq, 3, 3)
    assert((mid(0) & 0xff) == 0 && (mid(2 * 3) & 0xff) == 40)
    assert((mid(6 * 3) & 0xff) == 80 && (mid(8 * 3) & 0xff) == 120)
    assert((mid(4 * 3) & 0xff) == 60, "center = mean of 4 corners")
    // identity resize returns the source pixels exactly
    val same = Bmp.resampleBilinear(2, 2, sq, 2, 2)
    assert(same.toSeq == sq.toSeq)
    // degenerate 1-wide target picks the left column
    val one = Bmp.resampleBilinear(2, 1, row, 1, 1)
    assert(one.toSeq == Seq[Byte](0, 0, 0))
    // mode plumbs through resizeBmp
    val src = Seq((1L, Bmp.encode(2, 1, row))).toDF("asset_id", "media")
    val viaDf = Multimodal.resizeBmp(src, "media", 3, 1, mode = "bilinear")
      .select("resized").collect().head.getAs[Array[Byte]](0)
    assert(Bmp.decode(viaDf).get._3.toSeq.map(_ & 0xff) ==
      Seq(0, 0, 0, 50, 50, 50, 100, 100, 100))
  }

  test("sampleFrames explodes sampled frame indices") {
    val out = Multimodal.sampleFrames(
      Multimodal.withDecodedMeta(assets, "media", StubDecoder), "media_meta", stride = 5)
    val byAsset = out.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // asset 1: n_frames = 1 + 11 % 29 = 12 -> frames 0,5,10 -> 3 rows
    assert(byAsset(1L) == 3L)
    // empty asset: n_frames 0 -> frameless, emits NO rows
    assert(!byAsset.contains(2L))
  }

  test("repartitionByBytes sizes partitions by media bytes") {
    val out = Multimodal.repartitionByBytes(assets, "media", targetBytes = 20L)
    assert(out.rdd.getNumPartitions == 2) // 48 bytes total / 20
    assert(out.count() == 3)
  }
}
