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

  test("Png codec: encode/decode round trip across every filter type") {
    import Multimodal.Png
    // height 7 cycles the default per-row filter through 0..4 twice —
    // all five reconstruction branches run; width 5 gives each row a
    // left neighbor from byte 3 on
    for ((w, h) <- Seq((1, 1), (2, 3), (5, 7), (31, 23))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val png = Png.encode(w, h, rgb)
      val Some((dw, dh, back)) = Png.decode(png)
      assert(dw == w && dh == h, s"dims for ${w}x$h")
      assert(back.toSeq == rgb.toSeq, s"pixels for ${w}x$h")
      // HeaderDecoder reads the same IHDR
      val m = HeaderDecoder.decode(png)
      assert(m.format == "png" && m.valid && m.width == w && m.height == h)
    }
    // a single forced filter type also round-trips (each in isolation)
    for (ft <- 0 to 4) {
      val rgb = Array.tabulate(4 * 3 * 3)(i => ((i * 53) % 256).toByte)
      val png = Png.encode(4, 3, rgb, rowFilter = _ => ft)
      assert(Png.decode(png).get._3.toSeq == rgb.toSeq, s"filter $ft")
    }
  }

  test("Png decode: hand-authored stored-deflate golden pins Sub/Paeth math") {
    import Multimodal.Png
    // 2x2 RGB, row 0 filtered with Sub, row 1 with Paeth — the
    // filtered bytes below are computed BY HAND from the spec, and the
    // zlib stream is a stored (uncompressed) deflate block, so this
    // golden exercises the decoder against spec arithmetic independent
    // of our encoder. Pixels: (1,2,3)(5,6,7) / (10,20,30)(40,50,60).
    val raw = bytes(
      1, 1, 2, 3, 4, 4, 4,    // ft=1 (Sub): p0 as-is, p1 minus left
      4, 9, 18, 27, 30, 30, 30) // ft=4 (Paeth): row 0 then left wins
    val zlib = bytes(0x78, 0x01,             // zlib header, 32K window
      0x01, raw.length, 0x00,                // BFINAL=1 BTYPE=00, LEN le16
      0xff - raw.length, 0xff) ++ raw ++     // NLEN = ~LEN
      bytes(0x02, 0x9A, 0x00, 0xA8)          // adler32(raw), hand-computed
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      val v = crc.getValue
      bytes((data.length >> 24) & 0xff, (data.length >> 16) & 0xff,
            (data.length >> 8) & 0xff, data.length & 0xff) ++ t ++ data ++
        bytes(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
              ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)
    }
    val ihdr = bytes(0, 0, 0, 2, 0, 0, 0, 2, 8, 2, 0, 0, 0)
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zlib) ++
      chunk("IEND", Array.emptyByteArray)
    val Some((w, h, px)) = Png.decode(png)
    assert(w == 2 && h == 2)
    assert(px.toSeq.map(_ & 0xff) ==
      Seq(1, 2, 3, 5, 6, 7, 10, 20, 30, 40, 50, 60))
    // RGBA (color type 6) decodes with alpha stripped: same stored-
    // block trick, 1x2, filter 0 rows
    val rawA = bytes(0, 1, 2, 3, 200, 0, 10, 20, 30, 100)
    val ad = { // adler32 of rawA via the JDK (Inflater validates it)
      val a = new java.util.zip.Adler32(); a.update(rawA); a.getValue
    }
    val zlibA = bytes(0x78, 0x01, 0x01, rawA.length, 0x00,
      0xff - rawA.length, 0xff) ++ rawA ++
      bytes(((ad >> 24) & 0xff).toInt, ((ad >> 16) & 0xff).toInt,
            ((ad >> 8) & 0xff).toInt, (ad & 0xff).toInt)
    val ihdrA = bytes(0, 0, 0, 1, 0, 0, 0, 2, 8, 6, 0, 0, 0)
    val pngA = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdrA) ++ chunk("IDAT", zlibA) ++
      chunk("IEND", Array.emptyByteArray)
    val Some((wa, ha, pxa)) = Png.decode(pngA)
    assert(wa == 1 && ha == 2)
    assert(pxa.toSeq.map(_ & 0xff) == Seq(1, 2, 3, 10, 20, 30))
  }

  test("Png decode: corrupt and unsupported inputs degrade to None") {
    import Multimodal.Png
    val rgb = Array.tabulate(3 * 3 * 3)(i => (i * 7).toByte)
    val good = Png.encode(3, 3, rgb)
    assert(Png.decode(good).nonEmpty)
    assert(Png.decode(null).isEmpty)
    assert(Png.decode("not a png at all".getBytes).isEmpty)
    assert(Png.decode(good.take(30)).isEmpty)        // truncated mid-chunk
    assert(Png.decode(good.dropRight(12)).isEmpty)   // missing IEND
    val badCrc = good.clone()
    badCrc(good.length - 13) = (badCrc(good.length - 13) ^ 0x40).toByte // inside IDAT
    assert(Png.decode(badCrc).isEmpty)
    val palette = good.clone(); palette(25) = 3      // color type 3 (palette)
    assert(Png.decode(palette).isEmpty)              // (CRC now wrong too)
    val deep = good.clone(); deep(24) = 16           // 16-bit depth
    assert(Png.decode(deep).isEmpty)
    // declared dims too large for the payload: IHDR says 300x3 but
    // the IDAT inflates to 3x3 worth of bytes -> incomplete -> None
    // (patch dims AND recompute the CRC so only the size check fires)
    val bigDims = good.clone()
    bigDims(18) = 0x01; bigDims(19) = 0x2c.toByte    // width 300 (BE at 16..19)
    val crc = new java.util.zip.CRC32()
    crc.update(bigDims, 12, 17) // IHDR type + 13 data bytes
    val v = crc.getValue
    bigDims(29) = ((v >> 24) & 0xff).toByte; bigDims(30) = ((v >> 16) & 0xff).toByte
    bigDims(31) = ((v >> 8) & 0xff).toByte; bigDims(32) = (v & 0xff).toByte
    assert(Png.decode(bigDims).isEmpty)
  }

  test("resizeImage: PNG in, BMP out, decoded source dims; sniffing") {
    import Multimodal.{Bmp, Png}
    val rgb = Array.tabulate(4 * 4 * 3) { i =>
      val p = i / 3; val c = i % 3
      (16 * (p / 4) + 4 * (p % 4) + c).toByte
    }
    val src = Seq(
      (1L, Png.encode(4, 4, rgb)),
      (2L, Bmp.encode(4, 4, rgb)),
      (3L, "neither format".getBytes)
    ).toDF("asset_id", "media")
    val out = Multimodal.resizeImage(src, "media", 2, 2)
      .select("asset_id", "resized", "resized_src_w", "resized_src_h")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3)))).toMap
    // PNG and BMP inputs with identical pixels resize identically
    val (fromPng, pw, ph) = out(1L)
    val (fromBmp, bw, bh) = out(2L)
    assert(pw == 4 && ph == 4 && bw == 4 && bh == 4)
    assert(fromPng.toSeq == fromBmp.toSeq)
    val Some((_, _, px)) = Bmp.decode(fromPng)
    val expect = for { y <- Seq(0, 2); x <- Seq(0, 2); c <- 0 to 2 }
      yield (16 * y + 4 * x + c).toByte
    assert(px.toSeq == expect)
    // unknown format: null payload, zero source dims
    val (bad, zw, zh) = out(3L)
    assert(bad == null && zw == 0 && zh == 0)
    // oversized target fails fast on the driver (ADVICE r11)
    intercept[IllegalArgumentException] {
      Multimodal.resizeImage(src, "media", 40000, 30000)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resizeBmp(src, "media", 40000, 30000)
    }
  }

  test("withSyntheticPng: gradient survives the real zlib round trip") {
    import Multimodal.Png
    val docs = Seq((3L, 5, 7), (12L, 1, 1)).toDF("doc_id", "w", "h")
    val rows = Multimodal.withSyntheticPng(docs, "doc_id", "w", "h")
      .select("doc_id", "w", "h", "img").collect()
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val Some((dw, dh, px)) = Png.decode(r.getAs[Array[Byte]](3))
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert((px((y * w + x) * 3 + c) & 0xff) ==
          ((id + 7 * x + 13 * y + 29 * c) % 256).toInt)
    }
    // and the q127 shape: PNG source and BMP source produce identical
    // resize checksums (the PNG layer is lossless)
    val viaPng = Multimodal.withBmpPixelChecksum(
      Multimodal.resizeImage(
        Multimodal.withSyntheticPng(docs, "doc_id", "w", "h"),
        "img", 8, 5, mode = "bilinear"), "resized")
      .select("doc_id", "pixel_checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBmp = Multimodal.withBmpPixelChecksum(
      Multimodal.resizeBmp(
        Multimodal.withSyntheticBmp(docs, "doc_id", "w", "h"),
        "img", 8, 5, mode = "bilinear"), "resized")
      .select("doc_id", "pixel_checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPng == viaBmp)
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

  // ---- GIF: pure-JVM LZW codec -------------------------------------

  test("GIF LZW round-trips growth, width bumps, table-full resets, and KwKwK") {
    import graft.ext.Gif
    // varied stream long enough to push the dictionary past every
    // width bump (512/1024/2048) and through a full-table reset
    val varied = Array.tabulate(60000)(i => ((i * i + 7 * i) % 251).toByte)
    assert(Gif.lzwDecode(Gif.lzwEncode(varied, 8), 8, varied.length)
      .get.toSeq == varied.toSeq)
    // constant stream: the decoder's first post-literal code is always
    // the just-created entry — the KwKwK self-reference branch
    val constant = Array.fill(500)(42.toByte)
    assert(Gif.lzwDecode(Gif.lzwEncode(constant, 8), 8, constant.length)
      .get.toSeq == constant.toSeq)
    // small alphabet exercises narrow initial code widths
    val bits = Array.tabulate(1000)(i => (i % 2).toByte)
    assert(Gif.lzwDecode(Gif.lzwEncode(bits, 2), 2, bits.length)
      .get.toSeq == bits.toSeq)
    // truncated stream must degrade, not throw or fabricate pixels
    val enc = Gif.lzwEncode(varied, 8)
    assert(Gif.lzwDecode(enc.take(enc.length / 2), 8, varied.length).isEmpty)
  }

  test("Gif container round-trips the grayscale gradient; corrupt input degrades") {
    import graft.ext.Gif
    val w = 23; val h = 17
    val idx = Array.tabulate(w * h)(p => ((5 + 7 * (p % w) + 13 * (p / w)) % 256).toByte)
    val bytes = Gif.encode(w, h, idx)
    val Some((dw, dh, rgb)) = Gif.decode(bytes)
    assert(dw == w && dh == h)
    for (p <- 0 until w * h; c <- 0 until 3)
      assert((rgb(3 * p + c) & 0xff) == (idx(p) & 0xff))
    // the generic header decoder agrees on dims
    val meta = HeaderDecoder.decode(bytes)
    assert(meta.format == "gif" && meta.valid && meta.width == w && meta.height == h)
    // degrade paths
    assert(Gif.decode(bytes.take(12)).isEmpty)           // truncated header
    assert(Gif.decode(bytes.dropRight(40)).isEmpty)      // truncated payload
    val interlaced = bytes.clone()
    interlaced(6 + 7 + 768 + 9) = 0x40.toByte            // image-descriptor packed
    assert(Gif.decode(interlaced).isEmpty)
    assert(Gif.decode("not a gif".getBytes).isEmpty)
    assert(Gif.decode(null).isEmpty)
  }

  test("decodeRgb routes GIFs into the shared pixel operators") {
    import graft.ext.Multimodal
    val docs = Seq((4L, 9, 7)).toDF("doc_id", "w", "h")
    val gifs = Multimodal.withSyntheticGif(docs, "doc_id", "w", "h")
    val r = Multimodal.withBmpPixelChecksum(
        Multimodal.resizeImage(gifs, "img", 8, 5, mode = "bilinear"), "resized")
      .select("resized_src_w", "resized_src_h", "pixel_checksum").head()
    assert(r.getInt(0) == 9 && r.getInt(1) == 7)
    // grayscale source: every channel interpolates the same plane, so
    // the checksum is 3x the single-channel bilinear sum — computed
    // here by replaying the exact fixed-point arithmetic
    def v(x: Int, y: Int): Long = (4 + 7 * x + 13 * y) % 256
    var sum = 0L
    for (x <- 0 until 8; y <- 0 until 5) {
      val (i0, rx) = ((x * 8) / 7, (x * 8) % 7)
      val i1 = math.min(i0 + 1, 8)
      val (j0, ry) = ((y * 6) / 4, (y * 6) % 4)
      val j1 = math.min(j0 + 1, 6)
      val num = (7 - rx) * (4 - ry) * v(i0, j0) + rx * (4 - ry) * v(i1, j0) +
        (7 - rx) * ry * v(i0, j1) + rx * ry * v(i1, j1)
      sum += (2 * num + 28) / 56
    }
    assert(r.getLong(2) == 3 * sum)
  }

  // ---- JPEG: the javax.imageio lossy codec -------------------------

  test("Jpeg: real codec round trip preserves dims; smooth gray within tolerance") {
    import graft.ext.Jpeg
    val (w, h) = (16, 9)
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb((y * w + x) * 3 + c) = math.min(255, 40 + 2 * x + 3 * y).toByte
    val jpeg = Jpeg.encode(w, h, rgb, 0.92f)
    // real JPEG magic + EOI
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val Some((dw, dh, back)) = Jpeg.decode(jpeg)
    assert(dw == w && dh == h)
    val maxErr = rgb.indices.map(i =>
      math.abs((rgb(i) & 0xff) - (back(i) & 0xff))).max
    assert(maxErr <= 8, s"smooth-gradient JPEG error $maxErr")
    // lossy but not trivially pass-through: once past the fixed
    // table/header overhead (~600 bytes, which dominates a 16x9
    // fixture), the payload is a real compressed stream — a 64x64
    // smooth gradient must come out far smaller than its raw pixels
    val big = new Array[Byte](64 * 64 * 3)
    for (y <- 0 until 64; x <- 0 until 64; c <- 0 until 3)
      big((y * 64 + x) * 3 + c) = math.min(255, x + 2 * y).toByte
    assert(Jpeg.encode(64, 64, big, 0.92f).length < big.length / 2)
  }

  test("Jpeg.decode degrades to None on junk, truncation, and wrong magic") {
    import graft.ext.Jpeg
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode("BMnotajpeg".getBytes).isEmpty)
    val good = Jpeg.encode(4, 4, new Array[Byte](48), 0.9f)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty)
  }

  test("decodeRgb routes JPEGs through resize; withPixelMaxAbsDiff pins fidelity") {
    import graft.ext.Multimodal
    val docs = Seq((7L, 20, 13)).toDF("doc_id", "w", "h")
    val jp = Multimodal.withSyntheticJpeg(docs, "doc_id", "w", "h", "jpg")
    val both = Multimodal.withSyntheticSmoothBmp(jp, "doc_id", "w", "h", "ref")
    val rj = Multimodal.resizeImage(both, "jpg", 8, 5, out = "rj",
      mode = "bilinear")
    val rr = Multimodal.resizeImage(rj, "ref", 8, 5, out = "rr",
      mode = "bilinear")
    val r = Multimodal.withPixelMaxAbsDiff(rr, "rj", "rr", "err")
      .select("rj_src_w", "rj_src_h", "rr_src_w", "rr_src_h", "err").head()
    assert(r.getInt(0) == 20 && r.getInt(1) == 13) // decoded SOF dims
    assert(r.getInt(2) == 20 && r.getInt(3) == 13)
    val err = r.getLong(4)
    assert(err >= 0 && err <= 12, s"resampled JPEG-vs-lossless error $err")
  }

  test("withPixelMaxAbsDiff: zero on identical, exact on known diff, -1 contracts") {
    import graft.ext.Multimodal
    val base = Seq((3L, 6, 4)).toDF("doc_id", "w", "h")
    val a = Multimodal.withSyntheticSmoothBmp(base, "doc_id", "w", "h", "a")
    val same = Multimodal.withSyntheticSmoothBmp(a, "doc_id", "w", "h", "b")
    assert(Multimodal.withPixelMaxAbsDiff(same, "a", "b").select("max_abs_diff")
      .head().getLong(0) == 0L)
    // different gradients: smooth (id%64 + 2x + 3y, capped) vs the
    // classic (id + 7x + 13y + 29c) % 256 — compute expected driver-side
    val diff = Multimodal.withSyntheticBmp(a, "doc_id", "w", "h", "b")
    val exp = (for (y <- 0 until 4; x <- 0 until 6; c <- 0 until 3) yield
      math.abs(math.min(255, 3 + 2 * x + 3 * y) - ((3 + 7 * x + 13 * y + 29 * c) % 256))).max
    assert(Multimodal.withPixelMaxAbsDiff(diff, "a", "b").select("max_abs_diff")
      .head().getLong(0) == exp.toLong)
    // dim mismatch and undecodable input both report -1, never a pass
    val wider = base.withColumn("w2", lit(7))
    val mism = Multimodal.withSyntheticSmoothBmp(
      Multimodal.withSyntheticSmoothBmp(wider, "doc_id", "w", "h", "a"),
      "doc_id", "w2", "h", "b")
    assert(Multimodal.withPixelMaxAbsDiff(mism, "a", "b").select("max_abs_diff")
      .head().getLong(0) == -1L)
    val junk = a.withColumn("b", lit("nope".getBytes))
    assert(Multimodal.withPixelMaxAbsDiff(junk, "a", "b").select("max_abs_diff")
      .head().getLong(0) == -1L)
  }

  test("Tiff: lossless ImageIO round trip; registry routes both byte orders; junk degrades") {
    import graft.ext.{Multimodal, Tiff}
    val (w, h) = (13, 9)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val t = Tiff.encode(w, h, rgb)
    // JDK writes big-endian ("MM *"); decode must accept it...
    val Some((dw, dh, back)) = Tiff.decode(t)
    assert(dw == w && dh == h && back.toSeq == rgb.toSeq) // bit-exact
    // ...and the shared registry must route it like BMP/PNG/GIF/JPEG
    assert(Multimodal.decodeRgb(t).map(_._3.toSeq).contains(rgb.toSeq))
    // hand-built little-endian header is recognized (decode path),
    // junk with a TIFF-ish prefix degrades to None
    assert(Tiff.decode("II* garbagegarbage".getBytes("ISO-8859-1")).isEmpty)
    assert(Tiff.decode("MMnope___".getBytes).isEmpty)
    assert(Tiff.decode(null).isEmpty)
  }

  // ---- video: frame container + real frame extraction --------------

  test("Video.Container round-trips and seeks over skipped frames") {
    import graft.ext.Video.Container
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](), Array[Byte](9),
      Array[Byte](4, 5), Array[Byte](7))
    val bytes = Container.encode(frames)
    assert(Container.decodeFrames(bytes).get.map(_.toSeq) == frames.map(_.toSeq))
    val Some((n, kept)) = Container.sampledFrames(bytes, stride = 2)
    assert(n == 5 && kept.map(_._1) == Vector(0, 2, 4))
    assert(kept.map(_._2.toSeq) == Vector(Seq[Byte](1, 2, 3), Seq[Byte](9), Seq[Byte](7)))
    // corrupt input degrades to None, never throws
    assert(Container.sampledFrames(bytes.dropRight(1), 1).isEmpty) // truncated payload
    assert(Container.sampledFrames(bytes.take(7), 1).isEmpty)      // truncated header
    assert(Container.sampledFrames("JUNKJUNK".getBytes, 1).isEmpty)
    assert(Container.sampledFrames(null, 1).isEmpty)
  }

  test("extractFrames yields decodable BMP frames with the gradient pixels") {
    import graft.ext.{Multimodal, Video}
    import graft.ext.Multimodal.Bmp
    val docs = Seq((3L, 5, 4, 3), (8L, 1, 2, 2)).toDF("doc_id", "nf", "w", "h")
    val vids = Video.withSyntheticVideo(docs, "doc_id", "nf", "w", "h")
    val rows = Video.extractFrames(vids, "video", stride = 2)
      .select("doc_id", "frame", "frame_idx", "frame_count", "w", "h")
      .collect()
    // doc 3: frames 0,2,4 of 5; doc 8: frame 0 of 1
    assert(rows.map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSet ==
      Set((3L, 0, 5), (3L, 2, 5), (3L, 4, 5), (8L, 0, 1)))
    rows.foreach { r =>
      val (id, f, w, h) = (r.getLong(0), r.getInt(2), r.getInt(4), r.getInt(5))
      val Some((dw, dh, px)) = Bmp.decode(r.getAs[Array[Byte]](1))
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert((px((y * w + x) * 3 + c) & 0xff) ==
          ((id + 11 * f + 7 * x + 13 * y + 29 * c) % 256).toInt)
    }
    // corrupt container -> one visible row with null payload and -1 markers
    val junk = Seq((9L, "not a video".getBytes.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "video")
    val bad = Video.extractFrames(junk, "video", 2).collect()
    assert(bad.length == 1 && bad(0).getAs[Array[Byte]]("frame") == null &&
      bad(0).getAs[Int]("frame_idx") == -1 && bad(0).getAs[Int]("frame_count") == -1)
  }

  // ---- audio: pure-JVM PCM WAV codec + sample pipeline -------------

  test("Wav codec round-trips mono and stereo 16-bit PCM") {
    import graft.ext.Audio.Wav
    val mono = Array[Short](0, 100, -32768, 32767, -1)
    val Some((sr, ch, got)) = Wav.decode(Wav.encode(8000, 1, mono))
    assert(sr == 8000 && ch == 1 && got.toSeq == mono.toSeq)
    val stereo = Array[Short](1, -1, 2, -2, 3, -3) // 3 frames interleaved
    val Some((sr2, ch2, got2)) = Wav.decode(Wav.encode(44100, 2, stereo))
    assert(sr2 == 44100 && ch2 == 2 && got2.toSeq == stereo.toSeq)
    // the generic header decoder agrees on the encoded stream's frames
    val meta = HeaderDecoder.decode(Wav.encode(44100, 2, stereo))
    assert(meta.format == "wav" && meta.valid && meta.n_frames == 3)
  }

  test("Wav.decode rejects non-PCM, non-16-bit, and truncated input") {
    import graft.ext.Audio.Wav
    val good = Wav.encode(8000, 1, Array[Short](1, 2, 3))
    assert(Wav.decode(good.take(40)).isEmpty)          // truncated header
    assert(Wav.decode(good.dropRight(1)).isEmpty)      // data escapes buffer
    val nonPcm = good.clone(); nonPcm(20) = 3          // IEEE float format tag
    assert(Wav.decode(nonPcm).isEmpty)
    val eightBit = good.clone(); eightBit(34) = 8      // bits-per-sample
    assert(Wav.decode(eightBit).isEmpty)
    assert(Wav.decode(Array.emptyByteArray).isEmpty)
    assert(Wav.decode(null).isEmpty)
  }

  test("synthetic WAV -> decimate -> features matches hand computation") {
    import graft.ext.Audio
    val docs = Seq((0L, 10), (5L, 7)).toDF("doc_id", "n")
    val out = Audio.withWavFeatures(
      Audio.decimate(
        Audio.withSyntheticWav(docs, "doc_id", "n", 8000, "wav"),
        "wav", 3),
      "resampled", "audio")
      .select("doc_id", "n", "resampled_sr", "audio_sr", "audio_n",
        "audio_energy", "audio_zero_cross", "audio_peak")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    def sample(id: Long, i: Int): Long = ((id * 31 + i * 7919L) % 65536) - 32768
    for ((id, n) <- Seq((0L, 10), (5L, 7))) {
      val kept = (0 until n by 3).map(i => sample(id, i))
      val zc = kept.sliding(2).count { case Seq(a, b) => (a < 0) != (b < 0) }
      val (sr, srF, nOut, energy, zcGot, peak) = out(id)
      assert(sr == 2666 && srF == 2666) // 8000/3, re-decoded from the header
      assert(nOut == kept.size)
      assert(energy == kept.map(v => v * v).sum)
      assert(zcGot == zc)
      assert(peak == kept.map(math.abs).max)
    }
  }

  test("resampleLinear interpolates exactly (round half up) per channel") {
    import graft.ext.Audio
    import graft.ext.Audio.Wav
    // upsample 2 frames to 3 at 8000 -> 12000: midpoint of (0, 101)
    // rounds half-up to 51; stereo channel (-101, 0) rounds -50.5 up
    // to -50 (offset-space arithmetic IS floor on signed values)
    val stereo = Array[Short](0, -101, 101, 0)
    val df = Seq((1L, Wav.encode(8000, 2, stereo))).toDF("id", "wav")
    val rows = Audio.resampleLinear(df, "wav", 12000)
      .select("resampled", "resampled_sr", "resampled_n").head()
    val Some((sr, ch, got)) = Wav.decode(rows.getAs[Array[Byte]](0))
    assert(sr == 12000 && ch == 2 && rows.getInt(1) == 12000 && rows.getInt(2) == 3)
    assert(got.toSeq == Seq[Short](0, -101, 51, -50, 101, 0))
    // downsample via the same path: 4 frames -> 2 keeps the corners
    val mono = Array[Short](7, 100, -100, -7)
    val df2 = Seq((1L, Wav.encode(8000, 1, mono))).toDF("id", "wav")
    val r2 = Audio.resampleLinear(df2, "wav", 4000)
    val Some((_, _, got2)) = Wav.decode(r2.select("resampled").head().getAs[Array[Byte]](0))
    assert(got2.toSeq == Seq[Short](7, -7))
    // junk degrades
    val bad = Seq((1L, "junk".getBytes.asInstanceOf[Array[Byte]])).toDF("id", "wav")
    val rb = Audio.resampleLinear(bad, "wav", 4000)
      .select("resampled", "resampled_sr", "resampled_n").head()
    assert(rb.get(0) == null && rb.getInt(1) == 0 && rb.getInt(2) == 0)
  }

  test("frameFeatures emits per-frame energy rows with a partial tail frame") {
    import graft.ext.Audio
    import graft.ext.Audio.Wav
    // 5 mono samples, frame size 2 -> frames (3,4), (-5,0), (12)
    val df = Seq(
      (1L, Wav.encode(8000, 1, Array[Short](3, 4, -5, 0, 12))),
      (2L, "junk".getBytes.asInstanceOf[Array[Byte]]))
      .toDF("id", "wav")
    val rows = Audio.frameFeatures(df, "wav", frameSize = 2)
      .select("id", "frame_idx", "frame_n", "frame_energy", "frame_peak")
      .orderBy("id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, 0, 2, 25L, 4L), (1L, 1, 2, 25L, 5L), (1L, 2, 1, 144L, 12L),
      (2L, -1, 0, -1L, -1L)))
  }

  test("extractPatches tiles any decodable format with exact edge handling") {
    import graft.ext.Multimodal
    // 5x3 gradient as GIF (exercises the codec registry): 4x4 patches
    // -> grid 2x1 with widths 4 and 1, heights 3
    val docs = Seq((2L, 5, 3)).toDF("doc_id", "w", "h")
    val gifs = Multimodal.withSyntheticGif(docs, "doc_id", "w", "h")
    val rows = Multimodal.extractPatches(gifs, "img", 4, 4)
      .select("patch_x", "patch_y", "patch_w", "patch_h", "patch_checksum", "patch")
      .orderBy("patch_x").collect()
    def v(x: Int, y: Int): Long = (2 + 7 * x + 13 * y) % 256
    val sums = Seq(
      (for (x <- 0 until 4; y <- 0 until 3) yield 3 * v(x, y)).sum,
      (for (x <- 4 until 5; y <- 0 until 3) yield 3 * v(x, y)).sum)
    assert(rows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSeq ==
      Seq((0, 0, 4, 3, sums(0)), (1, 0, 1, 3, sums(1))))
    // patch bytes are the raw row-major tile (gray triples)
    val edge = rows(1).getAs[Array[Byte]](5)
    assert(edge.length == 1 * 3 * 3)
    assert((edge(0) & 0xff) == v(4, 0) && (edge(3) & 0xff) == v(4, 1))
    // undecodable -> one visible marker row
    val junk = Seq((9L, "nope".getBytes.asInstanceOf[Array[Byte]])).toDF("doc_id", "img")
    val bad = Multimodal.extractPatches(junk, "img", 4, 4).collect()
    assert(bad.length == 1 && bad(0).getAs[Array[Byte]]("patch") == null &&
      bad(0).getAs[Long]("patch_checksum") == -1L)
  }

  test("decimate is channel-aware (keeps whole frames) and degrades on junk") {
    import graft.ext.Audio
    import graft.ext.Audio.Wav
    // 5 stereo frames: frame f = (10f, -10f); decimate by 2 keeps f = 0,2,4
    val stereo = (0 until 5).flatMap(f => Seq((10 * f).toShort, (-10 * f).toShort)).toArray
    val df = Seq((1L, Wav.encode(8000, 2, stereo)), (2L, "junk".getBytes.asInstanceOf[Array[Byte]]))
      .toDF("id", "wav")
    val rows = Audio.decimate(df, "wav", 2).orderBy("id")
      .select("id", "resampled", "resampled_sr", "resampled_n").collect()
    val Some((sr, ch, kept)) = Wav.decode(rows(0).getAs[Array[Byte]](1))
    assert(sr == 4000 && ch == 2 && rows(0).getInt(3) == 3)
    assert(kept.toSeq == Seq[Short](0, 0, 20, -20, 40, -40))
    assert(rows(1).get(1) == null && rows(1).getInt(2) == 0 && rows(1).getInt(3) == 0)
  }

  test("withGrayHistEq: exact cdf remap — uniform, two-level and undecodable") {
    import Multimodal.Bmp
    // uniform image: every pixel remaps to (n·255) div n = 255
    val uni = Bmp.encode(4, 3, Array.fill(4 * 3 * 3)(60.toByte))
    // two-level image: 8 gray-0 pixels and 4 gray-120 pixels ->
    // cdf_le(0)=8, cdf_le(30)=12; remaps (8·255)//12=170 and
    // (12·255)//12=255 -> eq sum = 8·170 + 4·255 = 2380
    val two = Bmp.encode(4, 3,
      (Array.fill(8 * 3)(0.toByte) ++ Array.fill(4 * 3)(120.toByte)))
    val df = Seq(
      (1L, uni), (2L, two), (3L, Array[Byte](1, 2, 3))
    ).toDF("id", "img")
    val got = Multimodal.withGrayHistEq(df, "img")
      .select($"id", $"histeq_n_px", $"histeq_gray_checksum",
        $"histeq_eq_checksum")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((12L, 12L * 60, 12L * 255)))
    assert(got(2L) === ((12L, 4L * 120, 8L * 170 + 4L * 255)))
    assert(got(3L) === ((0L, -1L, -1L)))
  }
}
