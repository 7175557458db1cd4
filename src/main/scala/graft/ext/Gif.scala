package graft.ext

/** Pure-JVM GIF codec — the third real pixel path beside
  * [[Multimodal.Bmp]] (raw bytes) and [[Multimodal.Png]] (zlib):
  * GIF's payload is LZW-compressed palette indices, and LZW is ~100
  * lines of integer/bit arithmetic needing no library. Decode walks
  * the 87a/89a container (logical screen descriptor, global/local
  * color tables, extension-block skipping), inflates the
  * variable-width LSB-first LZW stream (dictionary growth, width
  * bumps at 2^width, the KwKwK self-reference case, deferred-clear
  * handling at 4096), and maps indices through the active palette to
  * the same top-down row-major RGB triples the other codecs emit —
  * so GIFs flow through [[Multimodal.resizeImage]] and the checksum/
  * meta operators unchanged. Encode (fixture path) writes a
  * 256-entry grayscale global palette and a REAL LZW compressor
  * (matching dictionary/width schedule), so driver-checked data
  * exercises every decoder branch. Interlaced images and animation
  * frames beyond the first are out of scope and decode to None
  * (corrupt or unsupported input must degrade, never throw past the
  * codec boundary).
  *
  * Reference scope note: the reference engine has no image surface;
  * this is the multimodal extension (brief: opaque binary columns
  * with real decode where no library is needed).
  */
object Gif {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  // ---- LZW (GIF variant: LSB-first bit packing, 12-bit cap) --------

  /** Compress palette indices; `minCode` is the GIF "LZW minimum code
    * size" (8 for a 256-color palette). Classic compress schedule:
    * emit CLEAR first, add a dictionary entry per emitted code, widen
    * when the next free code crosses 2^width, emit CLEAR + reset when
    * the table is full. */
  private[graft] def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var nBits = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += nBits
      while (accBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    val table = new java.util.HashMap[Integer, Integer]()
    var freeEnt = end + 1
    emit(clear)
    if (indices.nonEmpty) {
      var ent = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val c = indices(i) & 0xff
        val key = (ent << 8) | c
        val hit = table.get(key)
        if (hit != null) ent = hit.intValue()
        else {
          emit(ent)
          if (freeEnt < 4096) {
            table.put(key, freeEnt); freeEnt += 1
            if (freeEnt > (1 << nBits) && nBits < 12) nBits += 1
          } else {
            emit(clear)
            table.clear(); freeEnt = end + 1; nBits = minCode + 1
          }
          ent = c
        }
        i += 1
      }
      emit(ent)
    }
    emit(end)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Decompress up to `expected` indices; None on a malformed stream
    * (bad code, missing data). Mirrors the giflib schedule: the slot
    * counter adds one entry per code after the first, width doubles
    * at top_slot, a full table keeps reading 12-bit codes until the
    * encoder's CLEAR arrives (deferred clear). */
  private[graft] def lzwDecode(data: Array[Byte], minCode: Int,
                             expected: Int): Option[Array[Byte]] = {
    if (minCode < 1 || minCode > 8) return None
    val clear = 1 << minCode
    val end = clear + 1
    val newCodes = end + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var outPos = 0
    var acc = 0L
    var accBits = 0
    var pos = 0
    var nBits = minCode + 1
    var topSlot = 1 << nBits
    var slot = newCodes
    var prev = -1
    var firstChar = 0
    def readCode(): Int = {
      while (accBits < nBits) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << accBits
        pos += 1; accBits += 8
      }
      val c = (acc & ((1L << nBits) - 1)).toInt
      acc >>>= nBits; accBits -= nBits
      c
    }
    // expand a code's string (walk suffix chain backwards)
    val stack = new Array[Byte](4097)
    while (outPos < expected) {
      val c = readCode()
      if (c < 0 || c > slot) return None
      if (c == clear) {
        nBits = minCode + 1; topSlot = 1 << nBits; slot = newCodes; prev = -1
      } else if (c == end) {
        return if (outPos == expected) Some(out) else None
      } else if (prev == -1) {
        if (c >= clear) return None // first code after clear must be literal
        out(outPos) = c.toByte; outPos += 1
        firstChar = c; prev = c
      } else {
        var sp = 0
        var cur = c
        if (c == slot) { // KwKwK: string = prev's string + prev's first char
          stack(sp) = firstChar.toByte; sp += 1
          cur = prev
        }
        while (cur >= newCodes) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        if (cur >= clear) return None
        stack(sp) = cur.toByte; sp += 1
        firstChar = cur
        while (sp > 0 && outPos < expected) {
          sp -= 1; out(outPos) = stack(sp); outPos += 1
        }
        if (sp > 0) return None // string overflows the declared pixel count
        if (slot < 4096) {
          prefix(slot) = prev; suffix(slot) = firstChar.toByte; slot += 1
          if (slot >= topSlot && topSlot < 4096) { topSlot <<= 1; nBits += 1 }
        }
        prev = c
      }
    }
    Some(out)
  }

  // ---- container ---------------------------------------------------

  /** Encode a non-interlaced GIF89a with a 256-entry GRAYSCALE global
    * palette: `indices(y*width + x)` is both the palette index and the
    * gray value of pixel (x, y) — the fixture form whose decoded RGB
    * is (v, v, v). */
  def encode(width: Int, height: Int, indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535 &&
      indices.length == width * height,
      "dimensions must be in [1, 65535] with indices.length == w*h")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // background index, aspect
    var v = 0
    while (v < 256) { out.write(v); out.write(v); out.write(v); v += 1 }
    out.write(0x2C) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0) // no LCT, not interlaced
    out.write(8) // LZW minimum code size
    val lzw = lzwEncode(indices, 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Decode the FIRST image of a GIF87a/89a into top-down row-major
    * RGB triples. Handles global and local color tables of any size,
    * skips extension blocks; interlaced images, truncated streams, or
    * LZW errors yield None. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (bytes == null || bytes.length < 13 || bytes(0) != 'G' ||
          bytes(1) != 'I' || bytes(2) != 'F') return None
      var i = 6
      val packed = bytes(i + 4) & 0xff
      i += 7
      var palette: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        palette = java.util.Arrays.copyOfRange(bytes, i, i + 3 * n)
        i += 3 * n
      }
      while (i < bytes.length) {
        (bytes(i) & 0xff) match {
          case 0x21 => // extension: label byte then sub-blocks
            i += 2
            while ((bytes(i) & 0xff) != 0) i += 1 + (bytes(i) & 0xff)
            i += 1
          case 0x2C =>
            val w = le16(bytes, i + 5)
            val h = le16(bytes, i + 7)
            val ipacked = bytes(i + 9) & 0xff
            i += 10
            if ((ipacked & 0x40) != 0) return None // interlaced unsupported
            var pal = palette
            if ((ipacked & 0x80) != 0) {
              val n = 2 << (ipacked & 7)
              pal = java.util.Arrays.copyOfRange(bytes, i, i + 3 * n)
              i += 3 * n
            }
            if (pal == null || w <= 0 || h <= 0 ||
                w.toLong * h * 3 > Int.MaxValue) return None
            val minCode = bytes(i) & 0xff
            i += 1
            val data = new java.io.ByteArrayOutputStream()
            while ((bytes(i) & 0xff) != 0) {
              val n = bytes(i) & 0xff
              data.write(bytes, i + 1, n)
              i += 1 + n
            }
            return lzwDecode(data.toByteArray, minCode, w * h).flatMap { idx =>
              val nColors = pal.length / 3
              val rgb = new Array[Byte](w * h * 3)
              var p = 0
              while (p < idx.length) {
                val ci = idx(p) & 0xff
                if (ci >= nColors) return None
                rgb(3 * p) = pal(3 * ci)
                rgb(3 * p + 1) = pal(3 * ci + 1)
                rgb(3 * p + 2) = pal(3 * ci + 2)
                p += 1
              }
              Some((w, h, rgb))
            }
          case 0x3B => return None // trailer before any image
          case _ => return None
        }
      }
      None
    } catch {
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
    }
  }
}
