package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** TIFF codec over `javax.imageio` (java.desktop ships a TIFF plugin
  * since JDK 9) — unlike [[Jpeg]], TIFF is LOSSLESS here, so its
  * pixel pipelines carry the same exact-checksum oracle contract as
  * the hand-rolled [[Multimodal.Bmp]]/[[Multimodal.Png]] codecs
  * (probed in this container: RGB round trip is bit-exact). Same
  * degrade-to-None discipline; registered in
  * [[Multimodal.decodeRgb]] under both byte orders ("II*\0" /
  * "MM\0*").
  */
object Tiff {

  System.setProperty("java.awt.headless", "true")

  /** Encode row-major RGB triplets (the [[Multimodal.Bmp.encode]]
    * layout) as TIFF. */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      "rgb must be width*height*3 bytes")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        img.setRGB(x, y, ((rgb(i) & 0xff) << 16) |
          ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "tiff", bos)
    bos.toByteArray
  }

  /** Decode to (width, height, row-major RGB); None on junk. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I' &&
      (bytes(2) & 0xff) == 42 && bytes(3) == 0
    val be = bytes(0) == 'M' && bytes(1) == 'M' &&
      bytes(2) == 0 && (bytes(3) & 0xff) == 42
    if (!le && !be) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h * 3L > Int.MaxValue) return None
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val i = (y * w + x) * 3
          rgb(i) = ((p >> 16) & 0xff).toByte
          rgb(i + 1) = ((p >> 8) & 0xff).toByte
          rgb(i + 2) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, rgb))
    } catch {
      case _: Exception => None
    }
  }
}
