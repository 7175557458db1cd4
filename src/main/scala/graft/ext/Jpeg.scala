package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** JPEG codec over `javax.imageio` — the one raster format where a
  * hand-rolled decoder is unjustified (a DCT/Huffman stack would be
  * both slow and a re-implementation risk) while the JDK already
  * ships a complete baseline codec in `java.desktop`. Unlike
  * [[Multimodal.Bmp]]/[[Multimodal.Png]]/[[Gif]], JPEG is LOSSY, so
  * no SQL oracle can replay decoded pixels bit-exactly; driver
  * checks therefore pin (a) the header/dimension round trip exactly
  * and (b) decoded pixels against the known source within a fixed
  * error tolerance — a count the oracle predicts exactly (see
  * q201). Probed in this environment: the JDK 17 `java.desktop`
  * module is present and its JPEG plugin encodes+decodes headless.
  *
  * Everything here is static and partition-local (no AWT toolkit,
  * no display): safe inside `mapPartitions` on executors.
  */
object Jpeg {

  // ImageIO never needs a display for raster codecs, but pin
  // headless so no code path ever probes for one on an executor.
  System.setProperty("java.awt.headless", "true")

  /** Encode row-major RGB triplets as baseline JPEG at `quality`
    * (0..1). Input layout matches [[Multimodal.Bmp.encode]]:
    * `rgb((y*w + x)*3 + c)` with c = 0 (R), 1 (G), 2 (B). */
  def encode(width: Int, height: Int, rgb: Array[Byte],
             quality: Float = 0.92f): Array[Byte] = {
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
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode a JPEG to (width, height, row-major RGB) — the
    * [[Multimodal.decodeRgb]] contract. Undecodable bytes (wrong
    * magic, truncated stream, codec error) yield None, never an
    * exception: the degrade-to-null discipline every partition-batch
    * operator here relies on. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 3 ||
        (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
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
