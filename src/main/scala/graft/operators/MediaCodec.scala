package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image codec on the JDK's `javax.imageio` (pure-JVM PNG/BMP —
  * no native libraries, headless-safe). Media payloads are encoded
  * bytes in a `binary` column; pixels exist only transiently inside
  * the scan-stage kernel that consumes them, so blobs never outlive
  * their projection.
  *
  * Pixel layout: row-major RGB triples — index (y·w + x)·3 + c with
  * c ∈ {0: red, 1: green, 2: blue}, one unsigned byte per channel. */
object MediaCodec {
  ImageIO.setUseCache(false) // small in-memory images; skip disk cache

  /** Encode row-major RGB bytes as a real PNG (lossless — decode
    * returns exactly these bytes). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3,
      s"need ${w * h * 3} bytes for ${w}x$h RGB, got ${rgb.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val k = (y * w + x) * 3
        img.setRGB(x, y,
          ((rgb(k) & 0xFF) << 16) | ((rgb(k + 1) & 0xFF) << 8) | (rgb(k + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG, BMP, GIF, JPEG…) to
    * (width, height, row-major RGB bytes). */
  def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val k = (y * w + x) * 3
        rgb(k) = ((p >> 16) & 0xFF).toByte
        rgb(k + 1) = ((p >> 8) & 0xFF).toByte
        rgb(k + 2) = (p & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }
}
