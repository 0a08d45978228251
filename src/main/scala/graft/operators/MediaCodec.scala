package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real image codec: a pure-JVM PNG reader/writer implemented against
  * the public PNG specification (W3C PNG, second edition — chunk
  * layout, zlib/deflate IDAT, per-row filter types 0–4), with
  * `javax.imageio` as the fallback for payloads outside the fast
  * path's profile (RGBA PNGs, BMP, GIF, JPEG…).
  *
  * Why not ImageIO everywhere: the fixture images are tiny (≈ 33×25),
  * so ImageIO's per-call plugin lookup, stream wrapper, and
  * BufferedImage raster dominate the actual pixel work by an order of
  * magnitude. The direct writer/reader keeps the whole
  * encode → decode → kernel chain allocation-light inside a scan-stage
  * projection. PNG is lossless either way — `decodeRgb(encodePng(x))
  * == x` holds for both implementations, and nothing downstream hashes
  * the container bytes, only the pixels.
  *
  * Pixel layout: row-major RGB triples — index (y·w + x)·3 + c with
  * c ∈ {0: red, 1: green, 2: blue}, one unsigned byte per channel. */
object MediaCodec {

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Encode row-major RGB bytes as a real PNG (lossless — decode
    * returns exactly these bytes). 8-bit color type 2 (truecolor),
    * filter 0 rows, one zlib(6) IDAT — the minimal spec-conformant
    * profile, and exactly what the fast decode path reads back. */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3,
      s"need ${w * h * 3} bytes for ${w}x$h RGB, got ${rgb.length}")
    // raw scanlines: each row prefixed with filter byte 0 (None)
    val stride = w * 3
    val raw = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      System.arraycopy(rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val d = new Deflater(6, false) // zlib wrapper, fixed level => deterministic
    d.setInput(raw)
    d.finish()
    val comp = new ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()

    val out = new ByteArrayOutputStream(comp.size() + 64)
    out.write(PngSig, 0, PngSig.length)
    val ihdr = new Array[Byte](13)
    putInt(ihdr, 0, w); putInt(ihdr, 4, h)
    ihdr(8) = 8   // bit depth
    ihdr(9) = 2   // color type: truecolor RGB
    // compression 0, filter 0, interlace 0 already zero
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", comp.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def putInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  private def getInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xFF) << 24) | ((a(off + 1) & 0xFF) << 16) |
      ((a(off + 2) & 0xFF) << 8) | (a(off + 3) & 0xFF)

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putInt(len, 0, data.length)
    out.write(len, 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4)
    putInt(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  /** Decode any supported payload to (width, height, row-major RGB
    * bytes). 8-bit non-interlaced RGB PNGs take the direct spec-reader
    * path; everything else (RGBA PNG, BMP, GIF, JPEG…) falls back to
    * `javax.imageio`. */
  def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (isFastPng(bytes)) decodePngRgb(bytes)
    else decodeImageIo(bytes)
  }

  private def isFastPng(b: Array[Byte]): Boolean = {
    if (b.length < 33) return false
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return false; i += 1 }
    // first chunk must be IHDR at offset 8: len(4) "IHDR" data(13)
    if (getInt(b, 8) != 13) return false
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return false
    val bitDepth = b(24); val colorType = b(25); val interlace = b(28)
    bitDepth == 8 && colorType == 2 && interlace == 0
  }

  /** Direct reader for the 8-bit truecolor non-interlaced profile:
    * concatenate IDAT payloads, inflate, reverse per-row filters
    * (None/Sub/Up/Average/Paeth — PNG spec §9). */
  private def decodePngRgb(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    val w = getInt(b, 16); val h = getInt(b, 20)
    require(w > 0 && h > 0, s"bad PNG dims ${w}x$h")
    val idat = new ByteArrayOutputStream(b.length)
    var p = 33 // end of IHDR chunk (8 sig + 4 len + 4 type + 13 + 4 crc)
    while (p + 8 <= b.length) {
      val len = getInt(b, p)
      val typ = new String(b, p + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(b, p + 8, len)
      else if (typ == "IEND") p = b.length
      if (p < b.length) p += 8 + len + 4
    }
    val stride = w * 3
    val raw = new Array[Byte](h * (stride + 1))
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      // n == 0 without progress means the stream cannot continue:
      // exhausted input (truncated) OR a preset-dictionary demand
      // (FDICT — legal zlib, never emitted for PNG). Without the
      // needsDictionary check an FDICT payload loops forever here.
      if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
        val dict = inf.needsDictionary()
        inf.end()
        throw new IllegalArgumentException(
          if (dict) "PNG IDAT demands a preset dictionary"
          else "truncated PNG IDAT stream")
      }
      off += n
    }
    inf.end()
    require(off == raw.length, s"PNG pixel data: got $off of ${raw.length}")

    val rgb = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val rowIn = y * (stride + 1)
      val rowOut = y * stride
      val filter = raw(rowIn) & 0xFF
      var i = 0
      filter match {
        case 0 => // None
          System.arraycopy(raw, rowIn + 1, rgb, rowOut, stride)
        case 1 => // Sub: left neighbor (bpp = 3)
          while (i < stride) {
            val left = if (i >= 3) rgb(rowOut + i - 3) & 0xFF else 0
            rgb(rowOut + i) = ((raw(rowIn + 1 + i) & 0xFF) + left).toByte
            i += 1
          }
        case 2 => // Up
          while (i < stride) {
            val up = if (y > 0) rgb(rowOut - stride + i) & 0xFF else 0
            rgb(rowOut + i) = ((raw(rowIn + 1 + i) & 0xFF) + up).toByte
            i += 1
          }
        case 3 => // Average
          while (i < stride) {
            val left = if (i >= 3) rgb(rowOut + i - 3) & 0xFF else 0
            val up = if (y > 0) rgb(rowOut - stride + i) & 0xFF else 0
            rgb(rowOut + i) =
              ((raw(rowIn + 1 + i) & 0xFF) + ((left + up) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          while (i < stride) {
            val left = if (i >= 3) rgb(rowOut + i - 3) & 0xFF else 0
            val up = if (y > 0) rgb(rowOut - stride + i) & 0xFF else 0
            val ul = if (i >= 3 && y > 0) rgb(rowOut - stride + i - 3) & 0xFF
                     else 0
            val pp = left + up - ul
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - ul)
            val pred = if (pa <= pb && pa <= pc) left
                       else if (pb <= pc) up else ul
            rgb(rowOut + i) = ((raw(rowIn + 1 + i) & 0xFF) + pred).toByte
            i += 1
          }
        case other =>
          throw new IllegalArgumentException(s"bad PNG filter type $other")
      }
      y += 1
    }
    (w, h, rgb)
  }

  // one-time global: small in-memory images — skip ImageIO's disk cache
  private lazy val imageIoInit: Unit = javax.imageio.ImageIO.setUseCache(false)

  private def decodeImageIo(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    imageIoInit
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
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
