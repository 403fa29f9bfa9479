package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal column pipeline: media ride through the engine as opaque
 * `binary` columns plus typed metadata; decode / feature-extract / resize run
 * as narrow mapPartitions stages (no shuffle), so the corpus is scanned once
 * and decode only touches rows that survive metadata pushdown.
 *
 * The decoders are REAL: contract 24-bit BMPs decode through a zero-copy
 * contract-direct raster view (pure index arithmetic over the payload bytes
 * — see [[tryDirectBmp]]); everything else goes through javax.imageio (the
 * JDK's BMP/PNG/JPEG codecs), and audio through javax.sound.sampled
 * (RIFF/WAVE PCM) — no external libraries. Since the test corpus has no
 * stored media, the *payload builders* fabricate deterministic-but-valid
 * BMP / WAV files from document text, which the oracle can predict
 * byte-for-byte while the decode side still exercises a genuine codec path
 * (header parse, raster access, resize). A parity spec proves the direct
 * raster is pixel-identical to the ImageIO raster on the gate corpus.
 *
 * At 100 TB: binaries stay columnar in parquet (they compress and split per
 * row group), metadata predicates push to the scan, decode parallelism is
 * partition-count, and per-row work is bounded by media size, not corpus
 * size. Capability parity target: the reference has no media path at all —
 * this is part of the training-data-pipeline surface.
 */
object Multimodal {

  /** Typed record for a decoded image row. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      header: Array[Byte], // leading magic bytes ("BM")
      width: Int, // from the decoded image, not the metadata
      height: Int,
      feature: Array[Float]) // [pixelSum, rMean, gMean, bMean, 2x2 thumb luma]

  /** Typed record for a decoded audio row. */
  case class AudioFeatures(
      doc_id: Long,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      feature: Array[Float]) // [sampleSum/256, meanAbs/256, peak/256]

  // ------------------------------------------------------------ image side

  /** Deterministic w/h in [4, 11] from the first payload-source bytes. */
  private def dims(b: Array[Byte]): (Int, Int) = {
    val b0 = if (b.length > 0) b(0) & 0xff else 0
    val b1 = if (b.length > 1) b(1) & 0xff else 0
    (4 + b0 % 8, 4 + b1 % 8)
  }

  /** A valid 24-bit bottom-up BMP whose gray pixel (x,y) = src[(y*w+x) mod n]
    * (0 when src is empty). 54-byte header + 4-byte-aligned rows. */
  private[graft] def buildBmp(src: Array[Byte]): Array[Byte] = {
    val (w, h) = dims(src)
    val rowSize = ((3 * w + 3) / 4) * 4
    val total = 54 + rowSize * h
    val out = new Array[Byte](total)
    def putIntLE(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putIntLE(2, total)
    putIntLE(10, 54) // pixel data offset
    putIntLE(14, 40) // BITMAPINFOHEADER size
    putIntLE(18, w)
    putIntLE(22, h)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    putIntLE(34, rowSize * h)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowSize // bottom-up storage
      var x = 0
      while (x < w) {
        val v: Byte =
          if (src.length == 0) 0 else src((y * w + x) % src.length)
        val p = rowOff + 3 * x
        out(p) = v; out(p + 1) = v; out(p + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  private val bmpUdf = udf { src: Array[Byte] =>
    Option(src).map(buildBmp).getOrElse(buildBmp(Array.emptyByteArray))
  }

  // ---------------------------------------------- contract-direct raster view

  /**
   * Minimal decoded-raster interface shared by the two decode paths.
   * `rgb(x, y)` returns the pixel as 0x00RRGGBB (alpha, if any, masked off
   * by every caller).
   */
  private[graft] sealed trait Raster {
    def width: Int
    def height: Int
    def rgb(x: Int, y: Int): Int
  }

  /**
   * Contract-direct BMP raster: when the payload is an uncompressed 24-bit
   * bottom-up BITMAPINFOHEADER BMP (the shape `buildBmp` emits and the
   * byte-exact oracles replay), pixel access is pure index arithmetic over
   * the payload array — ZERO allocation, no `ImageIO.read`, no
   * BufferedImage. At corpus scale this removes the dominant per-row cost
   * of the image/video family (one BufferedImage + raster copy per decode
   * was the top per-byte cost in the 100x soak) and the GC-phase variance
   * it caused in the bench. Returns null for anything off-contract
   * (PNG/JPEG, palette or compressed BMPs, top-down rasters, truncated
   * pixel data) — those fall back to the real javax.imageio codec, so the
   * accepted input surface is unchanged.
   */
  private[graft] def tryDirectBmp(b: Array[Byte]): Raster = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOff = readIntLE(b, 10)
    val hdrSize = readIntLE(b, 14)
    val w = readIntLE(b, 18)
    val h = readIntLE(b, 22)
    val planes = (b(26) & 0xff) | ((b(27) & 0xff) << 8)
    val bpp = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
    val compression = readIntLE(b, 30)
    if (hdrSize != 40 || planes != 1 || bpp != 24 || compression != 0) return null
    if (w <= 0 || h <= 0) return null // negative h = top-down; not our contract
    val rowSize = ((3 * w + 3) / 4) * 4
    if (dataOff < 54 || dataOff.toLong + rowSize.toLong * h > b.length) return null
    new Raster {
      val width: Int = w
      val height: Int = h
      def rgb(x: Int, y: Int): Int = {
        val p = dataOff + (h - 1 - y) * rowSize + 3 * x // bottom-up storage
        ((b(p + 2) & 0xff) << 16) | ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
      }
    }
  }

  /** Decode to a [[Raster]]: contract-direct when possible, javax.imageio
    * otherwise. Throws (via require) only when BOTH paths reject the bytes. */
  private[graft] def decodeRaster(bytes: Array[Byte]): Raster = {
    val direct = tryDirectBmp(bytes)
    if (direct != null) direct
    else {
      val img: BufferedImage = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload (${if (bytes == null) -1 else bytes.length} bytes)")
      new Raster {
        val width: Int = img.getWidth
        val height: Int = img.getHeight
        def rgb(x: Int, y: Int): Int = img.getRGB(x, y) & 0xffffff
      }
    }
  }

  /**
   * A valid PNG (round 11) of the SAME pixel contract as [[buildBmp]]:
   * truecolor 8-bit, gray pixel (x,y) = src[(y*w+x) mod n]. The IDAT zlib
   * stream uses a STORED deflate block (BTYPE=00) — no compressor-version
   * dependence, every byte a pure function of the input — so the payload is
   * deterministic forever while still decoding through javax.imageio's REAL
   * PNG codec (signature, chunk CRCs, zlib adler, filter reconstruction).
   * A PNG and a BMP of the same source are byte-DIFFERENT containers with
   * an IDENTICAL raster: exactly the cross-format re-encode that byte-hash
   * dedup misses and perceptual dHash groups (q_image_dedup_png).
   */
  private[graft] def buildPng(src: Array[Byte]): Array[Byte] = {
    val (w, h) = dims(src)
    // raw scanlines: per row a filter byte 0 (None) + w RGB triples
    val stride = 1 + 3 * w
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v: Byte = if (src.length == 0) 0 else src((y * w + x) % src.length)
        val p = y * stride + 1 + 3 * x
        raw(p) = v; raw(p + 1) = v; raw(p + 2) = v
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue.toInt))
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(w)); ihdr.write(be32(h))
    ihdr.write(Array[Byte](8, 2, 0, 0, 0)) // depth 8, truecolor, default
    chunk("IHDR", ihdr.toByteArray)
    // zlib: 0x78 0x01 header, one final STORED block, adler32 (BE)
    val idat = new java.io.ByteArrayOutputStream()
    idat.write(0x78); idat.write(0x01)
    idat.write(0x01) // BFINAL=1, BTYPE=00 (stored)
    idat.write(raw.length & 0xff); idat.write((raw.length >> 8) & 0xff)
    val nlen = raw.length ^ 0xffff
    idat.write(nlen & 0xff); idat.write((nlen >> 8) & 0xff)
    idat.write(raw)
    val adler = new java.util.zip.Adler32(); adler.update(raw)
    idat.write(be32(adler.getValue.toInt))
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private val pngUdf = udf { src: Array[Byte] =>
    Option(src).map(buildPng).getOrElse(buildPng(Array.emptyByteArray))
  }

  // --------------------------------------------------------------- JPEG side

  /** Block-mosaic raster contract shared by [[buildBmpMosaic]] and
    * [[buildJpeg]]: (wb, hb) = dims(src) 8×8 BLOCKS, pixel (x, y) of the
    * 8wb × 8hb image is the uniform gray src[((y/8)*wb + (x/8)) mod n].
    * Block-uniform on purpose: a JPEG block whose 64 pixels are one value
    * has DC = 8·(v−128) and ALL AC coefficients zero, so with a unit
    * quantization table the round trip is EXACT — the one image family
    * where a lossy codec is byte-exact and therefore engine-replayable
    * forever (MultimodalSpec pins decode(buildJpeg(s)) == mosaic(s)). */
  @inline private def mosaicVal(src: Array[Byte], wb: Int, bx: Int, by: Int): Byte =
    if (src.length == 0) 0 else src((by * wb + bx) % src.length)

  /** A 24-bit BMP rendering of the block-mosaic contract (byte-different
    * container, raster-identical to [[buildJpeg]] of the same source). */
  private[graft] def buildBmpMosaic(src: Array[Byte]): Array[Byte] = {
    val (wb, hb) = dims(src)
    val w = 8 * wb; val h = 8 * hb
    val rowSize = ((3 * w + 3) / 4) * 4
    val total = 54 + rowSize * h
    val out = new Array[Byte](total)
    def putIntLE(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putIntLE(2, total)
    putIntLE(10, 54)
    putIntLE(14, 40)
    putIntLE(18, w)
    putIntLE(22, h)
    out(26) = 1
    out(28) = 24
    putIntLE(34, rowSize * h)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val v = mosaicVal(src, wb, x / 8, y / 8)
        val p = rowOff + 3 * x
        out(p) = v; out(p + 1) = v; out(p + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /**
   * A REAL baseline JPEG (ITU-T T.81) of the block-mosaic contract, built
   * byte-by-byte like [[buildPng]] — no encoder-version dependence, every
   * byte a pure function of the input — that decodes through javax.imageio's
   * actual JPEG codec (marker parse, Huffman decode, dequantize, IDCT).
   * Grayscale single-component, no subsampling, UNIT quantization table,
   * minimal canonical Huffman tables (12 DC categories at code length 4;
   * one AC symbol, EOB, at length 1). Because every 8×8 block is uniform,
   * each block is DC-only and the decode is EXACT (see [[mosaicVal]]) —
   * the JPEG is byte-different from the mosaic BMP but raster-identical:
   * the dominant crawl-format re-encode that byte-hash dedup misses and
   * perceptual dHash groups (q_image_dedup_jpeg).
   */
  private[graft] def buildJpeg(src: Array[Byte]): Array[Byte] = {
    val (wb, hb) = dims(src)
    val w = 8 * wb; val h = 8 * hb
    val out = new java.io.ByteArrayOutputStream()
    def word(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); word(2 + 1 + 64); out.write(0x00) // DQT: table 0, 8-bit
    var i = 0
    while (i < 64) { out.write(1); i += 1 } // unit quantization — exactness
    // SOF0, THREE components (YCbCr, no subsampling) with neutral chroma
    // rather than 1-component grayscale: ImageIO surfaces grayscale JPEGs
    // as linear-gray BufferedImages whose getRGB applies a linear→sRGB
    // transform (104 came back as 171) — YCbCr with Cb=Cr=128 converts to
    // R=G=B=Y exactly (all the conversion terms multiply Cb−128/Cr−128=0)
    marker(0xc0); word(8 + 3 * 3)
    out.write(8); word(h); word(w); out.write(3)
    out.write(1); out.write(0x11); out.write(0) // Y:  id 1, 1x1, DQT 0
    out.write(2); out.write(0x11); out.write(0) // Cb: id 2, 1x1, DQT 0
    out.write(3); out.write(0x11); out.write(0) // Cr: id 3, 1x1, DQT 0
    // DHT DC table 0: categories 0..11, all at canonical code length 4
    // (code for category s IS s; 1111 unused, so no all-ones codeword)
    marker(0xc4); word(2 + 1 + 16 + 12); out.write(0x00)
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(out.write)
    (0 to 11).foreach(out.write)
    // DHT AC table 0: single symbol 0x00 (EOB) at code length 1 (code '0')
    marker(0xc4); word(2 + 1 + 16 + 1); out.write(0x10)
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(out.write)
    out.write(0x00)
    marker(0xda); word(6 + 2 * 3) // SOS, 3 components
    out.write(3)
    out.write(1); out.write(0x00) // Y:  DC 0 / AC 0
    out.write(2); out.write(0x00) // Cb: DC 0 / AC 0
    out.write(3); out.write(0x00) // Cr: DC 0 / AC 0
    out.write(0); out.write(63); out.write(0) // spectral 0..63, Ah/Al 0
    // entropy-coded segment: per MCU (one 8x8 block of each component,
    // no subsampling) a DC diff + EOB; chroma blocks are uniform 128 →
    // level-shifted DC 0 → diff 0 forever
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0; var nBits = 0
    def putBits(v: Int, len: Int): Unit = {
      var j = len - 1
      while (j >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> j) & 1); nBits += 1
        if (nBits == 8) {
          data.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) data.write(0x00) // byte stuffing
          bitBuf = 0; nBits = 0
        }
        j -= 1
      }
    }
    def putDcDiffAndEob(diff: Int): Unit = {
      var mag = if (diff < 0) -diff else diff
      var s = 0
      while (mag > 0) { s += 1; mag >>= 1 } // category (<= 11: |diff| <= 2040)
      putBits(s, 4) // DC huffman code for category s
      if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      putBits(0, 1) // EOB: no AC coefficients
    }
    var prevDc = 0
    var by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        val v = mosaicVal(src, wb, bx, by) & 0xff
        val dc = 8 * (v - 128) // DCT DC of a uniform level-shifted block
        putDcDiffAndEob(dc - prevDc) // Y
        prevDc = dc
        putDcDiffAndEob(0) // Cb (uniform 128)
        putDcDiffAndEob(0) // Cr (uniform 128)
        bx += 1
      }
      by += 1
    }
    if (nBits > 0) { // pad the final byte with 1s
      val pad = ((bitBuf << (8 - nBits)) | ((1 << (8 - nBits)) - 1)) & 0xff
      data.write(pad)
      if (pad == 0xff) data.write(0x00)
    }
    out.write(data.toByteArray)
    marker(0xd9) // EOI
    out.toByteArray
  }

  private val bmpMosaicUdf = udf { src: Array[Byte] =>
    Option(src).map(buildBmpMosaic).getOrElse(buildBmpMosaic(Array.emptyByteArray))
  }

  private val jpegUdf = udf { src: Array[Byte] =>
    Option(src).map(buildJpeg).getOrElse(buildJpeg(Array.emptyByteArray))
  }

  /** Adds a `payload` column holding a mosaic-contract BMP of the text. */
  def withMosaicBmpPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", bmpMosaicUdf(encode(col(textCol), "UTF-8")))

  /** Adds a `payload` column holding a real baseline JPEG of the text
    * (same mosaic raster contract as [[withMosaicBmpPayload]]). */
  def withJpegPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", jpegUdf(encode(col(textCol), "UTF-8")))

  /** Adds a `payload` column holding a real PNG built from the text bytes
    * (same raster contract as [[withImagePayload]], different container). */
  def withPngPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", pngUdf(encode(col(textCol), "UTF-8")))

  /** Adds a `payload` column holding a real BMP built from the text bytes. */
  def withImagePayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", bmpUdf(encode(col(textCol), "UTF-8")))

  /** Kept name from round 1: binary payload stand-in (now a decodable BMP). */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    withImagePayload(df, textCol)

  /**
   * REAL image decode + feature extraction, batched per partition: the
   * container is parsed to a raster (contract-direct for 24-bit BMPs,
   * javax.imageio otherwise); features are the exact pixel sum
   * (oracle-predictable), per-channel means, and a 2x2 area-averaged
   * thumbnail — a genuine resize over the decoded raster.
   */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows => rows.map { case (id, bytes) => decodeOne(id, bytes) } }
  }

  /** Round-1 name, kept for source compatibility; decode is no longer a stub. */
  def decodeStub(df: DataFrame, idCol: String, payloadCol: String)(implicit d: DummyImplicit): Dataset[MediaFeatures] =
    decodeImages(df, idCol, payloadCol)

  private def decodeOne(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val img: Raster = decodeRaster(bytes)
    val w = img.width
    val h = img.height
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.rgb(x, y)
        sumR += (rgb >> 16) & 0xff; sumG += (rgb >> 8) & 0xff; sumB += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val nPix = (w * h).toFloat
    // 2x2 thumbnail: area-average resize over the decoded raster
    val thumb = new Array[Float](4)
    var q = 0
    while (q < 4) {
      val (x0, x1) = (if (q % 2 == 0) (0, w / 2) else (w / 2, w))
      val (y0, y1) = (if (q / 2 == 0) (0, h / 2) else (h / 2, h))
      var s = 0L; var cnt = 0
      var yy = y0
      while (yy < y1) {
        var xx = x0
        while (xx < x1) { s += img.rgb(xx, yy) & 0xff; cnt += 1; xx += 1 }
        yy += 1
      }
      thumb(q) = if (cnt == 0) 0f else s.toFloat / cnt / 255f
      q += 1
    }
    MediaFeatures(id, bytes.length.toLong, bytes.take(2), w, h,
      Array(sumR.toFloat, sumR / nPix / 255f, sumG / nPix / 255f, sumB / nPix / 255f) ++ thumb)
  }

  /** Shared dHash kernel over a decoded raster (blue channel, row-major,
    * first 63 gradient bits). */
  private def dHash(img: Raster): Long = {
    val w = img.width; val h = img.height
    var hash = 0L; var bit = 0; var y = 0
    while (y < h && bit < 63) {
      var x = 0
      while (x < w - 1 && bit < 63) {
        if ((img.rgb(x + 1, y) & 0xff) > (img.rgb(x, y) & 0xff)) hash |= (1L << bit)
        bit += 1; x += 1
      }
      y += 1
    }
    hash
  }

  /**
   * Perceptual dHash of a decoded image: bit i (row-major over (x, y),
   * x < w−1) is set when pixel(x+1, y) > pixel(x, y) on the decoded
   * raster's blue channel — the classic gradient hash, invariant to any
   * byte-level change that doesn't alter the rendered raster (metadata
   * edits, container re-encodes, palette reorderings). First 63 bits
   * packed into a non-negative BIGINT.
   *
   * The scale recipe: phash is a narrow map-side decode (this method),
   * exact-duplicate groups are a hash aggregation on the BIGINT, and
   * near-duplicates (small hamming distance) reuse the SimHash chunk-LSH
   * machinery — 4×16-bit chunk match guarantees recall for distance ≤ 3.
   *
   * POISON-ROW PATH: an undecodable payload (null bytes, ImageIO can't
   * parse it) emits a NULL phash instead of failing the job — at corpus
   * scale one corrupt blob must not kill a 10⁹-row pass. Downstream
   * dedup must filter `phash IS NOT NULL` (nulls would otherwise hash-
   * group together as a fake duplicate cluster); the null rows ARE the
   * quarantine list. Same contract on the audio/video twins.
   */
  def perceptualHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    implicit val enc: Encoder[(Long, java.lang.Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.LONG)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            (id, java.lang.Long.valueOf(dHash(decodeRaster(bytes))))
          } catch {
            case scala.util.control.NonFatal(_) => (id, null: java.lang.Long)
          }
        }
      }.toDF(idCol, "phash")
  }

  // ------------------------------------------------------------ video side

  /** Typed record for a frame sampled out of a video container. */
  case class FrameFeatures(
      doc_id: Long,
      n_bytes: Long,
      n_frames: Int,
      frame_idx: Int, // which frame was sampled (middle frame)
      width: Int,
      height: Int,
      feature: Array[Float]) // same layout as MediaFeatures.feature

  /** A simple video container: "GVID" magic, int32-LE frame count, then each
    * frame as int32-LE length + a valid BMP. Frame f's pixel source is the
    * text bytes rotated by f (so every frame differs deterministically). */
  private[multimodal] def buildVideo(src: Array[Byte]): Array[Byte] = {
    val b0 = if (src.length > 0) src(0) & 0xff else 0
    val nFrames = 2 + b0 % 3
    val frames = (0 until nFrames).map { f =>
      val rot =
        if (src.length == 0) src
        else { val off = f % src.length; src.drop(off) ++ src.take(off) }
      buildBmp(rot)
    }
    val total = 8 + frames.map(4 + _.length).sum
    val out = new Array[Byte](total)
    def putIntLE(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
    putIntLE(4, nFrames)
    var pos = 8
    frames.foreach { b =>
      putIntLE(pos, b.length)
      System.arraycopy(b, 0, out, pos + 4, b.length)
      pos += 4 + b.length
    }
    out
  }

  private val videoUdf = udf { src: Array[Byte] =>
    Option(src).map(buildVideo).getOrElse(buildVideo(Array.emptyByteArray))
  }

  /** Adds a `payload` column holding a GVID container of real BMP frames. */
  def withVideoPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", videoUdf(encode(col(textCol), "UTF-8")))

  private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /**
   * Frame sampling + REAL decode: parses the container, walks the frame
   * index to the MIDDLE frame (n_frames / 2) without materializing the
   * others, and runs the sampled frame through javax.imageio. Narrow
   * mapPartitions; per-row cost is one frame decode, not the whole clip.
   */
  def sampleMiddleFrame(df: DataFrame, idCol: String, payloadCol: String): Dataset[FrameFeatures] = {
    implicit val enc: Encoder[FrameFeatures] = Encoders.product[FrameFeatures]
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          require(bytes.length >= 8 && bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == 'I' && bytes(3) == 'D',
            s"not a GVID container for doc $id")
          val nFrames = readIntLE(bytes, 4)
          val target = nFrames / 2
          var pos = 8
          var f = 0
          while (f < target) { pos += 4 + readIntLE(bytes, pos); f += 1 }
          val len = readIntLE(bytes, pos)
          val frame = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)
          val m = decodeOne(id, frame)
          FrameFeatures(id, bytes.length.toLong, nFrames, target, m.width, m.height, m.feature)
        }
      }
  }

  /**
   * Perceptual hash of a video payload's MIDDLE frame: walk the container
   * to frame n/2 (no other frame is materialized), decode it, dHash the
   * raster — the standard frame-sampled video fingerprint (full-clip
   * variants hash several sampled frames and vote). Same invariance as
   * `perceptualHash`: container byte edits that don't change the sampled
   * frame's pixels leave it fixed.
   *
   * POISON-ROW PATH (see `perceptualHash`): a truncated container, a frame
   * walk that runs past the payload (every offset is bounds-checked before
   * the slice — `copyOfRange` would otherwise zero-pad silently), or an
   * undecodable sampled frame emits a NULL vfp instead of failing the job.
   */
  def videoFingerprint(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            require(bytes.length >= 8 && bytes(0) == 'G' && bytes(1) == 'V',
              s"not a GVID container for doc $id")
            val nFrames = readIntLE(bytes, 4)
            val target = nFrames / 2
            var pos = 8; var f = 0
            while (f < target) {
              require(pos + 4 <= bytes.length, s"truncated GVID frame index for doc $id")
              val flen = readIntLE(bytes, pos)
              require(flen >= 0 && pos + 4 + flen <= bytes.length,
                s"GVID frame $f overruns payload for doc $id")
              pos += 4 + flen; f += 1
            }
            require(pos + 4 <= bytes.length, s"truncated GVID frame index for doc $id")
            val len = readIntLE(bytes, pos)
            require(len >= 0 && pos + 4 + len <= bytes.length,
              s"GVID middle frame overruns payload for doc $id")
            val frame = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)
            (id, java.lang.Long.valueOf(dHash(decodeRaster(frame))))
          } catch {
            case scala.util.control.NonFatal(_) => (id, null: java.lang.Long)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.LONG))
      .toDF(idCol, "vfp")
  }

  // ------------------------------------------------------------ audio side

  private val SampleRate = 8000

  /** A valid RIFF/WAVE PCM16 mono file: sample k = (src[k mod n] - 128) * 256,
    * with 64 + (src[0] % 64) samples (64 zero samples when src is empty). */
  private[multimodal] def buildWav(src: Array[Byte]): Array[Byte] = {
    val b0 = if (src.length > 0) src(0) & 0xff else 0
    val nSamples = 64 + b0 % 64
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def putIntLE(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putTag(off: Int, s: String): Unit = s.zipWithIndex.foreach { case (c, i) => out(off + i) = c.toByte }
    putTag(0, "RIFF"); putIntLE(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putIntLE(16, 16)
    out(20) = 1 // PCM
    out(22) = 1 // mono
    putIntLE(24, SampleRate)
    putIntLE(28, SampleRate * 2) // byte rate
    out(32) = 2 // block align
    out(34) = 16 // bits/sample
    putTag(36, "data"); putIntLE(40, dataLen)
    var k = 0
    while (k < nSamples) {
      val v = if (src.length == 0) 0 else ((src(k % src.length) & 0xff) - 128) * 256
      out(44 + 2 * k) = (v & 0xff).toByte
      out(44 + 2 * k + 1) = ((v >> 8) & 0xff).toByte
      k += 1
    }
    out
  }

  /**
   * Acoustic fingerprint of decoded PCM: bit k set when sample(k+1) >
   * sample(k) — the sign-of-delta (zero-crossing-family) fingerprint,
   * computed on the DECODED waveform, so any container-level byte change
   * that doesn't alter the rendered samples leaves it fixed (the audio
   * twin of `perceptualHash`; near-matches via the same 16-bit chunk
   * LSH). First 63 delta bits packed into a non-negative BIGINT.
   */
  def audioFingerprint(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // POISON-ROW PATH (see perceptualHash): an unparseable or
          // unsupported audio container emits a NULL afp, never a job kill
          try {
            val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
            val data = in.readAllBytes()
            in.close()
            def sample(k: Int): Long =
              ((data(2 * k) & 0xff) | (data(2 * k + 1) << 8)).toShort.toLong
            val nSamples = data.length / 2
            var hash = 0L; var k = 0
            while (k < nSamples - 1 && k < 63) {
              if (sample(k + 1) > sample(k)) hash |= (1L << k)
              k += 1
            }
            (id, java.lang.Long.valueOf(hash))
          } catch {
            case scala.util.control.NonFatal(_) => (id, null: java.lang.Long)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.LONG))
      .toDF(idCol, "afp")
  }

  private val wavUdf = udf { src: Array[Byte] =>
    Option(src).map(buildWav).getOrElse(buildWav(Array.emptyByteArray))
  }

  /** Adds a `payload` column holding a real PCM16 WAV built from text bytes. */
  def withAudioPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", wavUdf(encode(col(textCol), "UTF-8")))

  /** REAL audio decode via javax.sound.sampled: container/format parse, then
    * PCM frame scan for exact sample sum (oracle-predictable), mean |s|, peak. */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String): Dataset[AudioFeatures] = {
    implicit val enc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val data = in.readAllBytes()
          in.close()
          var sum = 0L; var sumAbs = 0L; var peak = 0L
          var k = 0
          while (k + 1 < data.length) {
            val s = ((data(k) & 0xff) | (data(k + 1) << 8)).toShort.toLong
            sum += s; sumAbs += math.abs(s); peak = math.max(peak, math.abs(s))
            k += 2
          }
          val n = math.max(1L, frames)
          AudioFeatures(id, bytes.length.toLong, fmt.getSampleRate.toInt, fmt.getChannels,
            frames, Array(sum.toFloat / 256f, sumAbs.toFloat / n / 256f, peak.toFloat / 256f))
        }
      }
  }
}
