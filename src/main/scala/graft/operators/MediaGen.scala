package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal.MediaItem

/** Deterministic REAL media payload generators keyed by an id column — the
  * driver-gating bridge for the perceptual near-dup operators.
  *
  * The perceptual sketch stages (ImageIO / JavaSound / GIF decode) cannot
  * run inside a SQL oracle engine, so the catalog gates them the other way
  * around: generate payloads whose DECODED sketch is derivable in closed
  * form from the row id, run the REAL codec path in Spark, and let the
  * oracle recompute the sketches arithmetically (portable md5-60-bit
  * hashes, the same [[PortableHash]] convention every other portable
  * oracle splices). A drifted decoder, resampler, luma formula, RMS
  * binning, or pair join then shows up as a hash mismatch in the driver's
  * compare — the full codec→sketch→pair path is evidence-backed, not
  * spec-only.
  *
  * Payload construction is exact, not approximate:
  *  - images: a 9×8 PNG (PNG is lossless; 9×8 is exactly the dHash grid,
  *    so the bilinear "downsample" is the identity) whose per-row luma
  *    walk ±3 realizes each target bit as a strict neighbor comparison;
  *  - audio: a 16-bit PCM WAV (lossless) of 65 constant-level bins whose
  *    level walk ±25 realizes each RMS-envelope comparison exactly (each
  *    bin's RMS is level/32768, a dyadic rational both exact in IEEE);
  *  - video: 4-frame GIFs of 9×8 BLACK/WHITE grids (a 2-color palette —
  *    GIF quantization cannot perturb it) drawn from a shared frame pool,
  *    so two videos' frame-hash Jaccard equals the Jaccard of their
  *    closed-form frame-INDEX sets (distinct indices hash distinct; a
  *    collision would shrink an intersection and fail the compare).
  *
  * Pair structure: ids pair as (2g, 2g+1). The odd member's image/audio
  * sketch flips k = g mod 9 planted bits (hamming 0..8 — maxHamming 6
  * keeps 0..6 and rejects 7..8 on both engines); its video frame window
  * shifts by g mod 5 of 4 frames (Jaccard 1, 3/5, 1/3, 1/7, 0 — the 0.5
  * threshold keeps the first two). Everything is derived from doc_id, so
  * the same entries run unchanged at any scale tier.
  */
object MediaGen {

  /** JVM twin of [[PortableHash.portable60]] (md5 top 60 bits) for scalar
    * executor-side use — same value as the Column form and as DuckDB's
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`.
    */
  def portable60(s: String): Long = PortableHash.portable60(s)

  /** XOR mask flipping k distinct bit positions (g·7 + j·13) mod 60 —
    * 13 is invertible mod 60, so the positions are distinct for k ≤ 9 and
    * the oracle may SUM the shifted bits instead of folding XORs.
    */
  def flipMask(g: Long, k: Int): Long = {
    var m = 0L
    var j = 0
    while (j < k) {
      m |= 1L << ((g * 7 + j * 13) % 60).toInt
      j += 1
    }
    m
  }

  /** The planted 60-bit sketch for a doc id: pair (2g, 2g+1) shares a
    * per-group base; the odd member flips g mod 9 bits.
    */
  def plantedSketch(seed: String, docId: Long): Long = {
    val g = docId / 2
    val base = portable60(s"$seed:$g")
    if (docId % 2 == 1) base ^ flipMask(g, (g % 9).toInt) else base
  }

  /** A real PNG whose [[Multimodal.imageDHash]] decodes to exactly
    * `target` (bits 60..63 must be 0 — [[plantedSketch]] guarantees it).
    * The image IS the 9×8 dHash grid: each row walks luma ±3 from 128 so
    * dHash bit r·8+c = [luma(c+1) > luma(c)] = planted bit, and PNG's
    * losslessness plus the identity 9×8→9×8 resample make the decode
    * side exact.
    */
  def plantedPng(target: Long): Array[Byte] = {
    require((target >>> 60) == 0L, "planted sketches are 60-bit")
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var v = 128
      img.setRGB(0, r, (v << 16) | (v << 8) | v)
      var c = 0
      while (c < 8) {
        v += (if (((target >>> (r * 8 + c)) & 1L) == 1L) 3 else -3)
        img.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
        c += 1
      }
      r += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A real 16-bit PCM WAV whose [[Multimodal.audioRmsHash]] decodes to
    * exactly `target`: 65 bins × 16 samples of a constant positive level,
    * walking ±25 from 2000 (range [400, 3600] — no clipping, no sign
    * crossings), so rms(b+1) > rms(b) ⟺ planted bit b. Constant levels
    * make each bin's RMS the dyadic rational level/32768 — exact in IEEE,
    * so every comparison is strict and portable.
    */
  def plantedWav(target: Long): Array[Byte] = {
    val perBin = 16
    val levels = new Array[Int](65)
    levels(0) = 2000
    var b = 0
    while (b < 64) {
      levels(b + 1) = levels(b) + (if (((target >>> b) & 1L) == 1L) 25 else -25)
      b += 1
    }
    val n = 65 * perBin
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = levels(i / perBin)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** A 9×8 pure-black/white frame keyed by a frame-pool index: cell (x, y)
    * is white iff bit (y·9 + x) mod 60 of portable60("frm:" + idx). Two
    * colors survive ANY GIF palette exactly; distinct indices give
    * distinct (md5-random) grids, hence distinct frame dHashes.
    */
  def gridFrame(idx: Long): java.awt.image.BufferedImage = {
    val h = portable60(s"frm:$idx")
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = if (((h >>> ((y * 9 + x) % 60)) & 1L) == 1L) 0xffffff else 0
      img.setRGB(x, y, v)
    }
    img
  }

  /** A real multi-frame GIF (ImageIO sequence writer) of the given frames. */
  def gifOf(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  /** The frame-pool indices of a doc's video: 4 consecutive indices from a
    * per-group base of 9 (windows never cross groups); the odd member's
    * window shifts by g mod 5.
    */
  def videoFrameIndices(docId: Long): Seq[Long] = {
    val g = docId / 2
    val off = if (docId % 2 == 1) g % 5 else 0L
    (0 until 4).map(j => g * 9 + off + j)
  }

  private def items(
      docs: DataFrame, kind: String, payload: Long => Array[Byte]): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => MediaItem(id, kind, payload(id), "gen")))
  }

  /** One planted PNG per doc id — narrow map, payload never shuffles. */
  def imageItems(docs: DataFrame): Dataset[MediaItem] =
    items(docs, "image", id => plantedPng(plantedSketch("img", id)))

  /** One planted WAV per doc id. */
  def audioItems(docs: DataFrame): Dataset[MediaItem] =
    items(docs, "audio", id => plantedWav(plantedSketch("aud", id)))

  /** One 4-frame GIF per doc id from the shared frame pool. */
  def videoItems(docs: DataFrame): Dataset[MediaItem] =
    items(docs, "video", id => gifOf(videoFrameIndices(id).map(gridFrame)))

  /** Dimension-carrying payloads for the header-sniff entry: real encoded
    * containers whose dims/sample shape are CLOSED-FORM in doc_id, so the
    * oracle recomputes what [[Multimodal.sniffMeta]] must read from the
    * header bytes. Content is blank/silent — the sniff never decodes it.
    *  - id % 3 == 0 → PNG,  w = 8 + id % 24,        h = 8 + (id / 24) % 24
    *  - id % 3 == 1 → JPEG, w = 16 + id % 16,       h = 16 + (id * 3) % 16
    *  - id % 3 == 2 → WAV,  rate = 8000 + (id % 10) * 500, ch = 1 + id % 2
    */
  def sniffItems(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val bytes = (id % 3) match {
          case 0 => encodeImage((8 + id % 24).toInt, (8 + (id / 24) % 24).toInt, "png")
          case 1 => encodeImage((16 + id % 16).toInt, (16 + (id * 3) % 16).toInt, "jpg")
          case _ => silentWav((8000 + (id % 10) * 500).toInt, (1 + id % 2).toInt)
        }
        MediaItem(id, if (id % 3 == 2) "audio" else "image", bytes, "gen")
      })
  }

  private def encodeImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def silentWav(rate: Int, channels: Int): Array[Byte] = {
    val nFrames = 64
    val pcm = new Array[Byte](nFrames * 2 * channels)
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
