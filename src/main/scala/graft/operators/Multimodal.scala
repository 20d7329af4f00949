package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * transforms. New scope beyond the reference.
  *
  * The Spark-side shape is real and tested — schema, partition-preserving
  * mapPartitions with Encoders, per-row fan-out for frame sampling. The
  * IMAGE codec path is real: `javax.imageio` (ships in the JDK) decodes
  * the payload to true dimensions and a luma-histogram feature, and
  * `resize` rescales + re-encodes through `java.awt`. The AUDIO path is
  * real too: `javax.sound.sampled` (also JDK-shipped) parses WAV/AIFF/AU
  * to true sample rate / channels and a temporal RMS embedding over the
  * PCM stream. VIDEO frame extraction is real for the two containers
  * walkable in pure JVM — animated GIF via ImageIO's sequence reader
  * (true frame count, per-frame delays, decoded-pixel digests) and
  * MJPEG-in-AVI via a RIFF chunk walk (each '00dc' chunk is a JPEG that
  * ImageIO decodes); other containers (mp4 & co — no JDK codec, none in
  * this environment) fall back to a clearly marked deterministic
  * pseudo-decode with the same
  * signature and batch shape, so a native codec (e.g. ffmpeg via
  * mapPartitions) slots in without changing any plan: decode stays a
  * narrow per-partition pass, scales with input splits at 100 TB, and
  * never shuffles the payload bytes.
  */
object Multimodal {

  final case class MediaItem(
      media_id: Long, kind: String, bytes: Array[Byte], source: String)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, digest: String,
      width: Int, height: Int, embedding: Array[Float])

  final case class Frame(
      media_id: Long, frame_idx: Int, offset_ms: Long, digest: String)

  /** Real binary-file source (images/audio on disk): path, mtime, length,
    * content — Spark's binaryFile format, partitioned by file splits.
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Adapt the documents table into a media table (deterministic fake
    * payloads = UTF-8 bytes), for exercising the pipeline without binaries.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      col("source")).as[MediaItem]
  }

  /** Decode one item. Images go through the REAL codec (`javax.imageio`):
    * true width/height plus an 8-bin luma-histogram embedding computed
    * from the decoded pixels. Audio goes through the REAL JavaSound codec
    * (`javax.sound.sampled`, WAV/AIFF/AU in every JDK): width carries the
    * true sample rate, height the channel count, and the embedding is an
    * 8-bin temporal RMS profile of the PCM stream. Remaining kinds — and
    * payloads neither codec can parse — take the deterministic
    * pseudo-decode fallback. Either way the call is pure and per-row:
    * iterator-to-iterator per partition, no driver involvement, no
    * shuffle.
    */
  private[operators] def decode(item: MediaItem): MediaFeatures = {
    // null payload (e.g. a null source text upstream) decodes as empty
    // rather than NPE-ing the whole task
    val bytes = if (item.bytes == null) Array.emptyByteArray else item.bytes
    decodeImage(bytes) match {
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Float](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(luma >> 5) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        MediaFeatures(item.media_id, item.kind, bytes.length.toLong,
          f"${java.util.Arrays.hashCode(bytes)}%08x", w, h, hist.map(_ / n))
      case None => decodeAudioFeatures(item, bytes)
        .getOrElse(pseudoDecode(item, bytes))
    }
  }

  /** Real audio decode via JavaSound: parse the container, stream the PCM,
    * and compute an 8-bin temporal RMS profile (per-eighth of the stream,
    * normalized to [0, 1]). Handles the 16-bit signed PCM that WAV files
    * overwhelmingly carry sample-accurately; other widths fall back to
    * byte-level energy (still real signal, coarser quantization). None for
    * payloads JavaSound cannot parse.
    */
  /** Temporal RMS profile over `bins` equal time slices (plus the
    * container format). Canonical RIFF/WAVE PCM goes through a direct
    * chunk-walk fast path — `AudioSystem.getAudioInputStream` costs ~7 ms
    * PER CALL in provider probing (measured at ×100: ~120 s of the
    * 196 s audio sweep was container probing, not signal math), where the
    * chunk walk is microseconds; every other container (AIFF, AU,
    * non-PCM WAV) falls back to the real JavaSound decode. The fast path
    * reads the SAME flat little-endian sample stream JavaSound yields for
    * these files, so profiles are bit-identical (lockstep-spec'd).
    */
  private def rmsProfile(bytes: Array[Byte], bins: Int)
      : Option[(javax.sound.sampled.AudioFormat, Array[Double])] =
    fastWavProfile(bytes, bins).orElse(javaSoundProfile(bytes, bins))

  /** Direct RIFF/WAVE chunk walk for format-1 (integer PCM) 8/16-bit
    * payloads: locate "fmt " and "data", then run the same flat-stream
    * RMS loop [[javaSoundProfile]] runs on the decoded stream. None for
    * anything that is not canonical little-endian PCM WAVE — the caller
    * falls back to JavaSound, which stays the behavioral reference.
    */
  private[operators] def fastWavProfile(bytes: Array[Byte], bins: Int)
      : Option[(javax.sound.sampled.AudioFormat, Array[Double])] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (u16(o).toLong) | (u16(o + 2).toLong << 16)
    def tag(o: Int): String = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, channels, rate, bits)
    var data: Option[(Int, Int)] = None          // (offset, length)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val size = u32(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      val sz = size.toInt
      if (id == "fmt " && sz >= 16)
        fmt = Some((u16(off + 8), u16(off + 10), u32(off + 12).toInt, u16(off + 22)))
      else if (id == "data")
        data = Some((off + 8, sz))
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, channels, rate, bits)), Some((dOff, dLen)))
          if (bits == 16 || bits == 8) && channels > 0 && rate > 0 =>
        val sixteenBit = bits == 16
        val nSamples = if (sixteenBit) dLen / 2 else dLen
        val prof = new Array[Double](bins)
        if (nSamples > 0) {
          val acc = new Array[Double](bins)
          val cnt = new Array[Long](bins)
          var i = 0
          while (i < nSamples) {
            val s =
              if (sixteenBit) {
                val lo = bytes(dOff + 2 * i) & 0xff
                val hi = bytes(dOff + 2 * i + 1).toInt
                ((hi << 8) | lo) / 32768.0
              } else ((bytes(dOff + i) & 0xff) - 128) / 128.0
            val bin = (i.toLong * bins / nSamples).toInt
            acc(bin) += s * s
            cnt(bin) += 1
            i += 1
          }
          var b = 0
          while (b < bins) {
            if (cnt(b) > 0) prof(b) = math.sqrt(acc(b) / cnt(b))
            b += 1
          }
        }
        Some((new javax.sound.sampled.AudioFormat(
          rate.toFloat, bits, channels, bits == 16, false), prof))
      case _ => None
    }
  }

  /** REAL JavaSound decode → temporal RMS profile — the behavioral
    * reference for [[fastWavProfile]] and the path every non-canonical
    * container takes. One pass over the PCM stream; None for payloads the
    * codec rejects. Shared by the 8-bin feature embedding and the 65-bin
    * perceptual hash.
    */
  private[operators] def javaSoundProfile(bytes: Array[Byte], bins: Int)
      : Option[(javax.sound.sampled.AudioFormat, Array[Double])] = {
    if (bytes.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val pcm = ais.readAllBytes()
        val sixteenBit = fmt.getSampleSizeInBits == 16 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val nSamples = if (sixteenBit) pcm.length / 2 else pcm.length
        val prof = new Array[Double](bins)
        if (nSamples > 0) {
          val acc = new Array[Double](bins)
          val cnt = new Array[Long](bins)
          var i = 0
          while (i < nSamples) {
            val s =
              if (sixteenBit) {
                val lo = pcm(2 * i) & 0xff
                val hi = pcm(2 * i + 1).toInt // signed high byte
                val v = if (fmt.isBigEndian) (pcm(2 * i).toInt << 8) | (pcm(2 * i + 1) & 0xff)
                        else (hi << 8) | lo
                v / 32768.0
              } else ((pcm(i) & 0xff) - 128) / 128.0 // center the unsigned
              // 8-bit midpoint: gain scales amplitude about 0x80, not 0 —
              // without the shift RMS is DC-dominated and the documented
              // gain-invariance of audioRmsHash fails for 8-bit PCM
            val bin = (i.toLong * bins / nSamples).toInt
            acc(bin) += s * s
            cnt(bin) += 1
            i += 1
          }
          var b = 0
          while (b < bins) {
            if (cnt(b) > 0) prof(b) = math.sqrt(acc(b) / cnt(b))
            b += 1
          }
        }
        Some((fmt, prof))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  private def decodeAudioFeatures(
      item: MediaItem, bytes: Array[Byte]): Option[MediaFeatures] =
    rmsProfile(bytes, 8).map { case (fmt, prof) =>
      MediaFeatures(item.media_id, item.kind, bytes.length.toLong,
        f"${java.util.Arrays.hashCode(bytes)}%08x",
        width = fmt.getSampleRate.toInt, height = fmt.getChannels,
        prof.map(_.toFloat))
    }

  /** ImageIO parse, None for non-image/undecodable payloads (ImageIO
    * returns null rather than throwing for unknown containers).
    */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }

  /** STUB pseudo-decode for the codecs the JDK does not ship (video) and
    * for payloads no real codec can parse: deterministic fake dims +
    * embedding from the payload hash. A real codec replaces exactly this
    * function.
    */
  private def pseudoDecode(item: MediaItem, bytes: Array[Byte]): MediaFeatures = {
    val h = java.util.Arrays.hashCode(bytes)
    val digest = f"${h}%08x"
    val dim = 8
    val emb = Array.tabulate(dim) { i =>
      // deterministic fake embedding from payload hash — STUB
      (((h * 31 + i * 2654435761L) % 1000) / 1000.0f)
    }
    MediaFeatures(item.media_id, item.kind, bytes.length.toLong, digest,
      width = 16 + math.abs(h % 1024), height = 16 + math.abs((h / 7) % 1024),
      embedding = emb)
  }

  final case class SniffedMeta(
      media_id: Long, format: String, width: Int, height: Int)

  /** Header-only metadata SNIFF — the scale fast path the full decoders
    * deliberately are not: dimensions / sample shape read straight from
    * the container header bytes (PNG IHDR, GIF logical screen descriptor,
    * JPEG SOF marker walk, RIFF/WAVE fmt chunk) with NO pixel/PCM decode.
    * At 100 TB of media you sniff everything and decode selectively —
    * sniffing touches tens of bytes per file where ImageIO materializes
    * megapixel rasters (and the full payload still streams through the
    * binaryFile scan either way, so the win is CPU + allocation, not IO;
    * with a manifest of (path, offset) the same parsers run on ranged
    * reads and the IO win follows). For audio, width carries the sample
    * rate and height the channel count — the [[decode]] convention.
    * Unparseable payloads drop out. MultimodalSpec pins sniff == full
    * decode on every planted payload; the catalog oracle replays the
    * planted dimensions closed-form.
    */
  def sniffMeta(items: Dataset[MediaItem]): Dataset[SniffedMeta] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.flatMap { item =>
      val b = if (item.bytes == null) Array.emptyByteArray else item.bytes
      sniffBytes(b).map { case (f, w, h) => SniffedMeta(item.media_id, f, w, h) }
    })
  }

  private[operators] def sniffBytes(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(o: Int) = b(o) & 0xff
    def be16(o: Int) = (u8(o) << 8) | u8(o + 1)
    def be32(o: Int) = (u8(o) << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3)
    def le16(o: Int) = u8(o) | (u8(o + 1) << 8)
    if (b.length >= 24 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a)
      // PNG: 8-byte signature, IHDR is always the first chunk → width at
      // offset 16, height at 20 (big-endian, spec-guaranteed ordering)
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      // GIF: logical screen descriptor right after "GIF87a"/"GIF89a"
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first frame header (SOF0..SOF15
      // minus DHT/JPG/DAC which share the range but aren't frames)
      var off = 2
      var out: Option[(String, Int, Int)] = None
      while (out.isEmpty && off + 9 <= b.length && u8(off) == 0xff) {
        val marker = u8(off + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) off += 2
        else {
          val len = be16(off + 2)
          if (len < 2 || off + 2 + len > b.length) off = b.length
          else if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            out = Some(("jpeg", be16(off + 7), be16(off + 5)))
          else off += 2 + len
        }
      }
      out
    } else if (b.length >= 36 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // WAVE: walk chunks to "fmt " (usually immediate), no data scan
      var off = 12
      var out: Option[(String, Int, Int)] = None
      while (out.isEmpty && off + 8 <= b.length) {
        val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le16(off + 4).toLong | (le16(off + 6).toLong << 16)
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= b.length)
          out = Some(("wav",
            le16(off + 12) | (le16(off + 14) << 16), // sample rate (LE u32)
            le16(off + 10)))                          // channels
        else if (size < 0 || off + 8 + size > b.length) off = b.length
        else off += 8 + size.toInt + (size.toInt & 1)
      }
      out
    } else None
  }

  /** Decode + feature-extract over partitions. Iterator-in/iterator-out so
    * a real decoder can batch per partition (model load once per task).
    */
  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.map(decode))
  }

  /** Resize to (w, h). Image payloads are REALLY rescaled — decode via
    * ImageIO, bilinear draw onto a w×h canvas, re-encode as PNG — so
    * n_bytes/digest reflect the actual re-encoded payload. Non-image
    * payloads keep the stub contract (deterministic digest, dims = target,
    * size bounded by the target area) so downstream packing sees
    * realistic post-resize shapes either way.
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    require(w > 0 && h > 0, "target dims must be positive")
    items.mapPartitions(_.map { item =>
      val bytes = if (item.bytes == null) Array.emptyByteArray else item.bytes
      decodeImage(bytes) match {
        case Some(img) =>
          val canvas = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = canvas.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(canvas, "png", out)
          val encoded = out.toByteArray
          decode(item.copy(bytes = encoded)).copy(media_id = item.media_id)
        case None =>
          val f = pseudoDecode(item, bytes)
          // deterministic digest of (payload, target dims) — STUB re-encode
          val digest = f"${java.util.Arrays.hashCode(item.bytes) ^ (w * 31 + h)}%08x"
          // stub contract: a resized payload cannot exceed the target area
          // (3 bytes/pixel) — downstream packing must see post-resize sizes
          f.copy(width = w, height = h, digest = digest,
            n_bytes = math.min(f.n_bytes, w.toLong * h * 3))
      }
    })
  }

  final case class ImageHash(media_id: Long, dhash: Long)

  /** Perceptual dHash (difference hash) over the DECODED pixel content —
    * the image analog of a text SimHash: bilinear-downsample to a 9×8
    * luma grid (Rec.601 weights), set bit (r, c) iff luma(r, c+1) >
    * luma(r, c) → a 64-bit sketch whose hamming distance tracks
    * perceptual distance. Robust to re-encoding and uniform rescaling
    * (both preserve the downsampled gradient signs), unlike the byte
    * digest, which any recompression breaks. Undecodable / non-image
    * payloads drop out (flatMap) — a perceptual hash of bytes that never
    * decoded would be noise. Narrow map, real codec, no shuffle.
    */
  def imageDHash(items: Dataset[MediaItem]): Dataset[ImageHash] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.flatMap { item =>
      val bytes = if (item.bytes == null) Array.emptyByteArray else item.bytes
      decodeImage(bytes).map(img => ImageHash(item.media_id, dHashOf(img)))
    })
  }

  /** The dHash core over an already-decoded image — shared by the image
    * and video near-dup paths.
    */
  private[operators] def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val canvas = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = canvas.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 9, 8, null)
    } finally g.dispose()
    def luma(x: Int, y: Int): Double = {
      val rgb = canvas.getRGB(x, y)
      0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
    }
    var h = 0L
    var bit = 0
    for (r <- 0 until 8; c <- 0 until 8) {
      if (luma(c + 1, r) > luma(c, r)) h |= (1L << bit)
      bit += 1
    }
    h
  }

  final case class VideoFrameHash(media_id: Long, fh: Long)

  /** Per-frame perceptual hashes for the REALLY-decodable video
    * containers (GIF, MJPEG-AVI): every frame through [[dHashOf]],
    * distinct per video. Pseudo-decode containers drop out — a
    * perceptual hash needs pixels. Narrow map, no shuffle.
    */
  def videoFrameDHashes(items: Dataset[MediaItem]): Dataset[VideoFrameHash] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.flatMap { item =>
      gifFrameImages(item.bytes).orElse(aviFrameImages(item.bytes)) match {
        case Some(frames) =>
          frames.map { case (_, _, img) => dHashOf(img) }.distinct
            .map(VideoFrameHash(item.media_id, _)).iterator
        case None => Iterator.empty
      }
    })
  }

  /** Video near-duplicate pairs: Jaccard over the videos' frame-dHash
    * SETS — robust to trims, frame sampling, re-muxing AND transcoding
    * (a GIF and an MJPEG-AVI of the same frames share dHashes even
    * though every byte and every pixel digest differs). Inverted-index
    * join on the frame hash (the ngramJaccard candidate pattern without
    * the prefix filter — frame sets are tens, not thousands), exact
    * Jaccard verify, threshold cut. Fourth modality on the shared
    * sketch machinery.
    *
    * `maxFrameDf` caps the posting join's hot keys: a frame hash shared
    * by more than maxFrameDf videos (a studio intro card, a solid frame —
    * any solid frame dHashes to 0 — a test pattern) is a df² candidate
    * blowup at corpus scale, the exact hub regime [[Dedup.ngramJaccard]]'s
    * maxDf exists to cut. Like maxDf it is deterministic SET REDUCTION,
    * not a recall heuristic: a capped hash is removed from EVERY video's
    * frame set BEFORE sizes and the join, so the Jaccard is exactly the
    * Jaccard of the reduced sets and an oracle can replay it. The default
    * keeps full sets (fixture-safe, matches the historical semantics);
    * corpus-scale callers should cap (a frame shared by >100 videos
    * carries no near-dup signal — it is boilerplate, same argument as
    * ubiquitous shingles).
    */
  def videoNearDupPairs(
      items: Dataset[MediaItem], threshold: Double = 0.5,
      maxFrameDf: Int = Int.MaxValue): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val raw = videoFrameDHashes(items).toDF().select(col("media_id").as("id"), col("fh"))
    val capped =
      if (maxFrameDf == Int.MaxValue) raw
      else raw.withColumn("__df",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("fh")))
        .filter(col("__df") <= maxFrameDf).drop("__df")
    val posting = OperatorCaches.persistTracked(capped)
    val sizes = posting.groupBy("id").agg(count(lit(1)).as("sz"))
    posting.as("a").join(posting.as("b"),
        col("a.fh") === col("b.fh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Image near-duplicate pairs: [[imageDHash]] composed with the same
    * pigeonhole-banded hamming join text SimHash uses
    * ([[Dedup.hammingPairs]]) — one pair machinery, two modalities.
    * Returns (id_a, id_b, hamming ≤ maxHamming); exact for the sketch.
    */
  def imageNearDupPairs(
      items: Dataset[MediaItem], maxHamming: Int = 6): DataFrame =
    graft.operators.Dedup.hammingPairs(
      imageDHash(items).toDF()
        .select(col("media_id").as("id"), col("dhash").as("sh")),
      maxHamming)

  final case class AudioHash(media_id: Long, ahash: Long)

  /** Perceptual audio sketch — the audio twin of [[imageDHash]]: decode
    * the REAL PCM stream, take a 65-bin temporal RMS envelope, set bit b
    * iff rms(b+1) > rms(b). Comparing CONSECUTIVE bins makes the sketch
    * invariant to uniform gain (volume normalization, format headroom) —
    * a re-mastered copy at half volume hashes identically — while the
    * envelope SHAPE (beats, fades, speech rhythm) drives the bits.
    * Undecodable payloads drop out. Same 64-bit contract as dHash /
    * SimHash, so [[Dedup.hammingPairs]] is the pair join here too.
    */
  def audioRmsHash(items: Dataset[MediaItem]): Dataset[AudioHash] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.flatMap { item =>
      val bytes = if (item.bytes == null) Array.emptyByteArray else item.bytes
      rmsProfile(bytes, 65).map { case (_, p) =>
        var h = 0L
        var b = 0
        while (b < 64) {
          if (p(b + 1) > p(b)) h |= (1L << b)
          b += 1
        }
        AudioHash(item.media_id, h)
      }
    })
  }

  /** Audio near-duplicate pairs via [[audioRmsHash]] + the shared
    * pigeonhole hamming join — one pair engine, three modalities.
    */
  def audioNearDupPairs(
      items: Dataset[MediaItem], maxHamming: Int = 6): DataFrame =
    graft.operators.Dedup.hammingPairs(
      audioRmsHash(items).toDF()
        .select(col("media_id").as("id"), col("ahash").as("sh")),
      maxHamming)

  /** REAL multi-frame decode for the one video container the JDK ships a
    * codec for: animated GIF, via ImageIO's sequence reader. Returns every
    * frame's (index, cumulative offset in ms from the per-frame
    * GraphicControlExtension delays, pixel digest), or None when the
    * payload is not a multi-frame GIF (single-frame GIFs are images, not
    * video). The digest hashes the DECODED pixels (not the container
    * bytes), so two encodings of the same frames digest equal.
    */
  private[operators] def gifFrames(
      bytes: Array[Byte]): Option[Vector[(Int, Long, String)]] =
    gifFrameImages(bytes).map(_.map { case (i, off, img) =>
      (i, off, frameDigest(img)) })

  private def gifFrameImages(bytes: Array[Byte])
      : Option[Vector[(Int, Long, java.awt.image.BufferedImage)]] = {
    if (bytes == null || bytes.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      if (!reader.getFormatName.equalsIgnoreCase("gif")) return None
      try {
        reader.setInput(iis, false, false) // keep metadata: frame delays
        val nFrames = reader.getNumImages(true)
        if (nFrames <= 1) return None
        var offsetMs = 0L
        val out = Vector.newBuilder[(Int, Long, java.awt.image.BufferedImage)]
        for (i <- 0 until nFrames) {
          val img = reader.read(i)
          out += ((i, offsetMs, img))
          offsetMs += gifDelayCs(reader.getImageMetadata(i)) * 10L
        }
        Some(out.result())
      } finally reader.dispose()
    } catch {
      // only the types ImageIO actually throws for truncated/corrupt GIF
      // streams — a blanket RuntimeException catch would mask a genuine
      // decode-path bug as "not a GIF" (round-6 advice)
      case _: java.io.IOException => None
      case _: IndexOutOfBoundsException => None
    } finally iis.close()
  }

  /** REAL multi-frame decode for MJPEG-in-AVI — the second video container
    * walkable in pure JVM: AVI is RIFF framing (public spec: 'RIFF' size
    * 'AVI ' then fourcc-size-data chunks, LISTs nesting), and locating the
    * stream-0 video chunks ('00dc'/'00db' inside the 'movi' LIST) needs no
    * codec at all; in an MJPEG file each such chunk IS a JPEG, which
    * ImageIO already decodes. Frame offsets come from the main AVI
    * header's ('avih', first dword) microseconds-per-frame. Returns None
    * for non-AVI payloads, AVIs with fewer than 2 decodable frames
    * (single frames are images, not video), or truncated RIFF structure —
    * same contract as [[gifFrames]]. Digests hash the DECODED pixels, so
    * the same frames digest equal across re-muxed containers.
    */
  private[operators] def aviFrames(
      bytes: Array[Byte]): Option[Vector[(Int, Long, String)]] =
    aviFrameImages(bytes).map(_.map { case (i, off, img) =>
      (i, off, frameDigest(img)) })

  private def aviFrameImages(bytes: Array[Byte])
      : Option[Vector[(Int, Long, java.awt.image.BufferedImage)]] = {
    if (bytes == null || bytes.length < 12) return None
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32le(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var usPerFrame = 0L
    val frames = Vector.newBuilder[Array[Byte]]
    // iterative chunk walk (explicit stack — a crafted deep nesting must
    // not overflow the JVM stack); bounds-checked so truncation returns
    // what was walkable instead of throwing
    var stack = List((12, math.min(bytes.length, 8 + u32le(4).toInt)))
    while (stack.nonEmpty) {
      var (off, end) = stack.head
      stack = stack.tail
      while (off + 8 <= end) {
        val id = fourcc(off)
        val size = u32le(off + 4).toInt
        val dataOff = off + 8
        if (size < 0 || dataOff + size > end) { off = end } // truncated
        else {
          if (id == "RIFF" || id == "LIST") {
            // list payload = 4-byte list type + sub-chunks
            if (size >= 4) stack ::= (dataOff + 4, dataOff + size)
          } else if (id == "avih" && size >= 4) {
            usPerFrame = u32le(dataOff)
          } else if (id == "00dc" || id == "00db") {
            frames += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size)
          }
          off = dataOff + size + (size & 1) // chunks pad to even
        }
      }
    }
    val decoded = frames.result().zipWithIndex.flatMap { case (payload, i) =>
      decodeImage(payload).map(img => (i, i * usPerFrame / 1000L, img))
    }
    if (decoded.size >= 2) Some(decoded) else None
  }

  /** Per-frame delay in centiseconds from the GIF GraphicControlExtension
    * (0 when absent — the format's own default).
    */
  private def gifDelayCs(meta: javax.imageio.metadata.IIOMetadata): Long = {
    val tree = meta.getAsTree("javax_imageio_gif_image_1.0")
    val kids = tree.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      val node = kids.item(i)
      if (node.getNodeName == "GraphicControlExtension") {
        val attr = node.getAttributes.getNamedItem("delayTime")
        // corrupt metadata (non-numeric delay) degrades to the format's
        // default rather than aborting the whole frame walk
        if (attr != null) return attr.getNodeValue.toLongOption.getOrElse(0L)
      }
      i += 1
    }
    0L
  }

  /** Digest of a decoded frame's pixel raster (row-major ARGB). */
  private[operators] def frameDigest(img: java.awt.image.BufferedImage): String = {
    val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
    f"${java.util.Arrays.hashCode(px)}%08x"
  }

  /** Frame sampling for video rows: up to N evenly spaced frames per item
    * (flatMap — a narrow 1→N expansion, payload bytes never shuffle).
    * Animated-GIF payloads go through the REAL codec ([[gifFrames]]):
    * true frame indices, true cumulative offsets from the per-frame GIF
    * delays, digests of the decoded pixels. MJPEG-in-AVI payloads go
    * through the REAL RIFF walk + JPEG decode ([[aviFrames]]): true frame
    * indices, offsets from the avih frame rate, decoded-pixel digests.
    * Remaining containers (mp4 & co — no JDK codec, none in this
    * environment) keep the clearly-marked deterministic pseudo-frames
    * with the same shape, so a native decoder slots into exactly this
    * spot.
    */
  def sampleFrames(items: Dataset[MediaItem], n: Int = 4): Dataset[Frame] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.filter(_.kind == "video").flatMap { item =>
      gifFrames(item.bytes).orElse(aviFrames(item.bytes)) match {
        case Some(frames) =>
          // evenly spaced real frames: all of them when there are <= n
          val picks =
            if (frames.size <= n) frames
            else (0 until n).map(j => frames((j * frames.size) / n))
          picks.iterator.map { case (idx, off, digest) =>
            Frame(item.media_id, idx, off, digest)
          }
        case None =>
          val h = java.util.Arrays.hashCode(item.bytes) // null-safe: hashCode(null) = 0
          (0 until n).iterator.map { i =>
            Frame(item.media_id, i, i * 1000L, f"${h ^ i}%08x") // STUB digest
          }
      }
    }
  }
}
