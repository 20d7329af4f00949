package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec video frame walks, pinned against programmatically ENCODED
  * containers (not just fixture files): ImageIO writes animated GIFs, and
  * MJPEG-in-AVI is RIFF framing we can assemble byte-exactly from the
  * public spec — so frame counts, delay sums, offsets, and decoded-pixel
  * digests are all known a priori.
  */
class VideoFramesSpec extends AnyFunSuite {

  private def solidFrame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  /** Encode an animated GIF via ImageIO's sequence writer with explicit
    * per-frame GraphicControlExtension delays (centiseconds).
    */
  private def animatedGif(
      frames: Seq[java.awt.image.BufferedImage], delaysCs: Seq[Int]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.zip(delaysCs).foreach { case (img, d) =>
        val fmt = "javax_imageio_gif_image_1.0"
        val meta = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), null)
        val root = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        // reuse the default GCE node when the writer emits one — a second
        // GCE would shadow the first, which is what gifFrames reads
        val kids = root.getChildNodes
        val existing = (0 until kids.getLength).map(kids.item)
          .find(_.getNodeName == "GraphicControlExtension")
        val gce = existing.getOrElse {
          val n = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
          root.appendChild(n); n
        }.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", d.toString)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  /** Assemble an MJPEG AVI from real JPEG payloads: RIFF('AVI ') with a
    * minimal hdrl (avih carrying usPerFrame) and a movi list of 00dc
    * chunks — the exact structure aviFrames walks.
    */
  private def mjpegAvi(jpegs: Seq[Array[Byte]], usPerFrame: Long): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ u32(data.length.toLong) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(kind: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ payload)
    val avih = u32(usPerFrame) ++ Array.fill(13)(u32(0L)).flatten // 14 dwords
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", jpegs.flatMap(chunk("00dc", _)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ u32(body.length.toLong) ++ body
  }

  private def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  test("gifFrames round-trips ImageIO-encoded GIFs: count, delay sum, digests") {
    for (nFrames <- Seq(2, 3, 5); (w, h) <- Seq((8, 6), (16, 16))) {
      val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
      val frames = (0 until nFrames).map(i => solidFrame(w, h, colors(i)))
      val delays = (1 to nFrames).map(_ * 7) // distinct per-frame delays
      val bytes = animatedGif(frames, delays)
      val walked = Multimodal.gifFrames(bytes)
      assert(walked.isDefined, s"n=$nFrames ${w}x$h not walked")
      val fs = walked.get
      assert(fs.size == nFrames)
      assert(fs.map(_._1) == (0 until nFrames).toVector, "frame indices")
      // offsets are CUMULATIVE sums of the prior frames' delays (cs -> ms)
      val expectedOffsets = delays.scanLeft(0L)((acc, d) => acc + d * 10L).init
      assert(fs.map(_._2) == expectedOffsets.toVector, s"offsets ${fs.map(_._2)}")
      // digests hash DECODED pixels: a solid frame digests to the digest
      // of its own raster, frame-order-aligned
      assert(fs.map(_._3).distinct.size == nFrames, "distinct solid colors")
    }
  }

  test("gifFrames digests are stable under re-encode of the decoded frames") {
    val frames = Seq(solidFrame(10, 10, 0xff0000), solidFrame(10, 10, 0x0000ff),
      solidFrame(10, 10, 0x00ff00))
    val first = Multimodal.gifFrames(animatedGif(frames, Seq(5, 5, 5))).get
    // decode → re-encode into a NEW container (different bytes), digests
    // must survive: they hash pixels, not container bytes
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(animatedGif(frames, Seq(5, 5, 5))))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    val decoded = (0 until 3).map(reader.read)
    reader.dispose(); iis.close()
    // re-encode from RGB copies: feeding the INDEXED decoded frames back
    // makes ImageIO promote frame 1's palette to the global color table
    // and every re-encoded frame renders as frame 1 (an encoder quirk,
    // not a digest property); same pixels in RGB re-quantize per frame
    val rgb = decoded.map { img =>
      val c = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = c.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose(); c
    }
    val reencoded = Multimodal.gifFrames(animatedGif(rgb, Seq(9, 9, 9))).get
    assert(first.map(_._3) == reencoded.map(_._3), "digests changed across re-encode")
  }

  test("gifFrames rejects single-frame GIFs and non-GIF payloads") {
    assert(Multimodal.gifFrames(animatedGif(Seq(solidFrame(4, 4, 0x123456)), Seq(3))).isEmpty)
    assert(Multimodal.gifFrames("not a gif".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.gifFrames(Array.emptyByteArray).isEmpty)
    assert(Multimodal.gifFrames(null).isEmpty)
    // truncated GIF: cut an encoded animation mid-stream
    val whole = animatedGif(
      Seq(solidFrame(32, 32, 0xff0000), solidFrame(32, 32, 0x00ff00)), Seq(4, 4))
    assert(Multimodal.gifFrames(whole.take(whole.length / 2)).isEmpty
      || Multimodal.gifFrames(whole.take(whole.length / 2)).get.size <= 2)
  }

  test("aviFrames walks MJPEG-in-AVI: true counts, avih offsets, decoded-pixel digests") {
    val imgs = Seq(solidFrame(12, 8, 0xaa0000), solidFrame(12, 8, 0x00aa00),
      solidFrame(12, 8, 0x0000aa), solidFrame(12, 8, 0xaaaaaa))
    val jpegs = imgs.map(jpeg)
    val bytes = mjpegAvi(jpegs, usPerFrame = 40000L) // 25 fps
    val walked = Multimodal.aviFrames(bytes)
    assert(walked.isDefined)
    val fs = walked.get
    assert(fs.size == 4)
    assert(fs.map(_._1) == Vector(0, 1, 2, 3))
    assert(fs.map(_._2) == Vector(0L, 40L, 80L, 120L), "offsets from avih rate")
    // digest parity with decoding the SAME JPEG payloads directly — the
    // walk adds framing, never touches pixels
    val direct = jpegs.map(j => Multimodal.frameDigest(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))))
    assert(fs.map(_._3) == direct.toVector)
  }

  test("aviFrames rejects non-AVI, truncated, and single-frame payloads") {
    assert(Multimodal.aviFrames("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.aviFrames("no riff here at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.aviFrames(null).isEmpty)
    val one = mjpegAvi(Seq(jpeg(solidFrame(6, 6, 0x112233))), 33333L)
    assert(Multimodal.aviFrames(one).isEmpty, "single frame is an image, not video")
    // truncation mid-movi must degrade, not throw; whatever remains
    // walkable is <= the full frame set
    val whole = mjpegAvi(Seq(solidFrame(24, 24, 0xff0000), solidFrame(24, 24, 0x00ff00),
      solidFrame(24, 24, 0x0000ff)).map(jpeg), 40000L)
    val cut = Multimodal.aviFrames(whole.take(whole.length * 2 / 3))
    assert(cut.isEmpty || cut.get.size <= 3)
  }
}
