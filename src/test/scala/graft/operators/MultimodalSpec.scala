package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "an image payload", "web"),
      (1L, "an audio payload", "web"),
      (2L, "a video payload", "crawl"),
      (3L, "another image", "crawl")
    ).toDF("doc_id", "text", "source")
  }

  test("binaryFile source reads payload bytes with file metadata, glob-filtered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    java.nio.file.Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(dir.resolve("b.img"), Array[Byte](9, 8))
    java.nio.file.Files.write(dir.resolve("skip.wav"), Array[Byte](7))
    val df = Multimodal.readBinaryDir(spark, dir.toString, glob = "*.img")
    assert(df.columns.toSet === Set("path", "modificationTime", "length", "content"))
    val rows = df.collect().map(r =>
      r.getAs[String]("path").split('/').last -> r.getAs[Array[Byte]]("content").toSeq)
      .toMap
    assert(rows.keySet === Set("a.img", "b.img")) // .wav filtered by glob
    assert(rows("a.img") === Seq[Byte](1, 2, 3, 4))
    assert(rows("b.img") === Seq[Byte](9, 8))
  }

  test("fromDocuments builds typed media items with binary payloads") {
    val items = Multimodal.fromDocuments(docs).collect().sortBy(_.media_id)
    assert(items.length === 4)
    assert(items.map(_.kind).toSeq === Seq("image", "audio", "video", "image"))
    assert(new String(items(0).bytes, "UTF-8") === "an image payload")
  }

  test("decodeFeatures is deterministic, partition-parallel, and typed") {
    val feats = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs))
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length === 4)
    assert(rows.forall(_.embedding.length === 8))
    assert(rows(0).n_bytes === "an image payload".getBytes("UTF-8").length.toLong)
    // determinism: same input → same features
    val again = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs))
      .collect().sortBy(_.media_id)
    assert(rows.map(_.digest).toSeq === again.map(_.digest).toSeq)
  }

  test("sampleFrames fans out N frames per video item only") {
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), n = 3).collect()
    assert(frames.length === 3)
    assert(frames.forall(_.media_id === 2L))
    assert(frames.map(_.frame_idx).sorted.toSeq === Seq(0, 1, 2))
    assert(frames.map(_.offset_ms).sorted.toSeq === Seq(0L, 1000L, 2000L))
  }

  test("resize is deterministic and stamps exactly the target dims") {
    val items = Multimodal.fromDocuments(docs)
    val a = Multimodal.resize(items, 224, 224).collect().sortBy(_.media_id)
    val b = Multimodal.resize(items, 224, 224).collect().sortBy(_.media_id)
    assert(a.map(_.digest).toSeq === b.map(_.digest).toSeq)
    assert(a.forall(f => f.width === 224 && f.height === 224))
    // different target → different re-encode digest
    val c = Multimodal.resize(items, 64, 64).collect().sortBy(_.media_id)
    assert(a.map(_.digest).toSeq !== c.map(_.digest).toSeq)
  }
}
