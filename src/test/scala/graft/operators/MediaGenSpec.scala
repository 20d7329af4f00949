package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The load-bearing property behind the q_media_* driver gates: the REAL
  * codec path (PNG/WAV/GIF encode → ImageIO/JavaSound decode → perceptual
  * sketch) reproduces the closed-form planted sketches EXACTLY, so a SQL
  * oracle that recomputes the sketches arithmetically sees the same pairs.
  */
class MediaGenSpec extends SparkSpec {

  test("JVM portable60 matches the Spark column form") {
    import spark.implicits._
    val samples = Seq("img:0", "img:17", "aud:250", "frm:2249", "", "a b c")
    val viaSpark = samples.toDF("s")
      .select(PortableHash.portable60(col("s"))).as[Long].collect()
    assert(samples.map(MediaGen.portable60).toSeq === viaSpark.toSeq)
  }

  test("planted PNGs decode to exactly the planted dHash, for every flip count") {
    import spark.implicits._
    // ids 0..39 cover groups 0..19 — every k = g mod 9 flip count 0..8,
    // both members
    val ids = (0L until 40L)
    val items = ids.map(id =>
      Multimodal.MediaItem(id, "image", MediaGen.plantedPng(
        MediaGen.plantedSketch("img", id)), "gen")).toDS()
    val decoded = Multimodal.imageDHash(items).collect()
      .map(h => h.media_id -> h.dhash).toMap
    assert(decoded.keySet === ids.toSet, "every planted PNG must decode")
    ids.foreach { id =>
      assert(decoded(id) === MediaGen.plantedSketch("img", id),
        s"dHash of planted PNG for id $id drifted from the closed form")
    }
  }

  test("planted WAVs decode to exactly the planted RMS hash") {
    import spark.implicits._
    val ids = (0L until 40L)
    val items = ids.map(id =>
      Multimodal.MediaItem(id, "audio", MediaGen.plantedWav(
        MediaGen.plantedSketch("aud", id)), "gen")).toDS()
    val decoded = Multimodal.audioRmsHash(items).collect()
      .map(h => h.media_id -> h.ahash).toMap
    assert(decoded.keySet === ids.toSet, "every planted WAV must decode")
    ids.foreach { id =>
      assert(decoded(id) === MediaGen.plantedSketch("aud", id),
        s"RMS hash of planted WAV for id $id drifted from the closed form")
    }
  }

  test("video GIF frame hashes are distinct per index and shared across videos") {
    import spark.implicits._
    val ids = (0L until 20L)
    val items = ids.map(id =>
      Multimodal.MediaItem(id, "video", MediaGen.gifOf(
        MediaGen.videoFrameIndices(id).map(MediaGen.gridFrame)), "gen")).toDS()
    val byVideo = Multimodal.videoFrameDHashes(items).collect()
      .groupBy(_.media_id).map { case (k, v) => k -> v.map(_.fh).toSet }
    assert(byVideo.keySet === ids.toSet)
    // each video decodes 4 distinct frame hashes (GIF palette preserved
    // the binary grids — a collapse would merge frames)
    ids.foreach(id => assert(byVideo(id).size === 4, s"video $id frame set"))
    // the SAME pool index decodes to the SAME hash across different videos
    // and containers: intersection sizes follow the closed-form windows
    ids.grouped(2).foreach { pair =>
      val Seq(a, b) = pair
      val expect = MediaGen.videoFrameIndices(a).toSet
        .intersect(MediaGen.videoFrameIndices(b).toSet).size
      assert(byVideo(a).intersect(byVideo(b)).size === expect,
        s"frame-hash overlap of videos $a/$b diverged from index overlap")
    }
    // distinct indices map to distinct hashes across the whole pool
    val all = byVideo.values.flatten.toSeq
    val idxCount = ids.flatMap(MediaGen.videoFrameIndices).toSet.size
    assert(all.toSet.size === idxCount, "frame-pool dHash collision")
  }

  test("near-dup pairs land exactly on the planted hamming/Jaccard structure") {
    import spark.implicits._
    val docs = (0L until 40L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val imgPairs = Multimodal.imageNearDupPairs(MediaGen.imageItems(docs), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val audPairs = Multimodal.audioNearDupPairs(MediaGen.audioItems(docs), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // groups g = 0..19: expected pair (2g, 2g+1) iff k = g mod 9 <= 6
    val expected = (0L until 20L).filter(g => g % 9 <= 6)
      .map(g => (2 * g, 2 * g + 1) -> (g % 9).toInt).toMap
    assert(imgPairs === expected, "image pairs/hammings")
    assert(audPairs === expected, "audio pairs/hammings")
    val vidPairs = Multimodal.videoNearDupPairs(MediaGen.videoItems(docs), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // Jaccard (4-o)/(4+o) for o = g mod 5; threshold 0.5 keeps o = 0, 1
    val expectedVid = (0L until 20L).filter(g => g % 5 <= 1)
      .map(g => (2 * g, 2 * g + 1) -> (if (g % 5 == 0) 1.0 else 0.6)).toMap
    assert(vidPairs === expectedVid, "video pairs/jaccards")
  }
}
