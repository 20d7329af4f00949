package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CorpusIngestSpec extends SparkSpec {

  test("streaming ingest keeps only novel texts across batches, partitioned by source") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("corpus").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    val docs = in.toDF.toDF("doc_id", "text", "source")

    val q = CorpusIngest.incrementalCorpusIngest(docs, s"$dir/corpus", ckpt)

    // batch 0 is EMPTY: must not create a schema-less sink dir that would
    // poison every later base read
    q.processAllAvailable()

    // batch 1: a within-batch duplicate (ids 1,2 same text) + one unique
    in.addData((1L, "alpha beta", "web"), (2L, "alpha beta", "web"),
      (3L, "gamma delta", "books"))
    q.processAllAvailable()
    // batch 2: repeats batch-1 content under new ids + one genuinely new doc
    in.addData((10L, "alpha beta", "web"), (11L, "gamma delta", "web"),
      (12L, "epsilon zeta", "web"))
    q.processAllAvailable()
    q.stop()

    val corpus = spark.read.parquet(s"$dir/corpus")
      .select("doc_id", "text", "source").collect()
    // one row per distinct text; within-batch dup kept the lowest id;
    // cross-batch repeats (even under another source) never re-ingested
    assert(corpus.map(_.getString(1)).sorted.toSeq ===
      Seq("alpha beta", "epsilon zeta", "gamma delta"))
    assert(corpus.map(r => r.getString(1) -> r.getLong(0)).toMap ===
      Map("alpha beta" -> 1L, "gamma delta" -> 3L, "epsilon zeta" -> 12L))
    // hive partition layout by source survives
    assert(new java.io.File(s"$dir/corpus/source=web").exists())
    assert(new java.io.File(s"$dir/corpus/source=books").exists())
  }
}
