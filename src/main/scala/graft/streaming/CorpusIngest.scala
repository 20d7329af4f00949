package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, md5}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming corpus growth: the continuous version of the every-ingest
  * dedup loop (crawl batches arrive as a stream; only genuinely new
  * documents reach the corpus). New scope beyond the reference (batch-only,
  * SURVEY.md §2i), composing the batch operators it already ships:
  * per-batch exact dedup + digest anti-join against everything kept so far
  * ([[Dedup.incrementalExact]]) + hive-partitioned append.
  *
  * Scale + exactly-once notes:
  *  - The anti-join carries 16-byte md5 digests, never document bodies; at
  *    100 TB the base side is a digest column scan (or a pre-built digest
  *    table — swap the `spark.read.parquet` for it, same plan).
  *  - Retried micro-batches are CONTENT-idempotent without transactional
  *    sinks: a re-run batch re-checks against the base, which already
  *    contains whatever the failed attempt appended, so survivors of the
  *    first attempt are filtered out the second time. (File-level
  *    duplicates can only arise for rows that were mid-flight in a crashed
  *    write, the usual parquet-append caveat; a table format with commit
  *    atomicity slots in here unchanged.)
  *  - Partitioning by `partitionCols` (default: source) keeps each append
  *    scoped to the partitions the batch touches.
  */
object CorpusIngest {

  /** Start the ingest stream: `docs` must contain `idCol`, `textCol`, and
    * `partitionCols`. Returns the StreamingQuery handle.
    *
    * With `digestPath` set, a digest TABLE (one 16-byte md5 per kept doc)
    * is maintained next to the corpus and the anti-join runs against it —
    * the base corpus text is never rescanned on ingest
    * ([[Dedup.incrementalExactByDigest]]); without it, the base read
    * projects just the text column for hashing. Write order is corpus
    * first, digests second: a crash between the two re-admits a duplicate
    * on the next batch (benign — it gets filtered against the corpus
    * content it duplicates downstream), instead of a digest existing for a
    * body that was never committed (which would silently drop that
    * document forever).
    *
    * With `sketchPath` set, the stream additionally drops NEAR-duplicates
    * (estimated Jaccard ≥ `nearDupThreshold`): within the batch via the
    * LSH pair join collapsed to connected components (one min-id
    * representative per transitive dup group — the same policy as batch
    * [[Dedup.fuzzyDedupClusters]]), and against everything kept so far by
    * probing the minhash sketch table
    * ([[Dedup.minHashSketchTable]]) maintained at `sketchPath` — the fuzzy
    * analogue of the digest table, and like it, probes read (id, sig)
    * only, never base text. Same corpus-first write order: a crash that
    * commits bodies but not sketches re-ADMITS a later near-dup (benign,
    * cleanable offline); the reverse order could drop future novel
    * documents against sketches of bodies that never committed.
    */
  def incrementalCorpusIngest(
      docs: DataFrame,
      basePath: String,
      checkpointDir: String,
      partitionCols: Seq[String] = Seq("source"),
      idCol: String = "doc_id",
      textCol: String = "text",
      digestPath: Option[String] = None,
      sketchPath: Option[String] = None,
      nearDupThreshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an empty batch must not touch the sink: writing it would create
        // basePath with only _SUCCESS, and a schema-less parquet dir kills
        // every later batch's base read ("Unable to infer schema")
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // within-batch exact dedup (keep lowest id per text)
          val fresh = Dedup.exact(batch, idCol, textCol)
          val fs = new Path(basePath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val exactNovel = digestPath match {
            case Some(dp) if fs.exists(new Path(dp)) =>
              Dedup.incrementalExactByDigest(fresh,
                spark.read.parquet(dp), textCol)
            case None if fs.exists(new Path(basePath)) =>
              // pin the schema: tolerant of a base dir a crashed attempt
              // left behind with no data files
              Dedup.incrementalExact(fresh,
                spark.read.schema(batch.schema).parquet(basePath), textCol)
            case _ => fresh // first non-empty batch: nothing seen yet
          }
          val novel0 = sketchPath match {
            case Some(sp) =>
              // within-batch near-dup prune with the same representative
              // policy as fuzzyDedupClusters: collapse verified LSH pairs
              // to connected components and keep the min-id per component —
              // the streaming path now deduplicates by the SAME transitive-
              // cluster semantics as the batch path (standard fuzzy-dedup
              // policy: one keeper per dup group, members linked only
              // transitively still collapse). The previous drop-every-id_b
              // heuristic also never kept a near pair, but kept non-minimal
              // cluster members the batch path would drop, so a corpus
              // ingested via streaming could diverge from one deduped in
              // batch. Dup groups are near-cliques, so the min-label CC
              // converges in 1-2 rounds on a micro-batch.
              val pairs = Dedup.minHashLsh(exactNovel, idCol, textCol,
                threshold = nearDupThreshold)
              val losers = Dedup.connectedComponents(pairs)
                .filter(col("id") =!= col("component"))
                .select(col("id").as("__graft_nd"))
              val inBatch = exactNovel.join(losers,
                exactNovel(idCol).cast("long") === col("__graft_nd"),
                "left_anti")
              if (fs.exists(new Path(sp)))
                Dedup.incrementalMinHash(inBatch, spark.read.parquet(sp),
                  idCol, textCol, threshold = nearDupThreshold)
              else inBatch
            case None => exactNovel
          }
          // EAGER lineage cut before any sink append — load-bearing, not a
          // cache nicety: novel0's plan READS the digest/sketch paths this
          // batch also APPENDS to, and DataFrameWriter append triggers
          // recacheByPath on the target, which re-materializes every cached
          // plan reading it against the NEW file list. A merely persisted
          // kept-set would be recomputed after the first append and
          // anti-join itself against its own just-written digests — later
          // sinks would then see it EMPTY (the sketch table silently lost
          // every batch's rows). The localCheckpoint pins the batch's rows
          // as concrete blocks whose plan references no path at all.
          val novel = novel0.localCheckpoint()
          try {
            // same all-empty guard for all sinks, same reason as above
            if (!novel.isEmpty) {
              novel.write.mode("append")
                .partitionBy(partitionCols: _*).parquet(basePath)
              digestPath.foreach { dp =>
                novel.select(md5(col(textCol)).as("digest"))
                  .write.mode("append").parquet(dp)
              }
              sketchPath.foreach { sp =>
                Dedup.minHashSketchTable(novel, idCol, textCol)
                  .write.mode("append").parquet(sp)
              }
            }
          } finally {
            novel.unpersist(blocking = false)
            // the LSH pair join persists its own sketch table per batch
            graft.operators.OperatorCaches.release(spark)
          }
        }
      }
      .start()
}
