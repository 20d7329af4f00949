package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are laid out in a
  * deterministic hash order and split into fixed-capacity packs
  * (concat-and-split packing — each pack holds the documents whose stream
  * START offset falls inside its window, the standard pretraining layout).
  *
  * Scale shape: one shuffle (the per-shard window sort). The corpus is
  * first sharded 16-way by an md5 digit of the id, and the running offset
  * is computed PER SHARD — a single global window would serialize 100 TB
  * through one task, while per-shard windows parallelize freely (shards
  * are independent streams, as multi-host training readers expect).
  * The plan reads only (id, length): no document text moves.
  */
object Packing {

  /** Assign each row a shard, a deterministic position key, its start
    * offset in the shard's concatenated stream, and its pack number
    * (`floor(startOff / capacity)`). `lenCol` is the row's length in
    * whatever unit capacity is expressed in (tokens, chars, bytes).
    */
  def packSequences(
      df: DataFrame,
      idCol: String = "doc_id",
      lenCol: String = "n_chars",
      capacity: Long = 4096L): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val key = md5(concat_ws(":", lit("pack"), col(idCol).cast("string")))
    val w = Window.partitionBy("shard").orderBy("pack_key")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol),
        col(lenCol).cast("long").as("len"),
        substring(key, 1, 1).as("shard"),
        key.as("pack_key"))
      .withColumn("start_off", coalesce(sum(col("len")).over(w), lit(0L)))
      // integer DIV, kept long: double division would lose exactness for
      // offsets past 2^53 and an int cast overflows past 2^31 packs
      .withColumn("pack_no", expr(s"start_off DIV ${capacity}L"))
  }

  /** Per-pack summary (docs per pack, filled length) — the layout manifest
    * a training reader consumes.
    */
  def packSummary(
      df: DataFrame,
      idCol: String = "doc_id",
      lenCol: String = "n_chars",
      capacity: Long = 4096L): DataFrame =
    packSequences(df, idCol, lenCol, capacity)
      .groupBy("shard", "pack_no")
      .agg(count(lit(1)).as("n_docs"), sum("len").as("sum_len"))
      .orderBy("shard", "pack_no")

  /** WHOLE-document bin assignment for load balancing (GPU data-parallel
    * readers, shard-balanced exports): bin = the portable hash of the id
    * mod `nBins`. Unlike [[packSequences]] no document is ever split.
    *
    * Deliberately NOT first-fit-decreasing: FFD needs a global
    * length-sorted sequential pass — at corpus scale that is one task
    * scanning everything (the same reason packSequences shards its
    * windows). Hash assignment is a narrow map with no shuffle before the
    * stats aggregate, deterministic under re-runs and re-sharding, and
    * its imbalance concentrates like 1/√(docs per bin): at any realistic
    * corpus/bin ratio the spread is fractions of a percent — the per-bin
    * (n_docs, total_len) manifest this returns states the achieved
    * balance instead of assuming it.
    */
  def packBins(
      df: DataFrame,
      idCol: String = "doc_id",
      lenCol: String = "n_chars",
      nBins: Int = 16): DataFrame = {
    require(nBins >= 1, "need nBins >= 1")
    df.select(
        pmod(PortableHash.portable60(
          concat_ws(":", lit("bin"), col(idCol).cast("string"))),
          lit(nBins.toLong)).cast("int").as("bin"),
        col(lenCol).cast("long").as("len"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("len").as("total_len"))
      .orderBy("bin")
  }
}
