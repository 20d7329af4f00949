package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-cleaning recipe as ONE call — the composition a
  * pre-training data pipeline actually runs, chaining operators that are
  * each individually driver-oracled: PII scrub → Gopher hard gates →
  * span-level global line dedup → exact dedup → per-domain cap → a
  * one-row report of what every stage kept. A user of the reference
  * switching here gets the whole cleaning pass, not just its pieces.
  *
  * The scrub runs FIRST (stage 0) on purpose: no later stage — no
  * persisted intermediate, no dedup digest, no capped output — ever
  * holds text matching the CONFIGURED scrub classes; every downstream
  * hash and winner is computed over the already-redacted text. (That is
  * a guarantee about the configured patterns, not about PII in general:
  * forms outside them — e.g. 17+-digit runs or exotic phone groupings
  * under [[Scrub.PiiDefaults]] — flow through unredacted. Pass stricter
  * patterns for stricter corpora; `scrub = Seq.empty` skips stage 0
  * entirely and reports n_pii_docs = 0.)
  *
  * Scale shape: each stage is the already-audited operator (zero-shuffle
  * gates, digest-keyed line winners, md5 exact groups, one window for
  * the cap); intermediates that feed both the next stage and the report
  * counts are persisted once and released by the caller via
  * [[OperatorCaches.releaseAll]].
  */
object CorpusPipeline {

  /** Run the recipe and return the one-row report. `minStopHits` relaxes
    * Gopher's stopword probe for corpora whose vocabulary the 8-word
    * list barely overlaps (synthetic fixtures, non-English).
    */
  def cleanReport(
      docs: DataFrame,
      windowTokens: Int = 10,
      cap: Int = 40,
      minStopHits: Int = 1,
      scrub: Seq[Scrub.ScrubPattern] = Scrub.PiiDefaults): DataFrame = {
    val linesC = Dedup.tokenWindowLines(col("text"), windowTokens)

    // stage 0: PII scrub — persisted as (id, redacted text, source, pii
    // flag) only, so the raw text never sits in an intermediate. An empty
    // pattern list is the documented opt-out (stage skipped, n_pii_docs
    // reports 0) rather than an opaque .reduce crash
    val red = OperatorCaches.persistTracked(
      if (scrub.isEmpty)
        docs.select(col("doc_id"), col("text"), col("source"),
          lit(0L).as("pii"))
      else {
        val anyHit = scrub.map(p => col(s"hits_${p.name}") > 0).reduce(_ || _)
        Scrub.redact(docs, col("text"), scrub)
          .select(col("doc_id"), col("scrubbed_text").as("text"),
            col("source"), when(anyHit, 1L).otherwise(0L).as("pii"))
      })
    val gated = OperatorCaches.persistTracked(
      TextAnalysis.gopherFilter(red.select("doc_id", "text", "source"))
        .filter(col("ok_n_words") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_alpha") && col("stop_hits") >= minStopHits)
        .select("doc_id", "text", "source"))
    val lined = OperatorCaches.persistTracked(
      Dedup.lineDedup(gated, linesC)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("text_dedup"), col("source")))
    val exact = OperatorCaches.persistTracked(
      Dedup.exact(lined, textCol = "text_dedup"))
    val capped = OperatorCaches.persistTracked(
      Sampling.domainCap(exact, "source", cap))

    val nTok = (c: org.apache.spark.sql.Column) =>
      sum(size(split(c, "\\s+"))).cast("long") // text_dedup joins lines by \n
    docs.agg(count(lit(1)).as("n_input"), nTok(col("text")).as("tokens_in"))
      .crossJoin(red.agg(sum("pii").as("n_pii_docs")))
      .crossJoin(gated.agg(count(lit(1)).as("n_quality")))
      .crossJoin(lined.agg(count(lit(1)).as("n_nonempty")))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(capped.agg(count(lit(1)).as("n_final"),
        nTok(col("text_dedup")).as("tokens_out")))
      .select("n_input", "n_pii_docs", "n_quality", "n_nonempty", "n_exact",
        "n_final", "tokens_in", "tokens_out")
  }
}
