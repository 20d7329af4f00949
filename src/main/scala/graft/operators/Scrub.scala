package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / denylist scrubbing — the redaction pass a training-data pipeline
  * runs before anything else sees the text: pattern classes (emails, SSNs,
  * phone numbers, IPs, card-like digit runs, arbitrary denylist terms) are
  * counted and replaced with stable placeholders in ONE projection over
  * the corpus. New scope beyond the reference (the taxi pipeline has no
  * text); the LLM-pipeline counterpart of its sign-fix cleaning step.
  *
  * Scale shape: everything here is per-row regex work inside whole-stage
  * codegen — no shuffle at all for [[redact]], one bounded group roll-up
  * for [[scrubReport]]. At 100 TB the scan partitions and the report's
  * reduce is map-side combined; there is no state, no fan-out, no join.
  *
  * Cross-engine contract: patterns stay inside the Java-regex ∩ RE2
  * subset (no lookaround, no backrefs — both engines compile the class
  * below identically), counts are taken on the ORIGINAL text before any
  * replacement, and replacements chain in declaration order so the
  * scrubbed text is byte-identical in both engines (verified by the
  * portable hash-sum the report publishes).
  */
object Scrub {

  /** One scrub class: `name` keys the report columns, `regex` must be
    * valid under BOTH Java regex and RE2, `placeholder` is the literal
    * replacement. [[redact]] enforces the literal part: '$' and '\' are
    * Java replacement-string metacharacters (and '\1' is an RE2 rewrite
    * backref), so a placeholder containing either would throw or silently
    * diverge cross-engine — rejected up front rather than documented away.
    */
  final case class ScrubPattern(name: String, regex: String,
      placeholder: String)

  /** Default PII classes. Digit-run classes are ordered most- to
    * least-structured (SSN/phone/IP before the bare card run) so the
    * chained replace never lets a generic class eat a specific one.
    * Within the phone and card classes, alternations are ordered
    * specific-first (parenthesized area code before the dashed form,
    * separator-grouped card before the bare digit run) — both engines
    * try alternatives left to right at each position, and the two forms
    * of each class can never match at the same start offset ('(' vs
    * digit, digit-4-then-separator vs digit run), so the alternation is
    * unambiguous. Known residue (deliberate, documented): digit runs of
    * 17+ and card groupings other than 4-4-4-4 match no default class —
    * callers with stricter corpora pass custom patterns.
    */
  val PiiDefaults: Seq[ScrubPattern] = Seq(
    ScrubPattern("email",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ScrubPattern("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ScrubPattern("phone",
      "\\(\\d{3}\\) ?\\d{3}[-. ]\\d{4}\\b|\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
      "<PHONE>"),
    ScrubPattern("ipv4",
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ScrubPattern("card",
      "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b|\\b\\d{13,16}\\b",
      "<CARD>"))

  /** Per-row scrub: appends one `hits_<name>` count column per pattern
    * (counted on the ORIGINAL text) and replaces `textCol` with the
    * scrubbed text (replacements applied in `patterns` order). Pure
    * projection — composes with any downstream filter/dedup stage.
    */
  def redact(
      df: DataFrame,
      textCol: Column,
      patterns: Seq[ScrubPattern] = PiiDefaults): DataFrame = {
    require(patterns.nonEmpty, "redact: need >= 1 pattern")
    require(patterns.map(_.name).distinct.size == patterns.size,
      "redact: pattern names must be unique")
    // '$'/'\' are replacement metacharacters in Java's regexp_replace (and
    // RE2 rewrites treat '\1' specially): fail loudly instead of letting a
    // denylist placeholder throw mid-job or diverge from the DuckDB replay
    for (p <- patterns)
      require(!p.placeholder.exists(c => c == '$' || c == '\\'),
        s"redact: placeholder for '${p.name}' contains '$$' or '\\' — " +
          "Java replacement metacharacters are not portable")
    // withColumn REPLACES an existing column of the same name: a caller
    // frame already carrying hits_<name>/scrubbed_text would be silently
    // corrupted, so reject the collision instead
    val generated = "scrubbed_text" +: "__scrub_text" +:
      patterns.map(p => s"hits_${p.name}")
    val clash = df.columns.toSet.intersect(generated.toSet)
    require(clash.isEmpty,
      s"redact: input columns collide with generated names: ${clash.mkString(", ")}")
    val counted = patterns.foldLeft(df.withColumn("__scrub_text", textCol)) {
      case (d, p) => d.withColumn(s"hits_${p.name}",
        regexp_count(col("__scrub_text"), lit(p.regex)))
    }
    val scrubbed = patterns.foldLeft(counted) { case (d, p) =>
      d.withColumn("__scrub_text",
        regexp_replace(col("__scrub_text"), p.regex, p.placeholder))
    }
    scrubbed.withColumn("scrubbed_text", col("__scrub_text"))
      .drop("__scrub_text")
  }

  /** Per-group scrub certificate: document count, per-class hit totals,
    * docs_affected (any class hit), and a portable hash-sum of the
    * SCRUBBED text — zero hit columns certify the corpus clean for those
    * classes, and the hash-sum proves the redaction itself is
    * deterministic (an independent engine replaying the same chained
    * replaces lands on the same sum). Hash accumulates in decimal(38,0)
    * mod 2^61−1 (the tableFingerprint fold), so a 100 TB corpus cannot
    * wrap the publish.
    */
  def scrubReport(
      df: DataFrame,
      groupCol: Column,
      textCol: Column,
      patterns: Seq[ScrubPattern] = PiiDefaults): DataFrame = {
    val dec = "decimal(38,0)"
    val m = RankEval.FingerprintMod
    val red = redact(df, textCol, patterns)
    val hitCols = patterns.map(p => col(s"hits_${p.name}"))
    val anyHit = hitCols.map(_ > 0).reduce(_ || _)
    val aggs = (sum(when(anyHit, 1L).otherwise(0L)).as("docs_affected") +:
      patterns.map(p =>
        sum(col(s"hits_${p.name}").cast("long")).as(s"hits_${p.name}"))) :+
      pmod(sum(pmod(PortableHash.portable60(col("scrubbed_text")),
          lit(m)).cast(dec)), lit(m).cast(dec))
        .cast("long").as("scrubbed_hash_sum")
    red.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .orderBy("grp")
  }
}
