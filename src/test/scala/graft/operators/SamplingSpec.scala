package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, if (i % 4 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
  }

  test("deterministic split is stable, complete, and roughly proportioned") {
    val once = Sampling.deterministicSplit(docs, "doc_id")
    val again = Sampling.deterministicSplit(docs.repartition(7), "doc_id")
    val a = once.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = again.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b) // row order / partitioning cannot change the assignment
    assert(a.values.sum === 1000L)
    assert(a("train") > 650 && a("train") < 850) // 75% expected
    // per-row stability, not just counts
    val moved = once.as("x").join(again.as("y"), "doc_id")
      .filter(col("x.split") =!= col("y.split")).count()
    assert(moved === 0L)
  }

  test("stratified sample keeps per-stratum quotas of 16ths") {
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 16, "de" -> 4))
    val counts = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") === 250L) // 16/16 = keep all 250
    assert(counts("de") > 130 && counts("de") < 240) // 4/16 of 750 ≈ 187
    // strata not in the map are dropped entirely
    val dropped = Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 16))
    assert(dropped.filter(col("lang") === "de").count() === 0L)
  }

  test("mixture sample hits target proportions; binding stratum keeps everything") {
    // raw mix: 250 en / 750 de; target 50/50 → en binds (N = 500):
    // en keeps all 250, de downsamples to ~250 (rate quantized to 1/256)
    val kept = Sampling.mixtureSample(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.5))
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === 250L)
    assert(math.abs(byLang("de") - 250L) <= 40L,
      s"de kept ${byLang("de")}, expected ~250")
  }

  test("mixture sample accepts non-string stratum columns") {
    import spark.implicits._
    val intStrata = (0L until 100L).map(i => (i, (i % 2).toInt)).toDF("doc_id", "grp")
    val kept = Sampling.mixtureSample(intStrata, "grp", "doc_id",
      Map("0" -> 0.5, "1" -> 0.5))
    // both strata have 50 rows → balanced target keeps everything
    assert(kept.count() === 100L)
  }

  test("mixture sample depends only on relative weights") {
    val a = Sampling.mixtureSample(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.5)).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.mixtureSample(docs, "lang", "doc_id",
      Map("en" -> 2.0, "de" -> 2.0)).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a sameElements b)
  }

  test("mixture sample is deterministic and drops unlisted strata") {
    val a = Sampling.mixtureSample(docs, "lang", "doc_id", Map("en" -> 1.0))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.mixtureSample(docs, "lang", "doc_id", Map("en" -> 1.0))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a sameElements b)
    // only-en mixture keeps every en row and no de row
    assert(a.length === 250 && a.forall(_ % 4 == 0))
  }

  test("temperature mixture flattens skew; scarcest stratum keeps everything") {
    // raw mix: 250 en / 750 de. alpha = 0.5 → en (scarcest) keeps all,
    // de keeps sqrt(250/750) ≈ 57.7% ≈ 433 rows (1/256-quantized)
    val kept = Sampling.temperatureMixture(docs, "lang", "doc_id", alpha = 0.5)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === 250L)
    assert(math.abs(byLang("de") - 433L) <= 40L,
      s"de kept ${byLang("de")}, expected ~433")
    // alpha = 1 is the natural distribution: every row survives
    assert(Sampling.temperatureMixture(docs, "lang", "doc_id", alpha = 1.0)
      .count() === 1000L)
    // deterministic under repartition (narrow hash filter, no RNG)
    val a = kept.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.temperatureMixture(docs.repartition(7), "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a sameElements b)
    // lower alpha flattens harder: de's keep count shrinks monotonically
    val flatter = Sampling.temperatureMixture(docs, "lang", "doc_id", alpha = 0.25)
      .filter(col("lang") === "de").count()
    assert(flatter < byLang("de"))
    assertThrows[IllegalArgumentException](
      Sampling.temperatureMixture(docs, "lang", "doc_id", alpha = 0.0))
  }

  test("leakage-safe split keeps whole near-dup clusters in one side") {
    import spark.implicits._
    // 100 clusters of 3 near-dups each (component = min id of the trio)
    val clusters = (0L until 300L).map(i => (i, i / 3 * 3)).toDF("id", "component")
    val split = Sampling.leakageSafeSplit(clusters)
    // every cluster lands whole: one distinct split value per component
    val mixed = split.groupBy("component")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(mixed === 0L)
    // and the proportions still follow the 12/2/2 buckets, roughly
    val byS = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.values.sum === 300L)
    assert(byS("train") > 150 && byS("train") < 290, byS)
    // independent of the plain doc-id split (distinct purpose salt):
    // an id-keyed split WOULD mix these clusters — demonstrate the hazard
    val idSplit = Sampling.deterministicSplit(
      clusters.withColumnRenamed("id", "doc_id"), "doc_id")
    val idMixed = idSplit.groupBy("component")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count()
    assert(idMixed > 0L, "fixture too small to show the leakage hazard")
  }

  test("PII redaction replaces emails, phones, and IPs with typed tokens") {
    import spark.implicits._
    val d = Seq(
      (1L, "contact me at jane.doe@example.com or +1 (555) 123-4567 ok"),
      (2L, "server at 192.168.0.1 responded"),
      (3L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("text_redacted"), x.getAs[Boolean]("pii_found"))).toMap
    assert(r(1L)._1 === "contact me at <EMAIL> or <PHONE> ok")
    assert(r(1L)._2)
    assert(r(2L)._1 === "server at <IP> responded")
    assert(!r(3L)._2)
    assert(r(3L)._1 === "nothing sensitive here at all")
  }

  test("DSIR weights tilt toward the target vocabulary; sample is deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def doc(vocab: Seq[String], n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val va = Seq("alpha", "beta", "gamma", "delta")
    val vb = Seq("uno", "dos", "tres", "quatro")
    // raw corpus: 20 docs in the target-ish vocabulary, 20 in a disjoint
    // one; the target corpus is drawn from vocabulary A only
    val raw = ((1L to 20L).map(i => (i, doc(va, 30))) ++
      (21L to 40L).map(i => (i, doc(vb, 30)))).toDF("doc_id", "text")
    val target = (100L to 119L).map(i => (i, doc(va, 30))).toDF("doc_id", "text")
    val w = Sampling.dsirLogWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size === 40)
    val aAvg = (1L to 20L).map(w).sum / 20
    val bAvg = (21L to 40L).map(w).sum / 20
    assert(aAvg > bAvg + 1.0,
      s"importance model failed to separate vocabularies: $aAvg vs $bAvg")
    // selection: deterministic under repartition, ranked by score desc,
    // and dominated by target-like docs (the weight gap dwarfs the
    // Gumbel noise on this corpus)
    val s1 = Sampling.dsirSample(raw, target, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val s2 = Sampling.dsirSample(raw.repartition(5), target, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.map(_._3).toSeq === s1.map(_._3).toSeq.sorted.reverse)
    assert(s1.count(_._1 <= 20L) >= 8, s"off-target docs selected: ${s1.toSeq}")
    OperatorCaches.releaseAll()
  }

  test("domainCap keeps at most cap docs per group, deterministically") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i <= 95) "big.com" else "small.com"))
      .toDF("doc_id", "source")
    val kept = Sampling.domainCap(df, "source", cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("big.com") === 10)    // capped
    assert(bySrc("small.com") === 5)   // under cap: passes through whole
    val again = Sampling.domainCap(df.repartition(9), "source", cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.sorted.toSeq === kept.sorted.toSeq)
  }

  test("weightedSample is deterministic, weight-proportional, excludes w<=0") {
    import spark.implicits._
    // ids 1-10 heavy (w=500), 11-100 light (w=5), 101 zero weight
    val df = ((1L to 10L).map((_, 500L)) ++ (11L to 100L).map((_, 5L)) :+ (101L, 0L))
      .toDF("doc_id", "w")
    val s1 = Sampling.weightedSample(df, col("w"), n = 15)
      .collect().map(_.getLong(0))
    val s2 = Sampling.weightedSample(df.repartition(7), col("w"), n = 15)
      .collect().map(_.getLong(0))
    assert(s1.toSeq === s2.toSeq)
    assert(!s1.contains(101L))
    // heavy items are 100x the weight: expect most of the 10 in the top 15
    assert(s1.count(_ <= 10L) >= 7, s"heavy items under-sampled: ${s1.toSeq}")
    // different seed draws a different (still deterministic) light tail
    val s3 = Sampling.weightedSample(df, col("w"), n = 15, seed = "other")
      .collect().map(_.getLong(0))
    assert(s3.toSeq !== s1.toSeq)
  }

  test("budgetSelect reproduces the global greedy prefix, incl. boundary ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // coarse score grid forces ties (boundary-bucket window path fires)
    val rows = (0L until 400L).map { i =>
      (i, (rnd.nextInt(8) / 8.0), 10L + rnd.nextInt(90)) }
    val df = rows.toDF("doc_id", "q", "cost")

    def brute(budget: Long): Set[Long] = {
      var rem = budget
      rows.sortBy { case (id, s, _) => (-s, id) }
        .takeWhile { case (_, _, c) => val ok = c <= rem; if (ok) rem -= c; ok }
        .map(_._1).toSet
    }
    Seq(0L, 500L, 7_000L, 13_500L, 1_000_000L).foreach { budget =>
      val got = Sampling.budgetSelect(df, col("q"), col("cost"), budget)
        .collect().map(_.getLong(0)).toSet
      assert(got === brute(budget), s"budget $budget")
    }
    // budget >= total keeps everything; 0 keeps nothing
    assert(Sampling.budgetSelect(df, col("q"), col("cost"), 1_000_000L).count() === 400L)
    assert(Sampling.budgetSelect(df, col("q"), col("cost"), 0L).count() === 0L)
    // determinism under repartition (histogram + window paths both stable)
    val a = Sampling.budgetSelect(df, col("q"), col("cost"), 7000L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.budgetSelect(df.repartition(13), col("q"), col("cost"), 7000L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    OperatorCaches.releaseAll()
  }
}
