package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunking, decontamination, sequence packing, deterministic shuffle —
  * the corpus-layout operators of the training pipeline.
  */
class CorpusOpsSpec extends SparkSpec {

  test("chunk: windows, overlap, and tail size") {
    import spark.implicits._
    val tokens = (1 to 100).map(i => s"t$i")
    val docs = Seq((1L, tokens.mkString(" ")), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, chunkTokens = 10, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()

    val doc1 = out.filter(_.getLong(0) == 1L)
    // stride 8: ceil((100-10)/8)+1 = 13 chunks
    assert(doc1.length === 13)
    assert(doc1.head.getAs[String]("chunk_text") === (1 to 10).map(i => s"t$i").mkString(" "))
    // consecutive chunks share exactly `overlap` tokens
    assert(doc1(1).getAs[String]("chunk_text").startsWith("t9 t10 t11"))
    // tail chunk: tokens 97..100
    assert(doc1.last.getAs[String]("chunk_text") === "t97 t98 t99 t100")
    assert(doc1.last.getAs[Int]("n_chunk_tokens") === 4)
    // every chunk except the tail is full-width
    assert(doc1.init.forall(_.getAs[Int]("n_chunk_tokens") == 10))

    val doc2 = out.filter(_.getLong(0) == 2L)
    assert(doc2.length === 1)
    assert(doc2.head.getAs[String]("chunk_text") === "a b c")
    assert(doc2.head.getAs[Int]("n_chunk_tokens") === 3)
  }

  test("chunkCdc: reconstruction, expected size, and edit-locality") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val tokens = Vector.fill(400)(words(rnd.nextInt(words.size)))
    val docs = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkCdc(docs, k = 3, divisor = 32)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getAs[String]("chunk_text"), r.getAs[Int]("n_chunk_tokens")))
    // chunks partition the token stream exactly (concatenation identity)
    assert(chunks.map(_._1).mkString(" ") === tokens.mkString(" "))
    assert(chunks.map(_._2).sum === 400)
    // boundary rate ~1/32: with 400 positions expect ~12 cuts; accept a
    // wide deterministic band (this is a fixed seed, not a statistics test)
    assert(chunks.length >= 3 && chunks.length <= 40, s"${chunks.length} chunks")
    // EDIT-LOCALITY, the property fixed windows lack: prepend tokens and
    // the chunk set far from the edit is unchanged (boundaries depend only
    // on the k-token window ending at each position)
    val edited = Seq((1L, ("inserted tokens here " + tokens.mkString(" ")))).toDF("doc_id", "text")
    val editedChunks = TextAnalysis.chunkCdc(edited, k = 3, divisor = 32)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk_text"))
    // every original chunk except the first (whose start region the edit
    // touches) must reappear verbatim in the edited chunking
    val reappeared = chunks.map(_._1).drop(1).count(editedChunks.contains)
    assert(reappeared === chunks.length - 1,
      s"only $reappeared of ${chunks.length - 1} post-edit chunks stable")
    // fixed windows, by contrast, shift everywhere: the same edit leaves
    // at most the tail chunk of TextAnalysis.chunk intact
    val fixedA = TextAnalysis.chunk(docs, chunkTokens = 32, overlap = 0)
      .collect().map(_.getAs[String]("chunk_text")).toSet
    val fixedB = TextAnalysis.chunk(edited, chunkTokens = 32, overlap = 0)
      .collect().map(_.getAs[String]("chunk_text")).toSet
    assert(fixedA.intersect(fixedB).size <= 1, "fixed chunking unexpectedly stable")
  }

  test("decontaminate flags n-gram overlap with the benchmark only") {
    import spark.implicits._
    val bench = Seq(
      (100L, "What is the capital of France Paris is the answer here")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the benchmark 5-gram "what is the capital of"
      (1L, "trivia night asked What is the capital of France and we won"),
      // no 5-gram in common
      (2L, "completely unrelated text about spark shuffles and parquet files")
    ).toDF("doc_id", "text")
    val hits = Dedup.decontaminate(corpus, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(1L) && hits(1L) >= 1L)
    assert(!hits.contains(2L))
  }

  test("packSequences: per-shard offsets are the running sum; pack_no = floor(off/cap)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, (i * 7 % 23 + 1) * 10)).toDF("doc_id", "n_chars")
    val out = Packing.packSequences(docs, capacity = 300L).collect()
    out.groupBy(_.getAs[String]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[String]("pack_key"))
      var run = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_off") === run)
        assert(r.getAs[Long]("pack_no") === run / 300L)
        run += r.getAs[Long]("len")
      }
    }
    // packSummary conserves rows and length
    val summary = Packing.packSummary(docs, capacity = 300L).collect()
    assert(summary.map(_.getAs[Long]("n_docs")).sum === 40L)
    assert(summary.map(_.getAs[Long]("sum_len")).sum ===
      out.map(_.getAs[Long]("len")).sum)
  }

  test("packBins: conservation, determinism, and statistical balance") {
    import spark.implicits._
    val docs = (1L to 4000L).map(i => (i, (i * 13 % 97 + 1) * 5)).toDF("doc_id", "n_chars")
    val bins = Packing.packBins(docs, nBins = 8).collect()
    assert(bins.length === 8)
    assert(bins.map(_.getAs[Long]("n_docs")).sum === 4000L)
    val totals = bins.map(_.getAs[Long]("total_len"))
    // hash balance: spread within ~4/sqrt(500) of the mean, generously
    val mean = totals.sum.toDouble / 8
    totals.foreach(t => assert(math.abs(t - mean) / mean < 0.2,
      s"bin imbalance: ${totals.toSeq}"))
    // deterministic under repartition
    val again = Packing.packBins(docs.repartition(5), nBins = 8).collect()
    assert(again.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ===
      bins.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("approx percentile audit: brackets hold; exact side matches percentile()") {
    import spark.implicits._
    val vals = (1L to 10000L).map(i => (i, (i * 37 % 9973).toDouble)).toDF("id", "v")
    val audit = Profiling.approxPercentileAudit(vals, "v", Seq(0.5, 0.9), accuracy = 1000)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getBoolean(2))).toMap
    assert(audit.keySet === Set("500", "900"))
    // sketch must sit inside the p +- 2/accuracy exact bracket (merge-
    // compounded rank error; see approxPercentileAudit scaladoc)
    assert(audit.values.forall(_._2), audit)
    // and the exact side is the real interpolating percentile
    val exact = vals.selectExpr("round(percentile(v, 0.5), 2)").head().getDouble(0)
    assert(audit("500")._1 === exact)
    assertThrows[IllegalArgumentException](
      Profiling.approxPercentileAudit(vals, "v", Seq(1.5)))
  }

  test("deterministicShuffle: same seed same order, new seed new order") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def order(seed: String): Seq[Long] =
      Sampling.deterministicShuffle(docs, "doc_id", seed)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val a = order("epoch0")
    assert(a === order("epoch0"))
    assert(a !== order("epoch1"))
    assert(a.sorted === (1L to 100L))
  }

  test("bloom decontamination: superset of exact, planted leak flagged") {
    import spark.implicits._
    val bench = Seq((1000L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = (
      Seq((1L, "padding words then the quick brown fox jumps over the lazy dog tonight indeed")) ++
      (2L to 40L).map(i => (i, s"completely unrelated document number $i about topic ${i * 7} with plenty of words"))
    ).toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, bench, n = 5)
      .collect().map(_.getLong(0)).toSet
    val bloom = Dedup.decontaminateBloom(corpus, bench, n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(exact.contains(1L) && bloom.contains(1L))
    assert(exact.subsetOf(bloom), s"bloom lost exact flags: ${exact -- bloom}")
    // tiny filter forces false positives; the superset property must hold
    val tiny = Dedup.decontaminateBloom(corpus, bench, n = 5, bitsLog2 = 8)
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(tiny))
    OperatorCaches.releaseAll()
  }

  test("standardize: 6dp-anchored z-scores, constant column -> null, repartition-stable") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 5.0), (2L, 20.0, 5.0), (3L, 30.0, 5.0), (4L, 40.0, 5.0))
      .toDF("id", "x", "konst")
    val out = Profiling.standardize(df, Seq("x", "konst"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), Option(r.get(4)))).toMap
    // mean 25, stddev_samp = sqrt(500/3) ~ 12.909944 -> anchors round 6dp
    def z(x: Double) = BigDecimal((x - 25.0) / 12.909944)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0).foreach { case (id, x) =>
      assert(out(id)._1 === z(x), s"id $id")
      assert(out(id)._2 === None, s"constant column must scale to null, id $id")
    }
    val again = Profiling.standardize(df.repartition(5), Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again === out.view.mapValues(_._1).toMap)
  }

  test("dpNoisyCounts: seeded Laplace replays scalar-side, seed rotates, eps scales") {
    import spark.implicits._
    val df = (0 until 90).map(i => (s"g${i % 3}", i)).toDF("g", "x")
    // length-prefixed token (len#value) — the injective noise key that
    // stops ':'-containing or null-vs-empty group values colliding onto
    // one Laplace draw
    def scalarNoise(seed: String, g: String, eps: Double): Double = {
      val u = (graft.operators.PortableHash.portable60(
        s"$seed:${g.length}#$g") + 0.5) / math.pow(2.0, 60) - 0.5
      -1.0 / eps * math.signum(u) * math.log(1.0 - math.abs(u) * 2)
    }
    val got = Profiling.dpNoisyCounts(df, Seq("g"), epsilon = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set("g0", "g1", "g2"))
    got.foreach { case (g, (tc, nc)) =>
      assert(tc === 30L)
      val want = BigDecimal(30.0 + scalarNoise("dp", g, 1.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(nc === want, s"group $g")
      assert(nc !== 30.0, s"group $g drew zero noise — hash degenerate?")
    }
    // a different seed draws different noise; a bigger epsilon shrinks it
    val rot = Profiling.dpNoisyCounts(df, Seq("g"), 1.0, seed = "dp2")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rot !== got.view.mapValues(_._2).toMap)
    val tight = Profiling.dpNoisyCounts(df, Seq("g"), 100.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    tight.foreach { case (g, nc) =>
      assert(math.abs(nc - 30.0) <= math.abs(got(g)._2 - 30.0) + 1e-9, g)
    }
    // deterministic under repartition
    val again = Profiling.dpNoisyCounts(df.repartition(7), Seq("g"), 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(again === got.view.mapValues(_._2).toMap)
  }

  test("cleanReport stage 0: PII is counted and never reaches a later stage") {
    import spark.implicits._
    // a passing-quality doc needs >= 50 words, stopwords, alpha ratio —
    // build one and plant an email + an SSN inside it
    val good = (("the be to of and that have with " * 8).trim + " tail").trim
    val withPii = good.replace("tail", "mail me at a.b@mail.example.org or 123-45-6789 now")
    val docs = Seq(
      (1L, withPii, "s0"),
      (2L, good + " two", "s0"),
      (3L, "short", "s1")) // fails the Gopher word-count gate
      .toDF("doc_id", "text", "source")
    val rep = CorpusPipeline.cleanReport(docs, minStopHits = 1).collect()(0)
    OperatorCaches.releaseAll()
    assert(rep.getAs[Long]("n_input") === 3L)
    assert(rep.getAs[Long]("n_pii_docs") === 1L)
    // the scrub must not DROP the doc — it flows on, redacted
    assert(rep.getAs[Long]("n_quality") === 2L)
    // and the redaction is visible downstream: the redact() of the same
    // input contains the placeholders, not the raw identifiers
    val red = Scrub.redact(docs, col("text"))
      .filter(col("doc_id") === 1L).collect()(0)
    val txt = red.getAs[String]("scrubbed_text")
    assert(txt.contains("<EMAIL>") && txt.contains("<SSN>"))
    assert(!txt.contains("a.b@mail.example.org") && !txt.contains("123-45-6789"))
  }

  test("cleanReport with scrub = Seq.empty skips stage 0 and reports zero") {
    import spark.implicits._
    val good = (("the be to of and that have with " * 8).trim + " tail").trim
    val docs = Seq(
      (1L, good.replace("tail", "mail a.b@mail.example.org now ok"), "s0"),
      (2L, good + " two", "s0"))
      .toDF("doc_id", "text", "source")
    val rep = CorpusPipeline.cleanReport(docs, scrub = Seq.empty).collect()(0)
    OperatorCaches.releaseAll()
    assert(rep.getAs[Long]("n_input") === 2L)
    // opt-out: nothing scrubbed, nothing counted — and no crash
    assert(rep.getAs[Long]("n_pii_docs") === 0L)
    assert(rep.getAs[Long]("n_quality") === 2L)
  }
}
