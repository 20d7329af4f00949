package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank."),
      (2L, "El rapido zorro marron salta sobre el perro perezoso en la calle."),
      (3L, "12345 67890 !!!"),
      (4L, "word")
    ).toDF("doc_id", "text")
  }

  test("quality metrics: counts and ratios") {
    val m = TextAnalysis.qualityMetrics(docs).filter(col("doc_id") === 1).head()
    assert(m.getAs[Long]("n_char") === 64L)
    assert(m.getAs[Long]("n_tokens") === 13L)
    assert(m.getAs[Double]("stopword_ratio") > 0.2) // the, over, the, near, the
  }

  test("quality score separates prose from garbage") {
    val scores = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(3L))
    assert(scores(1L) > scores(4L)) // too short to pass the length window
  }

  test("token counting: whitespace vs BPE-ish subword") {
    val t = TextAnalysis.tokenCounts(docs).filter(col("doc_id") === 3).head()
    assert(t.getAs[Long]("n_ws_tokens") === 3L)
    // digits split from punctuation: 12345, 67890, !, !, !
    assert(t.getAs[Long]("n_bpeish_tokens") >= 3L)
  }

  test("language id picks the profile with most stopword hits") {
    val langs = TextAnalysis.languageId(docs)
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) === "en")
    assert(langs(2L) === "es")
    assert(langs(3L) === "und") // no stopword evidence
  }

  test("unigram surprisal: repeated-token docs score low, rare-token docs high") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "common common common common common common common common"),
      (2L, "rareword1 rareword2 rareword3 rareword4"),
      (3L, "common common common rareword5")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.unigramSurprisal(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 16 corpus tokens: "common" has P = 11/16; each rareword P = 1/16
    assert(s(1L) < s(3L) && s(3L) < s(2L))
    assert(math.abs(s(2L) - 4.0) < 1e-3) // -log2(1/16) = 4
  }

  test("collocations: a fixed phrase outranks incidental co-occurrence") {
    import spark.implicits._
    // "machine learning" always adjacent; "data" appears more often than
    // "learning", so even a perfect predictor of "data" scores lower
    // (PMI of a perfect pair = -log2 P(second word))
    val corpus = (0 until 10).map(i =>
      (i.toLong, s"machine learning is data w$i and data v$i uses machine learning also data here"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.collocations(corpus, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    assert(top.nonEmpty)
    val ml = top.find(t => t._1 == "machine" && t._2 == "learning").get
    // every "machine" is followed by "learning" → maximal association:
    // ml attains the top PMI (other perfect predictors may tie — PMI of a
    // perfect pair is -log2 P(second), identical when counts match)
    assert(ml._3 === top.head._3 && ml._3 > 0.0)
    // every pair landing on the commoner "data" scores strictly lower
    val inc = top.filter(_._2 == "data")
    assert(inc.nonEmpty && inc.forall(_._3 < ml._3))
  }

  test("fingerprint is order-sensitive and content-deterministic") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("fingerprint is whitespace-normalizing (token identity, not bytes)") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma"),
      (2L, "  alpha   beta\tgamma "),
      (3L, "alphabeta gamma")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("bigram backoff surprisal: fluent text beats shuffled soup; OOV finite") {
    import spark.implicits._
    // model corpus: one sentence repeated with light variation, so its
    // bigrams are in-model
    val model = (1L to 30L).map(i =>
      (i, s"the cat sat on the mat near door $i")).toDF("doc_id", "text")
    val target = Seq(
      (100L, "the cat sat on the mat"),            // fluent: all bigrams seen
      (101L, "mat the on cat the sat"),            // same words, unseen order
      (102L, "zyx qwv entirely novel tokens here") // OOV: must stay finite
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(target, model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === 3)
    assert(out(100L) < out(101L),
      s"fluent should beat shuffled: ${out(100L)} vs ${out(101L)}")
    assert(out(101L) < out(102L), "OOV should score highest")
    assert(!out(102L).isInfinite && !out(102L).isNaN)
    OperatorCaches.releaseAll()
  }

  test("BPE training matches an exact driver-side reference trainer") {
    import spark.implicits._
    // reference implementation: word-freq table, weighted pair counts,
    // argmax (cnt desc, a asc, b asc), greedy left-to-right apply
    def reference(words: Map[String, Long], nMerges: Int): Seq[(Int, String, String, Long)] = {
      var vocab = words.map { case (w, f) => (w.map(_.toString) :+ "</w>", f) }.toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      for (r <- 1 to nMerges) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (s, f) =>
          s.zip(s.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f) }
        if (counts.nonEmpty) {
          val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
          out += ((r, a, b, c))
          vocab = vocab.map { case (s, f) =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                buf += (a + b); i += 2
              } else { buf += s(i); i += 1 }
            }
            (buf.toIndexedSeq, f)
          }
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(53)
    val vocabWords = Seq("lower", "lowest", "newer", "newest", "wider",
      "widest", "low", "new", "aaaa", "aaab") // aaaa: overlapping-run case
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(8)(vocabWords(rnd.nextInt(vocabWords.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val wordFreq = docs.collect().flatMap(_.getString(1).split(" "))
      .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    val want = reference(wordFreq, nMerges = 8)
    val got = TextAnalysis.bpeTrain(docs, nMerges = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq === want, s"\ngot:  ${got.toSeq}\nwant: $want")
    // merged column really is the concatenation
    val merged = TextAnalysis.bpeTrain(docs, nMerges = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    merged.foreach { case (a, b, m) => assert(m === a + b) }
    // ENCODE: per-doc subword counts equal a reference apply of the same
    // ranked merges to every word
    def applyAll(w: String, ms: Seq[(String, String)]): Int = {
      var s: Seq[String] = w.map(_.toString) :+ "</w>"
      ms.foreach { case (a, b) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { buf += (a + b); i += 2 }
          else { buf += s(i); i += 1 }
        }
        s = buf.toSeq
      }
      s.length
    }
    val ms = want.map { case (_, a, b, _) => (a, b) }
    val counts = TextAnalysis.bpeTokenCounts(docs, merges = ms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docWords = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    docWords.foreach { case (id, ws) =>
      assert(counts(id)._1 === ws.length.toLong, s"doc $id ws")
      assert(counts(id)._2 === ws.map(w => applyAll(w, ms)).sum.toLong, s"doc $id bpe")
    }
    OperatorCaches.releaseAll()
  }

  test("bpeTrainBatched: batchK=1 equals sequential bpeTrain; disjoint top-k accepted in rank order") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val vocabWords = Seq("lower", "lowest", "newer", "newest", "wider",
      "widest", "low", "new", "aaaa", "aaab")
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(8)(vocabWords(rnd.nextInt(vocabWords.size))).mkString(" ")))
      .toDF("doc_id", "text")
    // PROPERTY: a batch of one IS sequential BPE — same pairs, same
    // counts, rank always 1, round == sequential round
    val seqM = TextAnalysis.bpeTrain(docs, nMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val b1 = TextAnalysis.bpeTrainBatched(docs, rounds = 6, batchK = 1)
      .collect().map { r =>
        assert(r.getInt(1) === 1, "batchK=1 rank must be 1")
        (r.getInt(0), r.getString(2), r.getString(3), r.getLong(5))
      }
    assert(b1.toSeq === seqM.toSeq)
    OperatorCaches.releaseAll()
    // Disjoint fixture: four symbol-disjoint dominant pairs — one batched
    // round accepts all four, in (count DESC, a, b) rank order, with the
    // same counts sequential training reports for its first four merges
    val dj = (1L to 50L).map(i => (i, "abab cdcd efef ghgh")).toDF("doc_id", "text")
    val batched = TextAnalysis.bpeTrainBatched(dj, rounds = 1, batchK = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(5)))
    assert(batched.length === 4, batched.mkString(","))
    assert(batched.forall(_._1 === 1))
    assert(batched.map(_._2).toSeq === Seq(1, 2, 3, 4))
    val seq4 = TextAnalysis.bpeTrain(dj, nMerges = 4)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSet
    assert(batched.map(t => (t._3, t._4, t._5)).toSet === seq4)
    // Conflict fixture: word "xy" x30 and "yz" x20 → round-1 candidates
    // ranked (x,y):30 then (y,</w>):30 (tie broken by sym_a) — they share
    // y, so the one-shot rule accepts only the top candidate
    val cf = ((1L to 30L).map(i => (i, "xy")) ++ (1L to 20L).map(i => (100 + i, "yz")))
      .toDF("doc_id", "text")
    val accepted = TextAnalysis.bpeTrainBatched(cf, rounds = 1, batchK = 2)
      .collect().map(r => (r.getString(2), r.getString(3)))
    assert(accepted.toSeq === Seq(("x", "y")), accepted.mkString(","))
    OperatorCaches.releaseAll()
  }

  test("gopherFilter trips each rule on its designed offender") {
    import spark.implicits._
    val prose = ("the quick brown fox jumps with energy and that " * 8).trim
    val docs = Seq(
      (1L, prose),                                   // passes everything
      (2L, "too short to keep the and"),             // < 50 words
      (3L, ("## # ## " * 20).trim + " " + prose),    // symbol-heavy
      (4L, (("123 456 " * 30).trim + " the and")),   // non-alpha words
      (5L, ("zz " * 60).trim)                        // no stopword hits, short words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(docs)
      .select("doc_id", "ok_n_words", "ok_symbols", "ok_alpha", "ok_stops", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(out(1L) === ((true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._5)
    assert(!out(3L)._2 && !out(3L)._5)
    assert(!out(4L)._3 && !out(4L)._5)
    assert(!out(5L)._4 && !out(5L)._5)
  }

  test("tfidfCosinePairs finds near-dups, respects the df cap, matches brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def words(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(3000)}").mkString(" ")
    val shared = words(30)
    val hub = "common boiler plate" // one trigram carried by every doc
    val docs = ((1L to 2L).map(i => (i, s"${words(10)} $shared $hub")) ++
      (3L to 12L).map(i => (i, s"${words(40)} $hub"))).toDF("doc_id", "text")
    val terms = Dedup.shinglesAll(col("text"), 3)
    val pairs = TextAnalysis.tfidfCosinePairs(docs, terms, threshold = 0.2, maxDf = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)), s"planted pair missing: ${pairs.keySet}")
    // the hub trigram (df = 12 > maxDf = 5) is capped away: no hub-only pair
    assert(!pairs.keySet.exists { case (a, b) => a >= 3L && b >= 3L },
      s"hub-driven pairs leaked: ${pairs.keySet}")
    // brute-force the planted pair's cosine over the capped vocabulary
    def grams(s: String) =
      s.split(" ").sliding(3).map(_.mkString(" ")).toSeq
    val all = docs.collect().map(r => r.getLong(0) -> grams(r.getString(1))).toMap
    val dfq = all.values.flatMap(_.distinct).groupBy(identity).map { case (g, o) => g -> o.size }
    val n = all.size.toDouble
    def vec(id: Long) = all(id).groupBy(identity).collect {
      case (g, o) if dfq(g) <= 5 && math.log((n + 1) / (dfq(g) + 1)) > 0 =>
        g -> o.size * math.log((n + 1) / (dfq(g) + 1))
    }.toMap
    val (v1, v2) = (vec(1L), vec(2L))
    def nrm(v: Map[String, Double]) = math.sqrt(v.values.map(x => x * x).sum)
    val dot = v1.keySet.intersect(v2.keySet).toSeq.map(g => v1(g) * v2(g)).sum
    val want = BigDecimal(dot / (nrm(v1) * nrm(v2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(pairs((1L, 2L)) - want) < 2e-6,
      s"cosine ${pairs((1L, 2L))} != brute $want")
    OperatorCaches.releaseAll()
  }

  test("vocabCoverage: top-K cut is deterministic, OOV counted per lang") {
    import spark.implicits._
    // 'aa' speaks only in-vocab tokens; 'bb' mixes in uniques
    val rows = (0L until 20L).map(i => (i, "alpha beta gamma alpha", "aa")) ++
      (20L until 30L).map(i => (i, s"alpha beta rare$i", "bb"))
    val df = rows.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.vocabCoverage(df, topK = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // vocab = {alpha, beta, gamma} (counts 50/30/20 beat each rare-1)
    assert(out("aa") === ((80L, 0L, 0.0)))
    val (nb, oovB, rateB) = out("bb")
    assert(nb === 30L && oovB === 10L)
    assert(rateB === BigDecimal(10.0 / 30)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // shrinking K pushes gamma out: 'aa' now has OOV mass too
    val tight = TextAnalysis.vocabCoverage(df, topK = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tight("aa") === 20L, s"gamma should fall out at K=2: $tight")
    OperatorCaches.releaseAll()
  }

  test("perplexityBuckets: per-lang tercile cut, head<=middle<=tail, cuts replayed") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val common = Seq("data", "table", "query", "scan", "join")
    def doc(i: Long, rare: Int) = {
      val toks = Seq.fill(12)(common(rnd.nextInt(common.size))) ++
        Seq.fill(rare)(s"rare${i}_${rnd.nextInt(1000)}")
      (i, toks.mkString(" "), if (i % 2 == 0) "aa" else "bb")
    }
    // rare-token density drives surprisal: i%3 docs get 0/4/12 rare tokens
    val docs = (0L until 90L).map(i => doc(i, ((i % 3) * 4).toInt))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))
    assert(out.length === 90)
    out.groupBy(_._2).foreach { case (lang, rows) =>
      // cut points are per-lang constants and the bucket rule is replayed
      assert(rows.map(r => (r._4, r._5)).distinct.size === 1, s"$lang cuts")
      val (p33, p66) = (rows.head._4, rows.head._5)
      rows.foreach { case (id, _, s, _, _, b) =>
        val want = if (s <= p33) "head" else if (s <= p66) "middle" else "tail"
        assert(b === want, s"doc $id bucket")
      }
      // ordering: every head surprisal <= every middle <= every tail
      def maxOf(b: String) = rows.filter(_._6 == b).map(_._3).maxOption
      def minOf(b: String) = rows.filter(_._6 == b).map(_._3).minOption
      for (h <- maxOf("head"); m <- minOf("middle")) assert(h <= m)
      for (m <- maxOf("middle"); t <- minOf("tail")) assert(m <= t)
      // terciles: no bucket hoards the language (45 docs per lang)
      val sizes = rows.groupBy(_._6).view.mapValues(_.size)
      assert(sizes.values.forall(n => n >= 9 && n <= 21), s"$lang $sizes")
    }
    OperatorCaches.releaseAll()
  }

  test("nbClassify matches a driver-side reference model exactly") {
    import spark.implicits._
    // two sharply separable classes + one OOV-heavy test doc
    val train = Seq(
      (1L, "spark shuffle partition executor", "tech"),
      (2L, "executor codegen shuffle spark spark", "tech"),
      (3L, "sonnet meter rhyme stanza", "poetry"),
      (4L, "rhyme stanza verse meter meter", "poetry")
    ).toDF("doc_id", "text", "lang")
    val test0 = Seq(
      (10L, "spark executor shuffle", "tech"),
      (11L, "stanza rhyme verse", "poetry"),
      (12L, "zzz qqq unseen tokens", "tech") // all OOV -> prior decides
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.nbClassify(train, test0)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getInt(4))).toMap

    // driver-side reference: same counts, same smoothing, same rounding
    val trainRows = Seq(
      ("tech", "spark shuffle partition executor"),
      ("tech", "executor codegen shuffle spark spark"),
      ("poetry", "sonnet meter rhyme stanza"),
      ("poetry", "rhyme stanza verse meter meter"))
    val toks = trainRows.map { case (y, t) => y -> t.split("\\s+").toSeq }
    val cwc = toks.flatMap { case (y, ws) => ws.map(y -> _) }
      .groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val ct = toks.groupBy(_._1).map { case (y, o) => y -> o.flatMap(_._2).size.toLong }
    val vocab = toks.flatMap(_._2).distinct.size.toLong
    val pri = toks.groupBy(_._1).map { case (y, o) => y -> o.size.toLong }
    val n = pri.values.sum.toDouble
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def score(text: String, y: String): Double = {
      val s = log2(pri(y) / n) + text.split("\\s+").map { w =>
        log2((cwc.getOrElse((y, w), 0L) + 1).toDouble / (ct(y) + vocab + 1))
      }.sum
      BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq(10L -> "spark executor shuffle", 11L -> "stanza rhyme verse",
      12L -> "zzz qqq unseen tokens").foreach { case (id, text) =>
      val byClass = Seq("poetry", "tech").map(y => y -> score(text, y))
      val best = byClass.map(_._2).max
      val wantPred = byClass.filter(_._2 == best).map(_._1).min
      val (gotPred, gotScore, _) = got(id)
      assert(gotPred === wantPred, s"doc $id pred")
      assert(gotScore === best, s"doc $id score")
    }
    assert(got(10L)._1 === "tech" && got(11L)._1 === "poetry")
    // OOV-only doc: every class scores it identically except the prior;
    // equal priors here -> 4dp tie -> smallest label wins on both engines
    assert(got(12L)._1 === "poetry")
    assert(got(10L)._3 === 1 && got(12L)._3 === 0) // correct flags
    OperatorCaches.releaseAll()
  }

  test("bm25TopK matches a driver-side reference and ranks rare-term docs first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash join table"),   // tf(hash)=2 in a short doc
      (2L, "table scan scan scan scan scan scan scan"),
      (3L, "needle hash table"),           // rare term + hash
      (4L, "needle needle scan"),          // rare term twice, short
      (5L, "scan table row group window sort agg value key part")
    ).toDF("doc_id", "text")
    val terms = Seq("needle", "hash")
    val got = TextAnalysis.bm25TopK(docs, terms, topK = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))

    // driver-side reference with the same constants and 6dp grid
    val toks = Seq(1L -> 5, 2L -> 8, 3L -> 3, 4L -> 3, 5L -> 10)
    val n = 5.0
    val avgdl = toks.map(_._2).sum.toDouble / n
    val tf = Map((1L, "hash") -> 2.0, (3L, "hash") -> 1.0,
      (3L, "needle") -> 1.0, (4L, "needle") -> 2.0)
    val df = Map("hash" -> 2.0, "needle" -> 2.0)
    def idf(t: String) = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
    def score(id: Long): Double = {
      val dl = toks.toMap.apply(id)
      val s = terms.flatMap { t =>
        tf.get((id, t)).map { f =>
          idf(t) * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = Seq(1L, 3L, 4L).map(id => id -> score(id))
      .sortBy { case (id, sc) => (-sc, id) }
    assert(got.toSeq === want, s"got ${got.toSeq} want $want")
    // both-terms doc wins; the short rare-term doc outranks the long
    // common-term doc (the length normalization doing its job)
    assert(got.map(_._1).toSeq === Seq(3L, 4L, 1L))
    // docs with no query terms never appear
    assert(!got.exists(p => p._1 == 2L || p._1 == 5L))
  }

  test("jsDivergence: identical slices give 0, disjoint vocabularies give 1") {
    import spark.implicits._
    val same = Seq(("a b c", 0L), ("a b c", 1L)).toDF("text", "g")
    val r0 = TextAnalysis.jsDivergence(same, col("text"), col("g")).head()
    assert(r0.getDouble(5) === 0.0)
    assert(r0.getLong(4) === 3L) // shared vocab
    val disjoint = Seq(("a b", 0L), ("x y", 1L)).toDF("text", "g")
    val r1 = TextAnalysis.jsDivergence(disjoint, col("text"), col("g")).head()
    assert(r1.getDouble(5) === 1.0)
    assert(r1.getLong(4) === 0L)
  }

  test("jsDivergence: an empty slice yields explicit NULL js_bits") {
    import spark.implicits._
    // every doc is in slice 0 -> n_b = 0 -> JS against a nonexistent
    // distribution is undefined, not zero and not an engine-specific NaN
    val oneSided = Seq(("a b c", 0L), ("a d", 0L)).toDF("text", "g")
    val r = TextAnalysis.jsDivergence(oneSided, col("text"), col("g")).head()
    assert(r.getLong(0) === 5L && r.getLong(1) === 0L)
    assert(r.isNullAt(5), "js_bits must be NULL when one slice is empty")
  }

  test("jsDivergence matches a driver-side replay on a mixed fixture") {
    import spark.implicits._
    val df = Seq(
      ("the cat sat on the mat", 0L), ("the dog ran", 0L),
      ("le chat et le chien", 1L), ("the chat ran fast", 1L))
      .toDF("text", "g")
    val got = TextAnalysis.jsDivergence(df, col("text"), col("g")).head()
    val tokA = "the cat sat on the mat the dog ran".split("\\s+").toSeq
    val tokB = "le chat et le chien the chat ran fast".split("\\s+").toSeq
    val vocab = (tokA ++ tokB).distinct
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val js = 0.5 * vocab.map { w =>
      val p = tokA.count(_ == w).toDouble / tokA.size
      val q = tokB.count(_ == w).toDouble / tokB.size
      (if (p > 0) p * log2(2 * p / (p + q)) else 0.0) +
        (if (q > 0) q * log2(2 * q / (p + q)) else 0.0)
    }.sum
    val exp = BigDecimal(js).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(got.getLong(0) === tokA.size.toLong)
    assert(got.getLong(1) === tokB.size.toLong)
    assert(math.abs(got.getDouble(5) - exp) <= 1e-4 + 1e-12)
    assert(got.getDouble(5) > 0.0 && got.getDouble(5) < 1.0)
  }
}
