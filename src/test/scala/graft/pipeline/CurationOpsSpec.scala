package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-7 curation operators: per-domain caps, temperature mixing,
  * Bloom decontamination, SemDeDup semantic dedup.
  */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (0 until 300).map { i =>
    val dom = if (i % 10 < 7) "big" else if (i % 10 < 9) "mid" else "small"
    (i.toLong, dom, (i * 37 % 100 + 20).toLong,
      s"the quick brown fox number $i jumps over the lazy dog ${i * 7} end of line")
  }.toDF("doc_id", "domain", "score", "text")

  test("domainCap keeps the n best rows per domain by (score desc, key)") {
    val out = Sampling.domainCap(docs, "domain", "doc_id", "score", 5)
      .select("domain", "doc_id", "score").collect()
    val byDom = out.groupBy(_.getString(0))
    assert(byDom.keySet === Set("big", "mid", "small"))
    byDom.foreach { case (dom, rows) =>
      assert(rows.length === 5, s"$dom kept ${rows.length}")
      val kept = rows.map(_.getLong(2)).toSet
      val all = docs.filter(col("domain") === dom)
        .select("score", "doc_id").as[(Long, Long)].collect()
        .sortBy { case (sc, id) => (-sc, id) }
      // the kept multiset is exactly the top-5 of the (desc score, id) order
      assert(rows.map(r => (r.getLong(2), r.getLong(1))).sortBy(t => (-t._1, t._2))
        === all.take(5).toSeq, s"$dom kept wrong rows: ${kept.toSeq.sorted}")
    }
  }

  test("temperature rates/sample: small-domain rate exceeds big-domain rate; draw is deterministic") {
    val rates = Sampling.temperatureRates(docs, "domain", alpha = 0.5, targetFraction = 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rates("small")._2 > rates("big")._2,
      s"alpha<1 must upweight small domains: $rates")
    // expected kept = sum(rate * n) ~= targetFraction * N (within rounding + clipping)
    val expected = rates.values.map { case (n, r) => r * n }.sum
    assert(math.abs(expected - 150.0) < 1.0, s"expected kept $expected, want ~150")
    val s1 = Sampling.temperatureSample(docs, "domain", "doc_id", 0.5, 0.5, "t")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.temperatureSample(docs, "domain", "doc_id", 0.5, 0.5, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)
    val s3 = Sampling.temperatureSample(docs, "domain", "doc_id", 0.5, 0.5, "other")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 !== s3, "independent salts should draw different samples")
  }

  test("bloom flags are a superset of the exact join flags (no false negatives)") {
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val exact = TextAnalysis.contaminationFlags(docs, bench, k = 8)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    val bloom = TextAnalysis.bloomContaminationFlags(docs, bench, k = 8,
      numHashes = 3, bits = 1 << 16)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(bloom),
      s"false negatives: ${exact.diff(bloom)}")
    // every benchmark doc contains its own grams -> must be flagged
    assert(docs.filter(col("doc_id") % 20 === 0).select("doc_id").as[Long]
      .collect().toSet.subsetOf(bloom))
    // tiny bitmap -> everything collides -> still no false negatives, all flagged
    val tiny = TextAnalysis.bloomContaminationFlags(docs, bench, k = 8,
      numHashes = 2, bits = 64)
      .filter(col("contaminated")).count()
    assert(tiny === 300L)
  }

  test("bloom hit counts never undercount the exact hit counts") {
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val exact = TextAnalysis.contaminationFlags(docs, bench, k = 8)
      .select("doc_id", "n_hit_grams").as[(Long, Long)].collect().toMap
    val bloom = TextAnalysis.bloomContaminationFlags(docs, bench, k = 8)
      .select("doc_id", "n_hit_grams").as[(Long, Long)].collect().toMap
    exact.foreach { case (id, n) =>
      assert(bloom(id) >= n, s"doc $id: bloom ${bloom(id)} < exact $n")
    }
  }

  // seeded-Gaussian vectors: pairwise cosines concentrate near 0 (sd ~ 1/4
  // at 16 dims), so no organic pair clears a 0.95 threshold — unlike
  // sin-grid fixtures, whose angular periodicity creates real near-dups
  private def gauss(id: Int, dims: Int): Array[Double] = {
    val rng = new scala.util.Random(id)
    Array.fill(dims)(rng.nextGaussian())
  }

  test("semanticDedup drops in-cell near-duplicates, keeps the lower id") {
    val base = (1 to 120).map(i => (i.toLong, gauss(i, 16))).toDF("vec_id", "embedding")
    val dup = base.filter(col("vec_id") % 10 === 4)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"), x => x * 1.001).as("embedding"))
    val emb = base.union(dup)
    val cent = base.filter(col("vec_id") % 40 === 1)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val kept = Dedup.semanticDedup(emb, cent, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    // every original survives; every scaled copy is in its original's cell
    // (same argmin direction) and must be dropped
    assert((1 to 120).forall(i => kept.contains(i.toLong)))
    assert(!kept.exists(_ > 1000L), s"copies survived: ${kept.filter(_ > 1000L)}")
  }

  test("semanticDedup cell cap excludes hot cells from pruning (kept whole)") {
    val base = (1 to 60).map(i => (i.toLong, gauss(i, 16))).toDF("vec_id", "embedding")
    val dup = base.select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val emb = base.union(dup)
    val cent = base.filter(col("vec_id") === 1)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    // one cell of 120 vectors; cap below that -> nothing pruned
    val kept = Dedup.semanticDedup(emb, cent, threshold = 0.95,
      maxCellSize = Some(10)).count()
    assert(kept === 120L)
    // uncapped -> the 60 exact copies drop
    val keptUncapped = Dedup.semanticDedup(emb, cent, threshold = 0.95,
      maxCellSize = None).count()
    assert(keptUncapped === 60L)
  }

  test("duplicateSpans finds a planted repeated sentence at exact offsets") {
    val boiler = "one two three four five six seven eight"  // exactly k=8 tokens
    val corpus = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"unique prefix here $boiler and a unique suffix tail"),
      (3L, s"$boiler totally different continuation follows afterwards here")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc 2: boiler starts at token 3; doc 3: at token 0; doc 1: clean
    assert(spans === Array((2L, 3, 8), (3L, 0, 8)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // 10 shared tokens -> three overlapping 8-windows -> ONE span of 10
    val shared = "a b c d e f g h i j"
    val corpus = Seq(
      (1L, s"$shared left tail distinct one"),
      (2L, s"right head distinct two $shared")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans === Array((1L, 0, 10), (2L, 4, 10)))
  }

  test("duplicateSpans counts within-document repetition too") {
    val eight = "p q r s t u v w"
    val corpus = Seq((1L, s"$eight filler middle words go here $eight")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, k = 8).collect()
    assert(spans.length === 2, "the same window repeated inside one doc is a duplicate")
  }

  test("duplicateSpanSignals rolls spans up per document") {
    val boiler = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"$boiler mid filler words $boiler"),
      (2L, s"prefix $boiler suffix"),
      (3L, "entirely novel content with no repeats at all whatsoever today")
    ).toDF("doc_id", "text")
    val sig = Dedup.duplicateSpanSignals(corpus, k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sig === Array((1L, 2L, 16L), (2L, 1L, 8L)))
  }

  test("lmScore: in-distribution text outscores gibberish; n_bigrams = tokens - 1") {
    val corpus = (0 until 40).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
      .unionAll(Seq((100L, "zxqv wkjh qpzm vbnx lkjs dfgh")).toDF("doc_id", "text"))
    val out = TextAnalysis.lmScore(corpus, trainFraction = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(0L)._1 === 8L, "9 tokens -> 8 bigrams")
    assert(out(100L)._1 === 5L)
    assert(out(0L)._2 > out(100L)._2,
      s"common text must outscore gibberish: ${out(0L)._2} vs ${out(100L)._2}")
    // every copy of the same text scores identically (fixed-point exactness)
    assert(out(1L) === out(0L))
  }

  test("knScoreAgainst: hand-computed interpolated KN, backoff and OOV paths") {
    // train bigrams: (a b) x2, (a c) x1, (b a) x1 -> from "a b a c" + "a b"
    val train = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    // doc bigrams exercise: seen (a b), unseen-pair-seen-prefix (a a),
    // unseen-prefix-seen-continuation (c a), OOV continuation (a z)
    val docs = Seq((10L, "a b"), (11L, "a a"), (12L, "c a"), (13L, "a z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.knScoreAgainst(docs, train)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // counts: c1(a)=3, n1fw(a)=2; c1(b)=1, n1fw(b)=1; B=3 distinct bigrams
    // pcont: a <- {b}: 1/3; b <- {a}: 1/3; c <- {a}: 1/3
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def lp(p: Double) = r6(math.floor(math.log(p) * 1e4 + 0.5) / 1e4)
    // (a b): (max(2-.75,0) + .75*2*(1/3)) / 3
    val pAB = (1.25 + 0.75 * 2 * (1.0 / 3)) / 3
    assert(out(10L)._3.get === lp(pAB))
    // (a a): c12=0 -> (0 + .75*2*(1/3)) / 3
    val pAA = (0.75 * 2 * (1.0 / 3)) / 3
    assert(out(11L)._3.get === lp(pAA))
    // (c a): prefix c unseen -> backoff to pcont(a) = 1/3
    assert(out(12L)._3.get === lp(1.0 / 3))
    // (a z): z never continues anything -> OOV, no average
    assert(out(13L) === ((1L, 1L, None)))
    assert(out(10L)._1 === 1L && out(10L)._2 === 0L)
  }

  test("textRankKeywords: the hub word of a star graph ranks first") {
    // "hub" co-occurs with every spoke; spokes only with hub (+ window-2
    // neighbors) -> hub gets the highest centrality
    val docs = (0 until 8).map(i =>
      (i.toLong, s"hub spoke$i")).toDF("doc_id", "text")
    val out = TextAnalysis.textRankKeywords(docs, window = 2, iters = 2, topK = 3)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.head === ((1, "hub")))
    assert(out.length === 3)
  }

  test("normalizedExact collapses case/punct/whitespace variants, keeps distinct texts") {
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO   world."),
      (4L, "a different document")).toDF("doc_id", "text")
    val out = Dedup.normalizedExact(docs)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 3L, 4L -> 1L),
      s"expected {1 -> 3 copies, 4 -> 1 copy}, got $out")
  }

  test("heavyHitterGrams ranks the planted boilerplate footer windows first") {
    val footer = "subscribe to our newsletter for more updates today"
    val corpus = (0 until 30).map(i =>
      (i.toLong, s"unique prose piece number $i about topic ${i * 3} . $footer"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.heavyHitterGrams(corpus, k = 5, topK = 6)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the 8-word footer yields 4 distinct 5-gram windows, each 30x;
    // ties at the same count break gram-ascending
    assert(out.take(4).forall(_._3 === 30L), s"top-4 must be the footer windows: ${out.toSeq}")
    assert(out.head._2 === "newsletter for more updates today")
    assert(out(4)._3 < 30L, "rank 5 must fall back to organic grams")
    assert(out.map(_._1).toSeq === (1L to 6L), "ranks are dense from 1")
  }

  test("bpeTrain learns the classic abab merges in order; counts are exact") {
    // 10x "abab", 5x "abcd": pair counts round 1: (a,b)=25, (b,a)=10,
    // (b,c)=5, (c,d)=5 -> merge ab. Round 2 symbols: ab|ab (10x), ab|c|d
    // (5x): (ab,ab)=10, (ab,c)=5, (c,d)=5 -> merge abab. Round 3: (ab,c)=5
    // beats (c,d)=5 on pair-ascending tiebreak.
    val corpus = ((0 until 10).map(i => (i.toLong, "abab")) ++
      (10 until 15).map(i => (i.toLong, "abcd"))).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(corpus, numMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m === Array((1L, "a", "b", 25L), (2L, "ab", "ab", 10L),
      (3L, "ab", "c", 5L)))
    // segmentation with those merges: "abab" -> 1 piece, "abcd" -> abc|d = 2
    val seg = TextAnalysis.bpeSegment(corpus,
      m.map(t => (t._2, t._3)).toSeq)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(seg(0L) === ((1L, 1L)))
    assert(seg(14L) === ((1L, 2L)))
  }

  test("bpeSegment kernel: greedy non-overlap, multi-word sums, empty/blank docs") {
    // (a,a) on "aaa" must fuse LEFT-TO-RIGHT non-overLAPPING: aa|a = 2
    // pieces (the classic BPE scan), never 1 (re-matching the fused "aa"
    // as `a`); multi-char rules apply after earlier ranks rewrite
    val corpus = Seq(
      (1L, "aaa"),
      (2L, "aaaa aa b"),     // aa|aa + aa + b = 2+1+1 pieces, 3 words
      (3L, ""),              // empty doc: 0 words, 0 pieces
      (4L, " .,;! "),        // tokenizer yields nothing: 0/0
      (5L, "xay")            // no rule applies: 3 char pieces
    ).toDF("doc_id", "text")
    val seg = TextAnalysis.bpeSegment(corpus, Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(seg(1L) === ((1L, 2L)))
    assert(seg(2L) === ((3L, 4L)))
    assert(seg(3L) === ((0L, 0L)))
    assert(seg(4L) === ((0L, 0L)))
    assert(seg(5L) === ((1L, 3L)))
    // chained ranks: (a,b) then (ab,ab): "ababab" -> ab|ab|ab -> abab|ab = 2
    val seg2 = TextAnalysis.bpeSegment(Seq((1L, "ababab")).toDF("doc_id", "text"),
      Seq(("a", "b"), ("ab", "ab")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(seg2(1L) === ((1L, 2L)))
    // merge symbols with spaces/newlines are refused loudly (spec encoding)
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeSegment(corpus, Seq(("a b", "c")))
    }
  }

  test("removeDuplicateSpans keeps the globally-first occurrence, strips the rest") {
    val shared = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"$shared alpha beta gamma"),
      (2L, s"prefix word list here $shared"),
      (3L, "no repeats in this document at all today friends")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(corpus, k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((1L, s"$shared alpha beta gamma", 0L)),
      "doc 1 is canonical — untouched")
    assert(out(1) === ((2L, "prefix word list here", 8L)),
      "doc 2 loses the repeated sentence")
    assert(out(2) === ((3L, "no repeats in this document at all today friends", 0L)))
  }

  test("removeDuplicateSpans: a fully-duplicated doc empties; within-doc repeats keep first") {
    val eight = "a b c d e f g h"
    val corpus = Seq(
      (1L, eight),
      (2L, eight),
      (3L, s"$eight $eight")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(corpus, k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((1L, eight, 0L)), "canonical copy survives")
    assert(out(1) === ((2L, "", 8L)), "exact later copy empties")
    // doc 3: every window (incl. those spanning the seam) is duplicated or
    // repeated; nothing in doc 3 is the global first, so it empties too
    assert(out(2) === ((3L, "", 16L)))
  }

  test("thetaDistinct: estimate lands near the exact distinct count, trace is deterministic") {
    val keys = (0 until 20000).map(i => (i % 4, s"key_$i")).toDF("g", "k")
    val est = Sketches.thetaDistinct(keys, Seq("g"), "k", thetaInverse = 16)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // each group holds 5000 distinct keys; theta^-1=16 -> stderr ~5.7%
    est.foreach { case (g, e) =>
      assert(math.abs(e - 5000L) < 1000, s"group $g estimate $e too far from 5000")
    }
    val est2 = Sketches.thetaDistinct(keys, Seq("g"), "k", thetaInverse = 16)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(est === est2)
    // sketches merge: the union's estimate equals the sketch of the union
    val half1 = keys.filter(col("k") < "key_5")
    val half2 = keys.filter(col("k") >= "key_5")
    val merged = Sketches.thetaDistinct(half1.unionAll(half2), Seq("g"), "k", 16)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(merged === est)
  }

  test("lengthBucketedBatches: batches stay in-bucket, full except the last, ordered") {
    val rows = (0 until 100).map(i => (i.toLong, (i * 7 % 45 + 10).toLong))
      .toDF("k", "len")
    val got = Sampling.lengthBucketedBatches(rows, "k", "len",
        bucketWidth = 20L, batchSize = 4)
      .select("k", "len", "bucket", "batch_in_bucket", "batch_rank")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(got.length === 100)
    got.foreach { case (_, len, bucket, _, rank) =>
      assert(bucket === len / 20)
      assert(rank >= 0 && rank < 4)
    }
    // every batch is full (4 rows) except possibly the last per bucket,
    // and lengths within a batch span at most the bucket width
    got.groupBy(r => (r._3, r._4)).foreach { case ((bucket, bi), rs) =>
      val maxBi = got.filter(_._3 == bucket).map(_._4).max
      if (bi < maxBi) assert(rs.length === 4, s"bucket $bucket batch $bi")
      val lens = rs.map(_._2)
      assert(lens.max - lens.min <= 20)
    }
    intercept[IllegalArgumentException] {
      Sampling.lengthBucketedBatches(rows, "k", "len", 0L, 4)
    }
  }

  test("percentileRank: uniform data ranks linearly; groups calibrate independently") {
    // uniform 0..999 with a fine grid: every bin holds one value, so
    // pct(v) is exactly (v+1)/1000
    val vals = spark.range(1000).select(col("id").cast("double").as("v"))
    val got = Sketches.percentileRank(vals, "v", bins = 1000)
      .select(col("v"), col("pct")).as[(Double, Double)].collect().toMap
    Seq(0.0, 249.0, 499.0, 999.0).foreach { v =>
      assert(math.abs(got(v) - (v + 1) / 1000.0) < 1e-9, s"v=$v got ${got(v)}")
    }
    // per-group calibration: shifting one group must not move the other's
    val twoG = spark.range(1000).select(
      when(col("id") < 500, lit("a")).otherwise(lit("b")).as("g"),
      when(col("id") < 500, col("id")).otherwise(col("id") * 1000)
        .cast("double").as("v"))
    val grouped = Sketches.percentileRank(twoG, "v", bins = 500, groupCols = Seq("g"))
      .filter(col("g") === "a").select(col("v"), col("pct"))
      .as[(Double, Double)].collect().toMap
    assert(math.abs(grouped(249.0) - 0.5) < 1e-9)
    // degenerate group: one distinct value -> everyone at pct 1
    val const = Seq(1.0, 1.0, 1.0).toDF("v")
    assert(Sketches.percentileRank(const, "v")
      .select("pct").as[Double].collect().forall(_ == 1.0))
  }

  test("hardNegatives: positives drop, survivors re-rank, pool shortage shrinks output") {
    val ranked = Seq(
      (1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2), (1L, 12L, 0.7, 3), (1L, 13L, 0.6, 4),
      (2L, 20L, 0.9, 1), (2L, 21L, 0.8, 2))
      .toDF("query_id", "vec_id", "cosine", "rank")
    val pos = Seq((1L, 10L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "vec_id")
    val got = Similarity.hardNegatives(ranked, pos, k = 2)
      .select("query_id", "vec_id", "neg_rank")
      .as[(Long, Long, Int)].collect().toSet
    // query 1: 11 and 13 survive, re-ranked 1, 2; query 2: pool exhausted
    assert(got === Set((1L, 11L, 1), (1L, 13L, 2)))
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(ranked, pos, k = 0)
    }
  }

  test("rendezvousAssign: removing a shard moves ONLY its keys; balance is sane") {
    val keys = (0 until 2000).map(i => Tuple1(i.toLong)).toDF("k")
    val four = Sampling.rendezvousAssign(keys, "k", Seq("s0", "s1", "s2", "s3"))
      .as[(Long, String)].collect().toMap
    val three = Sampling.rendezvousAssign(keys, "k", Seq("s0", "s1", "s3"))
      .as[(Long, String)].collect().toMap
    // the HRW stability law: keys not on the dropped shard keep their home
    four.foreach { case (k, sh) =>
      if (sh != "s2") assert(three(k) === sh, s"key $k moved $sh -> ${three(k)}")
      else assert(three(k) !== "s2")
    }
    // rough balance: each of 4 shards holds 500 +- 40%
    val sizes = four.values.groupBy(identity).map(_._2.size)
    assert(sizes.size === 4 && sizes.forall(s => s > 300 && s < 700), sizes)
    // single shard takes everything; duplicate shard names refuse
    assert(Sampling.rendezvousAssign(keys, "k", Seq("only"))
      .filter(col("shard") === "only").count() === 2000L)
    intercept[IllegalArgumentException] {
      Sampling.rendezvousAssign(keys, "k", Seq("a", "a"))
    }
  }

  test("editDistancePairs: blocking matches brute force at d=1 and d=2") {
    val terms = Seq("color", "colour", "colr", "dolor", "moon", "mon", "mono",
      "sparks", "spark", "shark", "entirely", "different").toDF("term")
    def brute(d: Int) = terms.as("l").crossJoin(terms.as("r"))
      .select(col("l.term").as("a"), col("r.term").as("b"))
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= d)
    for (d <- Seq(1, 2)) {
      val got = Dedup.editDistancePairs(terms, "term", maxDist = d)
      assert(got.exceptAll(brute(d)).isEmpty && brute(d).exceptAll(got).isEmpty,
        s"d=$d mismatch")
    }
    // the d=1 pair set is the expected hand list
    val d1 = Dedup.editDistancePairs(terms, "term", maxDist = 1)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(d1 === Set(("color", "colour"), ("color", "colr"), ("color", "dolor"),
      ("mon", "moon"), ("mon", "mono"), ("spark", "sparks"), ("shark", "spark")))
    // duplicate input terms collapse; the plan stays product-free
    val dup = Dedup.editDistancePairs(terms.unionAll(terms), "term")
    assert(dup.count() === 7L)
    val plan = dup.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(terms, "term", maxDist = 3)
    }
    // the candidate-sized explicit exchange (taken when Σ bucket pairs
    // exceeds the per-partition budget) returns the identical pair set
    val prev = spark.conf.getOption("graft.er.candidatesPerPartition")
    spark.conf.set("graft.er.candidatesPerPartition", "1")
    try {
      val wide = Dedup.editDistancePairs(terms, "term", maxDist = 1)
      assert(wide.select("a", "b").as[(String, String)].collect().toSet === d1)
      assert(wide.queryExecution.executedPlan.toString
        .contains("REPARTITION_BY_NUM"), "expected the explicit exchange")
    } finally prev match {
      case Some(v) => spark.conf.set("graft.er.candidatesPerPartition", v)
      case None => spark.conf.unset("graft.er.candidatesPerPartition")
    }
  }

  test("canonicalUrl collapses the standard crawl-duplicate variants") {
    val cases = Seq(
      ("https://WWW.Example.com:443/a/?utm_source=x&q=1#f",
        "https://example.com/a/?q=1"),
      ("http://example.com:8080/x", "http://example.com:8080/x"), // non-default port stays
      ("https://example.com/", "https://example.com"),
      ("http://Example.COM:80", "http://example.com"),
      ("https://e.com/p?utm_a=1&utm_b=2", "https://e.com/p"),
      ("https://e.com/p?a=1&utm_x=2&b=3&gclid=z", "https://e.com/p?a=1&b=3"),
      ("not a url", "not a url")) // non-URL passes through
    val got = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("unimaxRates: waterfill saturates small groups, splits the rest evenly") {
    // groups of 10 / 20 / 300 rows, budget 100, maxEpochs 1:
    // caps sorted 10, 20, 300 -> 10 and 20 saturate (10*3=30<=100,
    // 20*2+10=50<=100; 300+30>100), level = (100-30)/1 = 70
    val rows = ((0 until 10).map(i => ("a", i.toLong)) ++
      (0 until 20).map(i => ("b", i.toLong + 100)) ++
      (0 until 300).map(i => ("c", i.toLong + 1000))).toDF("g", "k")
    val rates = Sampling.unimaxRates(rows, "g", budget = 100)
      .select("g", "rate").as[(String, Double)].collect().toMap
    assert(rates === Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.233333))
    // kept: small groups whole; big group ~70 rows (hash-binomial)
    val kept = Sampling.unimaxSample(rows, "g", "k", budget = 100)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(kept("a") === 10L && kept("b") === 20L)
    assert(math.abs(kept("c") - 70L) < 30, s"group c kept ${kept("c")}")
  }

  test("unimaxRates: maxEpochs > 1 reports epoch plans; budget >= capacity keeps all") {
    val rows = ((0 until 10).map(i => ("a", i.toLong)) ++
      (0 until 20).map(i => ("b", i.toLong + 100)) ++
      (0 until 300).map(i => ("c", i.toLong + 1000))).toDF("g", "k")
    // caps double to 20/40/600; budget 100: 20*3=60<=100, 40*2+20=100<=100,
    // 600+60>100 -> level (100-60)/1 = 40 rows -> rates (alloc/n_rows)
    // 20/10 = 2 epochs, 40/20 = 2 epochs, 40/300 = 0.133333
    val rates = Sampling.unimaxRates(rows, "g", budget = 100, maxEpochs = 2.0)
      .select("g", "rate").as[(String, Double)].collect().toMap
    assert(rates === Map("a" -> 2.0, "b" -> 2.0, "c" -> 0.133333))
    // budget above total capacity: every group at its full epoch cap
    val full = Sampling.unimaxRates(rows, "g", budget = 10000)
      .select("g", "rate").as[(String, Double)].collect().toMap
    assert(full === Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    assert(Sampling.unimaxSample(rows, "g", "k", budget = 10000).count() === 330L)
    // zero budget keeps nothing
    assert(Sampling.unimaxSample(rows, "g", "k", budget = 0).count() === 0L)
  }

  test("hllDistinct: estimate within ~3 sigma of truth; registers merge by max") {
    val keys = (0 until 20000).map(i => (i % 4, s"key_$i")).toDF("g", "k")
    val est = Sketches.hllDistinct(keys, Seq("g"), "k", p = 9)
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    // 5000 distinct keys per group, p=9 -> stderr ~1.04/sqrt(512) = 4.6%
    est.foreach { case (g, e) =>
      assert(math.abs(e - 5000.0) < 700, s"group $g estimate $e too far from 5000")
    }
    // merging the halves' register frames == sketching the whole
    val half1 = keys.filter(col("k") < "key_5")
    val half2 = keys.filter(col("k") >= "key_5")
    val whole = Sketches.hllRegisters(keys, Seq("g"), "k", p = 9)
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllRegisters(half1, Seq("g"), "k", p = 9),
      Sketches.hllRegisters(half2, Seq("g"), "k", p = 9)), Seq("g"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("hllDistinct: harmonic bookkeeping is exact-integer and duplicate-insensitive") {
    val once = (0 until 500).map(i => (0, s"k$i")).toDF("g", "k")
    val thrice = (0 until 1500).map(i => (0, s"k${i % 500}")).toDF("g", "k")
    val a = Sketches.hllDistinct(once, Seq("g"), "k", p = 6).collect().head
    val b = Sketches.hllDistinct(thrice, Seq("g"), "k", p = 6).collect().head
    // a distinct sketch must not move under repetition
    assert(a === b)
    // hit + empty = m; harmonic_scaled >= m (every register term >= 1)
    assert(a.getLong(1) + a.getLong(2) === 64L)
    assert(a.getLong(3) >= 64L)
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(once, Seq("g"), "k", p = 1)
    }
  }

  test("thetaDistinct prunes with the hash filter BEFORE the distinct shuffle") {
    // spark.range keeps a real plan (a local Seq constant-folds away)
    val keys = spark.range(1000).select((col("id") % 4).cast("int").as("g"),
      concat(lit("key_"), col("id")).as("k"))
    val plan = Sketches.thetaDistinct(keys, Seq("g"), "k", 16)
      .queryExecution.executedPlan.toString
    // the Filter must sit below the first Exchange in the plan text
    // (executed plans print root-first, so below = later index)
    val fi = plan.indexOf("Filter")
    val ei = plan.indexOf("Exchange")
    assert(fi > 0 && ei > 0 && fi > ei,
      s"hash filter must be under the exchange (map-side prune):\n$plan")
  }

  test("histogramQuantiles: estimates within one bin width; fine grid is exact on uniform data") {
    // uniform 0..9999: true quantile(p) = p * 10000
    val vals = spark.range(10000).select(col("id").cast("double").as("v"))
    val probs = Seq(0.1, 0.5, 0.9)
    val est = Sketches.histogramQuantiles(vals, "v", probs, bins = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val binWidth = 9999.0 / 100
    probs.foreach { p =>
      assert(math.abs(est(p) - p * 10000) <= binWidth + 1e-6,
        s"p=$p est=${est(p)} off by more than a bin width")
    }
    // determinism
    val est2 = Sketches.histogramQuantiles(vals, "v", probs, bins = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(est === est2)
    // degenerate all-equal column: every quantile = the value
    val const = spark.range(50).select(lit(7.25).as("v"))
    val ec = Sketches.histogramQuantiles(const, "v", Seq(0.0, 0.5, 1.0))
      .collect().map(_.getDouble(1)).toSeq
    assert(ec === Seq(7.25, 7.25, 7.25))
  }

  test("histogramBins over the same grid merge by per-bin addition") {
    val vals = spark.range(1000).select((col("id") % 97).cast("double").as("v"))
    val whole = Sketches.histogramBins(vals, "v", 0.0, 96.0, 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h1 = Sketches.histogramBins(vals.filter(col("v") < 50), "v", 0.0, 96.0, 32)
    val h2 = Sketches.histogramBins(vals.filter(col("v") >= 50), "v", 0.0, 96.0, 32)
    val merged = h1.unionAll(h2).groupBy("bin").agg(sum("c").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === whole)
  }

  test("bpeTrain stops early when the vocabulary runs out of pairs") {
    val corpus = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(corpus, numMerges = 5).collect()
    // round 1 merges (a,b) count 3; afterwards every word is one symbol
    assert(m.length === 1)
    assert(m(0).getString(1) === "a" && m(0).getString(2) === "b")
  }

  test("stripHtml: blocks die with content, entities decode exactly once") {
    val f = Seq(
      (1L, "a <script type=\"x\">var s = '<b>kept?</b>';</script> b"),
      (2L, "x &amp;lt; y"), // must yield "x &lt; y", never double-decode
      (3L, "<p>hi</p>\n\n<div>there</div>"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stripHtml(f).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a b", "script content must vanish entirely")
    assert(out(2L) === "x &lt; y")
    assert(out(3L) === "hi there")
    assert(out(4L) === "")
  }

  test("exactKeepBest keeps the highest-scored duplicate, min id on ties") {
    val f = Seq(
      (1L, "same", 5L), (2L, "same", 9L), (3L, "same", 9L),
      (4L, "only", 1L)
    ).toDF("doc_id", "text", "score")
    val out = Dedup.exactKeepBest(f, "score").collect()
      .map(r => r.getAs[Long]("keep_id") ->
        (r.getAs[Long]("keep_score"), r.getAs[Long]("n_copies"))).toMap
    assert(out === Map(2L -> ((9L, 3L)), 4L -> ((1L, 1L))))
  }

  test("groupedHistogramQuantiles: per-group == global on that group; degenerate group") {
    val vals = (0 until 100).map(i => ("a", i.toDouble)) ++
      (0 until 50).map(i => ("b", (i * 3).toDouble)) ++
      Seq(("c", 7.0), ("c", 7.0))
    val df = vals.toDF("grp", "v")
    val probs = Seq(0.25, 0.5, 0.9)
    val grouped = Sketches.groupedHistogramQuantiles(df, "grp", "v", probs, bins = 32)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (g <- Seq("a", "b")) {
      val global = Sketches.histogramQuantiles(
        df.filter(col("grp") === g), "v", probs, bins = 32)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      probs.foreach(p =>
        assert(grouped((g, p)) === global(p), s"group $g prob $p"))
    }
    // constant-valued group: every prob estimates the constant
    probs.foreach(p => assert(grouped(("c", p)) === 7.0))
    // error bound: estimate within one bin width of the true quantile
    assert(math.abs(grouped(("a", 0.5)) - 49.5) <= 100.0 / 32 + 1)
  }

  test("tfidfSimilarPairs: near-copies score high, disjoint docs never pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val f = Seq(
      (1L, base),
      (2L, base + "iota"),                       // near-copy of 1
      (3L, "one two three four five six " * 5),  // shares nothing with 1/2
      (4L, "one two three four five six " * 5 + "seven")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfSimilarPairs(f, threshold = 0.5, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set((1L, 2L), (3L, 4L)), s"pairs: $got")
    assert(got.values.forall(c => c > 0.9 && c <= 1.0), s"cosines: $got")
  }

  test("splitLeakage surfaces planted cross-boundary near-copies and only those") {
    // 60 distinct docs + same-text copies of every 10th under shifted ids;
    // a copy that lands in a different split than its original must appear
    val docs = (0 until 60).map(i =>
      (i.toLong, s"unique document number $i talking about topic ${i * 31} " * 6))
    val copies = docs.filter(_._1 % 10 == 0).map { case (id, t) => (id + 1000, t) }
    val all = (docs ++ copies).toDF("doc_id", "text")
    val out = Dedup.splitLeakage(all).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every reported pair is an original/copy pair (ids differ by 1000)
    out.foreach { case (a, b) =>
      assert((a % 1000) == (b % 1000), s"unexpected pair ($a, $b)")
    }
    // at least one copy crossed the split boundary in this fixture
    assert(out.nonEmpty, "no cross-split pair found — fixture degenerate")
  }

  test("topTermsPerGroup: rank by count desc then token asc, within each group") {
    val f = Seq(
      (1L, "g1", "apple apple banana cherry"),
      (2L, "g1", "apple banana banana"),
      (3L, "g2", "dog dog dog cat")
    ).toDF("doc_id", "grp", "text")
    val out = TextAnalysis.topTermsPerGroup(f, "grp", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val g1 = out.filter(_._1 == "g1").sortBy(_._2)
    // apple 3, banana 3 -> tie broken token-ascending
    assert(g1.map(t => (t._3, t._4)).toSeq === Seq(("apple", 3L), ("banana", 3L)))
    val g2 = out.filter(_._1 == "g2").sortBy(_._2)
    assert(g2.map(t => (t._3, t._4)).toSeq === Seq(("dog", 3L), ("cat", 1L)))
  }

  test("perplexityPartition: terciles are ordered and roughly balanced") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.perplexityPartition(corpus)
      .select("avg_logprob", "ccnet_bucket").collect()
      .map(r => r.getDouble(0) -> r.getString(1))
    val byBucket = out.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // strict ordering: every head score > every middle score > every tail
    assert(byBucket("head").min > byBucket("middle").max)
    assert(byBucket("middle").min > byBucket("tail").max)
    // tercile balance within sketch-bin tolerance
    val n = out.length
    byBucket.values.foreach(v =>
      assert(v.length > n / 5 && v.length < n / 2,
        s"bucket sizes skewed: ${byBucket.view.mapValues(_.length).toMap}"))
  }

  test("gopherRules: each rule measures and flags its own failure mode") {
    // 72 words, mean word length exactly 3.0, five Gopher stopwords present
    val good = ("the cat sat with the dog and that was all of it " * 6).trim
    val bullets = Seq.fill(10)("- bullet point item").mkString("\n")
    val fixtures = Seq(
      (1L, good),                                     // passes everything
      (2L, "the of and that"),                        // too few words
      (3L, good + " ... ... #### ###"),               // symbol-heavy
      (4L, good + "\n" + bullets),                    // bullet lines 10/11
      (5L, good + "\nwait...\nmore...\nhmm..."),      // ellipsis lines 3/4
      (6L, good + " " + Seq.fill(80)("4217 7391 9042").mkString(" ")), // digit words
      (7L, "zz qq ww " * 30)                          // no Gopher stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(fixtures).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_pass"))
    assert(!out(2L).getAs[Boolean]("pass_word_count"))
    assert(out(4L).getAs[Double]("bullet_ratio") === 0.909091)
    assert(out(5L).getAs[Double]("ellipsis_ratio") === 0.75)
    assert(!out(7L).getAs[Boolean]("pass_stopwords"))
    assert(out(7L).getAs[Int]("n_stop_present") === 0)
    // the rule under test is the ONLY rule that fails on its fixture
    for ((id, failCol) <- Seq(3L -> "pass_symbol", 4L -> "pass_bullet",
        5L -> "pass_ellipsis", 6L -> "pass_alpha")) {
      val r = out(id)
      assert(!r.getAs[Boolean]("gopher_pass"))
      assert(!r.getAs[Boolean](failCol), s"doc $id should fail $failCol")
      for (c <- Seq("pass_word_count", "pass_mean_word_len", "pass_symbol",
          "pass_bullet", "pass_ellipsis", "pass_alpha", "pass_stopwords")
          if c != failCol)
        assert(r.getAs[Boolean](c), s"doc $id unexpectedly failed $c")
    }
  }

  test("gopherRules: empty and NULL text yield zero words and fail word count") {
    val f = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(f).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("n_words") === 0)
      assert(!r.getAs[Boolean]("pass_word_count"))
      assert(r.getAs[Double]("mean_word_len") === 0.0)
    }
  }

  test("clusterBalancedSample: at most perCell rows per cell, all cells drawn, deterministic") {
    val emb = (1 to 100).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.31 + d * 1.1))))
      .toDF("vec_id", "embedding")
    val cent = emb.filter($"vec_id" % 25 === 1)
      .select($"vec_id".as("centroid_id"), $"embedding")
    def draw() = Sampling.clusterBalancedSample(emb, cent, perCell = 7)
      .as[(Long, Long)].collect().toSet
    val got = draw()
    assert(got === draw(), "draw must be deterministic")
    val perCell = got.groupBy(_._2).view.mapValues(_.size)
    assert(perCell.values.forall(_ <= 7))
    assert(perCell.keys.toSet === Set(1L, 26L, 51L, 76L),
      s"every populated cell must contribute: ${perCell.toMap}")
  }

  test("dsirWeights identity law: target == background training sample -> every weight is exactly 1") {
    // when the target LM IS the background LM, lp_target == lp_corpus for
    // every doc, so weight = round6(exp(round6(0))) = 1.0 with no
    // floating tolerance
    val sample = Sampling.hashSample(
      docs.select($"doc_id", $"text"), "doc_id", 0.25, "dsir")
    val w = TextAnalysis.dsirWeights(docs, sample)
      .select("weight").as[Double].collect()
    assert(w.nonEmpty)
    assert(w.forall(_ === 1.0), s"non-unit weights: ${w.distinct.take(5).toSeq}")
  }

  test("dsirWeights separates target-like docs from alien-vocabulary docs") {
    val mixed = (0 until 200).map { i =>
      val text =
        if (i % 2 == 0) s"the quick brown fox jumps over the lazy dog again and again ${i % 3}"
        else s"zzq qqz zqz xqx qxq wvw vwv uvu vuv tut ${i % 3}"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val target = mixed.filter($"doc_id" % 2 === 0)
    val w = TextAnalysis.dsirWeights(mixed, target)
      .select($"doc_id", $"weight").as[(Long, Double)].collect()
    val (tgt, alien) = w.partition(_._1 % 2 == 0)
    assert(tgt.nonEmpty && alien.nonEmpty)
    assert(tgt.map(_._2).min > alien.map(_._2).max,
      s"target-like docs must outweigh alien docs: min(target)=${tgt.map(_._2).min}, max(alien)=${alien.map(_._2).max}")
    val kept = TextAnalysis.dsirResample(mixed, target, rate = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // alien docs' weights are tiny -> the keep cut should favor target docs
    assert(kept.count(_ % 2 == 0) > kept.count(_ % 2 == 1))
  }
}
