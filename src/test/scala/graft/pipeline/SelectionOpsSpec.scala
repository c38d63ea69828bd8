package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-10 selection/normalization operators: priority sampling,
  * winsorization, NFC canonicalization, cluster-aware split, keep-best
  * cluster survivors, and the skew-safe two-phase per-group top-k.
  */
class SelectionOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val weighted = (1 to 200).map { i =>
    (i.toLong, (i % 13 + 1).toDouble, if (i % 2 == 0) "even" else "odd")
  }.toDF("id", "w", "stratum")

  // brute-force priority mirror: w * 2^32 / (hash32+1) under salt "pri"
  private def bruteForce(rows: Seq[(Long, Double)]): Seq[(Long, Double, Double)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { case (id, w) =>
      val hex = md.digest(s"pri:$id".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val u = java.lang.Long.parseLong(hex, 16) + 1L
      (id, w, w * 4294967296.0 / u)
    }.sortBy { case (id, _, pr) => (-pr, id) }
  }

  test("prioritySample global: top-n by priority, est_w = max(w, tau)") {
    val n = 10
    val out = Sampling.prioritySample(weighted, "id", "w", n)
      .select("id", "w", "priority", "est_w")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.length === n)
    val bf = bruteForce(weighted.select("id", "w").as[(Long, Double)].collect().toSeq)
    val expectKept = bf.take(n)
    val tau = bf(n)._3
    assert(out.map(_._1).toSet === expectKept.map(_._1).toSet)
    out.foreach { case (id, w, pr, est) =>
      val exp = expectKept.find(_._1 == id).get
      assert(pr === exp._3, s"priority mismatch for $id")
      assert(est === math.max(w, tau), s"est_w mismatch for $id")
    }
  }

  test("prioritySample: population <= n keeps everything with est_w = w") {
    val tiny = weighted.filter(col("id") <= 5)
    val out = Sampling.prioritySample(tiny, "id", "w", 50)
      .select("id", "w", "est_w").as[(Long, Double, Double)].collect()
    assert(out.length === 5)
    out.foreach { case (_, w, est) => assert(est === w) }
  }

  test("prioritySample per-stratum equals the global algorithm run per stratum") {
    val n = 7
    val out = Sampling.prioritySample(weighted, "id", "w", n, Seq("stratum"))
      .select("stratum", "id", "est_w").as[(String, Long, Double)].collect()
    Seq("even", "odd").foreach { st =>
      val mine = out.filter(_._1 == st).map(t => (t._2, t._3)).sortBy(_._1)
      val solo = Sampling.prioritySample(
        weighted.filter(col("stratum") === st), "id", "w", n)
        .select("id", "est_w").as[(Long, Double)].collect().sortBy(_._1)
      assert(mine.toSeq === solo.toSeq, s"stratum $st disagrees with solo run")
    }
  }

  test("prioritySample drops NULL and non-positive weights") {
    val dirty = Seq((1L, Some(2.0)), (2L, None), (3L, Some(0.0)), (4L, Some(-1.0)),
      (5L, Some(1.0))).toDF("id", "w")
    val kept = Sampling.prioritySample(dirty, "id", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 5L))
  }

  test("prioritySample is a mergeable sketch: merged shard states == the one-shot draw") {
    val n = 12
    val shardA = weighted.filter(col("id") % 3 === 0)
    val shardB = weighted.filter(col("id") % 3 === 1)
    val shardC = weighted.filter(col("id") % 3 === 2)
    val merged = Sampling.prioritySampleMerge(
      Seq(shardA, shardB, shardC).map(s =>
        Sampling.prioritySampleState(s, "id", "w", n)), "id", "w", n)
      .select("id", "w", "priority", "est_w")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    val oneShot = Sampling.prioritySample(weighted, "id", "w", n)
      .select("id", "w", "priority", "est_w")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(merged.toSeq === oneShot.toSeq)
  }

  test("winsorize clamps tails to snapped cutoffs and passes interiors bit-identically") {
    val vals = ((1 to 98).map(_.toDouble) ++ Seq(-1e9, 1e9))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Sketches.winsorize(vals, "v", pLo = 0.05, pHi = 0.95, bins = 256)
      .select("id", "v", "v_w").as[(Long, Double, Double)].collect()
    val (lo, hi) = (out.map(_._3).min, out.map(_._3).max)
    assert(lo > -1e9 && hi < 1e9, "outliers must be clamped")
    out.filter(r => r._2 > lo && r._2 < hi).foreach { case (_, v, vw) =>
      assert(vw === v, "interior values must pass through unchanged")
    }
    // every output inside [lo, hi]
    out.foreach { case (_, _, vw) => assert(vw >= lo && vw <= hi) }
  }

  test("winsorize: NULL values stay NULL") {
    val vals = Seq((1L, Some(1.0)), (2L, None), (3L, Some(100.0)), (4L, Some(50.0)))
      .toDF("id", "v")
    val out = Sketches.winsorize(vals, "v", 0.25, 0.75, bins = 16)
    assert(out.filter(col("id") === 2 && col("v_w").isNull).count() === 1)
  }

  test("nfcNormalize composes decomposed sequences; ASCII and idempotency hold") {
    val decomposed = "cafe" + 0x0301.toChar          // e + COMBINING ACUTE
    val composed = "caf" + 0x00E9.toChar             // é precomposed
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.nfcNormalize(col("t")).as("n"))
    val got = df.as[(Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 === composed, "decomposed must compose")
    assert(got(1)._2 === composed, "composed is a fixpoint")
    assert(got(2)._2 === "plain ascii")
    val dfNull = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextAnalysis.nfcNormalize(col("t")).as("n"))
    assert(dfNull.filter(col("n").isNull).count() === 1)
  }

  test("clusterAwareSplit: every cluster lands on exactly one side; singletons match splitAssign") {
    val docs = (1 to 100).map(i => (i.toLong, s"text ${i % 20}")).toDF("doc_id", "text")
    // duplicate-pair frame: equal text
    val h = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val pairs = h.select(col("doc_id").as("id_a"), col("h"))
      .join(h.select(col("doc_id").as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    val out = Dedup.clusterAwareSplit(docs, pairs)
      .select("doc_id", "cluster_key", "split")
      .as[(Long, Long, String)].collect()
    out.groupBy(_._2).foreach { case (ck, rows) =>
      assert(rows.map(_._3).toSet.size === 1,
        s"cluster $ck straddles splits: ${rows.toSeq}")
    }
    // cluster_key is the min doc_id of the equal-text group
    val expect = out.groupBy(_._2).map { case (ck, rows) => ck -> rows.map(_._1).min }
    expect.foreach { case (ck, minId) => assert(ck === minId) }
  }

  test("keepBestPerCluster keeps the (score desc, id asc) argmax per cluster") {
    val docs = Seq(
      (1L, 1.0), (2L, 5.0), (3L, 5.0), // cluster {1,2,3}: best = id 2
      (9L, 7.0)                        // singleton
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestPerCluster(docs, pairs, "score")
      .select("cluster_key", "keep_id", "best_score", "n_members")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L, 5.0, 3L), (9L, 9L, 7.0, 1L)))
  }

  test("pcaTopComponent recovers a planted dominant direction; projection is exact") {
    // x = t * u + small noise, u = (3,4)/5 — PC1 must align with u
    val u = Seq(0.6, 0.8)
    val vecs = (1 to 400).map { i =>
      val t = (i % 21 - 10).toDouble        // spread along u
      val e = (i % 7 - 3).toDouble * 0.01   // tiny off-axis noise
      (i.toLong, Array((t * u(0) - e * u(1)).toFloat, (t * u(1) + e * u(0)).toFloat))
    }.toDF("vec_id", "embedding")
    val pc = Similarity.pcaTopComponent(vecs, iters = 5)
      .orderBy(col("i")).collect()
    val comp = pc.map(_.getDouble(1))
    val lambda = pc.head.getDouble(2)
    assert(lambda > 0)
    val cos = math.abs(comp(0) * u(0) + comp(1) * u(1)) /
      math.sqrt(comp.map(c => c * c).sum)
    assert(cos > 0.999, s"component $comp misaligned with planted direction")
    // unit norm up to snapping
    assert(math.abs(comp.map(c => c * c).sum - 1.0) < 1e-4)
    // projection = snapped dot, checked by hand on one vector
    val scores = Similarity.pcaProject(vecs, comp.toSeq)
      .filter(col("vec_id") === 1L).as[(Long, Double)].collect()
    val x = vecs.filter(col("vec_id") === 1L)
      .select("embedding").as[Array[Float]].head()
    val expect = x.zip(comp).map { case (xi, ci) =>
      math.floor(xi.toDouble * ci * 1e6 + 0.5).toLong }.sum.toDouble / 1e6
    assert(scores.head._2 === expect)
  }

  test("pcaProject raises loudly on width mismatch") {
    val vecs = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.pcaProject(vecs, Seq(1.0, 0.0, 0.0)).collect()
    }
    assert(ex.getMessage.contains("width") || ex.getMessage.contains("pcaProject"),
      s"unexpected error: ${ex.getMessage}")
  }

  test("jaccardPrefixPairs: exact recall vs brute force; plan stays product-free") {
    // templated docs with shared vocab + planted near-copies
    val docs = (1 to 80).map { i =>
      val base = s"alpha bravo charlie delta echo foxtrot word${i % 9} word${i % 7} tail$i"
      (i.toLong, if (i % 10 == 0) base + " zz" else base)
    }.toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // brute force over distinct word sets
    val toks = docs.select(col("doc_id"),
        array_distinct(Dedup.words(col("text"))).as("t"))
      .as[(Long, Seq[String])].collect().map { case (id, t) =>
        id -> t.filter(_.nonEmpty).toSet }
    val want = (for {
      (a, ta) <- toks; (b, tb) <- toks if a < b
      j = (ta & tb).size.toDouble / (ta | tb).size
      js = math.floor(j * 1e6 + 0.5) / 1e6
      if js >= 0.5
    } yield (a, b, js)).toSet
    assert(got === want, s"recall/precision mismatch: missing=${want -- got}, extra=${got -- want}")
    assert(want.nonEmpty, "fixture must produce pairs")
    val plan = Dedup.jaccardPrefixPairs(docs, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"product in:\n$plan")
  }

  test("jaccardPrefixPairs honors the hot-token cap loudly-by-construction") {
    // every doc shares one token; cap 2 kills that bucket -> no pairs
    val docs = (1 to 10).map(i => (i.toLong, "shared shared2")).toDF("doc_id", "text")
    val capped = Dedup.jaccardPrefixPairs(docs, 0.9, maxTokenBucket = Some(2))
    assert(capped.count() === 0)
    val uncapped = Dedup.jaccardPrefixPairs(docs, 0.9, maxTokenBucket = None)
    assert(uncapped.count() === 45) // all C(10,2) identical pairs
  }

  test("prefixCapAudit names capped tokens in both roles; empty audit implies capped == uncapped") {
    // docs 1-8: three hot fillers (df 11) + one unique token; docs 9-11:
    // the same fillers + a shared rare token that is their RAREST, so it
    // lands in the length-1 prefix of all three (prefix_count 3)
    val docs = ((1 to 8).map(i => (i.toLong, s"filler1 filler2 filler3 uniq$i")) ++
      (9 to 11).map(i => (i.toLong, "rare3 filler1 filler2 filler3")))
      .toDF("doc_id", "text")
    val audit = Dedup.prefixCapAudit(docs, threshold = 0.9, cap = 2)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(audit.keySet === Set("filler1", "filler2", "filler3", "rare3"))
    assert(audit("rare3") === ((3L, 3L)))     // hot in BOTH roles
    assert(audit("filler1") === ((11L, 0L)))  // hot postings, never in a prefix
    // law: audit empty at cap c ⟹ both prefix joins at cap c are
    // bit-identical to uncapped
    val calm = (1 to 12).map(i => (i.toLong, s"w${i % 4} w${i % 3} x$i y$i z$i"))
      .toDF("doc_id", "text")
    assert(Dedup.prefixCapAudit(calm, 0.8, cap = 50).count() === 0)
    val jc = Dedup.jaccardPrefixPairs(calm, 0.8, maxTokenBucket = Some(50))
      .as[(Long, Long, Double)].collect().toSet
    val ju = Dedup.jaccardPrefixPairs(calm, 0.8, maxTokenBucket = None)
      .as[(Long, Long, Double)].collect().toSet
    assert(jc === ju)
    val cc = Dedup.containmentPrefixPairs(calm, 0.8, maxTokenBucket = Some(50))
      .as[(Long, Long, Double)].collect().toSet
    val cu = Dedup.containmentPrefixPairs(calm, 0.8, maxTokenBucket = None)
      .as[(Long, Long, Double)].collect().toSet
    assert(cc === cu)
    // and on the hot corpus the active cap visibly loses pairs (the
    // recall loss the audit exists to surface)
    val hotCapped = Dedup.jaccardPrefixPairs(docs, 0.9, maxTokenBucket = Some(2)).count()
    val hotFull = Dedup.jaccardPrefixPairs(docs, 0.9, maxTokenBucket = None).count()
    assert(hotCapped < hotFull, s"expected recall loss: capped=$hotCapped full=$hotFull")
  }

  test("containmentPrefixPairs: exact recall vs brute force; asymmetry surfaces excerpts") {
    val docs = (1 to 40).map { i =>
      (i.toLong, s"alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
        s"kilo lima mike november word${i % 5} tail$i more$i filler$i")
    }.toDF("doc_id", "text")
    // planted excerpt of doc 1: strictly a word subset
    val excerpt = Seq((900L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet tail1"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(excerpt)
    val got = Dedup.containmentPrefixPairs(all, threshold = 0.9, minTokens = 5)
      .as[(Long, Long, Double)].collect().toSet
    // brute force
    val toks = all.select(col("doc_id"),
        array_distinct(Dedup.words(col("text"))).as("t"))
      .as[(Long, Seq[String])].collect().map { case (id, t) =>
        id -> t.filter(_.nonEmpty).toSet }
    val want = (for {
      (a, ta) <- toks; (b, tb) <- toks if a != b && ta.size >= 5
      c = (ta & tb).size.toDouble / ta.size
      cs = math.floor(c * 1e6 + 0.5) / 1e6
      if cs >= 0.9
    } yield (a, b, cs)).toSet
    assert(got === want, s"missing=${want -- got}, extra=${got -- want}")
    // the excerpt is contained in its parent, never the reverse
    assert(got.exists { case (a, b, c) => a == 900L && b == 1L && c == 1.0 })
    assert(!got.exists { case (a, b, _) => a == 1L && b == 900L })
  }

  test("blockingEval: orientation-normalized counts and hand-derived ratios") {
    val cand = Seq((1L, 2L), (3L, 4L), (9L, 8L), (2L, 1L)).toDF("id_a", "id_b")
    val truth = Seq((2L, 1L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.blockingEval(cand, truth, nDocs = 6)
      .as[(Long, Long, Long, Double, Double)].head()
    // normalized distinct candidates: (1,2),(3,4),(8,9) -> 3; hit: (1,2)
    assert(out === ((3L, 2L, 1L, 0.5, 1.0 - 3.0 / 15)))
  }

  test("scriptProfile counts per script and resolves dominance deterministically") {
    val docs = Seq(
      (1L, "hello world 42"),                 // latin dominant
      (2L, "привет мир ok"),                  // cyrillic dominant
      (3L, "中文测试中文测试 ab"),              // cjk dominant
      (4L, "!!! ... ???"),                    // none
      (5L, "αβ ab"),                          // tie greek/latin -> latin
      (6L, null.asInstanceOf[String])         // null -> none
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    assert(out(1L)._7 === "latin" && out(1L)._2 === 10 && out(1L)._3 === 2)
    assert(out(2L)._7 === "cyrillic" && out(2L)._5 === 0 && out(2L)._4 === 9)
    assert(out(3L)._7 === "cjk" && out(3L)._6 === 8)
    assert(out(4L)._7 === "none")
    assert(out(5L)._7 === "latin", "ties resolve latin-first")
    assert(out(6L)._7 === "none")
  }

  test("calibrationBins: hand-derived reliability table, score 1.0 folds into the top bin") {
    val scored = Seq((1L, 0.05, 0), (2L, 0.15, 1), (3L, 0.95, 1), (4L, 1.0, 1))
      .toDF("id", "score", "y")
    val out = Classifier.calibrationBins(scored, "score", "y", bins = 10)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((0L, 1L, 0.05, 0.0), (1L, 1L, 0.15, 1.0),
      (9L, 2L, 0.975, 1.0)))
  }

  test("thresholdMetrics: hand-derived confusion counts; empty denominators are NULL") {
    val scored = Seq((1L, 0.9, 1), (2L, 0.8, 0), (3L, 0.2, 1), (4L, 0.1, 0))
      .toDF("id", "score", "y")
    val rows = Classifier.thresholdMetrics(scored, "score", "y", Seq(0.5, 0.95))
      .orderBy(col("threshold")).collect()
    val at05 = rows(0)
    assert((at05.getLong(1), at05.getLong(2), at05.getLong(3), at05.getLong(4))
      === ((1L, 1L, 1L, 1L)))
    assert(at05.getDouble(5) === 0.5 && at05.getDouble(6) === 0.5 &&
      at05.getDouble(7) === 0.5)
    val at95 = rows(1) // nothing predicted positive -> precision NULL
    assert(at95.getLong(1) === 0L && at95.isNullAt(5) && at95.getDouble(6) === 0.0)
    assert(at95.isNullAt(7), "f1 undefined when precision is NULL")
  }

  test("aucRoc: hand-derived pair probability, ties at half credit, degenerate NULL") {
    val mixed = Seq((1L, 0.9, 1), (2L, 0.4, 1), (3L, 0.6, 0), (4L, 0.1, 0))
      .toDF("id", "score", "y")
    assert(Classifier.aucRoc(mixed, "score", "y").head().getDouble(0) === 0.75)
    val perfect = Seq((1L, 0.9, 1), (2L, 0.8, 1), (3L, 0.2, 0))
      .toDF("id", "score", "y")
    assert(Classifier.aucRoc(perfect, "score", "y").head().getDouble(0) === 1.0)
    val allTied = Seq((1L, 0.5, 1), (2L, 0.5, 0)).toDF("id", "score", "y")
    assert(Classifier.aucRoc(allTied, "score", "y").head().getDouble(0) === 0.5)
    val onlyPos = Seq((1L, 0.5, 1)).toDF("id", "score", "y")
    assert(Classifier.aucRoc(onlyPos, "score", "y").head().isNullAt(0))
  }

  test("classMetrics: hand-derived per-class table incl. never-predicted and absent classes") {
    val df = Seq(
      ("en", "en"), ("en", "en"), ("en", "fr"), // en: support 3, tp 2
      ("fr", "en"),                             // fr: support 1, tp 0
      ("de", "de")                              // de: support 1, tp 1
    ).toDF("actual", "predicted")
    val out = Classifier.classMetrics(df, "actual", "predicted").collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(1) === 3 && en.getLong(2) === 3 && en.getLong(3) === 2)
    assert(en.getDouble(4) === 0.666667 && en.getDouble(5) === 0.666667 &&
      en.getDouble(6) === 0.666667)
    val fr = out("fr") // predicted once (by the en doc), tp 0
    assert(fr.getLong(3) === 0 && fr.getDouble(4) === 0.0 && fr.getDouble(5) === 0.0)
    assert(fr.isNullAt(6), "f1 undefined at precision = recall = 0")
    val de = out("de")
    assert(de.getDouble(4) === 1.0 && de.getDouble(5) === 1.0 && de.getDouble(6) === 1.0)
  }

  test("classMetrics: null labels form a real class with support/n_predicted, tp 0") {
    // pins the round-13 single-pass form's null semantics: a null label is
    // aggregated as its own class (real support / n_predicted; tp stays 0
    // because actual === predicted is null-rejecting) — the pre-13
    // four-branch join emitted (null, 0, 0, 0) because its null-unsafe
    // joins dropped the group's counts
    val df = Seq(
      (Some("en"), Some("en")),
      (None: Option[String], Some("en")),  // null actual predicted en
      (Some("fr"), None: Option[String])   // fr predicted as null
    ).toDF("actual", "predicted")
    val out = Classifier.classMetrics(df, "actual", "predicted").collect()
      .map(r => Option(r.getString(0)) -> r).toMap
    val nul = out(None)
    assert(nul.getLong(1) === 1 && nul.getLong(2) === 1 && nul.getLong(3) === 0)
    assert(nul.getDouble(4) === 0.0 && nul.getDouble(5) === 0.0 && nul.isNullAt(6))
    val en = out(Some("en"))
    assert(en.getLong(1) === 1 && en.getLong(2) === 2 && en.getLong(3) === 1)
    val fr = out(Some("fr"))
    assert(fr.getLong(1) === 1 && fr.getLong(2) === 0 && fr.getLong(3) === 0)
    assert(fr.isNullAt(4), "never-predicted class keeps NULL precision")
  }

  test("spearman: monotone 1, reversed -1, ties averaged, constant NULL") {
    val mono = (1 to 50).map(i => (i.toLong, i.toDouble, (i * i).toDouble))
      .toDF("id", "a", "b")
    assert(Sketches.spearman(mono, "a", "b").head().getDouble(0) === 1.0)
    val rev = (1 to 50).map(i => (i.toLong, i.toDouble, (100 - i).toDouble))
      .toDF("id", "a", "b")
    assert(Sketches.spearman(rev, "a", "b").head().getDouble(0) === -1.0)
    val const = (1 to 10).map(i => (i.toLong, i.toDouble, 5.0)).toDF("id", "a", "b")
    assert(Sketches.spearman(const, "a", "b").head().isNullAt(0))
    // tie-averaging: hand case a=(1,2,2,3) b=(1,2,3,4): ra=(1,2.5,2.5,4)
    val tied = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 2.0, 3.0), (4L, 3.0, 4.0))
      .toDF("id", "a", "b")
    val rho = Sketches.spearman(tied, "a", "b").head().getDouble(0)
    // Pearson((1,2.5,2.5,4),(1,2,3,4)) = 4.5/sqrt(4.5*5) = 0.948683
    assert(rho === 0.948683, s"got $rho")
  }

  test("expectations: one-pass battery evaluates all check kinds with correct verdicts") {
    import Sketches.Check._
    val df = Seq(
      (1L, Some("a"), 10.0, "en"), (2L, Some("b"), 20.0, "en"),
      (3L, None, 999.0, "xx"), (4L, Some("d"), 30.0, "de"),
      (4L, Some("e"), 40.0, "en") // duplicate id
    ).toDF("id", "t", "v", "lang")
    val out = Sketches.expectations(df, Seq(
      NotNull("t", minRate = 0.9),          // 4/5 = 0.8 -> fail
      NotNull("lang"),                      // 1.0 -> pass
      Unique("id"),                         // 4 distinct / 5 -> fail
      InRange("v", 0, 100, minRate = 0.75), // 4/5 = 0.8 -> pass
      InSet("lang", Seq("en", "de"), minRate = 0.5))) // 4/5 -> pass
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getBoolean(4))).toMap
    assert(out(("not_null", "t")) === ((0.8, false)))
    assert(out(("not_null", "lang")) === ((1.0, true)))
    assert(out(("unique", "id")) === ((0.8, false)))
    assert(out(("in_range", "v")) === ((0.8, true)))
    assert(out(("in_set", "lang")) === ((0.8, true)))
  }

  test("chiSquareDrift: identical samples score 0; disjoint samples score large") {
    val a = (1 to 200).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val same = Sketches.chiSquareDrift(a, a, "v", 0.0, 20.0, bins = 16)
      .as[(Double, Long, Long, Long)].head()
    assert(same._1 === 0.0 && same._3 === 200 && same._4 === 200)
    val b = (1 to 200).map(i => (i.toLong, (i % 10).toDouble + 10.0)).toDF("id", "v")
    val diff = Sketches.chiSquareDrift(a, b, "v", 0.0, 20.0, bins = 16)
      .as[(Double, Long, Long, Long)].head()
    assert(diff._1 > 100.0, s"disjoint distributions must drift hard: $diff")
  }

  test("kaplanMeier: textbook curve with censoring, exhaustion zeroes the tail") {
    // 6 subjects: events at t=1,2,3,5; censored at t=2,4
    val subj = Seq((1L, 1L, 1), (2L, 2L, 1), (3L, 2L, 0), (4L, 3L, 1),
      (5L, 4L, 0), (6L, 5L, 1)).toDF("id", "dur", "ev")
    val got = Sketches.kaplanMeier(subj, "dur", "ev")
      .orderBy("t").as[(Long, Long, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq === Seq(
      (1L, 6L, 1L, 0L), (2L, 5L, 1L, 1L), (3L, 3L, 1L, 0L),
      (4L, 2L, 0L, 1L), (5L, 1L, 1L, 0L)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def dec6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lf = Seq(1.0 / 6, 1.0 / 5, 1.0 / 3).map(p => dec6(r6(math.log(1 - p))))
    val s1 = r6(math.exp(lf(0).toDouble))
    val s2 = r6(math.exp((lf(0) + lf(1)).toDouble))
    val s3 = r6(math.exp((lf(0) + lf(1) + lf(2)).toDouble))
    assert(got.map(_._5).toSeq === Seq(s1, s2, s3, s3, 0.0))
    // sanity on the magnitudes: the classic 5/6, 2/3, 4/9 curve
    assert(math.abs(s1 - 5.0 / 6) < 1e-5 && math.abs(s2 - 2.0 / 3) < 1e-5 &&
      math.abs(s3 - 4.0 / 9) < 1e-5)
  }

  test("logRankTest: identical groups read Z ~ 0; early-vs-late churn separates") {
    // identical survival experience -> every O-E term is d1 - d/2 with
    // n1 = n2, summing to ~0 (exactly 0 here by symmetry)
    val g = (1 to 20).map(i => (i.toLong, (i % 5 + 1).toLong, 1)).toDF("id", "dur", "ev")
    val same = Sketches.logRankTest(g, g, "dur", "ev")
      .as[(Double, Double, Option[Double], Long, Long)].head()
    assert(same._1 === 0.0 && same._3 === Some(0.0) && same._4 === 20 && same._5 === 20)
    // group a churns at t=1..2, group b at t=8..9: strongly negative
    // O-E for the late group's perspective — |Z| must be large
    val early = (1 to 10).map(i => (i.toLong, (i % 2 + 1).toLong, 1)).toDF("id", "dur", "ev")
    val late = (1 to 10).map(i => (i.toLong, (i % 2 + 8).toLong, 1)).toDF("id", "dur", "ev")
    val sep = Sketches.logRankTest(early, late, "dur", "ev")
      .as[(Double, Double, Option[Double], Long, Long)].head()
    assert(sep._3.isDefined && math.abs(sep._3.get) > 2.0,
      s"clearly separated curves must reject: $sep")
    // all-censored comparison: no event times -> no terms -> empty frame
    val cens = (1 to 5).map(i => (i.toLong, i.toLong, 0)).toDF("id", "dur", "ev")
    assert(Sketches.logRankTest(cens, cens, "dur", "ev").count() === 0L)
  }

  test("kendallTauB: monotone 1, reversed -1, hand tie case, constant NULL") {
    val up = Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L), (4L, 4L, 40L))
      .toDF("id", "a", "b")
    val one = Sketches.kendallTauB(up, "a", "b")
      .as[(Option[Double], Long, Long, Long)].head()
    assert(one === ((Some(1.0), 6L, 0L, 4L)))
    val down = Seq((1L, 1L, 40L), (2L, 2L, 30L), (3L, 3L, 20L), (4L, 4L, 10L))
      .toDF("id", "a", "b")
    assert(Sketches.kendallTauB(down, "a", "b")
      .as[(Option[Double], Long, Long, Long)].head()._1 === Some(-1.0))
    // ties: a = (1,1,2,2), b = (1,2,1,2): C = 2 (cells (1,1)-(2,2) and
    // nothing else... enumerate: cells {(1,1),(1,2),(2,1),(2,2)} n=1 each;
    // a-ordered pairs: (1,1)x(2,1): b equal? 1 vs 1 -> tie on b (neither);
    // (1,1)x(2,2): conc; (1,2)x(2,1): disc; (1,2)x(2,2): b 2 vs 2 tie
    // -> C=1, D=1; n0=6, ta=2+2 halves: t_a2 = 2*1+2*1=4 -> n0-ta=4;
    // same for b -> tau = 0/4 = 0
    val ties = Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 2L, 1L), (4L, 2L, 2L))
      .toDF("id", "a", "b")
    val t = Sketches.kendallTauB(ties, "a", "b")
      .as[(Option[Double], Long, Long, Long)].head()
    assert(t === ((Some(0.0), 1L, 1L, 4L)))
    // constant column: no ordering signal -> NULL
    val const = Seq((1L, 5L, 1L), (2L, 5L, 2L)).toDF("id", "a", "b")
    assert(Sketches.kendallTauB(const, "a", "b")
      .as[(Option[Double], Long, Long, Long)].head()._1 === None)
  }

  test("psiDrift: identical samples score 0; shifted samples cross the 0.25 alarm") {
    val a = (1 to 200).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val same = Sketches.psiDrift(a, a, "v", 0.0, 20.0, bins = 16)
      .as[(Double, Long, Long)].head()
    assert(same._1 === 0.0 && same._2 === 200 && same._3 === 200)
    val b = (1 to 200).map(i => (i.toLong, (i % 10).toDouble + 10.0)).toDF("id", "v")
    val diff = Sketches.psiDrift(a, b, "v", 0.0, 20.0, bins = 16)
      .as[(Double, Long, Long)].head()
    assert(diff._1 > 0.25, s"disjoint distributions must alarm: $diff")
    // PSI is symmetric by construction
    val rev = Sketches.psiDrift(b, a, "v", 0.0, 20.0, bins = 16)
      .as[(Double, Long, Long)].head()
    assert(rev._1 === diff._1)
  }

  test("jsDivergence: identical 0, disjoint saturates at ln 2, symmetric") {
    val a = (1 to 200).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val same = Sketches.jsDivergence(a, a, "v", 0.0, 20.0, bins = 16)
      .as[(Double, Long, Long)].head()
    assert(same._1 === 0.0)
    val b = (1 to 200).map(i => (i.toLong, (i % 10).toDouble + 10.0)).toDF("id", "v")
    val diff = Sketches.jsDivergence(a, b, "v", 0.0, 20.0, bins = 16)
      .as[(Double, Long, Long)].head()
    // fully disjoint supports: JSD = ln 2 exactly (each side's KL to the
    // midpoint is ln 2); snapped terms sum to within a few 1e-6 grid steps
    assert(math.abs(diff._1 - math.log(2.0)) < 1e-4, s"disjoint must read ln2: $diff")
    val rev = Sketches.jsDivergence(b, a, "v", 0.0, 20.0, bins = 16)
      .as[(Double, Long, Long)].head()
    assert(rev._1 === diff._1)
  }

  test("emdDrift: identical 0; a constant shift measures its own displacement") {
    val a = (1 to 100).map(i => (i.toLong, 2.5)).toDF("id", "v")
    val same = Sketches.emdDrift(a, a, "v", 0.0, 10.0, bins = 10)
      .as[(Double, Long, Long)].head()
    assert(same._1 === 0.0)
    // all mass at 2.5 vs all at 7.5: EMD = 5.0 (5 bins x width 1.0 gap)
    val b = (1 to 100).map(i => (i.toLong, 7.5)).toDF("id", "v")
    val got = Sketches.emdDrift(a, b, "v", 0.0, 10.0, bins = 10)
      .as[(Double, Long, Long)].head()
    assert(got._1 === 5.0, s"point masses 5 apart must read EMD 5: $got")
    // unlike chi2/PSI, EMD scales with displacement: a 2-unit shift reads 2
    val c = (1 to 100).map(i => (i.toLong, 4.5)).toDF("id", "v")
    val near = Sketches.emdDrift(a, c, "v", 0.0, 10.0, bins = 10)
      .as[(Double, Long, Long)].head()
    assert(near._1 === 2.0, s"2-unit shift must read EMD 2: $near")
  }

  test("benfordAudit: log-law data fits, uniform data drifts, absent digits are zero rows") {
    // multiplicative growth series follows Benford closely
    val growth = (1 to 2000).map(i =>
      math.floor(math.pow(1.01, i) * 100).toLong).toDF("v")
    val g = Sketches.benfordAudit(growth, "v")
      .select("digit", "chi2_term").as[(Int, Double)].collect().toMap
    assert(g.keySet === (1 to 9).toSet)
    assert(g.values.sum < 20.0, s"growth data must fit Benford: $g")
    // uniform ints 100..999 give p(d) ~ 1/9 everywhere -> large chi2
    val uniform = (100 to 999).map(_.toLong).toDF("v")
    val u = Sketches.benfordAudit(uniform, "v")
      .select("chi2_term").as[Double].collect().sum
    assert(u > 100.0, s"uniform digits must drift hard: $u")
    // non-positive rows drop; missing digits surface as 0 rows
    val tiny = Seq(1L, 1L, -5L, 0L).toDF("v")
    val t = Sketches.benfordAudit(tiny, "v")
      .select("digit", "n_obs").as[(Int, Long)].collect().toMap
    assert(t(1) === 2L && (2 to 9).forall(d => t(d) === 0L))
  }

  test("privacyAudit: hand-derived k-anonymity and l-diversity counts") {
    // QI (z, a): group (1,1) has 5 rows / 3 sensitive values;
    // group (1,2) has 2 rows / 1 value; group (2,1) has 1 row / 1 value
    val df = Seq(
      (1, 1, "s1"), (1, 1, "s1"), (1, 1, "s2"), (1, 1, "s3"), (1, 1, "s1"),
      (1, 2, "x"), (1, 2, "x"),
      (2, 1, "y")).toDF("z", "a", "sens")
    val r = Sketches.privacyAudit(df, Seq("z", "a"), "sens", k = 3, l = 2)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // below k=3: groups (1,2) and (2,1) -> 3 rows; below l=2: same -> 3
    assert(r === ((8L, 3L, 1L, 3L, 1L, 3L)))
    // NULL quasi values form their own group (a linkable value)
    val withNull = Seq((Some(1), "a"), (None, "b"), (None, "c"))
      .toDF("z", "sens")
    val r2 = Sketches.privacyAudit(withNull, Seq("z"), "sens", k = 2, l = 1)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r2._2 === 2L && r2._4 === 1L, s"NULL group must count: $r2")
    intercept[IllegalArgumentException] {
      Sketches.privacyAudit(df, Nil, "sens")
    }
  }

  test("welchT: shifted samples score large |t|, identical samples 0, tiny n NULL") {
    val a = (1 to 100).map(i => i.toLong -> (10.0 + (i % 7) * 0.1)).toDF("id", "v")
    val b = (1 to 100).map(i => i.toLong -> (12.0 + (i % 7) * 0.1)).toDF("id", "v")
    val shifted = Sketches.welchT(a, b, "v")
      .as[(Option[Double], Double, Double, Long, Long)].head()
    assert(shifted._1.exists(_ < -20), s"a clear -2 shift must score hard: $shifted")
    assert(shifted._4 === 100L && shifted._5 === 100L)
    val same = Sketches.welchT(a, a, "v")
      .as[(Option[Double], Double, Double, Long, Long)].head()
    assert(same._1 === Some(0.0))
    val tiny = Sketches.welchT(a.limit(1), b, "v")
      .as[(Option[Double], Double, Double, Long, Long)].head()
    assert(tiny._1 === None, "n=1 has no variance; t must be NULL")
    // zero pooled variance (both sides constant) -> NULL, not a div-by-0
    val ca = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "v")
    val z = Sketches.welchT(ca, ca, "v")
      .as[(Option[Double], Double, Double, Long, Long)].head()
    assert(z._1 === None)
  }

  test("madOutliers: the one extreme is flagged, the bulk is not, per group") {
    val rows = (1 to 20).map(i => (i.toLong, "g", 100.0 + (i % 5))) :+
      (99L, "g", 10000.0) :+ (100L, "h", 5.0) :+ (101L, "h", 6.0)
    val df = rows.toDF("id", "grp", "v")
    val out = Sketches.madOutliers(df, "grp", "v")
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(99L), "the 100x extreme must be flagged")
    assert((1 to 20).forall(i => !out(i.toLong)),
      "the bulk must survive a MAD cut the extreme cannot inflate")
    intercept[IllegalArgumentException] {
      Sketches.madOutliers(df, "grp", "v", k = 0.0)
    }
  }

  test("cramersV: perfect association 1, independence 0, constant column NULL") {
    val perfect = (Seq.fill(10)(("x", "1")) ++ Seq.fill(10)(("y", "2")))
      .toDF("a", "b")
    val p = Sketches.cramersV(perfect, "a", "b")
      .as[(Option[Double], Double, Long, Long, Long)].head()
    assert(p._1 === Some(1.0) && p._2 === 20.0 && p._3 === 20L)
    val indep = (for { a <- Seq("x", "y"); b <- Seq("1", "2"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val i = Sketches.cramersV(indep, "a", "b")
      .as[(Option[Double], Double, Long, Long, Long)].head()
    assert(i._1 === Some(0.0) && i._2 === 0.0)
    val const = Seq(("x", "1"), ("x", "2")).toDF("a", "b")
    val c = Sketches.cramersV(const, "a", "b")
      .as[(Option[Double], Double, Long, Long, Long)].head()
    assert(c._1 === None, "min(r,c)=1 must be NULL, not 0")
  }

  test("linearFuse: interpolated scores, one-sided docs take 0, constant list normalizes to 1") {
    import graft.pipeline.Similarity
    // ranker A: doc 1 score 10, doc 2 score 0; ranker B: doc 2 score 5 only
    val a = Seq((7L, 1L, 10.0), (7L, 2L, 0.0)).toDF("query_id", "vec_id", "score")
    val b = Seq((7L, 2L, 5.0)).toDF("query_id", "vec_id", "score")
    val out = Similarity.linearFuse(a, b, k = 3, alpha = 0.5)
      .select("vec_id", "fused", "rank")
      .as[(Long, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: 0.5*1.0 + 0.5*0 = 0.5 ; doc 2: 0.5*0.0 + 0.5*1.0 = 0.5
    // (B is a single-score list -> normalizes to 1.0); tie breaks to doc 1
    assert(out(1L) === ((0.5, 1)) && out(2L) === ((0.5, 2)))
    intercept[IllegalArgumentException] {
      Similarity.linearFuse(a, b, k = 1, alpha = 1.5)
    }
  }

  test("quantileNormalize: rank-equal rows across shifted groups land on one value") {
    // group a: 1..4, group b: 101..104 — same shape, shifted scale
    val df = ((1 to 4).map(i => ("a", i.toLong)) ++
      (1 to 4).map(i => ("b", 100L + i))).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val out = Sketches.quantileNormalize(df, "g", "v", bins = 8)
      .select("g", "v", "pct", "v_qn")
      .as[(String, Long, Double, Double)].collect()
    val byGV = out.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // within-group percentiles are scale-free: i-th of 4 in both groups
    (1 to 4).foreach { i =>
      assert(byGV(("a", i.toLong)) === byGV(("b", 100L + i)),
        s"rank-$i rows must normalize identically across groups")
    }
    // normalized values are monotone in within-group rank
    val aVals = (1 to 4).map(i => byGV(("a", i.toLong))._2)
    assert(aVals.zip(aVals.tail).forall { case (x, y) => x <= y })
    // and live on the GLOBAL scale (top rank maps into the global top bin)
    assert(aVals.last > 100.0, s"top of the global scale expected: $aVals")
    intercept[IllegalArgumentException] {
      Sketches.quantileNormalize(df, "g", "v", bins = 1)
    }
  }

  test("cohensKappa: textbook 2x2 table, perfect agreement 1, constant labeler NULL") {
    // classic worked example: a=20 yes/yes, b=5 yes/no, c=10 no/yes, d=15 no/no
    // p_o = 35/50 = 0.7; p_e = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val df = rows.toDF("a", "p")
    val r = Classifier.cohensKappa(df, "a", "p")
      .as[(Option[Double], Double, Double, Long)].head()
    assert(r === ((Some(0.4), 0.7, 0.5, 50L)))
    // perfect agreement
    val perfect = Classifier.cohensKappa(
      Seq(("x", "x"), ("y", "y")).toDF("a", "p"), "a", "p")
      .as[(Option[Double], Double, Double, Long)].head()
    assert(perfect._1 === Some(1.0))
    // both sides constant -> p_e = 1 -> undefined, NULL not 0
    val degen = Classifier.cohensKappa(
      Seq(("x", "x"), ("x", "x")).toDF("a", "p"), "a", "p")
      .as[(Option[Double], Double, Double, Long)].head()
    assert(degen._1 === None && degen._2 === 1.0 && degen._3 === 1.0)
  }

  test("giniSimpson: hand-derived index, NULL category counts, uniform maximizes") {
    val df = Seq(
      ("s1", "en"), ("s1", "en"), ("s1", "de"), ("s1", null),
      ("s2", "en"), ("s2", "de"), ("s2", "fr"), ("s2", "zh")
    ).toDF("src", "lang")
    val out = Sketches.giniSimpson(df, Seq("src"), "lang")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // s1: counts 2,1,1 over n=4 -> 1 - (4+1+1)/16 = 0.625
    assert(out("s1") === ((4L, 3L, 0.625)))
    // s2: uniform 4 singletons -> 1 - 4/16 = 0.75 (max for 4 cats)
    assert(out("s2") === ((4L, 4L, 0.75)))
    // all-NULL column is maximally UNdiverse: gini 0, one category
    val allNull = Sketches.giniSimpson(
      Seq(("s", null: String), ("s", null: String)).toDF("src", "lang"),
      Seq("src"), "lang").as[(String, Long, Long, Double)].head()
    assert(allNull === (("s", 2L, 1L, 0.0)))
  }

  test("topTermsPerGroupSalted returns exactly topTermsPerGroup's rows") {
    val docs = (1 to 120).map { i =>
      (i.toLong, if (i % 3 == 0) "aa" else "bb",
        s"alpha beta gamma delta ${"epsilon " * (i % 5)} zeta token$i")
    }.toDF("doc_id", "g", "text")
    val plain = TextAnalysis.topTermsPerGroup(docs, "g", topK = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = TextAnalysis.topTermsPerGroupSalted(docs, "g", topK = 4,
      saltBuckets = 4).collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq === plain.toSeq)
  }

  test("ksTest: identical samples D=0, disjoint samples D=1, hand-derived overlap") {
    def df(xs: Double*) = xs.map(Tuple1(_)).toDF("v")
    val same = Sketches.ksTest(df(1, 2, 3), df(1, 2, 3), "v")
      .as[(Option[Double], Option[Double], Long, Long)].head()
    assert(same === ((Some(0.0), Some(0.0), 3L, 3L)))
    val disjoint = Sketches.ksTest(df(1, 2), df(3, 4), "v")
      .as[(Option[Double], Option[Double], Long, Long)].head()
    assert(disjoint === ((Some(1.0), Some(1.0), 2L, 2L)))
    // a={1,1,2}, b={2,3}: max integer gap at v=1 is |2*2-0*3|=4
    // -> D = 4/6 = 0.666667; scaled by sqrt(6/5) -> 0.730297
    val mix = Sketches.ksTest(df(1, 1, 2), df(2, 3), "v")
      .as[(Option[Double], Option[Double], Long, Long)].head()
    assert(mix === ((Some(0.666667), Some(0.730297), 3L, 2L)))
  }

  test("mannWhitneyU: textbook separation and tie-corrected z") {
    def df(xs: Double*) = xs.map(Tuple1(_)).toDF("v")
    // a={1,2,3} all below b={4,5,6}: R_a=6, U_a=0, sigma^2=5.25,
    // z = -4.5/sqrt(5.25) = -1.963961
    val sep = Sketches.mannWhitneyU(df(1, 2, 3), df(4, 5, 6), "v")
      .as[(Option[Double], Option[Double], Long, Long)].head()
    assert(sep === ((Some(0.0), Some(-1.963961), 3L, 3L)))
    // ties: a={1,2,2}, b={2,3}: midrank of the 2s is 3 -> R_a=7, U_a=1,
    // T=24, sigma^2 = 0.5*(6 - 24/20) = 2.4, z = -2/sqrt(2.4) = -1.290994
    val tied = Sketches.mannWhitneyU(df(1, 2, 2), df(2, 3), "v")
      .as[(Option[Double], Option[Double], Long, Long)].head()
    assert(tied === ((Some(1.0), Some(-1.290994), 3L, 2L)))
    // all values tied on both sides -> sigma^2 = 0 -> z NULL, U = n_a*n_b/2
    val flat = Sketches.mannWhitneyU(df(5, 5), df(5), "v")
      .as[(Option[Double], Option[Double], Long, Long)].head()
    assert(flat === ((Some(1.0), None, 2L, 1L)))
  }

  test("funnelSteps: strictly-after ordering, per-step counts and conversions") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      ("u1", t(10), "view"), ("u1", t(20), "click"), ("u1", t(30), "purchase"),
      ("u2", t(10), "view"), ("u2", t(5), "click"), // click BEFORE view
      ("u3", t(10), "view"),
      ("u4", t(10), "view"), ("u4", t(10), "click") // same instant: not after
    ).toDF("user_id", "ts", "event_type")
    val out = Sketches.funnelSteps(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Option[Double])].collect().sortBy(_._1)
    assert(out === Array(
      (1, "view", 4L, Some(1.0)),
      (2, "click", 1L, Some(0.25)),
      (3, "purchase", 1L, Some(0.25))))
    // earliest-completion greedy: a later re-view does not reset the clock
    val re = Seq(("u", t(10), "view"), ("u", t(50), "view"), ("u", t(20), "click"))
      .toDF("user_id", "ts", "event_type")
    val out2 = Sketches.funnelSteps(re, "user_id", "ts", "event_type",
      Seq("view", "click")).as[(Int, String, Long, Option[Double])]
      .collect().sortBy(_._1)
    assert(out2.map(r => (r._1, r._3)) === Array((1, 1L), (2, 1L)))
  }

  test("retentionCohorts: epoch-week cohorts with hand-derived retention") {
    def t(week: Long, off: Long = 7) = new java.sql.Timestamp((week * 604800L + off) * 1000L)
    val ev = Seq(
      ("u1", t(0)), ("u1", t(1)), ("u1", t(1, 100)), // dup week collapses
      ("u2", t(0)),
      ("u3", t(1)), ("u3", t(2))
    ).toDF("user_id", "ts")
    val out = Sketches.retentionCohorts(ev, "user_id", "ts")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      (0L, 0L, 2L, 1.0), (0L, 1L, 1L, 0.5),
      (1L, 0L, 1L, 1.0), (1L, 1L, 1L, 1.0)))
  }

  test("groupedLinFit: exact line recovers, zero-variance group is NULL") {
    val df = Seq(
      ("g1", Some(0.0), Some(1.0)), ("g1", Some(1.0), Some(3.0)),
      ("g1", Some(2.0), Some(5.0)), ("g1", None, Some(9.0)), // dropped
      ("g2", Some(4.0), Some(1.0)), ("g2", Some(4.0), Some(7.0)))
      .toDF("g", "x", "y")
    val got = Sketches.groupedLinFit(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("g1") === (("g1", 3L, Some(2.0), Some(1.0), Some(1.0))))
    assert(got("g2") === (("g2", 2L, None, None, None)))
  }

  test("thetaSetOps: thetaInverse=1 degenerates to exact set algebra") {
    def df(xs: Long*) = xs.map(Tuple1(_)).toDF("k")
    val out = Sketches.thetaSetOps(df(1, 2, 3, 3), df(2, 3, 4), "k",
      thetaInverse = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Option[Double])]
      .head()
    // a={1,2,3} (dup collapses), b={2,3,4}: |∩|=2, |∪|=4, J=0.5
    assert(out === ((3L, 3L, 2L, 4L, 3L, 3L, 2L, 4L, Some(0.5))))
    // disjoint empty-side law: jaccard NULL only when union is empty
    val empty = Sketches.thetaSetOps(df(), df(), "k", thetaInverse = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Option[Double])]
      .head()
    assert(empty === ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, None)))
  }

  test("thetaSetOps: sampled counts bounded by exact and scale with theta") {
    val a = (1 to 400).map(i => Tuple1(i.toLong)).toDF("k")
    val b = (201 to 600).map(i => Tuple1(i.toLong)).toDF("k")
    val out = Sketches.thetaSetOps(a, b, "k", thetaInverse = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Option[Double])]
      .head()
    // survivors are a ~1/4 uniform subsample; estimates within 3 sigma
    assert(out._1 <= 400 && out._2 <= 400 && out._3 <= out._4)
    assert(math.abs(out._5 - 400L) < 150, s"est_a=${out._5}")
    assert(math.abs(out._7 - 200L) < 120, s"est_int=${out._7}")
    assert(math.abs(out._8 - 600L) < 180, s"est_union=${out._8}")
  }

  test("funnelWindow: later anchor completes a chain the first one misses") {
    def ev(rows: (String, Long, String)*) =
      rows.map { case (u, t, e) => (u, t, e) }.toDF("user_id", "ts", "event_type")
    // anchor@0 misses click@100 (window 10); anchor@95 catches it
    val e1 = ev(("u", 0L, "view"), ("u", 95L, "view"), ("u", 100L, "click"))
    val out1 = Sketches.funnelWindow(e1, "user_id", "ts", "event_type",
      Seq("view", "click"), window = 10L)
      .as[(Int, String, Long, Option[Double])].collect().sortBy(_._1)
    assert(out1.map(r => (r._1, r._3)) === Array((1, 1L), (2, 1L)))
    // whole chain must fit the step-1 window: purchase lands outside
    val e2 = ev(("u", 0L, "view"), ("u", 5L, "click"), ("u", 20L, "purchase"))
    val out2 = Sketches.funnelWindow(e2, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), window = 10L)
      .as[(Int, String, Long, Option[Double])].collect().sortBy(_._1)
    assert(out2.map(r => (r._1, r._3)) === Array((1, 1L), (2, 1L), (3, 0L)))
    // same-instant is not strictly-after even inside the window
    val e3 = ev(("u", 0L, "view"), ("u", 0L, "click"))
    val out3 = Sketches.funnelWindow(e3, "user_id", "ts", "event_type",
      Seq("view", "click"), window = 10L)
      .as[(Int, String, Long, Option[Double])].collect().sortBy(_._1)
    assert(out3.map(r => (r._1, r._3)) === Array((1, 1L), (2, 0L)))
  }
}
