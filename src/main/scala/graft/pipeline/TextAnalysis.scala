package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification (n-gram/stopword heuristic),
  * document fingerprinting. All pure column expressions — codegen'd,
  * shuffle-free, linear scans.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: whitespace tokens + intra-token case
    * and letter<->digit transitions (a regex approximation of byte-pair
    * tokenizers for budget estimation — deterministic, no vocab needed).
    * Expressed as transition COUNTS rather than lookaround splits: exactly
    * the same piece count (each in-token boundary adds one piece), but
    * RE2-expressible, so SQL oracles can mirror it.
    */
  def subwordCountEstimate(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(
        size(split(trim(text), "\\s+")) +
          regexp_count(text, lit("[a-z][A-Z]")) +
          regexp_count(text, lit("[a-zA-Z][0-9]")) +
          regexp_count(text, lit("[0-9][a-zA-Z]")))

  /** Unicode NFC canonical normalization as a codegen'd `StaticInvoke` of
    * [[TextKernel.nfc]] (never a UDF — same pattern as the sketch
    * kernels): composes combining sequences to their canonical form so
    * byte-level hashing (exact dedup, shingles, URL keys) treats
    * canonically-equal text as equal. Compose with [[Dedup.normalizedExact]]
    * or md5 content keys for normalization-invariant dedup over
    * multilingual corpora; NULL passes through NULL. Mirrors DuckDB's
    * `nfc_normalize` — the q246 gate compares the two over synthesized
    * decomposed text.
    */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    Bridge.staticInvoke(Class.forName("graft.pipeline.TextKernel"),
      StringType, "nfc", Seq(text), Seq(StringType), returnNullable = false)
  }

  /** Compression-ratio quality signal as a codegen'd `StaticInvoke` of
    * [[TextKernel.deflateRatio]] — low ratio = repetitive/templated text
    * (the filter cut usually lands near 0.3-0.4 for web prose). SQL
    * surface: `graft_deflate_ratio`. Spec-verified (no cross-engine
    * deflate oracle exists).
    */
  def deflateRatio(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    Bridge.staticInvoke(Class.forName("graft.pipeline.TextKernel"),
      DoubleType, "deflateRatio", Seq(text), Seq(StringType),
      returnNullable = false)
  }

  /** Luhn checksum validation as a codegen'd `StaticInvoke` of
    * [[TextKernel.luhnValid]] — see [[cardSignals]] for the composed
    * extraction. SQL surface: `graft_luhn_valid`.
    */
  def luhnValidCol(s: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    Bridge.staticInvoke(Class.forName("graft.pipeline.TextKernel"),
      BooleanType, "luhnValid", Seq(s), Seq(StringType),
      returnNullable = false)
  }

  /** Payment-card PII signals with CHECKSUM validation — the upgrade over
    * the regex-only q100 signals: maximal digit runs of plausible card
    * length are candidates, and only Luhn-valid ones count as card hits
    * (the regex-only rule over-flags order ids and timestamps ~10:1 —
    * over-redaction is corpus damage too). Runs-then-filter instead of a
    * lookaround regex so the same pattern runs on Java regex and RE2.
    * Stateless codegen projection; no shuffle.
    * Output: (idCol, n_candidates, n_luhn_valid, has_card).
    */
  def cardSignals(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val cands = filter(
      expr(s"regexp_extract_all($textCol, '[0-9]+', 0)"),
      s => length(s) >= 13 && length(s) <= 19)
    docs.select(col(idCol), cands.as("__c"))
      .select(col(idCol),
        size(col("__c")).cast("long").as("n_candidates"),
        size(filter(col("__c"), s => luhnValidCol(s))).cast("long")
          .as("n_luhn_valid"))
      .withColumn("has_card", col("n_luhn_valid") > 0)
  }

  /** Accent folding as a codegen'd `StaticInvoke` of
    * [[TextKernel.foldAccents]]: NFD → strip marks (Mn/Mc/Me) → NFC — the
    * match-key normalization above [[nfcNormalize]] for record linkage /
    * search ("café" and "cafe" collide; Æ/ß/ligatures pass through —
    * folding is not transliteration). Mirrors DuckDB's `strip_accents`
    * (both follow utf8proc's STRIPMARK semantics) — the q283 gate compares
    * the two. NULL passes through NULL.
    */
  def foldAccents(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    Bridge.staticInvoke(Class.forName("graft.pipeline.TextKernel"),
      StringType, "foldAccents", Seq(text), Seq(StringType),
      returnNullable = false)
  }

  /** Jaro-Winkler similarity as a codegen'd `StaticInvoke` of
    * [[TextKernel.jaroWinkler]] (never a UDF): the record-linkage string
    * score for the entity-resolution surface — transposition-tolerant and
    * prefix-boosted where `levenshtein` counts raw edits. Pairs with
    * [[Dedup.editDistancePairs]] / [[Dedup.sortedNeighborPairs]] as the
    * REFINE step after blocking. NULL on either side propagates NULL.
    * Conventions (empty → 0, boost iff jaro > 0.7) match DuckDB /
    * RapidFuzz — the q275 gate compares against DuckDB's native
    * `jaro_winkler_similarity` bit-for-bit after 1e-6 snapping.
    */
  def jaroWinklerCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    Bridge.staticInvoke(Class.forName("graft.pipeline.TextKernel"),
      DoubleType, "jaroWinkler", Seq(a, b), Seq(StringType, StringType),
      returnNullable = false)
  }

  /** MONGE-ELKAN soft token-set similarity (Monge/Elkan 1996): the mean
    * over a's tokens of the best [[jaroWinklerCol]] match among b's
    * tokens — the record-linkage matcher that forgives word reordering
    * ("maria garcia" vs "garcia maria" reads 1.0 where whole-string JW
    * collapses). ASYMMETRIC by definition (a quoted subset scores high
    * against a longer b, not vice versa); take the mean of both
    * directions for a symmetric score. Tokenization = [[Dedup.words]]
    * (lowercased alphanumerics). Cost per row: |tokens_a| × |tokens_b|
    * JW kernel calls inside ONE codegen'd projection — sized for names,
    * titles, addresses, not documents. NULL input propagates NULL; a
    * side that tokenizes to nothing contributes 0-similarity tokens
    * (the DuckDB/RapidFuzz empty convention [[jaroWinklerCol]] pins).
    */
  def mongeElkanCol(a: Column, b: Column): Column = {
    val ta = Dedup.words(a)
    val tb = Dedup.words(b)
    // each token's best match snaps to the 1e-6 grid and the per-row sum
    // runs in exact DECIMAL (the rrfFuse pattern), so the score is
    // engine-exact regardless of either engine's list-sum order
    val best = transform(ta, t =>
      round6(array_max(transform(tb, u => jaroWinklerCol(t, u)))))
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .otherwise(
        aggregate(best, lit(0).cast("decimal(28,6)"),
          (s, x) => (s + x.cast("decimal(28,6)")).cast("decimal(28,6)"))
          .cast("double") / size(ta))
  }

  /** 6-decimal rounding as pure IEEE arithmetic (`floor(x*1e6 + 0.5)/1e6`)
    * — bit-identical on every engine that evaluates the same double ops,
    * unlike engine-native `round`, whose half-way decisions differ between
    * Spark (BigDecimal HALF_UP on the decimal repr) and e.g. DuckDB
    * (scaled-double rounding) exactly at .5 boundaries.
    */
  def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Corpus-wide document frequency: how many documents contain each
    * normalized token at least once (the DF half of TF-IDF, and the vocab
    * statistic every tokenizer/filter pipeline starts from). Distinct
    * within doc (array_distinct, no per-doc shuffle) then one hash
    * aggregation keyed by token — partial aggregation makes the shuffle
    * carry per-partition token counts, not token occurrences; `minDf`
    * prunes the long singleton tail at the aggregate, which is where a
    * 100 TB vocabulary would otherwise explode.
    */
  def documentFrequency(docs: DataFrame, minDf: Long = 1,
      textCol: String = "text"): DataFrame =
    docs
      .select(explode(array_distinct(Dedup.words(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** Corpus bigram PMI (pointwise mutual information) — the association
    * statistic under collocation mining, tokenizer-merge scoring, and
    * phrase detection: pmi(a,b) = ln( (c_ab/M) / ((c_a/N)·(c_b/N)) )
    * over adjacent-word-pair counts c_ab (M total bigrams) and unigram
    * counts c_a (N total tokens). Division order is fixed and the result
    * snaps to the 1e-6 grid, so the doubles reproduce on any engine.
    *
    * Shape at scale: one zip_with projection assembles adjacent pairs
    * inside codegen (explode of a NULL array for sub-2-word docs emits
    * no rows), then two keyed count aggregations (partial map-side
    * combine) and two token-keyed equi-joins of the bigram table against
    * the unigram table — vocabulary-sized sides shuffle on their keys,
    * nothing is corpus-quadratic; the 1-row (N, M) totals broadcast.
    * `minCount` prunes the long tail BEFORE the joins.
    */
  def bigramPmi(docs: DataFrame, textCol: String = "text",
      minCount: Long = 2): DataFrame = {
    require(minCount >= 1, s"bigramPmi: minCount must be >= 1, got $minCount")
    val w = Dedup.words(col(textCol))
    val pairsArr = when(size(w) >= 2,
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("t1"), b.as("t2"))))
    val bigrams = docs.select(explode(pairsArr).as("bg"))
      .select(col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c_ab"))
    val unigrams = docs.select(explode(w).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val totals = unigrams.agg(sum(col("c")).as("n_tokens"))
      .crossJoin(bigrams.agg(sum(col("c_ab")).as("n_bigrams")))
    bigrams.filter(col("c_ab") >= minCount)
      .join(unigrams.select(col("t").as("t1"), col("c").as("c_a")), Seq("t1"))
      .join(unigrams.select(col("t").as("t2"), col("c").as("c_b")), Seq("t2"))
      .crossJoin(broadcast(totals))
      .select(col("t1"), col("t2"), col("c_ab"),
        round6(log(
          (col("c_ab").cast("double") / col("n_bigrams")) /
            ((col("c_a").cast("double") / col("n_tokens")) *
              (col("c_b").cast("double") / col("n_tokens"))))).as("pmi"))
  }

  /** Per-document bigram novelty: the fraction of a document's DISTINCT
    * word bigrams that appear in no other document (corpus bigram-DF
    * == 1). High novelty separates original prose from boilerplate /
    * template / near-duplicate text, complementing hash dedup: a page
    * that is 90% shared bigrams survives exact AND MinHash dedup yet
    * carries little new signal. Scores are exact rationals
    * (`novel/distinct`, 6-dec-rounded) so the result is engine-portable.
    *
    * Shape at scale: linear bigram assembly ([[Dedup.shingleRows]], one
    * shuffle by doc id), per-doc distinct, one DF aggregation keyed by
    * bigram (partial aggregation — the shuffle carries per-partition
    * counts), a bigram-keyed join back, one final count keyed by doc.
    * No window over the corpus, no product. Documents with < 2 words
    * have no bigrams and are omitted (nothing to score).
    * Output: (doc_id, n_bigrams, n_novel, novelty).
    */
  def bigramNovelty(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bi = Dedup.shingleRows(docs, textCol, idCol, 2)
      .select(col(idCol), col("shingle")).distinct()
    val df = bi.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    bi.join(df, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round6(col("n_novel").cast("double") / col("n_bigrams")))
  }

  /** Sentence/document BLEU (Papineni et al. 2002) over (candidate,
    * reference) text-pair rows — the overlap metric under distillation
    * filtering, paraphrase mining, and eval-suite scoring: modified
    * n-gram precision p_n for n = 1..maxN with REFERENCE-CLIPPED counts
    * (a candidate n-gram only credits up to its count in the reference),
    * geometric mean, and the brevity penalty exp(1 − ref_len/cand_len)
    * for candidates shorter than their reference. Any p_n = 0 zeroes the
    * score (the standard unsmoothed convention). Tokenization is the
    * engine-wide [[Dedup.words]] normalizer; ln/exp results snap to the
    * 1e-6 grid.
    *
    * Shape at scale: each side explodes to (pair, n, gram) COUNT rows
    * (partial aggregation — the shuffle carries per-pair gram counts,
    * bounded by pair text size × maxN), one pair+gram-keyed left join
    * clips, one keyed rollup per (pair, n), one conditional-aggregation
    * pivot back to a row per pair. No window over the corpus, no product.
    * Output: (idCol, cand_len, ref_len, bleu).
    */
  /** Per-pair (n, gram) COUNT rows for n = 1..maxN, tokenizing ONCE per
    * row. NOT the array-lambda form: Catalyst inlines single-reference
    * expressions into `transform` lambdas (the [[Dedup.shingles]]
    * caveat), so building grams with `slice` inside a lambda re-runs the
    * regex tokenizer PER GRAM POSITION PER n — measured 12 s/rep at
    * sf0.1 on the BLEU gate. This is the [[Dedup.shingleRows]]
    * discipline instead: posexplode words with position, assemble each
    * gram from window `lead`s (all leads share ONE keyed window sort),
    * stack the n variants, count. Linear work per token.
    */
  private def gramCountRows(df: DataFrame, idCol: String, textCol: String,
      cnt: String, maxN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val toks = filter(Dedup.words(col(textCol)), t => length(t) > 0)
    val exploded = df.select(col(idCol),
      posexplode(toks).as(Seq("__pos", "__t")))
    val withLeads = (1 until maxN).foldLeft(exploded) { (d, o) =>
      d.withColumn(s"__l$o", lead(col("__t"), o).over(win))
    }
    // a non-null last lead implies all earlier leads are non-null (the
    // positions between exist), so one null check guards each gram
    val gramN = (1 to maxN).map { n =>
      val parts = col("__t") +: (1 until n).map(o => col(s"__l$o"))
      val ok = if (n == 1) lit(true) else col(s"__l${n - 1}").isNotNull
      when(ok, struct(lit(n).as("n"), concat_ws(" ", parts: _*).as("gram")))
    }
    withLeads
      .select(col(idCol), explode(array(gramN: _*)).as("g"))
      .filter(col("g").isNotNull)
      .groupBy(col(idCol), col("g.n").as("n"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as(cnt))
  }

  /** BLEU per (candidate, reference) pair row. PRECONDITION: `idCol` is
    * unique per row — the kernel scores each ROW independently, where the
    * pre-round-13 aggregation form MERGED duplicate-id rows' gram counts
    * into one score per id (identical results on unique ids, which every
    * gate, spec and the oracle use). Null cand/ref rows keep the
    * aggregation form's semantics: length -1 for the null side, bleu 0.0.
    */
  def bleuScore(pairs: DataFrame, idCol: String = "pair_id",
      candCol: String = "cand", refCol: String = "ref",
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"bleuScore: maxN must be in [1, 6], got $maxN")
    // ONE codegen'd kernel call per row — candidate and reference live on
    // the SAME row, so BLEU needs no token explode, no per-doc window and
    // no gram-keyed join (the prior aggregation form shuffled every n-gram
    // of the corpus twice for a row-local value; guide §2.4: remove
    // shuffles outright). [[TextKernel.bleuRow]] documents the
    // bit-exactness contract (exact long counts, StrictMath float tail in
    // the identical operation order); TextAnalysisSpec pins kernel ==
    // aggregation form on randomized pairs.
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    val stats = Bridge.staticInvoke(
      Class.forName("graft.pipeline.TextKernel"),
      ArrayType(DoubleType, containsNull = false), "bleuRow",
      Seq(col(candCol), col(refCol), lit(maxN)),
      Seq(StringType, StringType, IntegerType), returnNullable = false,
      // the kernel defines null-text semantics (old form's -1/-1/0.0)
      propagateNull = false)
    pairs.select(col(idCol), stats.as("__b"))
      .select(col(idCol),
        col("__b").getItem(0).cast("int").as("cand_len"),
        col("__b").getItem(1).cast("int").as("ref_len"),
        col("__b").getItem(2).as("bleu"))
  }

  /** ROUGE-N (Lin 2004) over the same (candidate, reference) pair rows as
    * [[bleuScore]] — the RECALL-oriented twin (summarization/compression
    * eval: how much of the reference's n-gram mass the candidate keeps),
    * reported per n with clipped-overlap recall, precision, and F1.
    * recall = Σ min(c,r)/Σr, precision = Σ min(c,r)/Σc over matched
    * n-gram counts; a side with no n-grams (shorter than n) yields NULL
    * for the ratios it denominates. Same tokenizer, same snap discipline.
    *
    * Shape at scale: identical to [[bleuScore]]'s — two per-pair gram
    * count aggregations, one FULL OUTER pair+gram-keyed join (recall
    * needs reference-only grams' mass too), one keyed rollup. Output:
    * (idCol, n, rouge_recall, rouge_precision, rouge_f1).
    */
  def rougeN(pairs: DataFrame, idCol: String = "pair_id",
      candCol: String = "cand", refCol: String = "ref",
      maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"rougeN: maxN must be in [1, 6], got $maxN")
    val candG = gramCountRows(pairs, idCol, candCol, "__c", maxN)
    val refG = gramCountRows(pairs, idCol, refCol, "__r", maxN)
    val perN = candG.join(refG, Seq(idCol, "n", "gram"), "full_outer")
      .groupBy(col(idCol), col("n"))
      .agg(
        sum(least(coalesce(col("__c"), lit(0L)), coalesce(col("__r"), lit(0L))))
          .as("__m"),
        sum(coalesce(col("__c"), lit(0L))).as("__tc"),
        sum(coalesce(col("__r"), lit(0L))).as("__tr"))
    val rec = when(col("__tr") > 0,
      round6(col("__m").cast("double") / col("__tr")))
    val prec = when(col("__tc") > 0,
      round6(col("__m").cast("double") / col("__tc")))
    perN.select(col(idCol), col("n"),
        rec.as("rouge_recall"), prec.as("rouge_precision"),
        // F1 = 2pr/(p+r) simplifies exactly to 2m/(tc+tr)
        when(col("__tr") > 0 && col("__tc") > 0,
          round6(lit(2.0) * col("__m") / (col("__tr") + col("__tc"))))
          .as("rouge_f1"))
  }

  /** Per-document TF-IDF-style keyword extraction: score = tf * N / df
    * (term frequency times inverse document frequency as a pure rational —
    * no log, so the doubles are an exact IEEE division both engines
    * compute identically), top `topK` tokens per doc, score-desc then
    * token-asc. Shape at scale: one tf aggregation keyed by (doc, token),
    * one df aggregation keyed by token, a token-keyed join back, then a
    * per-doc top-k via [[graft.plans.TopKPerGroupLogical]] — map-side
    * bounded heaps, an exchange carrying <= k rows per (doc, partition),
    * rank assignment over the <= k survivors. No window, and no
    * aggregation buffer proportional to document vocabulary.
    */
  def tfidfKeywords(docs: DataFrame, topK: Int = 3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(Dedup.words(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__tf"))
    val df = tok.select(col(idCol), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("__df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("__score", col("__tf").cast("double") * col("__n") / col("__df"))
    // per-doc top-k through the custom TopKPerGroup operator: bounded
    // map-side heaps emit <= k rows per (doc, partition) BEFORE the
    // exchange — the shuffle carries O(docs * partitions * k), not every
    // (doc, token) score. Ranks are then assigned by a sorted-slice
    // aggregation whose buffer holds the <= k survivors (never a corpus
    // window), reusing the exchange's doc-hash partitioning (no extra
    // shuffle: the final TopK exec is already clustered on idCol).
    graft.ops.TopK.perGroup(
      scored.select(col(idCol), col("token"), col("__score")),
      Seq(idCol), Seq(("__score", false), ("token", true)), topK)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct((-col("__score")).as("__neg"),
        col("token"), col("__score").as("__s")))).as("__top"))
      .select(col(idCol), posexplode(col("__top")).as(Seq("__pos", "__kw")))
      .select(col(idCol), (col("__pos") + 1).cast("long").as("rank"),
        col("__kw.token").as("token"), round6(col("__kw.__s")).as("score"))
  }

  /** CCNet-style n-gram language-model scoring: train add-one-smoothed
    * bigram statistics on a deterministic [[Sampling.hashSample]] slice of
    * the corpus, then score EVERY document's average bigram log-probability
    * against them. Low scores mark text unlike the (presumed-clean)
    * training slice — the classic KenLM-perplexity quality filter of
    * CCNet/ RedPajama, here with counts instead of a trained LM binary.
    *
    * p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V) where c(w1 ·) counts
    * bigram OCCURRENCES with prefix w1 (so the conditional normalizes) and
    * V is the training vocabulary size. Determinism: counts and V are
    * exact integers, the probability is one exact IEEE division, and each
    * term's natural log is snapped to a 1e-4 fixed-point grid BEFORE the
    * per-document sum runs as exact BIGINT arithmetic — so the aggregate
    * is fold-order-free and the final average an exact-rational division
    * on the 6-decimal grid.
    *
    * Shape at scale: one sampled pass builds the two count tables (keyed
    * hash aggregations, partial map-side); scoring is a linear bigram
    * assembly ([[Dedup.shingleRows]]) plus two equi-joins keyed by bigram
    * and prefix (never a product; the single-row vocab total broadcasts),
    * then one keyed per-doc aggregation. Documents with < 2 tokens have no
    * bigrams and are omitted (nothing to score).
    * Output: (doc_id, n_bigrams, sum_lp4, avg_logprob).
    */
  def lmScore(docs: DataFrame, trainFraction: Double = 0.25,
      salt: String = "lm", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    lmScoreAgainst(docs,
      Sampling.hashSample(docs.select(col(idCol), col(textCol)),
        idCol, trainFraction, salt),
      textCol, idCol)

  /** Score every doc under an add-one-smoothed bigram LM trained on an
    * ARBITRARY training frame (same algebra as [[lmScore]], which is the
    * train-on-a-hash-sample special case). Separating the two is what
    * importance-style data selection needs: the same corpus scored under
    * two different LMs ([[dsirWeights]]).
    */
  def lmScoreAgainst(docs: DataFrame, train: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val trainBi = Dedup.shingleRows(train, textCol, idCol, 2).select(col("shingle"))
    val big = trainBi.groupBy(col("shingle")).agg(count(lit(1)).as("__c2"))
    val pre = trainBi
      .select(split(col("shingle"), " ").getItem(0).as("__w1"))
      .groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    val vocab = train
      .select(explode(array_distinct(Dedup.words(col(textCol)))).as("__t"))
      .filter(length(col("__t")) > 0)
      .agg(count_distinct(col("__t")).as("__v"))
    Dedup.shingleRows(docs, textCol, idCol, 2)
      .select(col(idCol), col("shingle"),
        split(col("shingle"), " ").getItem(0).as("__w1"))
      .join(big, Seq("shingle"), "left")
      .join(pre, Seq("__w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__p",
        (coalesce(col("__c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("__c1"), lit(0L)) + col("__v")).cast("double"))
      .withColumn("__lp4", floor(log(col("__p")) * 1e4 + 0.5).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp4")).as("sum_lp4"))
      .withColumn("avg_logprob",
        round6(col("sum_lp4").cast("double") / (col("n_bigrams") * 1e4)))
  }

  /** Score every doc under an INTERPOLATED KNESER-NEY bigram LM (Kneser &
    * Ney 1995; the Chen & Goodman 1998 interpolated form with a fixed
    * absolute discount) trained on an arbitrary training frame — the
    * production n-gram smoothing ([[lmScoreAgainst]]'s add-one is the
    * teaching baseline; KN is what CCNet-lineage quality filters and
    * KenLM-style scorers actually ship). With c12 the train bigram count,
    * c1 = Σ_w c(w1,w) the prefix mass, n1fw(w1) = |{w : c(w1,w)>0}|,
    * n1bw(w2) = |{w : c(w,w2)>0}|, B = distinct train bigram types, and
    * discount d:
    *
    *   Pcont(w2)  = n1bw(w2) / B
    *   P(w2|w1)   = (max(c12 − d, 0) + d·n1fw(w1)·Pcont(w2)) / c1
    *   c1 = 0     → P = Pcont(w2)            (unseen-prefix backoff)
    *   n1bw = 0   → the bigram is OOV: excluded from the average,
    *                counted in n_oov (its probability is 0 under the
    *                model; the reported average stays finite and the OOV
    *                count is the quality signal).
    *
    * Scale shape: three keyed count tables (bigram, prefix, continuation
    * — each at most vocabulary-sized, usually broadcastable) + a 1-row
    * B frame; scoring is the corpus bigram explode joined against them —
    * the same shape as [[lmScoreAgainst]], nothing corpus-quadratic.
    * Determinism: log terms snap to the 1e-4 fixed-point grid and sum as
    * exact BIGINTs ([[lmScore]]'s convention). Output: (idCol,
    * n_bigrams, n_oov, sum_lp4, avg_logprob) — docs with < 2 tokens have
    * no bigrams and are omitted; docs whose every bigram is OOV report
    * NULL avg_logprob.
    */
  def knScoreAgainst(docs: DataFrame, train: DataFrame, discount: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(discount > 0 && discount < 1,
      s"knScoreAgainst: discount must be in (0,1), got $discount")
    // get(), not getItem(1): shingleRows' pre-filter rows (last token of a
    // doc, NULL lead skipped by concat_ws) are one-token shingles; codegen
    // can evaluate this projection before the filter drops them, and ANSI
    // getItem throws on the out-of-bounds index where get() returns NULL
    val trBi = Dedup.shingleRows(train, textCol, idCol, 2)
      .select(split(col("shingle"), " ").getItem(0).as("__w1"),
        get(split(col("shingle"), " "), lit(1)).as("__w2"))
      .filter(col("__w2").isNotNull)
    val big = trBi.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).cast("double").as("__c12"))
    val pre = trBi.groupBy(col("__w1"))
      .agg(count(lit(1)).cast("double").as("__c1"),
        count_distinct(col("__w2")).cast("double").as("__n1fw"))
    val cont = trBi.select(col("__w1"), col("__w2")).distinct()
      .groupBy(col("__w2"))
      .agg(count(lit(1)).cast("double").as("__n1bw"))
    val btot = trBi.select(col("__w1"), col("__w2")).distinct()
      .agg(count(lit(1)).cast("double").as("__b"))
    val d = lit(discount)
    val scored = Dedup.shingleRows(docs, textCol, idCol, 2)
      .select(col(idCol),
        split(col("shingle"), " ").getItem(0).as("__w1"),
        get(split(col("shingle"), " "), lit(1)).as("__w2"))
      .filter(col("__w2").isNotNull)
      .join(big, Seq("__w1", "__w2"), "left")
      .join(pre, Seq("__w1"), "left")
      .join(cont, Seq("__w2"), "left")
      .crossJoin(broadcast(btot))
      .withColumn("__pcont", col("__n1bw") / col("__b"))
      .withColumn("__p",
        when(col("__n1bw").isNull, lit(null).cast("double"))
          .when(col("__c1").isNull, col("__pcont"))
          .otherwise((greatest(coalesce(col("__c12"), lit(0.0)) - d, lit(0.0)) +
            d * col("__n1fw") * col("__pcont")) / col("__c1")))
      .withColumn("__lp4",
        floor(log(col("__p")) * 1e4 + 0.5).cast("long"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__p").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("__lp4")).as("sum_lp4"))
      .withColumn("avg_logprob",
        when(col("n_bigrams") > col("n_oov"),
          round6(col("sum_lp4").cast("double") /
            ((col("n_bigrams") - col("n_oov")) * 1e4))))
  }

  /** [[knScoreAgainst]] trained on a deterministic hash sample of the
    * corpus itself — the self-scored form matching [[lmScore]]'s shape.
    */
  def knScore(docs: DataFrame, trainFraction: Double = 0.25,
      discount: Double = 0.75, salt: String = "kn",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    knScoreAgainst(docs,
      Sampling.hashSample(docs.select(col(idCol), col(textCol)),
        idCol, trainFraction, salt),
      discount, textCol, idCol)

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): words are
    * nodes, an undirected edge links every pair of words co-occurring
    * within a `window`-token sliding window anywhere in the corpus, and
    * [[GraphOps.pageRank]] over that graph ranks the vocabulary — the
    * graph-centrality keyword signal that needs no training data, the
    * corpus-level complement to [[tfidfKeywords]]' per-doc statistic.
    *
    * Scale shape: window pairs come from `lead()` over each doc's token
    * sequence (one doc-keyed sort, NO self-join — position windows are
    * the bigram machinery of [[Dedup.shingleRows]] generalized to gap
    * 1..window); the pair set dedups to vocabulary-sized edges; PageRank
    * then runs over vocab-sized frames with its usual keyed joins and
    * broadcast N. Nothing is ever corpus-quadratic. Determinism: the
    * snapped fixed-point PageRank arithmetic, ties on term. Output:
    * (rank, term, pr) — the topK highest-centrality terms.
    */
  def textRankKeywords(docs: DataFrame, window: Int = 2, iters: Int = 3,
      topK: Int = 20, damping: Double = 0.85, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1, s"textRankKeywords: window must be >= 1, got $window")
    require(topK >= 1, s"textRankKeywords: topK must be >= 1, got $topK")
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val toks = docs
      .select(col(idCol), posexplode(Dedup.words(col(textCol)))
        .as(Seq("__pos", "__w")))
      .filter(length(col("__w")) > 0)
    val pairs = (1 to window).map { gap =>
      toks.withColumn("__v", lead(col("__w"), gap).over(w))
        .filter(col("__v").isNotNull && col("__v") =!= col("__w"))
        .select(col("__w").as("src"), col("__v").as("dst"))
    }.reduce(_ unionAll _)
    // undirected: each co-occurrence contributes both directions
    val edges = pairs.unionAll(
      pairs.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    GraphOps.pageRank(edges, iters, damping)
      .orderBy(col("pr").desc, col("node"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pr").desc, col("node"))))
      .select(col("rank"), col("node").as("term"), col("pr"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus doc
    * under a TARGET-domain bigram LM and under a corpus-background bigram
    * LM (a hash-sampled slice), and weight it by the likelihood ratio
    * w = exp(avg_logprob_target − avg_logprob_corpus) — docs that look
    * more like the target than like the background get w > 1. Both LMs
    * are the [[lmScore]] add-one-smoothed bigram model (hashed feature
    * LMs in the paper; bigram-over-words here, matching the CCNet-lineage
    * scorer the engine already gates). The log-ratio and the weight snap
    * to the 1e-6 grid. Output: (idCol, lp_target, lp_corpus, log_ratio,
    * weight).
    *
    * Scale shape: two LM scoring passes (each one keyed join against
    * broadcast-sized count tables) and an id-keyed join — nothing
    * corpus-quadratic, no driver state beyond the LM count tables.
    */
  def dsirWeights(docs: DataFrame, target: DataFrame,
      corpusTrainFraction: Double = 0.25, salt: String = "dsir",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tgt = lmScoreAgainst(docs, target.select(col(idCol), col(textCol)),
        textCol, idCol)
      .select(col(idCol), col("avg_logprob").as("lp_target"))
    val cor = lmScore(docs, corpusTrainFraction, salt, textCol, idCol)
      .select(col(idCol), col("avg_logprob").as("lp_corpus"))
    tgt.join(cor, Seq(idCol))
      .withColumn("log_ratio", round6(col("lp_target") - col("lp_corpus")))
      .withColumn("weight", round6(exp(col("log_ratio"))))
  }

  /** DSIR importance RESAMPLING: keep each doc with probability
    * min(1, rate·w) via the stateless salted hash cut
    * ([[Sampling.weightedHashSample]]) — deterministic, engine-portable,
    * pushdown-friendly; the target-vs-background likelihood ratio from
    * [[dsirWeights]] is the weight. This is the data-selection step that
    * turns a raw crawl into a target-domain-shaped training mix. Output:
    * the kept docs' (idCol, weight).
    */
  def dsirResample(docs: DataFrame, target: DataFrame, rate: Double,
      corpusTrainFraction: Double = 0.25, salt: String = "dsir",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // the keep draw salts differently from the background-LM train draw —
    // with a shared salt, LM-train membership (hash < trainFraction·2^32)
    // and the keep cut (hash < w·rate·2^32) would be the SAME hash, so
    // training docs would be kept preferentially
    Sampling.weightedHashSample(
      dsirWeights(docs, target, corpusTrainFraction, salt, textCol, idCol)
        .select(col(idCol), col("weight")),
      idCol, "weight", rate, s"$salt:keep")

  /** Sparse TF-IDF cosine similarity over k-token shingles — the
    * token-space complement to embedding cosine ([[Dedup.cosinePairs]]):
    * each document is a sparse vector of df-pruned shingle TF-IDF weights,
    * candidate pairs meet through the shingles they share, and the cosine
    * is exact over the pruned vocabulary.
    *
    * The df prune (`2 <= df <= maxDf`) is the scale gate: df = 1 shingles
    * cannot produce a cross-document pair (drop them), and df > maxDf
    * shingles are boilerplate whose join bucket would be |df|^2 — the same
    * hot-bucket cap as the LSH band join, here doubling as stop-shingle
    * removal (their idf weight is near zero anyway). Every join is keyed
    * by shingle or doc id; no product. Determinism: idf weights and
    * per-term products are 6-dec snapped, sums run through exact decimals.
    * Output: (id_a, id_b, cosine) with id_a < id_b, cosine >= threshold.
    */
  def tfidfSimilarPairs(docs: DataFrame, threshold: Double = 0.3,
      k: Int = 3, maxDf: Long = 50, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tf = Dedup.shingleRows(docs, textCol, idCol, k)
      .groupBy(col(idCol), col("shingle")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
    val total = docs.agg(count(lit(1)).as("__n"))
    // NOT widened (round-13 measurement): forcing the shingle exchange to
    // 32 partitions (the q226 fan-out fix) made this operator SLOWER —
    // the pair groupBy's map-side partial aggregation collapses far better
    // on the few fat AQE-coalesced tasks (78k partial rows) than on wide
    // ones (1.3M partial rows), and the 3-task stages were never the wall.
    val w = tf.join(dfreq, Seq("shingle"))
      .crossJoin(broadcast(total)) // 1-row corpus size, the usual pattern
      .withColumn("w",
        round6(col("tf").cast("double") *
          log(col("__n").cast("double") / col("df").cast("double"))))
    val norms = w.groupBy(col(idCol))
      .agg(sqrt(sum(round6(col("w") * col("w")).cast("decimal(28,6)"))
        .cast("double")).as("__norm"))
    val pairs = w.select(col(idCol).as("id_a"), col("shingle"), col("w").as("__wa"))
      .join(w.select(col(idCol).as("id_b"), col("shingle"), col("w").as("__wb")),
        Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(round6(col("__wa") * col("__wb")).cast("decimal(28,6)"))
        .cast("double").as("__dot"))
    pairs
      .join(norms.select(col(idCol).as("id_a"), col("__norm").as("__na")), Seq("id_a"))
      .join(norms.select(col(idCol).as("id_b"), col("__norm").as("__nb")), Seq("id_b"))
      .withColumn("cosine", round6(col("__dot") / (col("__na") * col("__nb"))))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Top-k most frequent tokens PER GROUP (per language, per source, per
    * domain — the per-slice vocabulary audit next to the corpus-wide
    * [[heavyHitterGrams]]). Two stages: one keyed hash aggregation to
    * (group, token, count) — partial map-side combine, the only shuffle
    * that sees corpus-scale data — then per-group top-k through
    * [[graft.plans.TopKPerGroupLogical]]: map-side bounded heaps emit
    * <= k terms per (group, partition), so a hot group costs
    * k x partitions exchange rows, not its vocabulary (strictly better
    * than the previous rank window, which re-shuffled and sorted each
    * group's whole vocab; [[topTermsPerGroupSalted]] remains as the
    * composed-windows alternative). Ties break token-ascending. Output:
    * (groupCol, rank, token, n_occurrences).
    */
  def topTermsPerGroup(docs: DataFrame, groupCol: String, topK: Int = 5,
      textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(Dedup.words(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
    // rank window -> TopKPerGroup: the window re-shuffled and sorted each
    // group's WHOLE vocabulary; the custom operator's map-side heaps emit
    // <= k terms per (group, partition), so a whole-web-scale group costs
    // k * partitions exchange rows, not its vocab. Rank assignment sorts
    // the <= k survivors per group (reuses the exchange's partitioning).
    graft.ops.TopK.perGroup(counts, Seq(groupCol),
      Seq(("n_occurrences", false), ("token", true)), topK)
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct((-col("n_occurrences")).as("__neg"),
        col("token"), col("n_occurrences").as("__n")))).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(groupCol), (col("__pos") + 1).cast("long").as("rank"),
        col("__t.token").as("token"), col("__t.__n").as("n_occurrences"))
  }

  /** Unicode SCRIPT PROFILE — the script-level language signal
    * multilingual curation needs BEFORE any word-model language-ID can
    * run ([[languageId]] assumes Latin tokens; a Cyrillic or CJK page
    * must be routed by its script first). Per document: character counts
    * for Latin letters, digits, Cyrillic, Greek, CJK ideographs and the
    * dominant script among them — all via `length(x) -
    * length(regexp_replace(x, [range], ''))` over explicit BMP codepoint
    * ranges written as literal characters, so the same pattern bytes run
    * on Java regex and RE2 (no engine-specific `\\p{Script=}` dialects).
    * Stateless codegen'd projection, no shuffle. `dominant_script`
    * resolves ties in the fixed order latin > cyrillic > greek > cjk >
    * digit > none (an all-punctuation doc is `none`).
    * Output: (idCol, n_latin, n_digit, n_cyrillic, n_greek, n_cjk,
    * dominant_script).
    */
  def scriptProfile(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def countClass(range: String) =
      (length(t) - length(regexp_replace(t, lit(range), lit("")))).cast("long")
    val latin = countClass("[A-Za-z]")
    val digit = countClass("[0-9]")
    val cyr = countClass("[Ѐ-ӿ]")
    val greek = countClass("[Ͱ-Ͽ]")
    val cjk = countClass("[一-鿿]")
    val dominant =
      when(latin === 0 && cyr === 0 && greek === 0 && cjk === 0 && digit === 0,
        lit("none"))
        .when(latin >= cyr && latin >= greek && latin >= cjk && latin >= digit, lit("latin"))
        .when(cyr >= greek && cyr >= cjk && cyr >= digit, lit("cyrillic"))
        .when(greek >= cjk && greek >= digit, lit("greek"))
        .when(cjk >= digit, lit("cjk"))
        .otherwise(lit("digit"))
    docs.select(col(idCol), latin.as("n_latin"), digit.as("n_digit"),
      cyr.as("n_cyrillic"), greek.as("n_greek"), cjk.as("n_cjk"),
      dominant.as("dominant_script"))
  }

  /** [[topTermsPerGroup]]'s SKEW-SAFE twin: identical rows, but the rank
    * runs TWO-PHASE so no single reducer ever sorts a hot group's whole
    * vocabulary. Phase 1 ranks within (group, salt-bucket) — the salt is
    * the term's own hash, so each of the `saltBuckets` windows holds
    * ~vocab/saltBuckets rows — and keeps each bucket's local top-k; phase
    * 2 re-ranks the surviving <= saltBuckets*k rows per group. Exact by
    * the superset property (every global top-k term is top-k within its
    * bucket — counts are already fully aggregated per term, so bucket
    * membership cannot change a term's count). Use when single groups'
    * vocabularies run to billions (a whole-web "en" slice); the plain
    * one-window form is cheaper below that.
    */
  def topTermsPerGroupSalted(docs: DataFrame, groupCol: String, topK: Int = 5,
      saltBuckets: Int = 32, textCol: String = "text"): DataFrame = {
    require(saltBuckets >= 2,
      s"topTermsPerGroupSalted: need >= 2 salt buckets, got $saltBuckets")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(groupCol), explode(Dedup.words(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("__salt",
        pmod(Sampling.keyHash32(col("token"), "tts"), lit(saltBuckets.toLong)))
    val wLocal = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(col("n_occurrences").desc, col("token"))
    val survivors = counts.withColumn("__lr", row_number().over(wLocal))
      .filter(col("__lr") <= topK)
    val wFinal = Window.partitionBy(col(groupCol))
      .orderBy(col("n_occurrences").desc, col("token"))
    survivors.withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= topK)
      .select(col(groupCol), col("rank").cast("long").as("rank"),
        col("token"), col("n_occurrences"))
  }

  /** CCNet-style perplexity partition (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * score every document with the bigram LM ([[lmScore]]), derive the
    * tercile cutoffs, and label each document `head` / `middle` / `tail`
    * — the standard quality-tiering step before per-tier sampling rates.
    *
    * The cutoffs come from the mergeable fixed-grid quantile sketch
    * ([[Sketches.histogramQuantiles]] at p = 0.333333 / 0.666667), not an
    * exact corpus-wide sort: CCNet itself computes cutoffs once and
    * applies them as constants, and the sketch is the 100 TB-correct way
    * to get them (one histogram aggregation; no full sort, no corpus
    * window). The two cutoff doubles become literals in a stateless
    * bucket projection — the same driver-resident-model pattern as
    * k-means centroids and the trained classifier. Higher avg log-prob =
    * more fluent = `head` (strictly above the upper cutoff); `middle`
    * strictly above the lower; else `tail`.
    *
    * Output: (idCol, n_bigrams, sum_lp4, avg_logprob, ccnet_bucket).
    */
  def perplexityPartition(docs: DataFrame, trainFraction: Double = 0.25,
      bins: Int = 256, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // scored feeds three actions (range fact, histogram, final labeling) —
    // uncached, the whole shingle->join LM pipeline would replay each time
    val scored = lmScore(docs, trainFraction, textCol = textCol, idCol = idCol)
      .persist(lvl)
    val cuts = Sketches.histogramQuantiles(
        scored, "avg_logprob", Seq(0.333333, 0.666667), bins)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val (c1, c2) = (cuts(0.333333), cuts(0.666667))
    CacheScope.releaseAfterFirstUse(
      scored.withColumn("ccnet_bucket",
        when(col("avg_logprob") > c2, "head")
          .when(col("avg_logprob") > c1, "middle")
          .otherwise("tail")),
      Seq(scored))
  }

  /** The full CCNet curation step: [[perplexityPartition]] tiers the
    * corpus, then each tier keeps a deterministic hash-drawn fraction —
    * head kept (nearly) whole, tail heavily downsampled — which is exactly
    * how CCNet composes its quality tiers into a training mix. The draw is
    * [[Sampling.keyHash32]] on the doc id (salted), so membership is a
    * pure function of the key: reruns, repartitions, and engines agree
    * row-for-row. Output: the kept rows of [[perplexityPartition]]'s
    * frame, plus the applied `keep_rate`.
    */
  def ccnetCurate(docs: DataFrame,
      rates: Map[String, Double] =
        Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1),
      trainFraction: Double = 0.25, bins: Int = 256,
      salt: String = "ccnet", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(Set("head", "middle", "tail").subsetOf(rates.keySet),
      s"ccnetCurate: rates must cover head/middle/tail, got ${rates.keySet}")
    rates.values.foreach(r => require(r >= 0.0 && r <= 1.0,
      s"ccnetCurate: rates must be in [0, 1], got $rates"))
    val parts = perplexityPartition(docs, trainFraction, bins, textCol, idCol)
    val rate = when(col("ccnet_bucket") === "head", rates("head"))
      .when(col("ccnet_bucket") === "middle", rates("middle"))
      .otherwise(rates("tail"))
    parts.withColumn("keep_rate", rate)
      .filter(Sampling.keyHash32(col(idCol), salt) <
        floor(col("keep_rate") * 4294967296.0).cast("long"))
  }

  /** Corpus-wide heavy-hitter n-grams: the `topK` most-repeated k-token
    * shingles — the boilerplate-mining pass that feeds template/footer
    * removal (what [[Dedup.paragraphDedup]] does for whole paragraphs,
    * surfaced as an auditable ranked list). At 100 TB the gram explosion
    * runs on a deterministic [[Sampling.hashSample]] draw
    * (`sampleFraction` < 1) — heavy hitters by definition survive
    * sampling — and the count is one keyed hash aggregation (partial
    * map-side: the shuffle carries per-partition gram counts), followed
    * by `orderBy(...).limit(topK)` — Spark plans that as
    * TakeOrderedAndProject, the true distributed top-k (each partition
    * keeps its topK, the driver merges topK * partitions rows; no
    * corpus-wide window, no full sort). Ties break gram-ascending.
    * Output: (rank, gram, n_occurrences).
    */
  def heavyHitterGrams(docs: DataFrame, k: Int = 5, topK: Int = 20,
      sampleFraction: Double = 1.0, salt: String = "hh",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base =
      if (sampleFraction < 1.0)
        Sampling.hashSample(docs.select(col(idCol), col(textCol)), idCol,
          sampleFraction, salt)
      else docs.select(col(idCol), col(textCol))
    val top = Dedup.shingleRows(base, textCol, idCol, k)
      .groupBy(col("shingle").as("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(topK)
    // rank the tiny (<= topK rows) result; the unpartitioned window runs
    // over the already-reduced limit output, never the corpus
    val w = Window.orderBy(col("n_occurrences").desc, col("gram"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("gram"), col("n_occurrences"))
  }

  /** One greedy left-to-right BPE merge pass over a symbol array: fold the
    * array, replacing each adjacent (a, b) with the fused symbol. The
    * lookback fold is exactly the non-overlapping left-to-right scan of
    * classic BPE (a just-fused symbol can't re-match as `a` because its
    * value is `a+b`), and it stays a codegen'd lambda — no UDF.
    */
  private[pipeline] def bpeMergePass(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, array().cast("array<string>"),
      (acc, s) =>
        // `get` (not element_at): out-of-range yields NULL, not an ANSI
        // error, so the empty-accumulator case falls through to otherwise
        when(get(acc, size(acc) - 1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  private def bpeInitSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Byte-pair-encoding MERGE TRAINING, distributed: learn `numMerges`
    * merge rules from the corpus — the tokenizer-induction step of every
    * LLM data pipeline. Classic BPE works on the word-frequency table, not
    * the corpus: one pass builds (word, freq) — at 100 TB the only
    * corpus-sized shuffle, keyed by word with map-side partial counts —
    * and that vocabulary-sized table (persisted once) is all the merge
    * loop ever touches. Each round counts adjacent symbol pairs weighted
    * by word frequency (explode + one keyed aggregation), takes the global
    * argmax (count desc, then pair ascending — deterministic ties), and
    * collects ONE row: the merge rules ARE the model, driver-resident by
    * definition, like k-means centroids. The merge itself is the
    * [[bpeMergePass]] fold applied lazily on top of the previous round's
    * symbol expression — no second materialized copy of the vocabulary.
    *
    * All arithmetic is exact integer counts — engine-portable with no
    * rounding conventions. Output: (rank, lhs, rhs, pair_count), one row
    * per learned merge, rank in training order. Stops early (fewer rows)
    * if the vocabulary runs out of adjacent pairs.
    */
  def bpeTrain(docs: DataFrame, numMerges: Int = 3,
      textCol: String = "text"): DataFrame = {
    require(numMerges >= 1, s"bpeTrain: numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = docs.select(explode(Dedup.words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var symCol: Column = bpeInitSymbols(col("word"))
      val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
      var exhausted = false
      for (r <- 1 to numMerges if !exhausted) {
        val top = wf.select(col("freq"), symCol.as("__sym"))
          .filter(size(col("__sym")) >= 2)
          .select(col("freq"),
            explode(transform(sequence(lit(0), size(col("__sym")) - 2),
              i => struct(get(col("__sym"), i).as("a"),
                get(col("__sym"), i + 1).as("b")))).as("__p"))
          .groupBy(col("__p")("a").as("a"), col("__p")("b").as("b"))
          .agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((r.toLong, a, b, c))
          symCol = bpeMergePass(symCol, a, b)
        }
      }
      merges.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
    } finally wf.unpersist(blocking = false)
  }

  /** Apply trained BPE merges ([[bpeTrain]] output, in rank order) to every
    * document: per-doc word pieces after the full merge chain, as counts.
    * A stateless per-row projection — ONE codegen'd static call per doc
    * ([[TextKernel.bpeSegmentDoc]]; the merge rules ride along as a plan
    * literal, parsed once per executor). No shuffle, no join: the classic
    * "tokenize the corpus" map step. The previous form — a per-merge
    * `aggregate` fold nested inside a per-word fold — was a
    * HigherOrderFunction chain (CodegenFallback, interpreted) costing
    * ~1.4 ms/doc at sf0.1; the kernel is the [[Dedup.simhashCol]]
    * discipline applied here. Hash-identical output (exact integer
    * counts either way). Output: (id, n_words, n_pieces).
    */
  def bpeSegment(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !a.contains(' ') && !b.contains(' ') &&
        !a.contains('\n') && !b.contains('\n'),
        s"bpeSegment: merge symbols must be non-empty and space/newline-free, got ('$a','$b')")
    }
    val spec = merges.map { case (a, b) => s"$a $b" }.mkString("\n")
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    val counts = Bridge.staticInvoke(
      Class.forName("graft.pipeline.TextKernel"),
      ArrayType(LongType, containsNull = false), "bpeSegmentDoc",
      Seq(concat_ws(" ", Dedup.words(col(textCol))), lit(spec)),
      Seq(StringType, StringType), returnNullable = false)
    docs
      .select(col(idCol), counts.as("__c"))
      .select(col(idCol),
        get(col("__c"), lit(0)).as("n_words"),
        get(col("__c"), lit(1)).as("n_pieces"))
  }

  /** Quality-score components (length/punct/stopword ratios — the usual
    * heuristic filters in large-scale corpus cleaning).
    */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nAlpha = length(regexp_replace(t, "[^a-zA-Z]", ""))
    val nPunct = length(regexp_replace(t, "[^.,;:!?'\"()]", ""))
    val nTok = tokenCount(t)
    docs
      .withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTok)
      .withColumn("alpha_ratio", round6(nAlpha.cast("double") / nChars))
      .withColumn("punct_ratio", round6(nPunct.cast("double") / nChars))
      .withColumn("mean_word_len",
        round6(nAlpha.cast("double") / greatest(nTok, lit(1))))
  }

  /** Composite quality score in [0,1]: penalize too-short docs, extreme
    * punctuation, and unnatural mean word length.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(docs, textCol).withColumn("quality_score",
      round6(
        least(col("n_tokens").cast("double") / 64.0, lit(1.0)) *
          (lit(1.0) - least(col("punct_ratio") * 4.0, lit(1.0)) * 0.5) *
          least(col("mean_word_len") / 4.0, lit(1.5)) / 1.5))

  /** Tiny per-language stopword lists for the language-ID heuristic. */
  val StopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "en", "una", "por", "con"))

  /** Stopword hit count for one language over the normalized word array. */
  def stopwordHits(text: Column, lang: String): Column = {
    val w = Dedup.words(text)
    size(filter(w, t => t.isInCollection(StopWords(lang))))
  }

  /** Language-ID heuristic: argmax over per-language stopword hits; `und`
    * (undetermined) when no stopwords at all. Deterministic tie-break by
    * language code.
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val langs = StopWords.keys.toSeq.sorted
    val hits = langs.map(l => stopwordHits(col(textCol), l).as(s"hits_$l"))
    val withHits = docs.select(col("*") +: hits: _*)
    val best = langs.map(l => struct(col(s"hits_$l").as("h"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("h") > a.getField("h"), b).otherwise(a))
    withHits.withColumn("lang_pred",
      when(greatest(langs.map(l => col(s"hits_$l")): _*) === 0, lit("und"))
        .otherwise(best.getField("l")))
  }

  /** Content fingerprint: md5 of the normalized token stream (robust to
    * case/punctuation/whitespace changes).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", Dedup.words(text)))

  /** Split documents into fixed-size token chunks with overlap — the
    * context-window preparation step of a training pipeline. Chunk i
    * covers whitespace tokens [i*step, i*step + maxTokens) with
    * step = maxTokens - overlap; every token index below n starts at most
    * one chunk, so coverage is total and deterministic. Per-doc array
    * compute + one explode — no window, no shuffle beyond the caller's.
    * Empty/whitespace-only docs produce no chunks.
    */
  def chunkDocuments(docs: DataFrame, maxTokens: Int = 128, overlap: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens, "need 0 <= overlap < maxTokens")
    val step = maxTokens - overlap
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)),
          lit(step))).as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        least(lit(maxTokens), size(col("__toks")) - col("__start")).as("n_tokens"))
  }

  /** Benchmark decontamination signal: for each document, how many of its
    * distinct word `k`-grams appear in the `benchmark` corpus (eval sets,
    * test splits). The join is a distinct-gram equi-join — the benchmark
    * side is the small one and broadcasts; at 100 TB the doc-gram side
    * streams through it without ever collecting. Output:
    * (id, n_hit_grams, contaminated).
    */
  def contaminationFlags(docs: DataFrame, benchmark: DataFrame, k: Int = 8,
      textCol: String = "text", idCol: String = "doc_id",
      benchIdCol: String = "doc_id"): DataFrame = {
    // per-doc distinct gram arrays from the kernel: the only remaining
    // exchanges are the (small) benchmark-side DISTINCT and the hit-count
    // aggregation — the corpus side never shuffles its grams
    val bGrams = benchmark
      .select(explode(Dedup.distinctShingleArray(col(textCol), k)).as("shingle"))
      .distinct()
    val dGrams = docs.select(col(idCol),
      explode(Dedup.distinctShingleArray(col(textCol), k)).as("shingle"))
    val hits = dGrams.join(bGrams, "shingle")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit_grams"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }

  /** Bloom-filter decontamination: the constant-memory form of
    * [[contaminationFlags]]. The benchmark's k-gram set is folded into a
    * `bits`-wide bit array (double-hashing family over the gram's md5 —
    * `pos_j = (w1 + j*w2) mod bits`, the same construction as
    * [[TextKernel.minhashRow]]); each corpus document then tests its own
    * grams against the broadcast bitmap locally. NO join touches the
    * corpus: at 100 TB the gram-join of [[contaminationFlags]] shuffles
    * corpus-side gram rows, while this is one scan with a fixed
    * `bits/8`-byte broadcast — the standard trade (tunable false-positive
    * rate, zero false negatives; FP decisions are deterministic, so the
    * flags are still engine-exact for a given `bits`/`numHashes`).
    *
    * The bitmap is built in-plan (positions → per-word `bit_or` → one
    * packed `array<long>` row) and reaches the corpus via a broadcast
    * nested-loop join of a single row — no driver-side collect.
    */
  def bloomContaminationFlags(docs: DataFrame, benchmark: DataFrame,
      k: Int = 8, numHashes: Int = 3, bits: Int = 1 << 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(bits >= 64 && (bits & (bits - 1)) == 0,
      s"bloomContaminationFlags: bits must be a power of two >= 64, got $bits")
    require(numHashes >= 1 && numHashes <= 8,
      s"bloomContaminationFlags: numHashes must be in [1,8], got $numHashes")
    val nWords = bits / 64
    def w1(g: Column) = conv(substring(md5(g), 1, 8), 16, 10).cast("long")
    def w2(g: Column) = conv(substring(md5(g), 9, 8), 16, 10).cast("long")
    def posJ(g: Column, j: Column) = pmod(w1(g) + j * w2(g), lit(bits.toLong))
    // benchmark side: distinct grams -> distinct bit positions -> packed words
    val bPos = benchmark
      .select(explode(Dedup.distinctShingleArray(col(textCol), k)).as("g"))
      .distinct()
      .select(col("g"), explode(sequence(lit(0L), lit(numHashes - 1L))).as("j"))
      .select(posJ(col("g"), col("j")).as("p"))
      .distinct()
    val words = bPos
      .select(shiftright(col("p"), 6).cast("int").as("widx"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64L)).cast("int")).as("bit"))
      .groupBy(col("widx")).agg(call_function("bit_or", col("bit")).as("word"))
    val bitmap = words
      .agg(map_from_entries(collect_list(struct(col("widx"), col("word")))).as("__m"))
      .select(transform(sequence(lit(0), lit(nWords - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0L))).as("__bm"))
    // corpus side: per-doc gram array tested against the broadcast bitmap
    val grams = Dedup.distinctShingleArray(col(textCol), k)
    val gramHit = (g: Column) =>
      forall(sequence(lit(0L), lit(numHashes - 1L)), j => {
        val p = posJ(g, j)
        val word = element_at(col("__bm"), shiftright(p, 6).cast("int") + 1)
        call_function("shiftright", word, pmod(p, lit(64L)).cast("int"))
          .bitwiseAND(lit(1L)) === 1L
      })
    docs.crossJoin(broadcast(bitmap))
      .select(col(idCol),
        size(filter(grams, gramHit)).cast("long").as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }

  /** The composed C4-style curation pipeline: quality gate (token count +
    * composite score) → language filter (stopword-argmax language ID) →
    * full dedup ([[Dedup.dedupCorpus]]: exact → LSH → connected
    * components → canonical survivors). "Raw corpus in, training corpus
    * out" — each stage is the already-gated operator, so the composition
    * inherits their plan shapes: per-doc projections for the filters, the
    * bucketed dedup shuffles, nothing corpus-quadratic.
    */
  def curateCorpus(docs: DataFrame, lang: String = "en", minTokens: Long = 16,
      minQuality: Double = 0.3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val origCols = docs.columns.toSeq.map(col)
    // Spread the corpus scan when the file layout under-parallelizes it
    // (a single small parquet file scans as ONE task, serializing the
    // regex-heavy quality/language projections below — and the `kept`
    // persist then caches ONE partition, so every dedup branch downstream
    // stays serial too; measured 1.5-3.5 s single-task stages on q116/
    // q127). A bare repartition is NOT enough: PushDownPredicates/
    // ColumnPruning sink the quality filter (and with it the whole scoring
    // projection) below a RepartitionByExpression, putting the compute
    // right back on the single scan task — the lazy localCheckpoint roots
    // the spread rows at a flat leaf nothing can push through. Guarded:
    // at production scale the scan already has >= cores splits and
    // neither shuffle nor checkpoint is added. Two caveats inside the
    // guard: (a) the LogicalRDD leaf replaces the frame's stats with
    // defaults, so this barrier must not be reused where size estimates
    // feed a join strategy (here the consumers broadcast the OTHER side);
    // (b) localCheckpoint blocks are executor-local — an executor loss
    // fails the job rather than recomputing (acceptable for the
    // small-input local shapes this guard targets; at scale the guard is
    // false and no checkpoint exists).
    val spark = docs.sparkSession
    val want = spark.sparkContext.defaultParallelism
    val checkpointed =
      if (docs.rdd.getNumPartitions * 4 <= want)
        Some(docs.repartition(want, col(idCol)).localCheckpoint(false))
      else None
    val base = checkpointed.getOrElse(docs)
    // persisted: the dedup stage references its input from several plan
    // branches (exact hash, band table, final anti-join), which would
    // replay the regex-heavy quality/language projections per branch
    val kept = languageId(qualityScore(base, textCol), textCol)
      .filter(col("lang_pred") === lang &&
        col("n_tokens") >= minTokens && col("quality_score") >= minQuality)
      .select(origCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the checkpoint's RDD blocks are invisible to Dataset.unpersist and
    // catalog.clearCache — release them through the same scope as `kept`,
    // or repeated invocations in one session accumulate storage memory
    CacheScope.releaseAfterFirstUse(Dedup.dedupCorpus(kept, textCol, idCol),
      Seq(kept), checkpointed.toSeq.map(df =>
        () => org.apache.spark.sql.graftbridge.Bridge.unpersistRddLeaves(df)))
  }

  /** The full training-export pipeline: [[curateCorpus]] (quality gate →
    * language filter → end-to-end dedup) → token counting →
    * [[Sampling.packSequences]] (epoch shuffle + next-fit packing to the
    * context budget). "Raw corpus in, packed training shards out" — the
    * complete 100 TB path from crawl dump to dataloader-ready sequences,
    * inheriting the plan shapes of its stages (per-doc projections,
    * bucketed dedup shuffles, one shard exchange for the packing).
    */
  def trainingExport(docs: DataFrame, budget: Long, numShards: Int,
      lang: String = "en", minTokens: Long = 16, minQuality: Double = 0.3,
      textCol: String = "text", idCol: String = "doc_id",
      salt: String = "epoch0"): DataFrame = {
    val curated = curateCorpus(docs, lang, minTokens, minQuality, textCol, idCol)
      .withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
    Sampling.packSequences(curated, "n_tokens", budget, numShards, idCol, salt)
  }

  /** PII-pattern counts per document — the signals a curation pipeline
    * uses to route documents to scrubbing or drop them (counting only;
    * redaction policy is the caller's). RE2-expressible regexes so SQL
    * oracles mirror them exactly: emails, international-ish phone numbers,
    * dotted-quad IPs. Pure column expressions — codegen'd, shuffle-free.
    */
  def piiSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.withColumns(Map(
      "n_emails" -> regexp_count(t, lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")),
      "n_phones" -> regexp_count(t, lit("\\+?[0-9][0-9()\\- ]{7,}[0-9]")),
      "n_ips" -> regexp_count(t, lit("([0-9]{1,3}\\.){3}[0-9]{1,3}"))))
  }

  /** URL extraction: every http(s) URL in the text as one row
    * (doc_id, url, domain) — the raw material for link analysis, source
    * attribution, and [[domainBlocklistFlags]]. One regexp_extract_all +
    * explode (stateless until the explode, which is bounded by URLs per
    * doc); the domain is the lowercased authority with any port and
    * leading `www.` stripped.
    */
  val UrlRegex = "https?://[^\\s\"'<>]+"

  def extractUrls(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    docs.select(col(idCol),
        explode(regexp_extract_all(t, lit(UrlRegex), lit(0))).as("url"))
      .withColumn("domain",
        regexp_replace(
          lower(regexp_extract(col("url"), "https?://([^/\\s:]+)", 1)),
          "^www\\.", ""))
  }

  /** Canonical URL form — the URL-level dedup key (the same page crawled
    * as `https://WWW.Host:443/a/?utm_source=x#frag` and `https://host/a`
    * must collapse before page-level dedup even starts): drop the
    * fragment, lowercase scheme + authority, strip a leading `www.`, strip
    * the scheme's default port (:80 http / :443 https), remove tracking
    * query params (utm_*, fbclid, gclid, msclkid) with separator repair,
    * and strip trailing slashes. A fixed chain of regexp steps — stateless,
    * codegen'd, no UDF, each step mirrorable in SQL. Approximations are
    * the standard ones: query-param ORDER is preserved (not sorted), %XX
    * escapes are left as-is, and a directory/`?` boundary slash survives
    * (`/a/?id=1`). Non-URL input (no `scheme://`) passes through unchanged.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val auth1 = regexp_replace(auth0, "^www\\.", "")
    val auth = when(scheme === "http", regexp_replace(auth1, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth1, ":443$", ""))
      .otherwise(auth1)
    val pq0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    // tracking params go, their leading separator stays, then the
    // separator debris collapses: "?&" -> "?", "&&" -> "&", trailing dies
    val pq1 = regexp_replace(pq0,
      "([?&])(utm_[a-z0-9]+|fbclid|gclid|msclkid)=[^&#]*", "$1")
    val pq2 = regexp_replace(pq1, "\\?&+", "?")
    val pq3 = regexp_replace(pq2, "&&+", "&")
    val pq4 = regexp_replace(pq3, "[?&]+$", "")
    when(scheme === "", u)
      .otherwise(regexp_replace(
        concat(scheme, lit("://"), auth, pq4), "/+$", ""))
  }

  /** [[extractUrls]] + [[canonicalUrl]]: one row per URL occurrence with
    * its dedup key. `groupBy(canonical_url)` downstream is URL-level
    * dedup; joining the canonical key back to documents is the crawl
    * frontier's "have we seen this page" check.
    */
  def extractCanonicalUrls(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    extractUrls(docs, textCol, idCol)
      .withColumn("canonical_url", canonicalUrl(col("url")))

  /** Domain blocklist flags: per document, how many of its URLs hit a
    * blocklisted domain and the drop flag — the adult/spam/malware domain
    * filter every web corpus applies. The blocklist is a broadcast-sized
    * table (millions of rows at most) joined against the exploded URL
    * rows; every input document keeps a row, so the output is a keep/drop
    * routing table like the decontamination flags.
    */
  def domainBlocklistFlags(docs: DataFrame, blocklist: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      domainCol: String = "domain"): DataFrame = {
    val hits = extractUrls(docs, textCol, idCol)
      .join(broadcast(blocklist.select(col(domainCol).as("domain")).distinct()),
        Seq("domain"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_blocked_urls"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_blocked_urls"), lit(0L)).as("n_blocked_urls"))
      .withColumn("blocked", col("n_blocked_urls") > 0)
  }

  /** HTML boilerplate strip — the first pass of every web-corpus
    * pipeline: drop script/style blocks WITH their content, drop all
    * remaining tags, unescape the five standard entities, collapse
    * whitespace runs. A fixed chain of `regexp_replace`s — stateless,
    * codegen'd, no UDF, oracle-mirrorable; it is a cleaner, not a parser
    * (malformed nesting degrades gracefully — exactly how the C4/CCNet
    * lineage treats tag soup). `&amp;` unescapes LAST so `&amp;lt;` does
    * not double-decode.
    */
  def stripHtml(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val noBlocks = regexp_replace(t,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val unescaped = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")
    docs.withColumn(textCol,
      trim(regexp_replace(unescaped, "\\s+", " ")))
  }

  /** PII REDACTION — the rewrite half of [[piiSignals]]: replace every
    * email / phone / IP match with a fixed placeholder token (the standard
    * pre-training scrub, e.g. C4/RefinedWeb-style). Same three public
    * regexes as the detector, applied in a fixed order (emails first —
    * the phone pattern could otherwise eat digit runs inside an address's
    * local part... it cannot, but fixed order makes the output
    * deterministic by construction and oracle-mirrorable via three nested
    * `regexp_replace`s). A stateless codegen'd projection: no shuffle, no
    * UDF; `n_redactions` counts matches BEFORE rewriting so the count is
    * independent of placeholder collisions.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    docs.withColumn("n_redactions",
        regexp_count(t, lit(email)) + regexp_count(t, lit(phone)) +
          regexp_count(t, lit(ip)))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, email, "<EMAIL>"),
            phone, "<PHONE>"),
          ip, "<IP>"))
  }

  /** Gopher-style repetition signals — the duplicate-content quality
    * filters large-scale corpus cleaning applies per document (Rae et al.
    * 2021, "Scaling Language Models", table A1):
    *
    *  - `dup_line_frac`: fraction of (trimmed, non-empty) line occurrences
    *    beyond the first of each distinct line, `(total - distinct)/total`.
    *  - `dup_line_char_frac`: fraction of line characters inside those
    *    repeated occurrences.
    *  - `top_2gram_char_frac`: characters covered by the most frequent
    *    word 2-gram over the normalized text, `count * len(gram) /
    *    len(norm)`; ties break to the lexicographically greatest gram.
    *  - `dup_5gram_frac`: fraction of word 5-gram occurrences whose gram
    *    appears more than once.
    *
    * Shape at scale: three per-(doc, unit) count aggregations re-aggregated
    * per doc and joined back on doc_id — shuffles are keyed by doc id (plus
    * the unit string), partial aggregation everywhere, no windows, no
    * products. Docs with no lines/grams resolve to 0.0.
    */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    // all four signals in one static call per document
    // ([[TextKernel.repetitionSignals]]) — the aggregate form (line counts
    // + 2-gram counts + 5-gram counts, each a per-(doc, unit) then per-doc
    // double aggregation re-joined on doc id) paid three shuffle pipelines
    // for what is a pure per-document function; values are identical
    // (pinned by TextKernelSpec + the random-text property test)
    // NULL text folds to "" (not a null-propagated NULL signal row) — the
    // documented "docs with no lines/grams resolve to 0.0" contract
    val t = coalesce(col(textCol), lit(""))
    val sig = Bridge.staticInvoke(
      Class.forName("graft.pipeline.TextKernel"),
      ArrayType(DoubleType, containsNull = false), "repetitionSignals",
      Seq(t, concat_ws(" ", Dedup.words(t))),
      Seq(StringType, StringType), returnNullable = false)
    docs.select(col(idCol), sig.as("__s"))
      .select(col(idCol),
        round6(col("__s")(0)).as("dup_line_frac"),
        round6(col("__s")(1)).as("dup_line_char_frac"),
        round6(col("__s")(2)).as("top_2gram_char_frac"),
        round6(col("__s")(3)).as("dup_5gram_frac"))
  }

  /** Winnowing document sketch: k-char gram rolling hashes, keep the
    * per-window minimum; the distinct minima rows are the sketch — the
    * standard local fingerprinting scheme for near-dup detection at
    * character level.
    *
    * Fully per-document and shuffle-free until the (much smaller) sketch
    * rows hit the final distinct. The gram-hash/window-min pass is
    * [[TextKernel.winnowing]] — one codegen'd static call per document
    * with a reused digest instance, replacing an interpreted
    * sequence/transform/md5/slice/array_min lambda chain that allocated a
    * digest and a hex string per gram (that chain was the slowest query in
    * the whole bench; the values are bit-identical, see TextKernelSpec).
    */
  def winnowing(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      k: Int = 8, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    val norm = docs.select(col(idCol),
      concat_ws(" ", Dedup.words(col(textCol))).as("__norm"))
    val sketch = Bridge.staticInvoke(
      Class.forName("graft.pipeline.TextKernel"),
      ArrayType(StringType, containsNull = false), "winnowing",
      Seq(col("__norm"), lit(k), lit(window)),
      Seq(StringType, IntegerType, IntegerType), returnNullable = false)
    norm.select(col(idCol), explode(sketch).as("h")).distinct()
  }

  /** Gopher's English stopword-presence list (Rae et al. 2021, table A1):
    * a document must contain at least `minStopwordsPresent` DISTINCT words
    * from this list to pass the stop-word rule.
    */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality RULES (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * table A1) — the published rule battery big corpus pipelines apply
    * before model training, as per-document measurements + boolean rule
    * flags + one composite `gopher_pass`:
    *
    *  - `n_words` in [minWords, maxWords] (whitespace tokens of the
    *    trimmed text; empty text = 0 words),
    *  - `mean_word_len` in [minMeanWordLen, maxMeanWordLen],
    *  - `symbol_ratio` = (# of `#` + # of `...`) / words <= maxSymbolRatio,
    *  - `bullet_ratio` = fraction of lines starting with a bullet
    *    (`-`, `*`, `•` after ltrim) <= maxBulletRatio,
    *  - `ellipsis_ratio` = fraction of lines ending with `...`/`…`
    *    (after rtrim) <= maxEllipsisRatio,
    *  - `alpha_word_frac` = fraction of words containing at least one
    *    alphabetic character >= minAlphaWordFrac,
    *  - at least `minStopwordsPresent` distinct [[GopherStopWords]] present
    *    in the normalized word stream.
    *
    * Every signal is a stateless per-document projection over built-in
    * string/array functions — no shuffle, no join, no UDF; at 100 TB this
    * is a pure map stage that fuses into whatever scan feeds it. Ratios
    * are 6-decimal-snapped ([[round6]]) so the flags are engine-exact and
    * oracle-mirrorable.
    */
  def gopherRules(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3, minAlphaWordFrac: Double = 0.8,
      minStopwordsPresent: Int = 2): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val w = when(length(trim(t)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(t), "\\s+"))
    val lines = split(t, "\n")
    val nWords = size(w)
    val wDen = greatest(nWords, lit(1)).cast("double")
    val lDen = greatest(size(lines), lit(1)).cast("double")
    val meanWordLen = round6(
      aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") / wDen)
    val symbolRatio = round6(
      (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))).cast("double") / wDen)
    val bulletRatio = round6(
      size(filter(lines, x => ltrim(x).rlike("^[-*•]"))).cast("double") / lDen)
    val ellipsisRatio = round6(
      size(filter(lines, x => rtrim(x).rlike("(\\.\\.\\.|…)$"))).cast("double") / lDen)
    val alphaWordFrac = round6(
      size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") / wDen)
    val nw = Dedup.words(t)
    val nStopPresent =
      size(filter(array(GopherStopWords.map(lit): _*), s => array_contains(nw, s)))
    val passes = Seq(
      "pass_word_count" -> nWords.between(minWords, maxWords),
      "pass_mean_word_len" -> col("mean_word_len").between(minMeanWordLen, maxMeanWordLen),
      "pass_symbol" -> (col("symbol_ratio") <= maxSymbolRatio),
      "pass_bullet" -> (col("bullet_ratio") <= maxBulletRatio),
      "pass_ellipsis" -> (col("ellipsis_ratio") <= maxEllipsisRatio),
      "pass_alpha" -> (col("alpha_word_frac") >= minAlphaWordFrac),
      "pass_stopwords" -> (col("n_stop_present") >= minStopwordsPresent))
    val withSignals = docs
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanWordLen)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("bullet_ratio", bulletRatio)
      .withColumn("ellipsis_ratio", ellipsisRatio)
      .withColumn("alpha_word_frac", alphaWordFrac)
      .withColumn("n_stop_present", nStopPresent)
    val withFlags = passes.foldLeft(withSignals) {
      case (df, (name, cond)) => df.withColumn(name, cond)
    }
    withFlags.withColumn("gopher_pass",
      passes.map(p => col(p._1)).reduce(_ && _))
  }
}
