package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph statistics over edge tables — the web-graph half of
  * corpus curation. Common Crawl-lineage pipelines rank domains by link
  * centrality (PageRank / harmonic centrality) and use the rank as a
  * crawl-priority and quality prior; the reference engine has no graph
  * surface, so this sits beside [[Dedup.connectedComponents]] (the other
  * iterative graph op) in the LLM-pipeline layer.
  *
  * Everything is keyed joins + keyed aggregations — no adjacency lists on
  * the driver, no per-node windows — so the shape survives a billion-edge
  * graph: each iteration is one (src-keyed) join of the rank frame against
  * the out-degree-annotated edges plus one dst-keyed sum.
  */
object GraphOps {

  /** PageRank (Brin/Page 1998) with fixed iteration count and
    * deterministic fixed-point arithmetic, so two engines (and two
    * cluster topologies) produce bit-identical ranks:
    *
    *   pr_0(v)   = round6(1 / N)
    *   pr_i+1(v) = round6((1-d)/N + d · Σ_{u→v} round6(pr_i(u)/out(u)))
    *
    * with the Σ accumulated as exact DECIMAL(28,6) (order-independent) and
    * every stored rank snapped to the 1e-6 grid. Dangling nodes (out-degree
    * 0) contribute no mass — the "weak" PageRank variant most batch
    * implementations use; with damping the ranks stay bounded, they just
    * no longer sum to exactly 1. Duplicate edge rows are collapsed first
    * (an unweighted simple digraph); self-loops count like any edge.
    *
    * The edge table is persisted across iterations (out-degree is joined
    * on once, not per iteration) and released when the result is first
    * consumed. `iters` is small by design (production PageRank converges
    * in tens of iterations; each is one keyed shuffle pair), so the plan
    * stays linear in `iters` with no checkpointing needed.
    *
    * Output: (node, pr) for every node appearing as a source or target.
    */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 0, s"pageRank: iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1,
      s"pageRank: damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__out"))
    // out-degree rides on every edge row so iterations never re-join it
    val eo = e.join(outdeg, Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // LOCAL CUTOVER (the [[Dedup.connectedComponents]] stance, measured on
    // q215/q254-class graphs: tens of nodes, ~50 scheduler jobs, ~2-3 s of
    // pure cadence for microseconds of arithmetic): below the edge
    // threshold, run the identical snapped fixed point on the driver
    // ([[GraphLocal]] documents the bit-exactness contract). The count
    // doubles as the cache-warming first materialization of eo; unsupported
    // or null ids fall through — pure optimization, never a behavior gate.
    val spark0 = edges.sparkSession
    val idT = e.schema.fields(0).dataType
    // the null check must run on e, NOT eo: eo's null-unsafe inner join on
    // src already dropped null-src edges, so checking eo could cut over
    // locally on a graph whose distributed node set includes the null node
    // (and anything reachable only through it)
    if (eo.count() <= GraphLocal.threshold(spark0) &&
        idT == e.schema.fields(1).dataType && GraphLocal.idsSupported(idT) &&
        e.filter(col("src").isNull || col("dst").isNull).isEmpty) {
      val rows = eo.collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
      eo.unpersist(blocking = false)
      return GraphLocal.pageRank(spark0, rows, iters, damping, idT)
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // N stays a (broadcast) 1-row frame — no driver-side count action
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    def snap(c: org.apache.spark.sql.Column) = TextAnalysis.round6(c)
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), snap(lit(1.0) / col("__n")).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = pr.join(eo, pr("node") === eo("src"))
        .select(col("dst").as("node"),
          snap(col("pr") / col("__out")).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c").cast("decimal(28,6)")).cast("double").as("__sum"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          snap((lit(1.0) - damping) / col("__n") +
            lit(damping) * coalesce(col("__sum"), lit(0.0))).as("pr"))
    }
    CacheScope.releaseAfterFirstUse(pr, Seq(eo, nodes))
  }

  /** PERSONALIZED PageRank: the teleport lands uniformly on a SEED set
    * instead of all nodes — the seed-based trust/quality propagation used
    * over web graphs (TrustRank, Gyöngyi et al. 2004: start from vetted
    * good domains, damping-decay their mass along links; a page's score
    * is its link-proximity to the seeds). Same snapped fixed-point
    * arithmetic as [[pageRank]]:
    *
    *   t(v)      = round6(1 / |S|) if v ∈ S else 0
    *   pr_0      = t
    *   pr_i+1(v) = round6((1-d)·t(v) + d · Σ_{u→v} round6(pr_i(u)/out(u)))
    *
    * Nodes unreachable from the seeds decay to 0 — that asymmetry is the
    * point. Seeds not present in the edge set still teleport (they are
    * added to the node set), so a vetted-but-unlinked seed keeps its base
    * mass. Output: (node, pr) over edge-endpoint nodes ∪ seeds.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int = 3, damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", seedCol: String = "node"): DataFrame = {
    require(iters >= 0, s"personalizedPageRank: iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1,
      s"personalizedPageRank: damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__out"))
    val eo = e.join(outdeg, Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val s = seeds.select(col(seedCol).as("node")).distinct()
    // LOCAL CUTOVER — see [[pageRank]]; seeds ride along (they are the
    // teleport set, tiny by construction but bounded by the same check).
    val spark0 = edges.sparkSession
    val idT = e.schema.fields(0).dataType
    if (eo.count() <= GraphLocal.threshold(spark0) &&
        idT == e.schema.fields(1).dataType &&
        idT == s.schema.fields(0).dataType && GraphLocal.idsSupported(idT) &&
        // on e, not eo — see [[pageRank]]'s cutover
        e.filter(col("src").isNull || col("dst").isNull).isEmpty) {
      val seedIds = s.collect().map(_.get(0))
      // a null seed is a degenerate-but-defined distributed case (it
      // becomes an isolated zero-rank node); keep the local path pure by
      // falling through rather than replicating it
      if (!seedIds.contains(null) &&
          seedIds.length <= GraphLocal.threshold(spark0)) {
        val rows = eo.collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
        eo.unpersist(blocking = false)
        return GraphLocal.personalizedPageRank(spark0, rows,
          seedIds.map(x => x: Any), iters, damping, idT)
      }
    }
    val sRow = s.agg(count(lit(1)).as("__s"))
    def snap(c: org.apache.spark.sql.Column) = TextAnalysis.round6(c)
    // teleport rides on the node frame — computed once, reused per iteration
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(s.select(col("node"))).distinct()
      .join(s.withColumn("__seed", lit(1)), Seq("node"), "left")
      .crossJoin(broadcast(sRow))
      .select(col("node"),
        when(col("__seed").isNotNull, snap(lit(1.0) / col("__s")))
          .otherwise(lit(0.0)).as("__t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.select(col("node"), col("__t").as("pr"))
    for (_ <- 0 until iters) {
      val contrib = pr.join(eo, pr("node") === eo("src"))
        .select(col("dst").as("node"),
          snap(col("pr") / col("__out")).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c").cast("decimal(28,6)")).cast("double").as("__sum"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          snap((lit(1.0) - damping) * col("__t") +
            lit(damping) * coalesce(col("__sum"), lit(0.0))).as("pr"))
    }
    CacheScope.releaseAfterFirstUse(pr, Seq(eo, nodes))
  }

  /** Undirected co-occurrence edges from an item table: every unordered
    * pair of distinct values sharing a group becomes an edge in BOTH
    * directions — the standard construction for a co-citation /
    * co-occurrence graph (domains cited by the same document, tokens in
    * the same context). The self-join is keyed on the group column, so
    * its cost is Σ per-group-degree², bounded by the caller's group
    * fan-out (URLs per document), never corpus².
    */
  def coOccurrenceEdges(items: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val g = items.select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .distinct()
    val l = g.select(col("__g"), col("__v").as("src"))
    val r = g.select(col("__g"), col("__v").as("dst"))
    l.join(r, Seq("__g"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  /** Label-propagation community detection (Raghavan et al. 2007), the
    * cheap large-graph community pass (domain clusters over link graphs,
    * near-dup families over similarity graphs): every node starts as its
    * own label; each SYNCHRONOUS iteration relabels a node to its
    * neighbors' most frequent label. The classic algorithm breaks
    * frequency ties randomly — here ties take the MINIMUM label, and
    * iterations are synchronous with a fixed count, so the result is a
    * deterministic function of the edge set (two engines and two
    * partitionings agree; the price is the possible two-coloring
    * oscillation on bipartite regions, which a fixed iteration count
    * makes reproducible rather than divergent).
    *
    * Each iteration is one src-keyed join (labels onto edges) + one
    * (node, label)-keyed count + one node-keyed argmax via struct-min
    * ((-count, label) — no window, no collect). Isolated self-loop-only
    * nodes keep their own label through the left join. `directed=false`
    * (the default) symmetrizes the edge set first — community detection
    * is an undirected notion; pass `directed=true` to propagate along arcs.
    * Output: (node, label).
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3,
      directed: Boolean = false, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iters >= 0, s"labelPropagation: iters must be >= 0, got $iters")
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (directed) raw
             else raw.unionByName(raw.select(col("dst").as("src"), col("src").as("dst"))))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // LOCAL CUTOVER — see [[pageRank]]; ties need the same UTF-8-byte
    // min-label order the distributed struct-min uses, which is exactly
    // what [[Dedup.localIdOrdering]] (and so [[GraphLocal.idsSupported]])
    // guarantees.
    val spark0 = edges.sparkSession
    val idT = e.schema.fields(0).dataType
    if (e.count() <= GraphLocal.threshold(spark0) &&
        idT == e.schema.fields(1).dataType && GraphLocal.idsSupported(idT) &&
        e.filter(col("src").isNull || col("dst").isNull).isEmpty) {
      val rows = e.collect().map(r => (r.get(0), r.get(1)))
      e.unpersist(blocking = false)
      return GraphLocal.labelPropagation(spark0, rows, iters, idT)
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 0 until iters) {
      val best = labels.join(e, labels("node") === e("src"))
        .select(col("dst").as("node"), col("label"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("l"))).as("__b"))
        .select(col("node"), col("__b.l").as("label"))
      labels = nodes.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    }
    CacheScope.releaseAfterFirstUse(labels, Seq(e, nodes))
  }

  /** WEIGHTED co-occurrence edges: like [[coOccurrenceEdges]] but each
    * ordered pair carries the number of groups it co-occurs in — the
    * co-citation STRENGTH (two domains cited together once vs in 10k
    * documents are different signals). Same keyed-join shape, one extra
    * count aggregation.  Output: (src, dst, weight).
    */
  /** ASSOCIATION RULES over baskets (the market-basket support /
    * confidence / lift battery, Agrawal et al. 1993 Apriori's level-2
    * output — "users who bought A also bought B"): for each co-occurring
    * item pair with n_ab shared baskets, n_a/n_b per-item basket counts
    * and N retained baskets,
    *
    *   support = n_ab/N,  conf(a→b) = n_ab/n_a,  conf(b→a) = n_ab/n_b,
    *   lift = n_ab·N / (n_a·n_b)   (> 1 ⇔ positive association)
    *
    * Scale shape: the pair generation is a BASKET-KEYED self-join, so a
    * basket costs its size² — baskets larger than `maxBasketSize` are
    * DROPPED before pairing (the [[Dedup.lshCandidatePairs]] hot-bucket
    * stance: a power-user/spam basket is noise for association mining
    * and would otherwise dominate the shuffle; N counts retained baskets
    * so the probabilities stay consistent). Counts stay exact longs;
    * the n_ab·N and n_a·n_b products stay under 2^53 for any realistic
    * catalog, and every ratio snaps to the 1e-6 grid. `minPairCount`
    * prunes the long tail BEFORE the stat joins. Output: (a, b (a < b),
    * n_ab, n_a, n_b, support, conf_ab, conf_ba, lift) — topK by lift.
    */
  def assocRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2, topK: Int = 20,
      maxBasketSize: Int = 256): DataFrame = {
    require(minPairCount >= 1 && topK >= 1 && maxBasketSize >= 2,
      s"assocRules: bad minPairCount=$minPairCount topK=$topK maxBasketSize=$maxBasketSize")
    val b0 = baskets.select(col(basketCol).as("__g"), col(itemCol).as("__i"))
      .distinct()
    val sizes = b0.groupBy(col("__g")).agg(count(lit(1)).as("__sz"))
    val b = b0.join(sizes.filter(col("__sz") <= maxBasketSize), Seq("__g"))
      .select(col("__g"), col("__i"))
    val nB = b.select(col("__g")).distinct().agg(count(lit(1)).as("__n"))
    val ci = b.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val snap = (c: org.apache.spark.sql.Column) => TextAnalysis.round6(c)
    b.select(col("__g"), col("__i").as("a"))
      .join(b.select(col("__g"), col("__i").as("b")), Seq("__g"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
      .join(ci.select(col("__i").as("a"), col("__c").as("n_a")), Seq("a"))
      .join(ci.select(col("__i").as("b"), col("__c").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nB))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        snap(col("n_ab").cast("double") / col("__n")).as("support"),
        snap(col("n_ab").cast("double") / col("n_a")).as("conf_ab"),
        snap(col("n_ab").cast("double") / col("n_b")).as("conf_ba"),
        snap((col("n_ab") * col("__n")).cast("double") /
          (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(topK)
  }

  def coOccurrenceEdgesWeighted(items: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val g = items.select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .distinct()
    val l = g.select(col("__g"), col("__v").as("src"))
    val r = g.select(col("__g"), col("__v").as("dst"))
    l.join(r, Seq("__g"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** WEIGHTED PageRank: rank mass flows along edges in proportion to
    * edge weight instead of splitting evenly — the form link analysis
    * actually runs over co-citation/click graphs, where multiplicity IS
    * the signal. Same snapped fixed-point discipline as [[pageRank]],
    * with the per-edge SHARE precomputed once (share = round6(w / Σ_out w),
    * exact-decimal Σ over integer weights) so iterations stay one keyed
    * join + one keyed decimal sum:
    *
    *   pr_i+1(v) = round6((1-d)/N + d · Σ_{u→v} round6(pr_i(u) · share(u,v)))
    *
    * Duplicate (src, dst) rows collapse by SUMMING their weights;
    * non-positive weights are rejected loudly. Output: (node, pr).
    */
  def weightedPageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85, srcCol: String = "src", dstCol: String = "dst",
      weightCol: String = "weight"): DataFrame = {
    require(iters >= 0, s"weightedPageRank: iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1,
      s"weightedPageRank: damping must be in (0,1), got $damping")
    def snap(c: org.apache.spark.sql.Column) = TextAnalysis.round6(c)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // validate BEFORE the share division plans (a zero out-weight would
    // otherwise surface as an ANSI arithmetic error mid-pipeline)
    require(e.filter(col("w") <= 0).limit(1).count() == 0,
      "weightedPageRank: weights must be positive")
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("__ow"))
    // shares ride on every edge row, computed once — iterations never
    // touch the weights again
    val eo = e.join(outW, Seq("src"))
      .select(col("src"), col("dst"),
        snap(col("w").cast("double") / col("__ow").cast("double")).as("__share"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // LOCAL CUTOVER — see [[pageRank]]; shares are collected precomputed
    // (the same snapped division the iterations would read), null weights
    // fall through with the null-id check (a null w nulls its share).
    val spark0 = edges.sparkSession
    val idT = e.schema.fields(0).dataType
    if (eo.count() <= GraphLocal.threshold(spark0) &&
        idT == e.schema.fields(1).dataType && GraphLocal.idsSupported(idT) &&
        // null ids checked on e, not eo — see [[pageRank]]'s cutover; the
        // null-share check stays on eo (shares only exist post-join)
        e.filter(col("src").isNull || col("dst").isNull).isEmpty &&
        eo.filter(col("__share").isNull).isEmpty) {
      val rows = eo.collect().map(r => (r.get(0), r.get(1), r.getDouble(2)))
      eo.unpersist(blocking = false); e.unpersist(blocking = false)
      return GraphLocal.weightedPageRank(spark0, rows, iters, damping, idT)
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), snap(lit(1.0) / col("__n")).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = pr.join(eo, pr("node") === eo("src"))
        .select(col("dst").as("node"),
          snap(col("pr") * col("__share")).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c").cast("decimal(28,6)")).cast("double").as("__sum"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          snap((lit(1.0) - damping) / col("__n") +
            lit(damping) * coalesce(col("__sum"), lit(0.0))).as("pr"))
    }
    CacheScope.releaseAfterFirstUse(pr, Seq(e, eo, nodes))
  }

  /** k-CORE decomposition by iterative peeling: repeatedly remove nodes
    * of degree < k (over the symmetrized simple graph) until stable or
    * `maxRounds` — the surviving subgraph is the k-core, the standard
    * dense-subgraph signal (spam/link-farm rings survive high-k cores;
    * organic long-tail pages peel away early). Each round is one degree
    * aggregation + two semi-joins restricting the edge set — keyed
    * shuffles only, no window, rounds bounded by `maxRounds` (peeling
    * converges in at most |V| rounds, in practice a handful; pass the
    * round budget explicitly when mirroring against an unrolled oracle).
    * Output: (node, degree) of the surviving core — empty when the graph
    * has no k-core.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 10,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    require(maxRounds >= 1, s"kCore: maxRounds must be >= 1, got $maxRounds")
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // LOOP-SCOPED SESSION ([[LoopSession]]): AQE off for the loop's own
    // actions (re-optimizing the accumulating peeled lineage at every
    // stage turned 6 rounds into ~18 s of driver work at sf0.1 — the
    // connectedComponents finding) and loop shuffles sized to the
    // symmetric edge count (round-11 finding) — both on a CLONED
    // session, so concurrent queries on the caller's session keep the
    // caller's conf. Each round runs ONE bounded action — "does any node
    // sit below k" on the node-sized degree frame (limit(1), not an
    // edge count).
    val spark0 = edges.sparkSession
    val loopSpark = LoopSession.enter(spark0)
    var e = LoopSession.rebind(
      raw.unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct(), loopSpark)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var held: List[DataFrame] = List(e)
    var rounds = 0
    var stable = false
    // the count doubles as the cache-warming first materialization of e
    LoopSession.sizeShuffles(loopSpark, spark0, e.count())
    while (rounds < maxRounds && !stable) {
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (deg.filter(col("degree") < k).limit(1).count() == 0) {
        stable = true
        deg.unpersist()
      } else {
        val keep = deg.filter(col("degree") >= k).select(col("node"))
        val peeled = e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
        // periodic lineage truncation (the connectedComponents round-12
        // finding): each round references `e` three ways (directly + via
        // keep->deg twice), so the accumulated plan DAG's tree expansions
        // grow ~3^rounds — bounded fine at the default maxRounds but an
        // analyzer blowup on deep peels; a checkpointed leaf every 8
        // rounds keeps it linear for one extra materialization
        val e2 = if (rounds % 8 == 7) peeled.localCheckpoint(true)
                 else peeled.persist(StorageLevel.MEMORY_AND_DISK)
        held = e2 :: deg :: held
        e = e2
      }
      rounds += 1
    }
    // result rebound to the CALLER's session — its consuming action must
    // not plan under the loop clone's conf
    val out = LoopSession.rebind(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree")), spark0)
    CacheScope.releaseAfterFirstUse(out, held)
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected simple graph — the link-farm / tight-community signal
    * (spam rings close triangles; organic link graphs are sparse in
    * them). Exact counting via the DEGREE-ORDERED wedge join (Cohen
    * 2009 / Suri-Vassilvitskii 2011): orient every edge from its lower
    * (degree, node) endpoint to the higher, so wedges form only at a
    * triangle's LOWEST-degree corner — total wedge volume drops from
    * Σ deg² (quadratic at one hub) to O(m^1.5), the bound that survives
    * a power-law web graph. Three keyed joins, no window, no driver
    * state; the orientation comparison is a plain (deg, node) tuple
    * predicate, not a rank window.
    *
    * Output: (node, degree, triangles, clustering) with clustering =
    * round6(2·t / (deg·(deg−1))), 0 when deg < 2. Duplicate edges and
    * self-loops are dropped first.
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = raw.unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
    // orient a -> b iff (deg(a), a) < (deg(b), b): a DAG whose out-
    // neighborhoods are O(sqrt(m)) on any graph
    val withDeg = und
      .join(deg.select(col("node").as("src"), col("degree").as("__ds")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("degree").as("__dd")), Seq("dst"))
    val directed = withDeg.filter(
        col("__ds") < col("__dd") ||
          (col("__ds") === col("__dd") && col("src") < col("dst")))
      .select(col("src").as("u"), col("dst").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges at u: (v, w) pairs of out-neighbors, emitted once (v before w
    // in the same orientation order — enforced by joining the directed
    // edge (v, w), which exists only in that direction)
    val wedges = directed.join(
        directed.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") =!= col("w"))
    val tris = wedges.join(
        directed.select(col("u").as("v"), col("v").as("w")),
        Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    val perNode = tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    val out = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2, TextAnalysis.round6(
          lit(2.0) * col("triangles") / (col("degree") * (col("degree") - 1))))
          .otherwise(lit(0.0)))
    CacheScope.releaseAfterFirstUse(out, Seq(und, directed))
  }

  /** HARMONIC CENTRALITY by landmark BFS — the statistic Common Crawl's
    * host ranking actually publishes (Boldi & Vigna 2014, "Axioms for
    * centrality": harmonic = Σ_u 1/d(u, v) handles disconnected graphs
    * where closeness breaks). Exact all-pairs is O(n·m) — the landmark
    * form runs BFS from L deterministically-chosen sources (the L
    * smallest salted node hashes, ties by node — any engine re-derives
    * the set) and reports the PARTIAL sum Σ_{l ∈ landmarks, d(l→v) ≥ 1}
    * round6(1/d(l→v)) plus `n_reached`; the (N-1)/L scale-up to the full
    * estimate is the consumer's one multiply (the hllDistinct stance:
    * ship the exact parts, not the engine-unportable garnish — here the
    * parts ARE portable, the stance is about keeping the estimator
    * choice visible). Distances follow edge direction (d(l→v) along
    * src→dst paths; pass a symmetrized edge table for the undirected
    * form).
    *
    * Scale shape: per hop one frontier-to-edges equi-join + one distinct
    * + one anti-join against the settled set — state is O(L·n) rows,
    * keyed shuffles only; each hop's frontier is persisted and forced
    * with a count (≤ maxHops tiny driver actions — the CC loop cadence),
    * which doubles as early termination when the frontier drains.
    * Output: (node, h_sum, n_reached) for every node reached by ≥ 1
    * landmark (BFS source rows at d=0 count as reached, contribute 0).
    */
  def harmonicCentrality(edges: DataFrame, landmarks: Int = 16,
      maxHops: Int = 6, srcCol: String = "src", dstCol: String = "dst",
      salt: String = "hc"): DataFrame = {
    require(landmarks >= 1, s"harmonicCentrality: need >= 1 landmark")
    require(maxHops >= 1 && maxHops <= 12,
      s"harmonicCentrality: maxHops must be in [1, 12], got $maxHops")
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // deterministic landmark set: L smallest (hash, node)
    val lms = nodes
      .orderBy(Sampling.keyHash32(col("node"), salt), col("node"))
      .limit(landmarks)
      .select(col("node").as("lm")).persist(lvl)
    // renamed-column join frame sidesteps self-join ambiguity (each hop's
    // frontier descends from the same persisted edge frame)
    // SIZE-ADAPTIVE (the connectedComponents pattern): a small graph's
    // hop loop is pure driver-action cadence (<= maxHops persist+count
    // rounds), so under the edge threshold the (lm, node, d) distance
    // table comes from a driver-side multi-source BFS instead — EXACT
    // integer rows fed to the IDENTICAL aggregation below, so the
    // snapped decimal h_sum arithmetic never leaves Spark and outputs
    // are unchanged. Above threshold: the distributed hop loop.
    val spark = edges.sparkSession
    val hopsHeld = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val eCount = e.count()
    val dist: DataFrame =
      if (eCount <= localGraphThreshold(spark)) {
        // the threshold bounds DRIVER state at O(edges) — the adjacency.
        // The distance table is O(landmarks × reached-nodes), up to 16×
        // larger, so it must never materialize on the driver: broadcast
        // the adjacency once and run each landmark's BFS in an EXECUTOR
        // task (landmarks are few; one task each), so rows are born
        // distributed and flow straight into the aggregation below.
        val adjB = spark.sparkContext.broadcast(collectAdjacency(e))
        val lmsL = lms.collect().map(_.get(0)).toSeq
        import org.apache.spark.sql.types._
        val nodeT = e.schema.fields(0).dataType
        val rdd = spark.sparkContext
          .parallelize(lmsL, math.max(1, lmsL.size))
          .flatMap { lm =>
            localBfs(adjB.value, Seq(lm), maxHops).iterator
              .map { case (n, d) => org.apache.spark.sql.Row(lm, n, d.toInt) }
          }
        spark.createDataFrame(rdd,
          StructType(Seq(StructField("lm", nodeT), StructField("node", nodeT),
            StructField("d", IntegerType))))
      } else {
        val eK = e.select(col("src").as("__fn"), col("dst").as("__to"))
        val base = lms.select(col("lm"), col("lm").as("node"), lit(0).as("d"))
          .persist(lvl)
        base.count()
        hopsHeld += base
        var distAcc = base
        var frontier: DataFrame = base.select(col("lm"), col("node"))
        var hop = 1
        var drained = false
        while (hop <= maxHops && !drained) {
          val next = frontier.select(col("lm"), col("node").as("__fn"))
            .join(eK, Seq("__fn"))
            .select(col("lm"), col("__to").as("node")).distinct()
            .join(distAcc.select(col("lm"), col("node")), Seq("lm", "node"),
              "left_anti")
            .select(col("lm"), col("node"), lit(hop).as("d"))
            .persist(lvl)
          drained = next.count() == 0 // forces the hop's cache; early stop
          hopsHeld += next
          distAcc = distAcc.unionByName(next) // union of CACHED frames: shallow
          frontier = next.select(col("lm"), col("node"))
          hop += 1
        }
        distAcc
      }
    val out = dist
      .groupBy(col("node"))
      .agg(
        TextAnalysis.round6(
          sum(when(col("d") >= 1,
            TextAnalysis.round6(lit(1.0) / col("d"))).otherwise(lit(0.0))
            .cast("decimal(28,6)")).cast("double")).as("h_sum"),
        sum(when(col("d") >= 1, 1L).otherwise(0L)).as("n_reached"))
    CacheScope.releaseAfterFirstUse(out, Seq(e, lms) ++ hopsHeld.toSeq)
  }

  /** Conf-gated edge threshold shared by the size-adaptive graph ops
    * (the [[Dedup.connectedComponents]] cutover, same rationale): below
    * it, BFS frontiers run on the driver over a collected adjacency —
    * the bound is CHECKED against an exact count, never guessed.
    */
  private def localGraphThreshold(spark: SparkSession): Long =
    spark.conf.get("graft.graph.localEdgeThreshold", "1000000").toLong

  /** Driver-side adjacency from a SMALL distinct edge frame (caller has
    * count-verified the bound).
    */
  private def collectAdjacency(
      e: DataFrame): java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[Any]] = {
    val adj = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[Any]]()
    e.collect().foreach { r =>
      val (s, d) = (r.get(0), r.get(1))
      var lst = adj.get(s)
      if (lst == null) { lst = scala.collection.mutable.ArrayBuffer.empty[Any]; adj.put(s, lst) }
      lst += d
    }
    adj
  }

  /** Multi-source driver BFS along edge direction: min hop distance per
    * reached node (sources at 0), capped at `maxHops` — the same rows
    * the distributed frontier loop settles, exactly.
    */
  private def localBfs(
      adj: java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[Any]],
      sources: Seq[Any], maxHops: Int): Seq[(Any, Long)] = {
    val dist = new java.util.HashMap[Any, Long]()
    var frontier = sources.distinct
    frontier.foreach(s => dist.put(s, 0L))
    var hop = 1L
    while (hop <= maxHops && frontier.nonEmpty) {
      val next = scala.collection.mutable.ArrayBuffer.empty[Any]
      frontier.foreach { n =>
        val lst = adj.get(n)
        if (lst != null) lst.foreach { m =>
          if (!dist.containsKey(m)) { dist.put(m, hop); next += m }
        }
      }
      frontier = next.toSeq
      hop += 1
    }
    import scala.jdk.CollectionConverters._
    dist.entrySet().asScala.iterator.map(e0 => (e0.getKey, e0.getValue)).toSeq
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the directional
    * complement to [[pageRank]]: a good HUB links to good authorities, a
    * good AUTHORITY is linked from good hubs (catalog/aggregator pages vs
    * canonical sources — PageRank's single score cannot separate the two
    * roles). Fixed iteration count, deterministic fixed-point trace (the
    * [[pageRank]]/q155 discipline):
    *
    *   a'_i+1(v) = Σ_{u→v} h_i(u)        (exact DECIMAL sum of snapped h)
    *   a_i+1     = round6(a' / ||a'||)   (L2 norm: snapped a'² terms →
    *                                      exact LONG sum → one IEEE sqrt)
    *   h'_i+1(u) = Σ_{u→v} a_i+1(v)      (with the JUST-normalized a)
    *   h_i+1     = round6(h' / ||h'||)
    *
    * so every stored score lives on the 1e-6 grid and a SQL oracle
    * unrolling the same rounds reproduces it bit-for-bit. Per iteration:
    * two keyed join+sum pairs and two 1-row norm broadcasts — no window,
    * no driver collect; duplicate edges collapse first. Nodes with no
    * in-edges hold authority 0; no out-edges, hub 0. Output:
    * (node, hub, auth).
    */
  def hits(edges: DataFrame, iters: Int = 2,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1 && iters <= 20, s"hits: iters must be in [1, 20], got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // LOCAL CUTOVER — see [[pageRank]]. The q254 co-citation graph is 18
    // nodes; two distributed HITS rounds cost ~55 scheduler jobs and ~3 s
    // of cadence for arithmetic the driver does in microseconds.
    val spark0 = edges.sparkSession
    val idT = e.schema.fields(0).dataType
    if (e.count() <= GraphLocal.threshold(spark0) &&
        idT == e.schema.fields(1).dataType && GraphLocal.idsSupported(idT) &&
        e.filter(col("src").isNull || col("dst").isNull).isEmpty) {
      val rows = e.collect().map(r => (r.get(0), r.get(1)))
      e.unpersist(blocking = false)
      return GraphLocal.hits(spark0, rows, iters, idT)
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    def snap(c: org.apache.spark.sql.Column) = TextAnalysis.round6(c)
    // raw score -> L2-normalized snapped score; the norm is a 1-row frame
    // (snapped squared terms summed exactly, one sqrt), broadcast back
    def normalized(raw: DataFrame, rawCol: String, outCol: String): DataFrame = {
      val nrm = raw.agg(
        sqrt(sum(floor(col(rawCol) * col(rawCol) * 1e6 + 0.5).cast("long"))
          .cast("double") / 1e6).as("__nrm"))
      raw.crossJoin(broadcast(nrm))
        .select(col("node"),
          when(col("__nrm") > 0, snap(col(rawCol) / col("__nrm")))
            .otherwise(lit(0.0)).as(outCol))
    }
    // renamed-column join frames sidestep self-join attribute ambiguity
    // (scores derive from the SAME persisted edge frame each round)
    val bySrc = e.select(col("src").as("__k"), col("dst").as("__t"))
    val byDst = e.select(col("dst").as("__k"), col("src").as("__t"))
    def spread(scores: DataFrame, scoreCol: String, edgesK: DataFrame): DataFrame =
      nodes.join(
        scores.select(col("node").as("__k"), col(scoreCol).as("__x"))
          .join(edgesK, Seq("__k"))
          .groupBy(col("__t").as("node"))
          .agg(sum(col("__x").cast("decimal(28,6)")).cast("double").as("__s")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("__s"), lit(0.0)).as("__raw"))
    var h = nodes.select(col("node"), lit(1.0).as("hub"))
    var a = nodes.select(col("node"), lit(1.0).as("auth"))
    // LAZY localCheckpoint per half-round. The unbroken lazy chain is
    // marginally faster warm-isolated (2.6 s vs 3.1 s on the q254
    // graph), but its duplicated-subplan fan-out (each half-round
    // references the previous one twice: norm agg + select) makes the
    // ANALYZER walk up to 4^iters subplan copies — measured at 10-40 s
    // for the same query inside a long bench suite (codegen-cache churn,
    // old-gen pressure). localCheckpoint(eager = false) truncates the
    // LOGICAL plan to a leaf, so analysis is O(1) per reference while
    // the single final action still materializes each half-round exactly
    // once — unlike persist, which bounds execution but leaves the full
    // lineage for the analyzer (measured 8-9 s warm). Production HITS
    // runs inside exactly the kind of long-lived JVM the suite simulates.
    for (_ <- 0 until iters) {
      a = normalized(spread(h, "hub", bySrc), "__raw", "auth")
        .localCheckpoint(false)
      h = normalized(spread(a, "auth", byDst), "__raw", "hub")
        .localCheckpoint(false)
    }
    val out = h.join(a, Seq("node"))
      .select(col("node"), col("hub"), col("auth"))
    CacheScope.releaseAfterFirstUse(out, Seq(e, nodes))
  }

  /** Newman MODULARITY of a given community assignment — the "is this
    * partition actually community-like?" audit for whatever produced it
    * ([[labelPropagation]], an external clustering, a domain grouping):
    * Q = Σ_c [ m_c/m − (D_c/2m)² ] over communities c, where m is the
    * undirected edge count, m_c the edges with BOTH endpoints in c and
    * D_c the total degree mass of c's nodes (Newman & Girvan 2004). Q > 0
    * means denser-than-chance communities; Q ≈ 0 means the labels are
    * noise — the go/no-go gate before a community column drives sampling
    * or dedup decisions.
    *
    * Engine-exact: edges are canonicalized (a < b, self-loops dropped,
    * duplicates collapsed), so m, m_c, D_c are exact integers; each
    * community's contribution is the integer combination
    * (4·m·m_c − D_c²) / (4m²) with ONE double division, snapped. The
    * total is the exact DECIMAL sum of the integer numerators divided
    * once — order-independent.
    *
    * Scale shape: two keyed joins (each edge endpoint → its community)
    * plus keyed aggregations; nothing is per-node quadratic and no
    * corpus-wide window appears. Nodes missing from `assign` form an
    * implicit `null` community (flagged in the output so silent coverage
    * gaps are visible rather than folded into Q).
    *
    * Output: one row per community, ordered columns
    * (community, n_nodes, m_in, deg_sum, contribution) — `n_nodes`
    * counting only nodes that appear in the graph — plus the scalar
    * total via [[modularityTotal]].
    */
  def modularity(edges: DataFrame, assign: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", commCol: String = "community"): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val asg = assign.select(col(nodeCol).as("__node"), col(commCol).as("community"))
    // degree over the symmetric view of the canonical edge set
    val deg = e.select(col("a").as("__node"))
      .unionAll(e.select(col("b").as("__node")))
      .groupBy(col("__node")).agg(count(lit(1)).as("__deg"))
    val degC = deg.join(asg, Seq("__node"), "left")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("__deg")).as("deg_sum"))
    val mIn = e
      .join(asg.select(col("__node").as("a"), col("community").as("__ca")), Seq("a"), "left")
      .join(asg.select(col("__node").as("b"), col("community").as("__cb")), Seq("b"), "left")
      .filter(col("__ca").isNotNull && col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("m_in"))
    // m stays a broadcast 1-row frame — no driver action
    val mRow = e.agg(count(lit(1)).as("__m"))
    val out = degC.join(mIn, Seq("community"), "left")
      .crossJoin(broadcast(mRow))
      .select(col("community"), col("n_nodes"),
        coalesce(col("m_in"), lit(0L)).as("m_in"), col("deg_sum"),
        TextAnalysis.round6(
          (lit(4L) * col("__m") * coalesce(col("m_in"), lit(0L)) -
            col("deg_sum") * col("deg_sum")).cast("double") /
            (lit(4.0) * col("__m") * col("__m"))).as("contribution"))
    CacheScope.releaseAfterFirstUse(out, Seq(e))
  }

  /** Scalar modularity Q: exact DECIMAL sum of the per-community integer
    * numerators (4·m·m_c − D_c²), ONE double division, snapped — so the
    * total does not accumulate per-community rounding.
    * Output: one row (modularity, m, n_communities).
    */
  def modularityTotal(edges: DataFrame, assign: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", commCol: String = "community"): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val asg = assign.select(col(nodeCol).as("__node"), col(commCol).as("community"))
    val deg = e.select(col("a").as("__node"))
      .unionAll(e.select(col("b").as("__node")))
      .groupBy(col("__node")).agg(count(lit(1)).as("__deg"))
    val degC = deg.join(asg, Seq("__node"), "left")
      .groupBy(col("community")).agg(sum(col("__deg")).as("deg_sum"))
    val mIn = e
      .join(asg.select(col("__node").as("a"), col("community").as("__ca")), Seq("a"), "left")
      .join(asg.select(col("__node").as("b"), col("community").as("__cb")), Seq("b"), "left")
      .filter(col("__ca").isNotNull && col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community")).agg(count(lit(1)).as("m_in"))
    val mRow = e.agg(count(lit(1)).as("__m"))
    val out = degC.join(mIn, Seq("community"), "left")
      .crossJoin(broadcast(mRow))
      .agg(
        sum((lit(4L) * col("__m") * coalesce(col("m_in"), lit(0L)) -
          col("deg_sum") * col("deg_sum")).cast("decimal(38,0)")).as("__num"),
        first(col("__m")).as("m"),
        count(lit(1)).as("n_communities"))
      .select(
        when(col("m") > 0, TextAnalysis.round6(
          col("__num").cast("double") / (lit(4.0) * col("m") * col("m"))))
          .as("modularity"),
        col("m"), col("n_communities"))
    CacheScope.releaseAfterFirstUse(out, Seq(e))
  }

  /** ADAMIC-ADAR link prediction (Adamic & Adar 2003) — score every
    * non-adjacent pair that shares at least one neighbor by
    * Σ_z 1/ln(deg z) over the common neighbors z: the classic
    * "which edge is missing?" signal for graph densification, related-
    * domain suggestion, and entity-graph completion, weighting rare
    * shared neighbors above hubs (everything links the big hub — sharing
    * it says nothing).
    *
    * Scale shape: candidate pairs come from ONE wedge self-join keyed by
    * the shared center z, so the work is Σ_z deg(z)² — quadratic in HUB
    * degree, not in graph size. `maxDegree` drops hubs AS WEDGE CENTERS
    * before the join (their 1/ln(deg) weight is the smallest anyway),
    * bounding the fan-out at maxDegree·|E|; hub-adjacent pairs can still
    * surface through their other, informative common neighbors. This is
    * the standard production trade (same cap family as
    * [[Dedup.lshCandidatePairs]]'s hot-bucket cap) and is the documented
    * recall contract, not a silent truncation. Per-center weights are
    * snapped to the 1e-6 grid and summed as exact DECIMAL —
    * order-independent, engine-reproducible. Existing edges are removed
    * with one anti-join on the canonical (a < b) key.
    *
    * Output: (a, b, common_neighbors, adamic_adar), a < b.
    */
  def adamicAdar(edges: DataFrame, maxDegree: Int = 64,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxDegree >= 2, s"adamicAdar: maxDegree must be >= 2, got $maxDegree")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sym = e.select(col("a").as("z"), col("b").as("n"))
      .unionAll(e.select(col("b").as("z"), col("a").as("n")))
    val deg = sym.groupBy(col("z")).agg(count(lit(1)).as("__deg"))
    // a center needs deg >= 2 to form a wedge, so ln(deg) > 0 always
    val centers = sym.join(
      deg.filter(col("__deg") >= 2 && col("__deg") <= maxDegree), Seq("z"))
      .withColumn("__w", TextAnalysis.round6(lit(1.0) / log(col("__deg"))))
    val wedges = centers.select(col("z"), col("n").as("x"), col("__w"))
      .join(centers.select(col("z"), col("n").as("y")), Seq("z"))
      .filter(col("x") < col("y"))
    val scored = wedges.groupBy(col("x").as("a"), col("y").as("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("__w").cast("decimal(38,6)")).cast("double").as("adamic_adar"))
    val out = scored.join(e, Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("common_neighbors"), col("adamic_adar"))
    CacheScope.releaseAfterFirstUse(out, Seq(e))
  }

  /** Multi-source BFS hop distances over a DIRECTED edge table — the
    * link-proximity primitive (crawl frontier depth, seed-set distance
    * tiers, TrustRank's hop-bounded neighborhoods): every node reachable
    * from the source set within `maxDepth` hops gets its SHORTEST hop
    * count (sources themselves at 0, multi-source = min over sources).
    * Unreachable (or beyond-depth) nodes are absent, not NULL — the
    * caller left-joins if it wants the full node set. For an undirected
    * walk, pass the symmetrized edge table.
    *
    * Iteration shape (the [[Dedup.connectedComponents]] discipline):
    * edges localCheckpoint once (flat leaf — the analyzer never re-walks
    * the caller's upstream), each round is ONE keyed frontier⋈edges join
    * plus one anti-join against the settled set, both frames re-truncated
    * per round so the plan stays O(1) deep; AQE is scoped off inside the
    * loop (tiny fixed-size shuffles, re-planning is pure driver tax). The
    * frontier SHRINKS monotonically on expander-ish graphs; settled rows
    * accumulate but only ever join by key. Convergence = empty frontier,
    * detected on the same action that materializes the round.
    */
  def bfsDistances(edges: DataFrame, sources: DataFrame, maxDepth: Int = 20,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node"): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 200,
      s"bfsDistances: maxDepth must be in [1, 200], got $maxDepth")
    val spark0 = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    // size-adaptive: under the edge threshold (exact count of the
    // checkpointed frame) the frontier loop's per-hop checkpoint+count
    // cadence costs more than the whole BFS — settle distances on the
    // driver instead; identical integer rows by construction
    val eCount = e.count()
    if (eCount <= localGraphThreshold(spark0)) {
      val adj = collectAdjacency(e)
      val srcsDf = sources.select(col(nodeCol).as("node")).distinct()
      val nodeT = srcsDf.schema.fields(0).dataType
      val rows = localBfs(adj, srcsDf.collect().map(_.get(0)).toSeq, maxDepth)
        .map { case (n, d) => org.apache.spark.sql.Row(n, d) }
      import org.apache.spark.sql.types._
      return spark0.createDataFrame(
        spark0.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("node", nodeT),
          StructField("dist", LongType))))
    }
    // LOOP-SCOPED SESSION ([[LoopSession]]): AQE off + loop shuffles
    // sized to the edge count (a small graph at the session partition
    // count pays per-round stage scheduling, not shuffle work — the
    // connectedComponents round-11 finding; e is checkpointed, so the
    // count was a cached-leaf scan) — on a CLONED session, so concurrent
    // queries on the caller's session keep the caller's conf.
    val loopSpark = LoopSession.enter(spark0)
    LoopSession.sizeShuffles(loopSpark, spark0, eCount)
    val eL = LoopSession.rebind(e, loopSpark)
    var settled = LoopSession.rebind(
      sources.select(col(nodeCol).as("node")).distinct()
        .select(col("node"), lit(0L).as("dist")), loopSpark)
      .localCheckpoint(true)
    var frontier = settled
    var depth = 1L
    var done = false
    while (!done && depth <= maxDepth) {
      val next = frontier.join(eL, frontier("node") === eL("src"))
        .select(col("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .select(col("node"), lit(depth).as("dist"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        settled = settled.unionAll(next).localCheckpoint(true)
        frontier = next
        depth += 1
      }
    }
    // rebound: the caller's consuming action plans under its own session
    LoopSession.rebind(settled, spark0)
  }
}
