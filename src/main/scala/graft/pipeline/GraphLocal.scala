package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-side evaluators for the snapped graph fixed points — the
  * [[Dedup.connectedComponentsLocal]] cutover generalized to the
  * PageRank/HITS/LPA family.
  *
  * Why: each distributed iteration of these operators is a handful of
  * keyed joins plus 1-row norm/size broadcast subqueries; on a SMALL graph
  * (the co-citation / vocabulary graphs the gates exercise are tens of
  * nodes) the wall time is pure scheduling cadence — measured ~55 jobs and
  * ~3 s for two HITS rounds on an 18-node graph whose arithmetic is
  * microseconds. Below an edge-count threshold the operators collect the
  * (validated, bounded) edge list and run the SAME fixed point on the
  * driver, exactly like the CC cutover.
  *
  * Bit-exactness contract (the reason this file is longer than the math):
  * every stored score lives on the 1e-6 grid, and each iteration's float
  * tail replicates the Column expressions operation by operation —
  *  - `round6(x)` = floor(x·1e6 + 0.5) / 1e6 in IEEE doubles;
  *  - `cast(x as decimal(28,6))` = java BigDecimal(x).setScale(6,
  *    HALF_UP), an exact micro-unit long; decimal SUMs are long sums
  *    (order-free, so driver iteration order cannot matter);
  *  - `cast(dec as double)` = BigDecimal(micro, 6).doubleValue;
  *  - update expressions keep the distributed form's association order.
  * GraphOpsSpec pins local == distributed on randomized graphs; the gate
  * oracles pin both against DuckDB.
  *
  * The cutover is a PURE OPTIMIZATION: unsupported id types or null ids
  * fall through to the distributed loop (same stance as the CC local
  * path). Threshold: `graft.graph.localEdgeThreshold` (default 1M edges).
  */
private[pipeline] object GraphLocal {

  def threshold(spark: SparkSession): Long =
    spark.conf.get("graft.graph.localEdgeThreshold", "1000000").toLong

  /** Can ids of this type take the local path (hash/equality is enough
    * for the rank family; LPA ties additionally need [[Dedup.localIdOrdering]],
    * which supports exactly the same types).
    */
  def idsSupported(t: DataType): Boolean = Dedup.localIdOrdering(t).isDefined

  /** floor(x*1e6 + 0.5)/1e6 — [[TextAnalysis.round6]]'s exact semantics. */
  private def snap(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Micro-units of `cast(x as decimal(28,6))` (HALF_UP, like Spark). */
  private def micro6(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** `cast(decimal(28,6) as double)` of a micro-unit sum. */
  private def microToDouble(m: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(m), 6).doubleValue()

  private def toDF(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame = {
    val slices = math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions, rows.size / 100000 + 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, slices), schema)
  }

  /** PageRank over collected (src, dst, outDegree) edge rows.
    * pr_0 = round6(1/N); pr_{i+1}(v) = round6((1-d)/N + d·Σ_{u→v}
    * round6(pr_i(u)/out(u))) with the Σ an exact decimal sum.
    */
  def pageRank(spark: SparkSession, edges: Array[(Any, Any, Long)],
      iters: Int, damping: Double, nodeType: DataType): DataFrame = {
    val nodes = new java.util.LinkedHashSet[Any]()
    edges.foreach { case (u, v, _) => nodes.add(u); nodes.add(v) }
    val n = nodes.size.toLong
    val pr = new java.util.HashMap[Any, Double]()
    val it0 = nodes.iterator()
    while (it0.hasNext) pr.put(it0.next(), snap(1.0 / n.toDouble))
    for (_ <- 0 until iters) {
      val sums = new java.util.HashMap[Any, Array[Long]]()
      edges.foreach { case (u, v, out) =>
        val c = micro6(snap(pr.get(u) / out.toDouble))
        val e = sums.get(v)
        if (e == null) sums.put(v, Array(c)) else e(0) += c
      }
      val it = nodes.iterator()
      while (it.hasNext) {
        val v = it.next()
        val s = sums.get(v)
        val sd = if (s == null) 0.0 else microToDouble(s(0))
        pr.put(v, snap(((1.0 - damping) / n.toDouble) + damping * sd))
      }
    }
    import scala.jdk.CollectionConverters._
    toDF(spark, nodes.asScala.toSeq.map(v => Row(v, pr.get(v))),
      StructType(Seq(StructField("node", nodeType), StructField("pr", DoubleType))))
  }

  /** Personalized PageRank over collected (src, dst, outDegree) edges and
    * a seed set: t(v) = round6(1/|S|) on seeds else 0; pr_0 = t;
    * pr_{i+1}(v) = round6((1-d)·t(v) + d·Σ round6(pr_i(u)/out(u))).
    */
  def personalizedPageRank(spark: SparkSession, edges: Array[(Any, Any, Long)],
      seeds: Array[Any], iters: Int, damping: Double,
      nodeType: DataType): DataFrame = {
    val nodes = new java.util.LinkedHashSet[Any]()
    edges.foreach { case (u, v, _) => nodes.add(u); nodes.add(v) }
    seeds.foreach(nodes.add)
    val seedSet = new java.util.HashSet[Any]()
    seeds.foreach(seedSet.add)
    val nS = seedSet.size.toLong
    val t = new java.util.HashMap[Any, Double]()
    val pr = new java.util.HashMap[Any, Double]()
    val it0 = nodes.iterator()
    while (it0.hasNext) {
      val v = it0.next()
      val tv = if (seedSet.contains(v)) snap(1.0 / nS.toDouble) else 0.0
      t.put(v, tv); pr.put(v, tv)
    }
    for (_ <- 0 until iters) {
      val sums = new java.util.HashMap[Any, Array[Long]]()
      edges.foreach { case (u, v, out) =>
        val c = micro6(snap(pr.get(u) / out.toDouble))
        val e = sums.get(v)
        if (e == null) sums.put(v, Array(c)) else e(0) += c
      }
      val it = nodes.iterator()
      while (it.hasNext) {
        val v = it.next()
        val s = sums.get(v)
        val sd = if (s == null) 0.0 else microToDouble(s(0))
        pr.put(v, snap((1.0 - damping) * t.get(v) + damping * sd))
      }
    }
    import scala.jdk.CollectionConverters._
    toDF(spark, nodes.asScala.toSeq.map(v => Row(v, pr.get(v))),
      StructType(Seq(StructField("node", nodeType), StructField("pr", DoubleType))))
  }

  /** Weighted PageRank over collected (src, dst, share) edges — the share
    * is precomputed upstream exactly as the distributed form does.
    * pr_{i+1}(v) = round6((1-d)/N + d·Σ round6(pr_i(u)·share(u,v))).
    */
  def weightedPageRank(spark: SparkSession, edges: Array[(Any, Any, Double)],
      iters: Int, damping: Double, nodeType: DataType): DataFrame = {
    val nodes = new java.util.LinkedHashSet[Any]()
    edges.foreach { case (u, v, _) => nodes.add(u); nodes.add(v) }
    val n = nodes.size.toLong
    val pr = new java.util.HashMap[Any, Double]()
    val it0 = nodes.iterator()
    while (it0.hasNext) pr.put(it0.next(), snap(1.0 / n.toDouble))
    for (_ <- 0 until iters) {
      val sums = new java.util.HashMap[Any, Array[Long]]()
      edges.foreach { case (u, v, share) =>
        val c = micro6(snap(pr.get(u) * share))
        val e = sums.get(v)
        if (e == null) sums.put(v, Array(c)) else e(0) += c
      }
      val it = nodes.iterator()
      while (it.hasNext) {
        val v = it.next()
        val s = sums.get(v)
        val sd = if (s == null) 0.0 else microToDouble(s(0))
        pr.put(v, snap(((1.0 - damping) / n.toDouble) + damping * sd))
      }
    }
    import scala.jdk.CollectionConverters._
    toDF(spark, nodes.asScala.toSeq.map(v => Row(v, pr.get(v))),
      StructType(Seq(StructField("node", nodeType), StructField("pr", DoubleType))))
  }

  /** HITS over collected (src, dst) edges: per half-round an exact
    * decimal spread sum, then the snapped L2 normalization — norm² is the
    * exact LONG sum of floor(raw²·1e6 + 0.5), norm one IEEE sqrt of
    * (sum/1e6), scores round6(raw/norm) (0 when the norm is 0).
    */
  def hits(spark: SparkSession, edges: Array[(Any, Any)], iters: Int,
      nodeType: DataType): DataFrame = {
    val nodes = new java.util.LinkedHashSet[Any]()
    edges.foreach { case (u, v) => nodes.add(u); nodes.add(v) }
    import scala.jdk.CollectionConverters._
    val nodeSeq = nodes.asScala.toSeq
    var h = new java.util.HashMap[Any, Double]()
    var a = new java.util.HashMap[Any, Double]()
    nodeSeq.foreach { v => h.put(v, 1.0); a.put(v, 1.0) }
    // spread scores along (from, to) pairs, then L2-normalize snapped
    def halfRound(scores: java.util.HashMap[Any, Double],
        along: Array[(Any, Any)]): java.util.HashMap[Any, Double] = {
      val sums = new java.util.HashMap[Any, Array[Long]]()
      along.foreach { case (u, v) =>
        val c = micro6(scores.get(u))
        val e = sums.get(v)
        if (e == null) sums.put(v, Array(c)) else e(0) += c
      }
      val raw = new java.util.HashMap[Any, Double]()
      var normMicroSq = 0L
      nodeSeq.foreach { v =>
        val s = sums.get(v)
        val r = if (s == null) 0.0 else microToDouble(s(0))
        raw.put(v, r)
        normMicroSq += math.floor(r * r * 1e6 + 0.5).toLong
      }
      val nrm = math.sqrt(normMicroSq.toDouble / 1e6)
      val out = new java.util.HashMap[Any, Double]()
      nodeSeq.foreach { v =>
        val r = raw.get(v)
        out.put(v, if (nrm > 0) snap(r / nrm) else 0.0)
      }
      out
    }
    val fwd = edges
    val rev = edges.map { case (u, v) => (v, u): (Any, Any) }
    for (_ <- 0 until iters) {
      a = halfRound(h, fwd) // authority from hubs along u→v
      h = halfRound(a, rev) // hubs from the just-normalized authorities
    }
    toDF(spark, nodeSeq.map(v => Row(v, h.get(v), a.get(v))),
      StructType(Seq(StructField("node", nodeType),
        StructField("hub", DoubleType), StructField("auth", DoubleType))))
  }

  /** Synchronous min-tie label propagation over collected (src, dst)
    * edges (already symmetrized/distinct upstream when undirected):
    * each round a node takes its in-neighbors' most frequent label, ties
    * to the MINIMUM label under Spark's own type ordering (UTF-8 bytes
    * for strings); a node with no in-edges RESETS to its own id — the
    * distributed form's coalesce(label, node) semantics.
    */
  def labelPropagation(spark: SparkSession, edges: Array[(Any, Any)],
      iters: Int, nodeType: DataType): DataFrame = {
    val ord = Dedup.localIdOrdering(nodeType).get
    val nodes = new java.util.LinkedHashSet[Any]()
    edges.foreach { case (u, v) => nodes.add(u); nodes.add(v) }
    import scala.jdk.CollectionConverters._
    val nodeSeq = nodes.asScala.toSeq
    var labels = new java.util.HashMap[Any, Any]()
    nodeSeq.foreach(v => labels.put(v, v))
    for (_ <- 0 until iters) {
      // per node: label -> count over in-neighbors
      val counts = new java.util.HashMap[Any, java.util.HashMap[Any, Array[Long]]]()
      edges.foreach { case (u, v) =>
        val l = labels.get(u)
        var m = counts.get(v)
        if (m == null) { m = new java.util.HashMap(); counts.put(v, m) }
        val e = m.get(l)
        if (e == null) m.put(l, Array(1L)) else e(0) += 1
      }
      val next = new java.util.HashMap[Any, Any]()
      nodeSeq.foreach { v =>
        val m = counts.get(v)
        if (m == null) next.put(v, v) // coalesce(label, node)
        else {
          var bestL: Any = null
          var bestC = -1L
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue()(0)
            if (c > bestC || (c == bestC && ord.lt(e.getKey, bestL)))
              { bestL = e.getKey; bestC = c }
          }
          next.put(v, bestL)
        }
      }
      labels = next
    }
    toDF(spark, nodeSeq.map(v => Row(v, labels.get(v))),
      StructType(Seq(StructField("node", nodeType), StructField("label", nodeType))))
  }
}
