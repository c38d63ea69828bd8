package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The IVF-PQ ANN index AT REST: [[Similarity.ivfPqSearch]] recomputes cell
  * assignments and PQ codes per query batch; a real 100 TB deployment
  * builds them ONCE and stores the index so query cost is independent of
  * the raw corpus. The layout is deliberately plain Spark:
  *
  *   - one parquet dataset of (vec_id, sub, code_id), PARTITIONED BY
  *     centroid_id — each inverted list is a partition directory, so a
  *     query that probes `nprobe` cells reads only those directories
  *     (Spark's dynamic partition pruning fires on the cell equi-join:
  *     partition-column join key + broadcastable probe side);
  *   - centroids and codebooks ride along as small side tables (they are
  *     the model — k x dims and m x k x subDim doubles).
  *
  * Search then never touches a raw corpus vector: candidates stream out of
  * the probed partitions as m-code rows and are scored through the inline
  * ADC arithmetic of [[Similarity.pqSearch]] against the broadcast query
  * subvectors + codebook (6-decimal-rounded subspace distances, exact
  * DECIMAL sums, id-ascending ties) — so at-rest results match the
  * recompute path bit-for-bit.
  */
object VectorIndex {

  /** The index rows: every corpus vector's cell assignment joined with its
    * m PQ codes — (vec_id, centroid_id, sub, code_id). One ivfAssign pass
    * (broadcast centroids) + one pqEncode pass (broadcast codebooks) and a
    * single id-keyed equi-join.
    */
  def buildIndex(corpus: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      m: Int, subDim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val cells = Similarity.ivfAssign(corpus, centroids, idCol, vecCol, centroidIdCol)
      .select(col(idCol), col(centroidIdCol))
    val codes = Similarity.pqEncode(corpus, codebooks, m, subDim, idCol, vecCol)
      .select(col(idCol), col("sub"), col("code_id"))
    cells.join(codes, Seq(idCol))
      .select(col(idCol), col(centroidIdCol), col("sub"), col("code_id"))
  }

  /** Persist the index partitioned by cell: one directory per inverted
    * list. Overwrite semantics (rebuilds replace the index atomically at
    * the path level).
    */
  def writeIndex(corpus: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      m: Int, subDim: Int, path: String, idCol: String = "vec_id",
      vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): Unit =
    buildIndex(corpus, centroids, codebooks, m, subDim, idCol, vecCol, centroidIdCol)
      // cluster by the partition column before the dynamic-partition write:
      // without it every task holds rows of every cell and opens one file
      // per (task, cell) — tasks x cells tiny files (3,200 for the 32x100
      // q214 fixture; measured ~27 s of task time mostly opening/closing
      // writers). After the repartition each cell is written by exactly one
      // task: ~one file per cell, file count independent of the task count.
      // A pathologically hot cell writes from one task — at that point use
      // a REBALANCE hint (AQE splits skewed write partitions) instead.
      .repartition(col(centroidIdCol))
      .write.mode("overwrite").partitionBy(centroidIdCol).parquet(path)

  /** INCREMENTAL index maintenance: encode a NEW batch of vectors with the
    * SAME frozen model (centroids + codebooks) and append its rows to the
    * partitioned layout — dynamic-partition parquet append, touching only
    * the directories the batch lands in. Because cell assignment and PQ
    * codes depend only on the model, `write(old) + append(new)` is
    * row-identical to `write(old ∪ new)` — search results after an append
    * match a full rebuild bit-for-bit (the q180 gate pins this against the
    * full-build oracle). This is how a production vector index absorbs a
    * daily embedding batch without re-encoding the corpus; re-TRAINING the
    * model (centroid drift) is a rebuild, by design.
    */
  def appendToIndex(newVectors: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, m: Int, subDim: Int, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): Unit =
    buildIndex(newVectors, centroids, codebooks, m, subDim, idCol, vecCol, centroidIdCol)
      .repartition(col(centroidIdCol)) // one task per cell — see writeIndex
      .write.mode("append").partitionBy(centroidIdCol).parquet(path)

  /** Read the at-rest index back. The partition column comes back typed by
    * directory-name inference (int); it is cast back to long so the probe
    * join key matches the centroid table exactly.
    */
  def readIndex(spark: SparkSession, path: String,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val df = spark.read.parquet(path)
    df.withColumn(centroidIdCol, col(centroidIdCol).cast("long"))
  }

  /** ANN search against the stored index: nprobe nearest cells per query
    * (tiny broadcast-centroid argsort), ONE equi-join of the probe list
    * against the partitioned index on the PARTITION column — only the
    * probed directories are scanned — then inline ADC scoring against the
    * broadcast query subvectors + codebook and a per-query top-k.
    * Identical semantics (and oracle) to [[Similarity.ivfPqSearch]].
    */
  def searchIndex(index: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      queries: DataFrame, k: Int, m: Int, subDim: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val cent = centroids.select(col(centroidIdCol),
      col(vecCol).cast("array<double>").as("__c"))
    val qDist2 = Similarity.dist2Fold(col("__qv"), col("__c"))
    val probes = queries
      .select(col(queryIdCol), col(vecCol).cast("array<double>").as("__qv"))
      .crossJoin(broadcast(cent))
      .filter(Similarity.sameWidth(col("__qv"), col("__c"), "searchIndex"))
      .withColumn("__d", qDist2)
      .groupBy(col(queryIdCol))
      .agg(slice(array_sort(collect_list(struct(col("__d"), col(centroidIdCol)))),
        1, nprobe).as("__cells"))
      .select(col(queryIdCol), explode(col("__cells")).as("__cell"))
      .select(col(queryIdCol), col(s"__cell.$centroidIdCol").as(centroidIdCol))
    val slices = transform(sequence(lit(0), lit(m - 1)),
      s => slice(col(vecCol).cast("array<double>"), s * subDim + 1, lit(subDim)))
    val qsub = queries.select(col(queryIdCol), posexplode(slices).as(Seq("sub", "__qv")))
    val cb = codebooks.select(col("sub"), col("code_id"),
      col("subvec").cast("array<double>").as("__cv"))
    val dist2 = Similarity.dist2Fold(col("__qv"), col("__cv"))
    // INLINE ADC (see [[Similarity.pqSearch]]): broadcast the model-side
    // inputs (query subvecs: queries x m rows; codebook: m x k rows)
    // instead of materializing the queries x m x k LUT as one
    // driver-built hash relation that scales with the query batch, and
    // evaluate the identical round6(dist2) per scored row — bit-identical
    // sums, same oracle.
    val scored = index.join(broadcast(probes), Seq(centroidIdCol))
      .join(broadcast(qsub), Seq(queryIdCol, "sub"))
      .join(broadcast(cb), Seq("sub", "code_id"))
      .filter(Similarity.sameWidth(col("__qv"), col("__cv"), "searchIndex"))
      .withColumn("__d", TextAnalysis.round6(dist2))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__d").cast("decimal(28,6)")).cast("double").as("adist"),
        count(lit(1)).as("__n"))
      .filter(col("__n") === m).drop("__n")
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("adist"), col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("adist"), col("rank"))
  }

  /** TWO-STAGE ANN search: ADC shortlist → EXACT re-rank — the standard
    * production recall fix for product quantization (Jégou et al. 2011
    * §IV-D: PQ distances are approximations; the final ordering should
    * come from true distances over a small shortlist). Stage 1 is
    * [[searchIndex]] with k = `shortlist` (ADC top-R per query, raw
    * vectors never touched); stage 2 joins ONLY those R ids per query
    * back to the raw corpus — the shortlist is queries×R rows, so it
    * BROADCASTS onto the corpus scan (at 100 TB this is one
    * semi-join-filtered pass over the vector store, and with the corpus
    * at rest partitioned/bucketed by id it prunes further) — and
    * re-scores with the exact squared L2 distance (1e-6 grid), re-ranking
    * the top-k. Output: (queryIdCol, idCol, edist, rank ≤ k).
    */
  def searchRerank(index: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      corpus: DataFrame, queries: DataFrame, k: Int, shortlist: Int, m: Int,
      subDim: Int, nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding", queryIdCol: String = "query_id",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    require(shortlist >= k,
      s"searchRerank: shortlist ($shortlist) must be >= k ($k)")
    val short = searchIndex(index, centroids, codebooks, queries, shortlist,
        m, subDim, nprobe, idCol, vecCol, queryIdCol, centroidIdCol)
      .select(col(queryIdCol), col(idCol))
    val cand = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .join(broadcast(short), Seq(idCol))
    val qv = queries.select(col(queryIdCol),
      col(vecCol).cast("array<double>").as("__qv"))
    val d2 = Similarity.dist2Fold(col("__qv"), col("__v"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("edist"), col(idCol))
    cand.join(broadcast(qv), Seq(queryIdCol))
      .filter(Similarity.sameWidth(col("__qv"), col("__v"), "searchRerank"))
      .withColumn("edist", TextAnalysis.round6(d2))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("edist"), col("rank"))
  }
}
