package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the join is
  * queries x corpus, fine when queries are a small batch). Scale path:
  * random-hyperplane LSH — bucket by sign bits, search only same-bucket
  * (plus optional multi-probe) candidates; the hyperplanes are
  * md5-seeded so the index is deterministic and rebuildable anywhere.
  */
object Similarity {

  private def norm2(v: org.apache.spark.sql.Column) =
    sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, p) => s + p)

  /** Exact top-k by cosine for each query vector. Ties break on corpus id
    * (deterministic). Output: (query_id, vec_id, cosine, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm2(col("__cv")))
    val q = queries.select(col(queryIdCol), col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm2(col("__qv")))
    val scored = q.crossJoin(c)
      .withColumn("cosine", TextAnalysis.round6(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component: md5-seeded value in
    * [-0.5, 0.5) for (plane, dimension). Computed ON THE DRIVER — the weights
    * are row-independent constants, so hashing them per input row (the naive
    * expression form) would cost planes x dims md5 calls per row for values
    * that never change. All steps are IEEE-exact and identical to the SQL
    * `CAST('0x'||substr(md5(...),1,6) AS BIGINT)/16777216.0 - 0.5`: a 24-bit
    * integer and a power-of-two divisor have exact double representations.
    */
  private[pipeline] def planeWeight(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane$plane:$dim".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 6), 16).toDouble / 16777216.0 - 0.5
  }

  private val MaxDims = 64

  /** Sign-bit bucket id from `numPlanes` hyperplanes, plane indices starting
    * at `planeOffset` (for banded amplification). The plane matrix is baked
    * into the plan as array literals; the projection is a pure zip_with-sum
    * inside whole-stage codegen. Vectors up to [[MaxDims]] dims supported
    * (weights are sliced to the row's length, so mixed-length inputs work).
    */
  def lshBucket(vecCol: org.apache.spark.sql.Column, numPlanes: Int,
      planeOffset: Int = 0): org.apache.spark.sql.Column = {
    val v = vecCol.cast("array<double>")
    val bits = (0 until numPlanes).map { p =>
      val w = typedlit((0 until MaxDims).map(i => planeWeight(planeOffset + p, i)))
      val proj = aggregate(
        zip_with(v, slice(w, lit(1), size(v)), (x, c) => x * c),
        lit(0.0), (s, t) => s + t)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: candidates = same bucket; exact cosine + top-k inside
    * the bucket. Trades recall for a bucket-local join — the 100 TB path
    * (the corpus shuffle is by bucket id, queries broadcast per bucket).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__bucket", lshBucket(col("__cv"), numPlanes))
      .withColumn("__cn", norm2(col("__cv")))
    val q = queries.select(col(queryIdCol), col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__bucket", lshBucket(col("__qv"), numPlanes))
      .withColumn("__qn", norm2(col("__qv")))
    val scored = q.join(c, Seq("__bucket"))
      .withColumn("cosine", TextAnalysis.round6(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"), col("rank"))
  }

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `centroids` (a small broadcast table of (centroid_id, embedding)); ANN
    * probes only the closest cells. Returns corpus annotated with cell id.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val cent = centroids.select(col(centroidIdCol), col(vecCol).cast("array<double>").as("__c"))
    val dist2 = aggregate(zip_with(col("__v"), col("__c"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, t) => s + t)
    // argmin as a struct-min aggregate (lexicographic on (dist2, centroid_id),
    // same tiebreak as an ORDER BY window) — partial-aggregates map-side, so
    // the shuffle carries one row per vec_id instead of the full corpus x K
    // expansion a row_number window would reshuffle.
    c.crossJoin(broadcast(cent))
      .withColumn("__d", dist2)
      .groupBy(col(idCol))
      .agg(min(struct(col("__d"), col(centroidIdCol))).as("__best"))
      .select(col(idCol), col("__best")(centroidIdCol).as(centroidIdCol),
        col("__best")("__d").as("dist2"))
  }

  /** The IVF QUERY path: each query probes its `nprobe` nearest cells and
    * searches only the corpus vectors [[ivfAssign]] put there — the classic
    * inverted-file ANN. The per-query cell shortlist expands to `nprobe`
    * rows (a tiny explode on the query batch), then ONE equi-join on
    * cell id against the partitioned corpus lists; exact cosine + top-k
    * inside the probed union. At 100 TB the corpus shuffles once by cell
    * id (or is bucketed by it at rest) and each query touches
    * nprobe/|cells| of the data — no product anywhere.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding", queryIdCol: String = "query_id",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val lists = ivfAssign(corpus, centroids, idCol, vecCol, centroidIdCol)
      .select(col(idCol), col(centroidIdCol))
      .join(corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__cv")), idCol)
      .withColumn("__cn", norm2(col("__cv")))
    val cent = centroids.select(col(centroidIdCol), col(vecCol).cast("array<double>").as("__c"))
    val qDist2 = aggregate(zip_with(col("__qv"), col("__c"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, t) => s + t)
    val probes = queries
      .select(col(queryIdCol), col(vecCol).cast("array<double>").as("__qv"))
      .crossJoin(broadcast(cent))
      .withColumn("__d", qDist2)
      // nprobe nearest cells per query: sort the tiny per-query cell list
      // in an aggregate (K entries), no window over the corpus
      .groupBy(col(queryIdCol))
      .agg(first(col("__qv")).as("__qv"),
        slice(array_sort(collect_list(struct(col("__d"), col(centroidIdCol)))),
          1, nprobe).as("__cells"))
      .select(col(queryIdCol), col("__qv"),
        explode(col("__cells")).as("__cell"))
      .select(col(queryIdCol), col("__qv"),
        col(s"__cell.$centroidIdCol").as(centroidIdCol))
      .withColumn("__qn", norm2(col("__qv")))
    val scored = probes.join(lists, Seq(centroidIdCol))
      .withColumn("cosine", TextAnalysis.round6(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"), col("rank"))
  }
}
