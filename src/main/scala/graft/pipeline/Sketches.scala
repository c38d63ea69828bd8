package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching. The classic streaming sketches
  * (HLL, CPC) trade exactness for memory but are engine-specific bit
  * soups no SQL oracle can mirror; the bottom-θ (fixed-threshold KMV /
  * theta) sketch gives the same sub-linear behavior with EXACT
  * reproducibility on any md5-bearing engine: keep only keys whose
  * uniform 32-bit hash falls below 2^32/θ⁻¹, count them distinct, scale
  * by θ⁻¹. Every step is integer arithmetic over md5 — the estimate is a
  * deterministic function of the key set.
  *
  * Scale shape: the hash filter is a stateless codegen'd predicate that
  * prunes (θ⁻¹-1)/θ⁻¹ of all rows BEFORE the shuffle — the distinct
  * aggregation then shuffles only the surviving ~n/θ⁻¹ keys (this is the
  * point of the sketch: the exact count shuffles everything). Standard
  * error ≈ sqrt(θ⁻¹/n_distinct): θ⁻¹=16 over 100k distinct keys is ~1.3%.
  * Sketches over different slices merge by construction (same salt ->
  * same retained key set -> union then re-count).
  */
object Sketches {

  /** Per-group distinct-count estimate via the bottom-θ sketch.
    * Output: group columns + `sampled_distinct` (exact distinct survivors
    * below the threshold) + `estimated_distinct` (= sampled * θ⁻¹, exact
    * integer arithmetic).
    */
  def thetaDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
      thetaInverse: Int, salt: String = "theta"): DataFrame = {
    require(thetaInverse >= 1, s"thetaDistinct: thetaInverse must be >= 1, got $thetaInverse")
    val cut = math.round(4294967296.0 / thetaInverse)
    df.filter(Sampling.keyHash32(col(keyCol), salt) < cut)
      .groupBy(groupCols.map(col): _*)
      .agg(count_distinct(col(keyCol)).as("sampled_distinct"))
      .withColumn("estimated_distinct",
        col("sampled_distinct") * thetaInverse.toLong)
  }

  /** The two 32-bit md5 words of `salt:key` — the same Kirsch–Mitzenmacher
    * double-hashing family as the MinHash/Bloom kernels: row j hashes to
    * (w1 + j * w2) mod width.
    */
  private def hashWords(keyCol: String, salt: String): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val k = md5(concat(lit(salt + ":"), col(keyCol).cast("string")))
    (conv(substring(k, 1, 8), 16, 10).cast("long"),
      conv(substring(k, 9, 8), 16, 10).cast("long"))
  }

  /** Count-Min sketch BUILD: a depth x width grid of occurrence counts —
    * the bounded-memory frequency summary (heavy-hitter estimation,
    * per-key rate limiting) whose state is depth*width longs no matter
    * how many distinct keys stream through. Each occurrence increments
    * one bucket per row (bucket_j = (w1 + j*w2) mod width); the build is
    * one keyed aggregation whose shuffle carries at most depth*width
    * partial counts per map task, NOT the key stream. Deterministic:
    * md5-derived buckets, integer counts — exactly mirrorable in SQL.
    * Output: (j, bucket, c).
    */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int = 3,
      width: Int = 1024, salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 2, s"cmsBuild: bad grid ${depth}x$width")
    val (w1, w2) = hashWords(keyCol, salt)
    df.select(w1.as("__w1"), w2.as("__w2"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("__w1"), col("__w2"))
      .select(col("j"), pmod(col("__w1") + col("j") * col("__w2"), lit(width.toLong)).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Count-Min PROBE: estimated occurrence count for each item = the
    * minimum of its depth bucket counters (never an undercount; overcounts
    * only by collisions, bounded by total/width per row w.h.p.). The
    * sketch side is at most depth*width rows — it broadcasts; probing any
    * number of items is a stateless equi-join + keyed min.
    * Output: (key, est_count).
    */
  def cmsEstimate(cms: DataFrame, items: DataFrame, keyCol: String,
      depth: Int = 3, width: Int = 1024, salt: String = "cms"): DataFrame = {
    val (w1, w2) = hashWords(keyCol, salt)
    items.select(col(keyCol), w1.as("__w1"), w2.as("__w2"))
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("__w1"), col("__w2"))
      .select(col(keyCol), col("j"),
        pmod(col("__w1") + col("j") * col("__w2"), lit(width.toLong)).as("bucket"))
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
  }
}
