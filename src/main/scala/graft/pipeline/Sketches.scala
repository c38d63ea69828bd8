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
}
