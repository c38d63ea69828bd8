package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The MinHash-LSH band index AT REST — the text twin of [[VectorIndex]]:
  * [[Dedup.crossCorpusCandidates]] recomputes BOTH sides' shingle→minhash
  * →band pipelines per call, but a production corpus is deduplicated
  * incrementally — every new batch probes the SAME existing corpus. At
  * 100 TB the corpus-side minhash pass (a full-text scan + per-doc digest
  * work, the dominant cost of the operator) must happen ONCE, at build
  * time, not once per arriving batch.
  *
  * Layout is deliberately plain Spark: the corpus band table
  * (id, band, band_key) persisted as a parquet table BUCKETED AND SORTED
  * on the join key (band, band_key). Probing then plans with NO exchange
  * on the index side (the classic pre-shuffled-on-disk layout,
  * [[graft.ops.ScaleJoins.writeBucketed]]): only the new batch — typically
  * orders of magnitude smaller — is shuffled (or broadcast, AQE's choice).
  * The hot-bucket cap aggregation on the index side is likewise
  * bucket-local: grouped on exactly the bucketing keys, no shuffle.
  *
  * Same candidate algebra as [[Dedup.crossCorpusCandidates]] (per-side
  * capped buckets, band equi-join, countDistinct band), so the at-rest
  * probe matches the recompute path row-for-row — the q162 gate pins that
  * against the DuckDB oracle.
  */
object TextIndex {

  /** Build + persist the corpus band index: one minhash pass over the
    * corpus, written bucketed+sorted by (band, band_key). Overwrites both
    * the table entry and the data path.
    */
  def writeBandIndex(docs: DataFrame, table: String, path: String,
      textCol: String = "text", idCol: String = "doc_id",
      k: Int = 3, numHashes: Int = 12, bands: Int = 4,
      buckets: Int = 16): Unit = {
    val spark = docs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    Dedup.lshBands(docs, textCol, idCol, k, numHashes, bands)
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "band", "band_key")
      .sortBy("band", "band_key")
      .format("parquet")
      .saveAsTable(table)
  }

  def readBandIndex(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Probe a NEW batch against the stored corpus bands: band the batch
    * (its own minhash pass — it is the small side), cap hot buckets on
    * EACH side independently (same policy and same oracle-mirrorable
    * HAVING as [[Dedup.crossCorpusCandidates]]), and equi-join on
    * (band, band_key). Output: (idCol, corpusOutCol, n_bands) — one row
    * per (batch doc, corpus doc) candidate near-duplicate pair.
    *
    * `index` is the frame from [[readBandIndex]]; its id column must be
    * named `idCol` (it is renamed to `corpusOutCol` in the output).
    */
  def probe(index: DataFrame, newDocs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      corpusOutCol: String = "corpus_id",
      k: Int = 3, numHashes: Int = 12, bands: Int = 4,
      maxBucketSize: Option[Int] = Some(Dedup.DefaultMaxBucketSize)): DataFrame = {
    require(corpusOutCol != idCol,
      s"probe: corpusOutCol must differ from idCol ($idCol)")
    def capped(b: DataFrame): DataFrame = maxBucketSize match {
      case Some(cap) =>
        val small = b.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") <= lit(cap.toLong))
          .select(col("band"), col("band_key"))
        b.join(small, Seq("band", "band_key"))
      case None => b
    }
    val l = capped(Dedup.lshBands(newDocs, textCol, idCol, k, numHashes, bands))
      .select(col(idCol), col("band"), col("band_key"))
    val r = capped(index)
      .select(col(idCol).as(corpusOutCol), col("band"), col("band_key"))
    l.join(r, Seq("band", "band_key"))
      .groupBy(col(idCol), col(corpusOutCol))
      .agg(countDistinct(col("band")).as("n_bands"))
  }
}
