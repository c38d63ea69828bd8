package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing of the composed dedup pipeline (diagnostic aid for
  * the q109 latency work — run against a testdata SF dir).
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedupprofile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    for (rep <- 1 to 2) {
      println(s"[dedupprofile] ---- rep $rep ----")
      // curate-path breakdown: the filter pass alone, dedup over a
      // PRE-MATERIALIZED filtered frame, and the composed operator
      locally {
        import graft.pipeline.TextAnalysis
        val kept0 = TextAnalysis.languageId(
            TextAnalysis.qualityScore(docs, "text"), "text")
          .filter(col("lang_pred") === "en" &&
            col("n_tokens") >= 16 && col("quality_score") >= 0.3)
          .select(col("doc_id"), col("text"))
        time("curate_filter_alone")(noop(kept0))
        val keptMat = kept0.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        keptMat.count()
        println(s"[dedupprofile] kept partitions: ${keptMat.rdd.getNumPartitions}")
        time("kept_exact")(noop(Dedup.exact(keptMat)))
        time("kept_survivors")(noop(keptMat.join(
          Dedup.exact(keptMat).select(col("keep_id").as("doc_id")),
          Seq("doc_id"), "left_semi")))
        time("kept_bands")(noop(Dedup.lshBands(keptMat, "text", "doc_id")))
        val kpairs = Dedup.lshCandidatePairs(keptMat, maxBucketSize = Some(50),
          persistBands = true, withBandCounts = false)
          .select("id_a", "id_b")
        time("kept_candidates_run")(noop(kpairs))
        val kpairs2 = Dedup.lshCandidatePairs(keptMat, maxBucketSize = Some(50),
          persistBands = true, withBandCounts = false).select("id_a", "id_b")
        val kcc = time("kept_cc_build(+iterate)")(Dedup.connectedComponents(kpairs2))
        time("kept_cc_run")(noop(kcc))
        time("dedup_on_materialized_kept")(noop(Dedup.dedupCorpus(keptMat)))
        keptMat.unpersist()
        spark.catalog.clearCache()
        time("full_curateCorpus")(noop(TextAnalysis.curateCorpus(docs)))
        spark.catalog.clearCache()
      }
      time("scan")(noop(docs))
      time("exact")(noop(Dedup.exact(docs)))
      time("survivors")(noop(docs.join(
        Dedup.exact(docs).select(col("keep_id").as("doc_id")),
        Seq("doc_id"), "left_semi")))
      time("minhash_sigs")(noop(Dedup.minhashSignatures(docs, "text", "doc_id", 3, 12)))
      time("bands")(noop(Dedup.lshBands(docs, "text", "doc_id")))
      val pairs = time("candidates_build")(
        Dedup.lshCandidatePairs(docs, maxBucketSize = Some(50), persistBands = true)
          .select("id_a", "id_b"))
      time("candidates_run")(noop(pairs))
      val pairs2 = Dedup.lshCandidatePairs(docs, maxBucketSize = Some(50),
        persistBands = true).select("id_a", "id_b")
      val cc = time("cc_build(+iterate)")(Dedup.connectedComponents(pairs2))
      time("cc_run")(noop(cc))
      time("full_dedupCorpus")(noop(Dedup.dedupCorpus(docs)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
