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
