package graft.pipeline

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation over the real documents table:
  * quality filter -> exact dedup -> LSH near-dup clusters -> canonical doc
  * per cluster -> corpus-wide paragraph dedup -> deterministic sample ->
  * context-window chunks. Each stage is covered by its own oracle gate;
  * this spec pins that they COMPOSE — schemas line up, row counts are
  * monotone where they must be, and the full chain is deterministic.
  */
class CurationJourneySpec extends SparkTestBase {
  import spark.implicits._

  test("curation chain composes and is deterministic end to end") {
    def runChain(): (Long, Long, Long, Long, Set[(Long, Int, String)]) = {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      val n0 = docs.count()

      val kept = TextAnalysis.qualityScore(docs)
        .filter(col("quality_score") > 0.05)
        .select("doc_id", "text")
      val n1 = kept.count()
      assert(n1 <= n0 && n1 > 0, s"quality filter kept $n1 of $n0")

      val deduped = Dedup.exactFiltered(kept)
      val n2 = deduped.count()
      assert(n2 <= n1)

      val pairs = Dedup.lshCandidatePairs(deduped,
        maxBucketSize = Some(50), persistBands = true).select("id_a", "id_b")
      val clusters = Dedup.connectedComponents(pairs)
      // canonical = drop docs whose cluster label is some other (smaller) doc
      val dupMembers = clusters.filter(col("doc_id") =!= col("cluster_id"))
      val canonical = deduped.join(dupMembers, Seq("doc_id"), "left_anti")
      val n3 = canonical.count()
      assert(n3 <= n2 && n3 > 0)

      val cleaned = Dedup.paragraphDedup(canonical)
        .filter(length(col("clean_text")) > 0)
      val sampled = Sampling.hashSample(cleaned, "doc_id", 0.5)
      val chunks = TextAnalysis.chunkDocuments(sampled,
        maxTokens = 64, overlap = 8, textCol = "clean_text")
      val chunkSet = chunks.select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Int, String)].collect().toSet
      assert(chunkSet.nonEmpty)
      // every chunk respects the token bound
      assert(chunkSet.forall(_._3.split("\\s+").length <= 64))
      spark.catalog.clearCache()
      (n0, n1, n2, n3, chunkSet)
    }
    val a = runChain()
    val b = runChain()
    assert(a == b, "the chain must be bit-for-bit reproducible")
  }
}
