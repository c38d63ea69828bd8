package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.pipeline.TextIndex
import org.apache.spark.sql.functions._

class DocStreamSpec extends SparkTestBase {

  private val schemaDDL = "doc_id LONG, text STRING"

  test("streaming per-batch probe union equals the one-shot batch probe") {
    val sf = "/root/testdata/sf0.001"
    val corpus = Tables.documents(spark, sf).select("doc_id", "text")
    val newDocs = corpus.filter(col("doc_id") % 5 === 0)

    val tmp = java.nio.file.Files.createTempDirectory("graft_docstream_")
    val table = "graft_band_index_docstream"
    try {
      TextIndex.writeBandIndex(corpus, table, tmp.resolve("idx").toString)
      val index = TextIndex.readBandIndex(spark, table)

      // one-shot batch probe of everything that will arrive
      val batchPairs = TextIndex.probe(index, newDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batchPairs.nonEmpty, "fixture must produce candidates")

      // stage the same docs as 3 files -> 3 micro-batches
      val srcDir = tmp.resolve("src").toString
      newDocs.repartition(3).write.parquet(srcDir)
      val outDir = tmp.resolve("out").toString
      val q = DocStream.streamingNearDupProbe(spark, srcDir, schemaDDL,
        index, outDir, maxFilesPerTrigger = Some(1))
      try assert(q.awaitTermination(120000),
        "streaming probe did not terminate within 120 s")
      finally q.stop()

      val streamed = spark.read.parquet(outDir)
      val nBatches = streamed.select("batch_id").distinct().count()
      assert(nBatches >= 2, s"expected multiple micro-batches, got $nBatches")
      val streamedPairs = streamed.select("doc_id", "corpus_id", "n_bands")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamedPairs == batchPairs)
      // each new doc is screened in exactly one batch — no pair repeats
      assert(streamed.count() == streamedPairs.size)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
