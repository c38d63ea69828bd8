package graft.streaming

import graft.pipeline.{Dedup, TextIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming document-pipeline operators — the incremental form of the
  * corpus-curation ops in `graft.pipeline`. The reference has no streaming
  * surface (SURVEY.md §2.9 extension); this is how a production ingest
  * actually runs dedup: the corpus index is built ONCE at rest
  * ([[graft.pipeline.TextIndex]]), and every arriving micro-batch of new
  * documents is screened against it without ever re-scanning the corpus.
  */
object DocStream {

  /** Incremental near-duplicate screening: stream new documents from a
    * parquet directory, and per micro-batch run the SAME banded probe as
    * the batch path ([[TextIndex.probe]]) against the at-rest corpus band
    * index — `foreachBatch` is the right vehicle because the probe needs a
    * per-batch aggregation (the hot-bucket cap) that append-mode streaming
    * aggregation cannot express. Candidate pairs append to `outDir` tagged
    * with `batch_id`; foreachBatch is at-least-once on failure/retry
    * (standard contract), so a checkpointed production run should dedup
    * downstream by (batch_id, doc_id, corpus_id) — trivial because the
    * tag makes replays idempotent to filter.
    *
    * Semantics: each batch is screened INDEPENDENTLY (per-batch hot-bucket
    * caps on the new side; the corpus-side cap is fixed at index scope) —
    * the natural incremental contract: a document's verdict never depends
    * on what arrives after it. With no cap binding, the union of per-batch
    * outputs equals the one-shot batch probe of all new docs
    * (DocStreamSpec pins this).
    *
    * Scale shape per batch: the corpus side plans with NO exchange (the
    * index is bucketed+sorted on the band join key); only the new batch —
    * orders of magnitude smaller — is shuffled or broadcast. State: none
    * beyond the file-source log; the stream can run forever.
    *
    * Output rows in `outDir`: (doc_id, corpus_id, n_bands, batch_id).
    */
  def streamingNearDupProbe(spark: SparkSession, sourceDir: String,
      schemaDDL: String, index: DataFrame, outDir: String,
      textCol: String = "text", idCol: String = "doc_id",
      k: Int = 3, numHashes: Int = 12, bands: Int = 4,
      maxBucketSize: Option[Int] = Some(Dedup.DefaultMaxBucketSize),
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TextIndex.probe(index, batch, textCol, idCol,
            k = k, numHashes = numHashes, bands = bands,
            maxBucketSize = maxBucketSize)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
    // a real deployment passes checkpointDir: the file-source log +
    // committed batch ids live there, so a RESTART resumes exactly after
    // the last committed batch instead of re-screening the whole source
    // directory (DocStreamSpec pins restart-resume). Omitted = Spark's
    // session temp checkpoint (test convenience; not restartable).
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING lexical-index maintenance: every arriving micro-batch of
    * documents is tokenized and appended into the at-rest BM25 index
    * ([[TextIndex.appendToBm25Index]] — postings append into the bucketed
    * table, exact-decimal stats merge). Because the append is
    * batch-associative (postings are per-doc-local, the decimal sum_dl
    * is order-free), the index after the stream drains is bit-identical
    * to a one-shot build over base ∪ streamed docs — DocStreamSpec pins
    * ranking parity against the full rebuild. foreachBatch because the
    * append touches two tables transactionally-ish (postings, then
    * stats); at-least-once on retry, so a production run keys replays by
    * checkpointed batch id (same contract as [[streamingNearDupProbe]]).
    * Per batch the work is O(batch postings) + a 1-row stats read —
    * corpus cost stays at build time.
    */
  def streamingBm25Append(spark: SparkSession, sourceDir: String,
      schemaDDL: String, table: String,
      textCol: String = "text", idCol: String = "doc_id",
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TextIndex.appendToBm25Index(batch, table, textCol, idCol)
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING substring-dedup screening: stream document batches and
    * per micro-batch compute their duplicate spans against the at-rest
    * k-token gram index ([[graft.pipeline.TextIndex.probeSpans]]) ∪ the
    * batch itself — Lee-et-al span marking at crawl-batch cadence with
    * no corpus re-hash. Like the SNM probe (and unlike FastSS), batch
    * COMPOSITION is semantic: grams can duplicate WITHIN a micro-batch,
    * so each batch screens as a unit and union-over-batches equals
    * per-batch one-shot probes (each doc lives in exactly one batch, so
    * outputs never repeat). Output rows:
    * (idCol, span_start, span_tokens, batch_id).
    */
  def streamingSpanProbe(spark: SparkSession, sourceDir: String,
      schemaDDL: String, indexTable: String, outDir: String,
      textCol: String = "text", idCol: String = "doc_id",
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None): StreamingQuery = {
    // fail at setup if the index records no window width
    graft.pipeline.TextIndex.spanIndexK(spark, indexTable)
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.TextIndex.probeSpans(spark, indexTable, batch,
            textCol, idCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING sorted-neighborhood screening: stream record batches and
    * per micro-batch probe the at-rest SNM layout
    * ([[graft.pipeline.ErIndex.probeSnm]]) — partition-pruned slice
    * pairing at crawl-batch cadence, the order-blocking twin of
    * [[streamingFastSSProbe]]. foreachBatch (the probe routes, prunes
    * and distincts — not append-expressible); the corpus side scans only
    * the ranges each micro-batch touches. NOTE the batch-composition
    * semantics: unlike the FastSS probe (row-independent), SNM batch
    * rows can pair with EACH OTHER through the window, so each
    * micro-batch screens as a unit against stored ∪ that batch — the
    * union over micro-batches equals per-batch one-shot probes (pinned
    * by DocStreamSpec), not one probe of the concatenated stream.
    * Output rows: (id_a, id_b, key_a, key_b, batch_id).
    */
  def streamingSnmProbe(spark: SparkSession, sourceDir: String,
      schemaDDL: String, layoutTable: String, outDir: String,
      keyCol: String, idCol: String, window: Int,
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.ErIndex.probeSnm(spark, layoutTable, batch,
            keyCol, idCol, window)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING entity-resolution screening: stream new terms (product
    * codes, author names, entity keys) and per micro-batch probe the
    * at-rest FastSS deletion-key index ([[graft.pipeline.ErIndex]]) —
    * the incremental "does this new entity fuzzily match a known one?"
    * check at crawl-batch cadence. foreachBatch like
    * [[streamingNearDupProbe]] (the probe ends in a distinct the
    * append-mode engine cannot express); per batch the index side plans
    * with NO exchange (bucketed on the deletion key), only the small
    * batch is expanded and shuffled. Each batch screens independently,
    * so the union of per-batch outputs equals the one-shot probe of all
    * streamed terms (DocStreamSpec pins this); output rows:
    * (term, corpus_term, dist, batch_id).
    */
  def streamingFastSSProbe(spark: SparkSession, sourceDir: String,
      schemaDDL: String, indexTable: String, outDir: String,
      termCol: String = "term", maxDist: Int = 1,
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None): StreamingQuery = {
    // validate the probe depth against the index's stored build maxDist
    // ONCE at stream setup (refuses loudly before any batch runs)
    val built = graft.pipeline.ErIndex.fastSSIndexMaxDist(spark, indexTable)
    require(built >= maxDist,
      s"streamingFastSSProbe: index '$indexTable' built with maxDist=$built " +
        s"cannot serve maxDist=$maxDist probes without losing recall")
    val index = graft.pipeline.ErIndex.readFastSSIndex(spark, indexTable)
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.ErIndex.probeFastSS(index, batch, termCol, maxDist)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }
}
