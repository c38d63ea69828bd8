package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time processing over the stream-shaped `events` table.
  *
  * The reference has no streaming surface (SURVEY.md §2.9); this module is
  * the scale-out extension: every aggregate is an incremental `groupBy`
  * expressible identically in batch and Structured Streaming —
  * `windowedCounts` runs on a static DataFrame, `streamingWindowedCounts`
  * runs the same plan over `readStream` with a watermark.
  */
object EventStream {

  /** ns-epoch long -> timestamp (micros precision). Integer `div`, not `/`:
    * double division loses the low microsecond digits at ns magnitudes.
    */
  def tsFromNanos(nsCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros(
      org.apache.spark.sql.graftbridge.Bridge.integralDivide(nsCol, lit(1000L)))

  /** Tumbling event-time window aggregate (batch form): count + exact
    * decimal sum per (window, event_type).
    */
  def windowedCounts(events: DataFrame, windowDuration: String = "5 minutes"): DataFrame =
    events
      .withColumn("event_time", tsFromNanos(col("ts")))
      .groupBy(window(col("event_time"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** The same aggregation as an unbounded streaming query over a parquet
    * directory source, with a watermark for state cleanup. Caller starts it
    * with `.writeStream`(e.g. memory sink in tests; kafka/delta in prod).
    */
  def streamingWindowedCounts(spark: SparkSession, sourceDir: String,
      schemaDDL: String, windowDuration: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    spark.readStream.schema(schemaDDL).parquet(sourceDir)
      .withColumn("event_time", tsFromNanos(col("ts")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming ingest into a Z-ORDERED at-rest layout
    * ([[graft.ops.ZOrder]]): each micro-batch of points is keyed with the
    * layout's persisted grid parameters and APPENDED as key-sorted files;
    * every `compactEvery` batches the layout is re-range-partitioned and
    * rewritten so row-group pruning stays tight ([[graft.ops.ZOrder
    * .compact]]). This is the streaming half of the at-rest spatial
    * story: the batch query path ([[graft.query.SpatialQuery
    * .boundingBoxPointsMultiZ]], `ZOrder.readBox`) reads the same layout
    * unchanged — appended-but-not-yet-compacted rows are still found (the
    * exact refine is layout-blind), compaction only restores prune
    * tightness. foreachBatch because the append+swap is a table
    * maintenance action, not a row transform; at-least-once on retry,
    * idempotent downstream via the usual batch_id tagging if appends must
    * be exactly-once (a table format's manifest would close that too).
    * The layout at `path` must exist ([[graft.ops.ZOrder.writeZOrdered]]
    * — possibly of an empty frame) so the grid parameters are fixed
    * before data flows.
    */
  def streamingZOrderedIngest(spark: SparkSession, sourceDir: String,
      schemaDDL: String, path: String, compactEvery: Int = 8,
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.ZOrder.appendZOrdered(batch, path)
        if (batchId % compactEvery == compactEvery - 1)
          graft.ops.ZOrder.compact(spark, path)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING ingest into the manifest-versioned layout
    * ([[graft.ops.VersionedLayout]]): every micro-batch lands as one
    * atomic version commit — concurrent readers see either the previous
    * version or the whole batch, never a torn file set (the guarantee the
    * plain parquet-append ingest cannot give) — and every `compactEvery`
    * batches the accumulated small file sets rewrite into one, also as a
    * plain commit, so compaction needs no pause. Version history doubles
    * as a replay ledger: a crashed consumer resumes from the version it
    * last processed via [[graft.ops.VersionedLayout.diff]].
    */
  def streamingVersionedIngest(spark: SparkSession, sourceDir: String,
      schemaDDL: String, path: String, compactEvery: Int = 8,
      compactSortCol: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.VersionedLayout.commit(batch, path)
        if (batchId % compactEvery == compactEvery - 1)
          graft.ops.VersionedLayout.compact(spark, path, compactSortCol)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING cardinality maintenance: each micro-batch's HyperLogLog
    * registers ([[graft.pipeline.Sketches.hllRegisters]]) merge into an
    * at-rest register table by per-register MAX — the mergeability that
    * makes distinct-count streamable with CONSTANT state: the table holds
    * at most 2^p rows per group forever, not a key set, and reading it
    * through the [[graft.pipeline.Sketches.hllDistinct]] estimator at any
    * moment gives the running distinct count over everything ingested.
    * The merge rewrites to a sibling temp dir and swaps (same brief
    * unavailability note as `ZOrder.compact`); `foreachBatch` gives
    * effectively-once per batch — re-running a batch after a crash
    * re-merges the same registers, and MAX is idempotent, so replays
    * cannot corrupt the sketch (the property counters lack).
    */
  def streamingHllRegisters(spark: SparkSession, sourceDir: String,
      schemaDDL: String, groupCols: Seq[String], keyCol: String,
      path: String, p: Int = 9, salt: String = "hll",
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.pipeline.Sketches
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = Sketches.hllRegisters(batch, groupCols, keyCol, p, salt)
        val conf = spark.sparkContext.hadoopConfiguration
        val target = new org.apache.hadoop.fs.Path(path)
        val fs = target.getFileSystem(conf)
        val merged =
          if (fs.exists(target))
            Sketches.hllMerge(Seq(spark.read.parquet(path), b), groupCols)
          else b
        val tmp = s"${path}__merging"
        merged.write.mode("overwrite").parquet(tmp)
        fs.delete(target, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), target)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING frequency-sketch maintenance — the Count-Min twin of
    * [[streamingHllRegisters]], with the idempotency problem solved the
    * OTHER way: CMS merges by ADDITION (linear sketch), so re-merging a
    * replayed batch into a running grid would double-count where the
    * HLL's MAX could not. Instead each micro-batch writes its OWN partial
    * grid under `batch_id=<id>/` (an overwrite of that one directory —
    * replaying batch N rewrites N's partition byte-identically, never
    * double-counts), and the live sketch is
    * [[graft.pipeline.Sketches.cmsMerge]] over the partitioned table: a
    * <= batches x depth x width row aggregation, no raw keys retained.
    * Reading mid-write sees either the old or the new version of one
    * batch directory — same note as the HLL's tmp-and-swap. Estimate any
    * key set with [[graft.pipeline.Sketches.cmsEstimate]] over the merged
    * grid; compact by re-writing the merge as a single batch partition
    * when batch count grows (the zone-map append pattern).
    */
  def streamingCmsGrids(spark: SparkSession, sourceDir: String,
      schemaDDL: String, keyCol: String, path: String, depth: Int = 3,
      width: Int = 1024, salt: String = "cms",
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.pipeline.Sketches
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketches.cmsBuild(batch, keyCol, depth, width, salt)
          .coalesce(1) // depth x width rows — one file per batch partition
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING quantile-sketch maintenance — the fixed-grid histogram is
    * ADDITION-mergeable like the Count-Min grid, so it streams the same
    * way ([[streamingCmsGrids]]'s idempotency design): each micro-batch
    * overwrites its own `batch_id=<id>/` partial-histogram partition
    * (replays rewrite, never double-count), the live histogram is a
    * per-bin SUM over the partitioned table (<= batches x bins rows), and
    * quantile estimates read off its cumulative edges exactly as
    * [[graft.pipeline.Sketches.histogramQuantiles]] does — running
    * latency/size/score percentiles over an endless stream with
    * `bins`-bounded state. The (lo, hi, bins) grid is FIXED at stream
    * start (a mergeable histogram needs one grid; values outside clamp
    * into the edge bins, same contract as the batch sketch's min/max
    * clamp).
    */
  def streamingHistogramBins(spark: SparkSession, sourceDir: String,
      schemaDDL: String, valueCol: String, path: String, lo: Double,
      hi: Double, bins: Int = 1024, maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.pipeline.Sketches
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketches.histogramBins(
          // clamp into the fixed grid so every batch bins identically;
          // gate on non-null (greatest/least SKIP nulls — a NULL value
          // must stay NULL for histogramBins to drop, not clamp to hi)
          batch.withColumn(valueCol,
            when(col(valueCol).isNotNull,
              greatest(least(col(valueCol).cast("double"), lit(hi)), lit(lo)))),
          valueCol, lo, hi, bins)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** STREAMING decayed-count maintenance — [[decayedCounts]]' streaming
    * twin, BUCKET-ALIGNED so the state is addition-mergeable: each event
    * lands in its absolute half-life epoch `ts div halflifeNs`, so a
    * micro-batch's contribution is a tiny (key, bucket, n) partial that
    * overwrites its own `batch_id=<id>/` partition (the
    * [[streamingCmsGrids]] idempotency discipline — replays rewrite, never
    * double-count). The live statistic at any `asOf` is
    * [[decayedFromBuckets]] over the state table — state stays
    * O(keys × live buckets) forever, raw events are never retained, and
    * asOf can move forward without touching old state (that is what the
    * ABSOLUTE bucketing buys over q279's relative ages; the price is
    * bucket-granular ages — an event decays by whole epochs).
    */
  def streamingDecayBuckets(spark: SparkSession, sourceDir: String,
      schemaDDL: String, path: String, halflifeNs: Long,
      keyCol: String = "event_type", maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(halflifeNs > 0, s"streamingDecayBuckets: halflife must be > 0")
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("__bucket", org.apache.spark.sql.graftbridge.Bridge
            .integralDivide(col("ts"), lit(halflifeNs)))
          .groupBy(col(keyCol), col("__bucket"))
          .agg(count(lit(1)).as("n"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** Decayed counts AS OF a moment from the [[streamingDecayBuckets]]
    * state table: age in whole half-lives b = asOfBucket − eventBucket,
    * weight 2⁻ᵇ — the same exact dyadic arithmetic as [[decayedCounts]]
    * (Σ n·2^(62−b) integers, one power-of-two division, one snap).
    * Buckets after asOf's drop; b > 62 contributes 0 but still counts in
    * `n`. Reading is O(state), never O(events).
    */
  def decayedFromBuckets(spark: SparkSession, path: String, asOfNs: Long,
      halflifeNs: Long, keyCol: String = "event_type"): DataFrame = {
    require(halflifeNs > 0, s"decayedFromBuckets: halflife must be > 0")
    val asOfBucket = java.lang.Math.floorDiv(asOfNs, halflifeNs)
    spark.read.parquet(path)
      .filter(col("__bucket") <= asOfBucket)
      .withColumn("__b", lit(asOfBucket) - col("__bucket"))
      .withColumn("__t", // n·2^(62−b) exceeds LONG at b=0 — multiply in DECIMAL
        when(col("__b") <= 62,
          col("n").cast("decimal(38,0)") *
            expr("shiftleft(CAST(1 AS BIGINT), CAST(62 - __b AS INT))")
              .cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)")))
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"),
        graft.pipeline.TextAnalysis.round6(
          sum(col("__t")).cast("double") / lit(math.pow(2.0, 62)))
          .as("decayed_count"))
  }

  /** DECLARATIVE streaming sessionization via Spark's built-in
    * `session_window` — the Catalyst-native twin of [[streamingSessionize]]
    * (which hand-rolls the state with `flatMapGroupsWithState`): merging
    * session windows, watermark-driven state cleanup and append-mode
    * emission all come from the engine, so prefer THIS form unless the
    * session logic needs custom state (the hand-rolled one exists to gate
    * that capability). Semantics difference worth knowing: a built-in
    * session window's `end` is lastEvent + gap (the window), not the last
    * event's time — `end_us` here reflects that.
    * Output stream: (user_id, start_us, end_us, n_events), append mode.
    */
  def streamingSessionWindows(spark: SparkSession, sourceDir: String,
      schemaDDL: String, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    spark.readStream.schema(schemaDDL).parquet(sourceDir)
      .withColumn("event_time", tsFromNanos(col("ts")))
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))

  /** STREAMING weighted reservoir — priority sampling maintained over an
    * endless stream with O(n) state per batch: each micro-batch writes
    * its [[graft.pipeline.Sampling.prioritySampleState]] (the priority
    * top-(n+1) rows) under `batch_id=<id>/` (idempotent overwrite, the
    * [[streamingCmsGrids]] discipline), and the LIVE fixed-size weighted
    * sample at any moment is
    * [[graft.pipeline.Sampling.prioritySampleMerge]] over the partitioned
    * state table — bit-identical to running [[Sampling.prioritySample]]
    * over everything ingested (the merge law, oracle-pinned by q257).
    * Batches are disjoint row sets by construction, which is exactly the
    * precondition the merge needs.
    */
  def streamingPrioritySample(spark: SparkSession, sourceDir: String,
      schemaDDL: String, keyCol: String, weightCol: String, n: Int,
      path: String, salt: String = "pri",
      maxFilesPerTrigger: Option[Int] = None,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.pipeline.Sampling
    val reader = spark.readStream.schema(schemaDDL)
    val src = maxFilesPerTrigger
      .fold(reader)(n0 => reader.option("maxFilesPerTrigger", n0))
      .parquet(sourceDir)
    val writer = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sampling.prioritySampleState(batch, keyCol, weightCol, n, salt)
          .coalesce(1) // <= n+1 rows
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** Per-user session state for [[streamingSessionize]] (micros epoch). */
  final case class SessionAgg(startUs: Long, endUs: Long, n: Long)

  /** The streaming form of [[sessionize]]: custom per-key state via
    * `flatMapGroupsWithState` with an event-time timeout. A session closes
    * and is EMITTED either when a same-user event arrives more than
    * `gapMinutes` later, or when the watermark passes the session end by
    * the gap (the timeout path — no later event can extend it). Output:
    * `(user_id, start_us, end_us, n_events)` in integer microseconds, the
    * same gap arithmetic as the batch form.
    */
  def streamingSessionize(spark: SparkSession, sourceDir: String,
      schemaDDL: String, gapMinutes: Int = 30,
      watermark: String = "10 minutes"): org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    spark.readStream.schema(schemaDDL).parquet(sourceDir)
      .withColumn("event_time", tsFromNanos(col("ts")))
      .withWatermark("event_time", watermark)
      // keep the watermarked event_time column in the Dataset — projecting
      // it away would detach the watermark the event-time timeout needs
      .select(col("user_id").cast("long"),
        org.apache.spark.sql.graftbridge.Bridge.integralDivide(col("ts"), lit(1000L)),
        col("event_time"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAgg, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single((user, s.startUs, s.endUs, s.n))
          } else {
            val sorted = events.map(_._2).toArray.sorted
            val closed = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
            var cur = state.getOption
            sorted.foreach { ts =>
              cur match {
                case None => cur = Some(SessionAgg(ts, ts, 1))
                case Some(s) if ts - s.endUs > gapUs =>
                  closed += ((user, s.startUs, s.endUs, s.n))
                  cur = Some(SessionAgg(ts, ts, 1))
                case Some(s) =>
                  cur = Some(SessionAgg(s.startUs, math.max(s.endUs, ts), s.n + 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60L * 1000)
            }
            closed.iterator
          }
      }
  }

  /** Exactly-once ingestion dedup, batch form: keep the FIRST occurrence
    * of each key, ordered by `orderCols` (event time, then event_id by
    * default) — the at-least-once -> exactly-once repair every
    * training-data ingest needs. A struct-min aggregate per key: partial
    * aggregation, no window.
    */
  def dedupByKey(events: DataFrame, keyCols: Seq[String] = Seq("event_id"),
      orderCols: Seq[String] = Seq("ts", "event_id")): DataFrame = {
    (keyCols ++ orderCols).foreach(c => require(events.columns.contains(c),
      s"dedupByKey: column '$c' not found in ${events.columns.mkString(", ")}"))
    val others = events.columns.filterNot(keyCols.contains)
    val structCols = orderCols.filterNot(keyCols.contains) ++
      others.filterNot(orderCols.contains)
    events
      .groupBy(keyCols.map(col): _*)
      .agg(min(struct(structCols.map(col): _*)).as("__first"))
      .select(keyCols.map(col) ++
        others.map(c => col(s"__first.$c").as(c)): _*)
  }

  /** The streaming form: `dropDuplicatesWithinWatermark` keeps one row per
    * key and expires its hash state once the watermark passes — bounded
    * state at unbounded stream length, the property a driver-side `Set`
    * or an un-watermarked dropDuplicates does not have. Kept row: the
    * FIRST-ARRIVING one — identical to [[dedupByKey]]'s event-time-first
    * pick exactly when duplicate payloads are identical (the ingestion
    * retry case both forms exist for); duplicates with differing payloads
    * can keep different representatives across the two forms.
    */
  def streamingDedupByKey(spark: SparkSession, sourceDir: String,
      schemaDDL: String, keyCols: Seq[String] = Seq("event_id"),
      watermark: String = "10 minutes"): DataFrame =
    spark.readStream.schema(schemaDDL).parquet(sourceDir)
      .withColumn("event_time", tsFromNanos(col("ts")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment + rollup, batch form: join the event stream
    * against a slowly-changing dimension table on `eventKey = dimKey`
    * (inner — unmatched events carry no dimension context), then aggregate
    * counts and an exact decimal value sum per (dimension attribute,
    * event_type). At scale the dimension side broadcasts (AQE picks it —
    * dims are small by definition) so the event scan never shuffles before
    * the partial aggregate.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String, dimAttr: String): DataFrame =
    // the dim key is aliased so eventKey == dimKey (the common modeling
    // convention) doesn't produce an ambiguous self-reference condition
    events.join(dim.select(col(dimKey).as("__dk"), col(dimAttr)),
        col(eventKey) === col("__dk"))
      .groupBy(col(dimAttr), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))

  /** The streaming form of [[enrichWithDim]]: the classic stream-static
    * join — the static side is planned per micro-batch (so dimension
    * updates are picked up between batches, no restart), the stream side
    * is incremental. The aggregate after the join makes this a stateful
    * query; run it with complete/update output (or add a watermark +
    * append for event-time rollups).
    */
  def streamingEnrichWithDim(spark: SparkSession, sourceDir: String,
      schemaDDL: String, dim: DataFrame, eventKey: String, dimKey: String,
      dimAttr: String): DataFrame =
    spark.readStream.schema(schemaDDL).parquet(sourceDir)
      .join(dim.select(col(dimKey).as("__dk"), col(dimAttr)), col(eventKey) === col("__dk"))
      .groupBy(col(dimAttr), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))

  /** Event attribution, batch form: every `dstType` event that follows a
    * same-user `srcType` event within `withinMinutes` (exclusive start,
    * inclusive end) is attributed to it — the click→purchase join every
    * funnel/conversion pipeline runs. One equi-join on user_id with a
    * time-range residual: partitions by user, no product, no window.
    * Output: matched pairs in integer microseconds.
    */
  def attributionPairs(events: DataFrame, srcType: String, dstType: String,
      withinMinutes: Int): DataFrame = {
    val us = org.apache.spark.sql.graftbridge.Bridge
      .integralDivide(col("ts"), lit(1000L))
    val a = events.filter(col("event_type") === srcType)
      .select(col("event_id").as("src_event_id"), col("user_id"),
        us.as("src_ts_us"))
    val b = events.filter(col("event_type") === dstType)
      .select(col("event_id").as("dst_event_id"),
        col("user_id").as("__dst_user"), us.as("dst_ts_us"))
    a.join(b, col("user_id") === col("__dst_user") &&
        col("dst_ts_us") > col("src_ts_us") &&
        col("dst_ts_us") <= col("src_ts_us") + withinMinutes * 60L * 1000000L)
      .select(col("src_event_id"), col("user_id"), col("dst_event_id"),
        col("src_ts_us"), col("dst_ts_us"))
  }

  /** [[attributionPairs]] rolled up per source event: conversion count +
    * time of the first conversion. Partial-aggregating groupBy on the
    * source event id.
    */
  def attributeWithin(events: DataFrame, srcType: String, dstType: String,
      withinMinutes: Int): DataFrame =
    attributionPairs(events, srcType, dstType, withinMinutes)
      .groupBy(col("src_event_id"), col("user_id"))
      .agg(count(lit(1)).as("n_conversions"),
        min(col("dst_ts_us")).as("first_conv_us"))

  /** The streaming form of [[attributionPairs]]: a stream-stream inner
    * join — the flagship stateful op. Both sides carry a watermark and the
    * join condition bounds each side's event time against the other
    * (same-user equi-join + the attribution window), so Spark can expire
    * join state: a src event leaves state once the dst watermark passes
    * its window end, which is what makes the join runnable forever at
    * 100 TB/day rates. Emits matched pairs in append mode.
    */
  def streamingAttributionPairs(spark: SparkSession, sourceDir: String,
      schemaDDL: String, srcType: String, dstType: String, withinMinutes: Int,
      watermark: String = "10 minutes"): DataFrame = {
    def side(t: String, prefix: String): DataFrame =
      spark.readStream.schema(schemaDDL).parquet(sourceDir)
        .filter(col("event_type") === t)
        .withColumn(s"${prefix}_time", tsFromNanos(col("ts")))
        .withWatermark(s"${prefix}_time", watermark)
        .select(col("event_id").as(s"${prefix}_event_id"),
          col("user_id").as(s"${prefix}_user"), col(s"${prefix}_time"))
    side(srcType, "src").join(side(dstType, "dst"),
      expr(s"""src_user = dst_user AND dst_time > src_time
              |AND dst_time <= src_time + interval $withinMinutes minutes""".stripMargin))
      .select(col("src_event_id"), col("src_user").as("user_id"),
        col("dst_event_id"), col("src_time"), col("dst_time"))
  }

  /** Semi-structured payload parsing: a JSON string column lowered through
    * `from_json` with an EXPLICIT schema — the codegen'd `JsonToStructs`
    * path, no UDF, no schema inference pass (inference = an extra full
    * scan at 100 TB and a nondeterministic schema under drift; production
    * pipelines pin the schema and route parse failures, which `from_json`
    * surfaces as NULL structs, to a quarantine filter). Parsed fields
    * land as top-level columns prefixed `prefix`.
    */
  def parseJsonCol(df: DataFrame, jsonCol: String, schemaDDL: String,
      prefix: String = "j_"): DataFrame = {
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schemaDDL,
      Map.empty[String, String]))
    val fields = parsed.select(col("__j.*")).columns
    fields.foldLeft(parsed) { (d, f) =>
      d.withColumn(s"$prefix$f", col(s"__j.$f"))
    }.drop("__j")
  }

  /** Rolling event-time features per key: for EVERY event, the count and
    * exact-decimal value sum of same-user events in the trailing window
    * `(ts - windowMinutes, ts]` — the standard point-in-time feature
    * backfill (fraud velocity counts, engagement rates) that must be
    * leak-free: a row only ever sees events at or before itself, the
    * offline mirror of what a streaming job computes incrementally.
    *
    * One keyed RANGE window over integer microseconds (a half-open lower
    * bound via `-(W_us - 1)`): Spark shuffles by user and sorts by time —
    * the same lower bound any per-key rolling computation pays; no
    * self-join, no explode. Equal-timestamp peers all enter each other's
    * frames (RANGE semantics — deterministic regardless of tie order,
    * which is also why the value sum runs through exact decimals).
    */
  def rollingFeatures(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("__ts_us"))
      .rangeBetween(-(windowMinutes * 60L * 1000000L - 1), 0)
    events
      .withColumn("__ts_us",
        org.apache.spark.sql.graftbridge.Bridge.integralDivide(col("ts"), lit(1000L)))
      .withColumn("n_events_w", count(lit(1)).over(w))
      .withColumn("sum_value_w",
        sum(col("value").cast("decimal(28,6)")).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("__ts_us").as("ts_us"),
        col("n_events_w"), col("sum_value_w"))
  }

  /** Retention COHORT matrix: users bucketed by the epoch-week of their
    * FIRST event (the cohort), then for every (cohort week, activity week)
    * cell the count of distinct cohort members active that week — the
    * standard retention triangle. Weeks are INTEGER epoch weeks
    * (`us div 7*86400e6`), not calendar weeks: integer arithmetic is
    * engine-portable where week-of-year calendars are not, and the cohort
    * analysis only needs relative offsets. Shape: one keyed min-aggregate
    * (first event per user), one join back on user_id (broadcastable when
    * the user dimension is small; keyed otherwise), one distinct-count
    * aggregate per cell. Output: (cohort_week, activity_week, week_offset,
    * n_active_users).
    */
  /** First-order MARKOV transition matrix between event types — the
    * behavioral-model summary (what follows what, and how often): per
    * user, order events by (ts, id) (the id breaks timestamp ties
    * deterministically), pair each event with its successor via one
    * per-user lead window, count (from, to) transitions, and attach
    * per-FROM row probabilities p = round6(n / Σ_from n) through a keyed
    * join of the tiny from-totals frame (broadcast — it is
    * |event types| rows). A user's last event has no successor and drops.
    * The window is per-user, bounded by that user's activity — never a
    * corpus window. Output: (from_type, to_type, n, p).
    */
  def eventTransitions(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        graft.pipeline.TextAnalysis.round6(
          col("n").cast("double") / col("__tot")).as("p"))
  }

  /** Top-k EVENT PATHS — the most common length-n behavioral sequences
    * (the "screen flow" / funnel-discovery mining that [[funnel]] checks
    * one hypothesis of): per user, the (ts, id)-ordered type sequence is
    * assembled in ONE keyed aggregation (sort_array over (ts, id, type)
    * structs — no window), its length-n windows become '>'-joined path
    * strings by a codegen array transform, and the global top-k is
    * TakeOrderedAndProject over the path counts (never a full sort). A
    * user costs its own event count; paths cross no user boundary.
    * Output: (path, n_occurrences), k rows, ties path-ascending.
    */
  def topEventPaths(events: DataFrame, n: Int = 3, k: Int = 10,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(n >= 2, s"topEventPaths: need path length >= 2, got $n")
    require(k >= 1, s"topEventPaths: need k >= 1, got $k")
    val seqs = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(idCol), col(typeCol).as("t")))).as("__e"))
      .select(transform(col("__e"), e => e.getField("t")).as("__t"))
    seqs
      .filter(size(col("__t")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("__t")) - n),
        i => concat_ws(">", slice(col("__t"), i + 1, lit(n))))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path"))
      .limit(k)
  }

  def retentionCohorts(events: DataFrame): DataFrame = {
    val us = org.apache.spark.sql.graftbridge.Bridge
      .integralDivide(col("ts"), lit(1000L))
    val weekUs = 7L * 86400L * 1000000L
    def week(c: org.apache.spark.sql.Column) = org.apache.spark.sql.graftbridge.Bridge
      .integralDivide(c, lit(weekUs))
    val act = events.select(col("user_id"), week(us).as("activity_week"))
    val cohort = act.groupBy(col("user_id"))
      .agg(min(col("activity_week")).as("cohort_week"))
    act.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), col("activity_week"))
      .agg(count_distinct(col("user_id")).as("n_active_users"))
      .withColumn("week_offset", col("activity_week") - col("cohort_week"))
      .select(col("cohort_week"), col("activity_week"), col("week_offset"),
        col("n_active_users"))
  }

  /** Ordered FUNNEL analysis: for each user, the earliest time they
    * completed each step of `steps` IN ORDER (step i+1 strictly after
    * step i) — the conversion-funnel query every product-analytics
    * pipeline runs. Greedy-earliest semantics: step 1 anchors at the
    * user's first step-1 event; each later step at its first qualifying
    * event after the previous step. (Greedy-earliest is a valid witness
    * whenever ANY ordered witness exists, so reach counts are exact.)
    *
    * Shape: one keyed (user) min-aggregate per step, joined back on
    * user_id with a strictly-greater residual — k steps = k keyed
    * shuffles of the (small) per-step event slices, never a per-user
    * window over full histories or a collect of event sequences. Output:
    * one row per user who completed step 1, with `step{i}_us` micro-epoch
    * columns (NULL once the funnel breaks).
    */
  /** Forward fill (LOCF — last observation carried forward) per key: the
    * telemetry / slowly-changing-dimension gap repair — a NULL reading
    * takes the key's most recent non-NULL value in event order; leading
    * NULLs (nothing observed yet) stay NULL, never invent data. One
    * per-KEY ordered window (`last(ignoreNulls)` over unbounded-preceding
    * rows) — a key costs its own history, no corpus window. `orderCols`
    * must reach a unique order (append the event id).
    * Output: input columns + `<valueCol>_ff`.
    */
  def forwardFill(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String): DataFrame = {
    require(orderCols.nonEmpty, "forwardFill: need at least one order column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${valueCol}_ff",
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** LINEAR MULTI-TOUCH ATTRIBUTION — the credit-assignment completion
    * of the funnel/attribution family ([[streamingAttributionPairs]]
    * finds src→dst pairs; funnels count stage survival; this answers
    * "which CHANNEL gets the conversion credit"): for each user's FIRST
    * `convType` event, every strictly-earlier event is a touch and
    * shares the conversion's one unit of credit equally (the linear
    * model — first-touch and last-touch are the argmin/argmax
    * specializations). Per-touch credit 1/n snaps to the 1e-6 grid;
    * per-channel totals sum in exact decimal. Conversions with zero
    * preceding touches credit nothing (stated; the self-credit variant
    * is a different model).
    *
    * Scale shape: one user-keyed aggregation for the first-conversion
    * time, one keyed join back (broadcastable at converter counts, AQE's
    * choice), one per-user touch count, one channel aggregation —
    * nothing user-quadratic, no windows. Output: (typeCol, n_touches,
    * credit) per channel that touched any converting journey.
    */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__tc"))
    val touches = events.join(conv, Seq(userCol))
      .filter(col(tsCol) < col("__tc"))
      .select(col(userCol), col(typeCol))
    val perUser = touches.groupBy(col(userCol))
      .agg(count(lit(1)).as("__nt"))
    touches.join(perUser, Seq(userCol))
      .select(col(typeCol), graft.pipeline.TextAnalysis.round6(
        lit(1.0) / col("__nt")).as("__credit"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("__credit").cast("decimal(28,6)")).cast("double").as("credit"))
  }

  /** LINEAR INTERPOLATION gap fill per key — [[forwardFill]]'s
    * time-aware sibling (LOCF repeats the last reading; interpolation
    * reconstructs a smoothly varying signal between the bounding
    * readings — sensor/metric backfill): a NULL reading becomes
    *
    *   prev + (next − prev) · (ts − ts_prev) / (ts_next − ts_prev)
    *
    * from the key's nearest non-NULL neighbors in event order. Rows
    * missing EITHER side (leading/trailing gaps) stay NULL — never
    * invent data, the [[forwardFill]] law; equal-timestamp neighbors
    * (a zero-length gap) take the previous value. The interpolated
    * value snaps to the 1e-6 grid; pass-through values are untouched.
    *
    * Scale shape: two keyed windows over the SAME (key, tsCol, tieCol)
    * ordering — one sort, no self-join; a key costs its own history.
    * `tieCol` must make the order unique or neighbor choice is
    * nondeterministic. tsCol is integer time (the ns convention).
    */
  def interpolateLinear(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val wPrev = base.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = base.rowsBetween(1, Window.unboundedFollowing)
    val obs = when(col(valueCol).isNotNull,
      struct(col(tsCol).as("t"), col(valueCol).as("v")))
    val pv = last(obs, ignoreNulls = true).over(wPrev)
    val nv = first(obs, ignoreNulls = true).over(wNext)
    val ratio = (col(tsCol) - pv.getField("t")).cast("double") /
      (nv.getField("t") - pv.getField("t"))
    df.withColumn(s"${valueCol}_li",
      when(col(valueCol).isNotNull, col(valueCol))
        .when(pv.isNotNull && nv.isNotNull,
          when(nv.getField("t") > pv.getField("t"),
            graft.pipeline.TextAnalysis.round6(
              pv.getField("v") +
                (nv.getField("v") - pv.getField("v")) * ratio))
            .otherwise(pv.getField("v"))))
  }

  /** SCD2-style CHANGE INTERVALS — compress a per-key state log into the
    * validity-interval history table (one row per state RUN: the row's
    * state held from `valid_from` until the next change's `valid_to`,
    * NULL = still current). The warehouse "slowly changing dimension"
    * build, as one declarative pass: a keyed lag marks change points
    * (null-SAFE compare, so consecutive NULL states collapse into one
    * run and a NULL run is a real run), a keyed lead closes each
    * interval, and `version` numbers the runs 1..n per key.
    *
    * Scale shape: two keyed windows over the SAME (key, orderCols)
    * ordering — one sort, no self-join, no global window; cost is the
    * per-key history length. `orderCols` must reach a unique order (add
    * an id tiebreaker) or run boundaries are nondeterministic. Output:
    * (keyCol, state = stateCol, valid_from = first orderCol at the
    * change, valid_to, version).
    */
  def changeIntervals(df: DataFrame, keyCol: String, orderCols: Seq[String],
      stateCol: String): DataFrame = {
    require(orderCols.nonEmpty, "changeIntervals: need at least one order column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val marked = df
      .select((keyCol +: stateCol +: orderCols).distinct.map(col): _*)
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(stateCol)))
    marked
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col(keyCol), col(stateCol).as("state"), col("valid_from"),
        col("valid_to"), col("version"))
  }

  /** TIME-DECAYED counts per key — the recency-weighted frequency behind
    * trending-topic / hot-domain / activity-score features: each event
    * contributes 2^(−age/halflife) with the age bucketed to INTEGER
    * half-lives. The integer bucketing is what makes the statistic
    * ENGINE-EXACT where exponential decay normally isn't portable
    * (`pow`/`exp` are not correctly rounded): every weight is a dyadic
    * rational, so the sum is computed EXACTLY as Σ 2^(62−b) in
    * DECIMAL(38,0) integers (b > 62 contributes 0 — under 2⁻⁶² an event
    * is gone at any realistic count) and the single final division by 2⁶²
    * is an exact power-of-two scale; one snap at the end. One keyed
    * aggregation with map-side partials. Events after `asOfNs` drop
    * (a decayed count is always "as of" a moment; future events have no
    * defined age). Expects [[graft.Tables.eventsWithTs]]'s ns-LONG `ts`.
    * Output: (keyCol, n, decayed_count).
    */
  def decayedCounts(events: DataFrame, asOfNs: Long, halflifeNs: Long,
      keyCol: String = "event_type"): DataFrame = {
    require(halflifeNs > 0, s"decayedCounts: halflife must be > 0, got $halflifeNs")
    val b = org.apache.spark.sql.graftbridge.Bridge
      .integralDivide(lit(asOfNs) - col("ts"), lit(halflifeNs))
    events
      .filter(col("ts") <= asOfNs)
      .withColumn("__b", b)
      .withColumn("__t",
        when(col("__b") <= 62,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(62 - __b AS INT))"))
          .otherwise(lit(0L)).cast("decimal(38,0)"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        graft.pipeline.TextAnalysis.round6(
          sum(col("__t")).cast("double") / lit(math.pow(2.0, 62)))
          .as("decayed_count"))
  }

  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    val us = org.apache.spark.sql.graftbridge.Bridge
      .integralDivide(col("ts"), lit(1000L))
    def slice(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"), us.as("__us"))
    var acc = slice(steps.head).groupBy(col("user_id"))
      .agg(min(col("__us")).as("step1_us"))
    for (i <- 2 to steps.length) {
      val prev = s"step${i - 1}_us"
      val next = slice(steps(i - 1))
      acc = acc.join(
        next.select(col("user_id").as("__u"), col("__us")),
        col("user_id") === col("__u") && col("__us") > col(prev), "left")
        .groupBy(acc.columns.map(col): _*)
        .agg(min(col("__us")).as(s"step${i}_us"))
    }
    acc
  }

  /** Per-group z-score anomaly flags — the monitoring staple over a metric
    * stream: each row scored against ITS GROUP's mean/stddev (population
    * form), flagged beyond `zThreshold`. Two keyed passes: one aggregate
    * for the per-group moments (exact decimal sums, so mean and variance
    * are engine-deterministic regardless of partial-agg order), one keyed
    * join back (the moments frame has one row per group — AQE broadcasts
    * it). Degenerate groups (zero variance) z-score to 0 rather than
    * dividing by zero. z is 6-dec snapped. Output: input columns +
    * (group mean, stddev, z, is_anomaly).
    */
  def zScoreFlags(df: DataFrame, groupCol: String, valueCol: String,
      zThreshold: Double = 3.0): DataFrame = {
    import graft.pipeline.TextAnalysis.round6
    val v = col(valueCol).cast("double")
    // v*v carries more decimals than the exact-decimal width — snap it
    // with the IEEE floor form FIRST (engine-identical), then sum exactly
    val moments = df.groupBy(col(groupCol))
      .agg(count(v).as("__n"),
        sum(v.cast("decimal(28,6)")).cast("double").as("__s"),
        sum(round6(v * v).cast("decimal(28,6)")).cast("double").as("__s2"))
      .select(col(groupCol), (col("__s") / col("__n")).as("__mean"),
        sqrt(col("__s2") / col("__n") -
          (col("__s") / col("__n")) * (col("__s") / col("__n"))).as("__sd"))
    df.join(moments, Seq(groupCol))
      .withColumn("z", round6(
        when(col("__sd") > 0.0, (v - col("__mean")) / col("__sd"))
          .otherwise(lit(0.0))))
      .withColumn("is_anomaly", abs(col("z")) > zThreshold)
      .withColumnRenamed("__mean", "group_mean")
      .withColumnRenamed("__sd", "group_stddev")
  }

  /** Sessionization per user: events within `gapMinutes` of each other chain
    * into one session (classic gaps-and-islands — batch form; the streaming
    * form is [[streamingSessionize]]).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Gap compare runs on integer MICROSECONDS (the native precision of the
    // timestamps), never on second-truncated unix_timestamp: a 1800.4 s gap
    // must split on both engines. event_id tiebreaks equal timestamps so the
    // window order is total.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__ts_us"), col("event_id"))
    events
      .withColumn("__ts_us",
        org.apache.spark.sql.graftbridge.Bridge.integralDivide(col("ts"), lit(1000L)))
      .withColumn("event_time", timestamp_micros(col("__ts_us")))
      .withColumn("__prev", lag(col("__ts_us"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          col("__ts_us") - col("__prev") > gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("event_time")).as("session_start"),
        max(col("event_time")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Lag-k AUTOCORRELATION per key (Box/Jenkins sample ACF) — the
    * periodicity/memory readout over a metric stream: for each `groupCol`
    * series ordered by (`tsCol`, `tieCol`), r_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄)
    * / Σ_t(x_t−x̄)² for k = 1..maxLag (the standard biased-denominator
    * form, so r_0 ≡ 1 and |r_k| ≤ 1). Engine-deterministic: x snaps to the
    * 1e-6 grid first; x̄ comes from an exact decimal sum; every centered
    * product is cast to DECIMAL(38,12) before summing, so partial-agg
    * order cannot move a bit.
    *
    * Shape at scale: one keyed window sort carries ALL maxLag lag columns
    * (one exchange + one sort, not one per lag), the per-key moments frame
    * is group-cardinality-sized (AQE broadcasts it back), and the lag→row
    * unpivot is a stateless posexplode. Keys with < k+1 points or zero
    * variance report NULL at that lag. Output: (groupCol, lag, n, acf).
    */
  def acfByKey(events: DataFrame, groupCol: String, tsCol: String,
      tieCol: String, valueCol: String, maxLag: Int = 3): DataFrame = {
    import graft.pipeline.TextAnalysis.round6
    import org.apache.spark.sql.expressions.Window
    require(maxLag >= 1 && maxLag <= 16,
      s"acfByKey: maxLag must be in [1, 16], got $maxLag")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(tsCol), col(tieCol))
    val base = events
      .select(col(groupCol), col(tsCol), col(tieCol),
        round6(col(valueCol).cast("double")).as("__x"))
      .filter(col("__x").isNotNull)
    val means = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,6)")).cast("double").as("__s"))
      .select(col(groupCol), col("n"), (col("__s") / col("n")).as("__mean"))
    val lagged = (1 to maxLag).foldLeft(base) { (df, k) =>
      df.withColumn(s"__x_$k", lag(col("__x"), k).over(w))
    }
    val centered = lagged.join(means, Seq(groupCol))
    val perKey = centered.groupBy(col(groupCol), col("n"))
      .agg(
        sum(((col("__x") - col("__mean")) * (col("__x") - col("__mean")))
          .cast("decimal(38,12)")).cast("double").as("__den"),
        (1 to maxLag).map { k =>
          sum(((col("__x") - col("__mean")) * (col(s"__x_$k") - col("__mean")))
            .cast("decimal(38,12)")).cast("double").as(s"__num_$k")
        }: _*)
    perKey
      .select(col(groupCol), col("n"), col("__den"),
        posexplode(array((1 to maxLag).map(k => col(s"__num_$k")): _*))
          .as(Seq("__k0", "__num")))
      .select(col(groupCol), (col("__k0") + 1).as("lag"), col("n"),
        when(col("__den") > 0.0 && col("__num").isNotNull,
          round6(col("__num") / col("__den"))).as("acf"))
  }

  /** CUSUM mean-shift statistic per key (Page 1954 / the standardized
    * cumulative-sum changepoint screen): over each `groupCol` series in
    * (`tsCol`, `tieCol`) order, S_t = Σ_{i≤t}(x_i − x̄); the reported
    * statistic is max_t |S_t| / (σ·√n) — ~0.3-0.9 under a stable mean,
    * large when the mean shifts mid-series — plus the FIRST order position
    * attaining the max (`change_seq`, 1-based) as the changepoint estimate.
    * Determinism: x snaps to 1e-6; x̄/σ come from exact decimal moments;
    * each centered term is cast to DECIMAL(38,12) so the RUNNING window
    * sum is exact-decimal (associativity-free), not a sequential double
    * fold. Zero-variance keys report NULL.
    *
    * Shape at scale: one keyed window sort (the running sum + row_number
    * share it), one group-cardinality moments join (broadcast), one final
    * keyed aggregate via max_by on the (|S|, −seq) pair — no self-join,
    * nothing corpus-wide. Output: (groupCol, n, cusum_stat, change_seq).
    */
  def cusumMaxShift(events: DataFrame, groupCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    import graft.pipeline.TextAnalysis.round6
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(tsCol), col(tieCol))
    val base = events
      .select(col(groupCol), col(tsCol), col(tieCol),
        round6(col(valueCol).cast("double")).as("__x"))
      .filter(col("__x").isNotNull)
    val moments = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,6)")).cast("double").as("__s"),
        sum(round6(col("__x") * col("__x")).cast("decimal(38,6)"))
          .cast("double").as("__s2"))
      .select(col(groupCol), col("n"),
        (col("__s") / col("n")).as("__mean"),
        sqrt(col("__s2") / col("n") -
          (col("__s") / col("n")) * (col("__s") / col("n"))).as("__sd"))
    val run = base.join(moments, Seq(groupCol))
      .withColumn("__seq", row_number().over(w))
      .withColumn("__scum",
        sum((col("__x") - col("__mean")).cast("decimal(38,12)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__sabs", abs(col("__scum").cast("double")))
    run.groupBy(col(groupCol), col("n"), col("__sd"))
      .agg(max_by(col("__seq"),
          struct(col("__sabs"), (-col("__seq")).as("__negseq"))).as("change_seq"),
        max(col("__sabs")).as("__smax"))
      .select(col(groupCol), col("n"),
        when(col("__sd") > 0.0,
          round6(col("__smax") / (col("__sd") * sqrt(col("n").cast("double")))))
          .as("cusum_stat"),
        when(col("__sd") > 0.0, col("change_seq").cast("long")).as("change_seq"))
  }
}
