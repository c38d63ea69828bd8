package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution blocking structures AT REST — the ER twin of
  * [[TextIndex]] (band/BM25 postings) and [[VectorIndex]] (IVF-PQ):
  * [[Dedup.editDistancePairs]] and [[Dedup.sortedNeighborPairs]] rebuild
  * their blocking structures from the full corpus on every run, but a
  * production master-data corpus is resolved INCREMENTALLY — each arriving
  * batch matches against the SAME existing records. At 100 TB the
  * corpus-side key expansion (FastSS) and the corpus-wide range sort (SNM)
  * must happen once, at build time, not once per batch.
  *
  * Two structures:
  *
  * 1. FastSS deletion-key index (Bocek et al. 2007): (term, key) rows for
  *    every member of each DISTINCT term's <= maxDist deletion
  *    neighborhood, persisted bucketed+sorted on `key` — probes then plan
  *    with NO exchange on the index side, exactly like the band index.
  *    Keys are per-term-local (no cross-term state), so
  *    `write(old); append(new)` is row-identical to `write(old ∪ new)` —
  *    probe-after-append ≡ probe-after-rebuild (the q354 gate pins this
  *    against a full-corpus oracle that never sees the index).
  *
  * 2. SNM rank layout (Hernández/Stolfo 1995 sorted-neighborhood): the
  *    corpus range-partitioned and stored by blocking-key order, one
  *    parquet partition per contiguous key range (`range_id=`), plus a
  *    manifest table of per-range (lo, hi, n_rows) bounds. A batch probe
  *    touches only the ranges its keys fall in, plus one adjacent range
  *    on each side — partition-pruned at the scan — and runs the windowed
  *    pairing on that contiguous slice. Appends route new rows to their
  *    covering ranges by the STORED bounds (a broadcast of the tiny
  *    manifest), so the at-rest order never re-sorts.
  *
  * SNM probe exactness: touched ∪ adjacent ranges form contiguous
  * intervals of the global (key, id) order, and batch rows are routed by
  * the same bounds, so LOCAL rank differences inside an interval equal
  * GLOBAL rank differences in the full union; a batch row's window
  * partners (<= window-1 positions away) stay inside its own range or
  * spill at most window-1 rows into an adjacent one, which is covered
  * whenever every range holds >= window-1 rows — checked against the
  * manifest and refused loudly otherwise.
  */
object ErIndex {

  // ---- FastSS deletion-key index ----

  /** Table property recording the maxDist the index was expanded at —
    * the recall guarantee is only valid for probes at <= this distance,
    * so the probe path reads it back and refuses a deeper probe loudly
    * instead of silently losing recall.
    */
  private val MaxDistProp = "graft.fastss.maxdist"

  /** Build + persist the deletion-key index over the DISTINCT terms: one
    * key-expansion pass, written bucketed+sorted by `key`. Overwrites
    * table and path. The build `maxDist` is stamped into the table
    * properties; probes and appends validate against it.
    */
  def writeFastSSIndex(terms: DataFrame, table: String, path: String,
      termCol: String = "term", maxDist: Int = 1,
      buckets: Int = 16): Unit = {
    val spark = terms.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    fastSSRows(terms, termCol, maxDist)
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "key")
      .sortBy("key")
      .format("parquet")
      .saveAsTable(table)
    spark.sql(
      s"ALTER TABLE `$table` SET TBLPROPERTIES ('$MaxDistProp' = '$maxDist')")
  }

  /** The maxDist a stored index was built at (from table properties).
    * Refuses indexes written before the property existed — their depth
    * is unknowable, so every probe against them would be unsafe.
    */
  def fastSSIndexMaxDist(spark: SparkSession, table: String): Int = {
    val rows = spark.sql(s"SHOW TBLPROPERTIES `$table` ('$MaxDistProp')")
      .collect()
    val v = rows.headOption.map(_.getString(1))
      .filterNot(_.contains("does not have property"))
    v.map(_.toInt).getOrElse(sys.error(
      s"FastSS index '$table' records no build maxDist " +
        s"(missing table property $MaxDistProp) — rebuild with writeFastSSIndex"))
  }

  /** Incremental maintenance: key-expand ONLY the new batch and append
    * under the same bucket spec. Deletion keys are per-term-local, so the
    * appended table is row-identical to a full rebuild (modulo duplicate
    * terms across batches, which the probe's distinct absorbs). The batch
    * is expanded at the STORED maxDist — a shallower append would leave
    * the new terms under-expanded and silently break the index's recall
    * contract for every later probe.
    */
  def appendToFastSSIndex(newTerms: DataFrame, table: String,
      termCol: String = "term",
      buckets: Int = 16): Unit = {
    val maxDist = fastSSIndexMaxDist(newTerms.sparkSession, table)
    fastSSRows(newTerms, termCol, maxDist)
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "key")
      .sortBy("key")
      .format("parquet")
      .saveAsTable(table)
  }

  private def fastSSRows(terms: DataFrame, termCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"FastSS index: maxDist must be 1 or 2, got $maxDist")
    terms.select(col(termCol).as("term"))
      .filter(col("term").isNotNull && length(col("term")) >= 1)
      .distinct()
      .select(col("term"),
        explode(Dedup.deletionNeighborhood(col("term"), maxDist)).as("key"))
  }

  def readFastSSIndex(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Probe a batch of terms against the stored index: key-expand the
    * batch (its own small expansion pass), equi-join on the deletion key
    * — no exchange on the index side (pre-bucketed on exactly the join
    * key) — and refine with true `levenshtein`. Recall-exact by the
    * FastSS pigeonhole: two strings within distance d share a <= d
    * deletion variant. The index must have been built with a `maxDist`
    * >= this probe's — the table-name overload enforces that against the
    * stored build property; this DataFrame form is the unchecked core
    * for callers that already validated (or composed) the index.
    * Output: (term, corpus_term, dist), dist in [1, maxDist] (identity
    * matches are dropped), over distinct terms.
    */
  def probeFastSS(index: DataFrame, batch: DataFrame,
      termCol: String, maxDist: Int): DataFrame = {
    val b = fastSSRows(batch, termCol, maxDist)
    b.join(index.select(col("term").as("corpus_term"), col("key")), Seq("key"))
      .filter(col("term") =!= col("corpus_term"))
      .withColumn("dist", levenshtein(col("term"), col("corpus_term")))
      .filter(col("dist") <= maxDist)
      .select(col("term"), col("corpus_term"), col("dist"))
      .distinct()
  }

  /** Probe a STORED index by table name — validates the probe's
    * `maxDist` against the build's (recorded in the table properties by
    * [[writeFastSSIndex]]): probing a d=1 index at maxDist=2 would
    * silently lose recall (the index holds no depth-2 deletion keys), so
    * it refuses loudly instead.
    */
  def probeFastSS(spark: SparkSession, table: String, batch: DataFrame,
      termCol: String = "term", maxDist: Int = 1): DataFrame = {
    val built = fastSSIndexMaxDist(spark, table)
    require(built >= maxDist,
      s"probeFastSS: index '$table' was built with maxDist=$built, " +
        s"probing at maxDist=$maxDist would silently lose recall — " +
        "rebuild the index at the deeper distance")
    probeFastSS(spark.table(table), batch, termCol, maxDist)
  }

  // ---- SNM rank layout ----

  /** Build + persist the sorted-neighborhood layout: the corpus
    * range-partitioned on (keyCol, idCol) into `numRanges` contiguous
    * key ranges, one parquet partition (`range_id=`) each, plus the
    * `table`_manifest table of per-range (range_id, lo_key, lo_id,
    * hi_key, hi_id, n_rows). The ONE corpus-wide range exchange happens
    * here, at build time.
    */
  def writeSnmLayout(df: DataFrame, table: String, path: String,
      keyCol: String, idCol: String, numRanges: Int = 16): Unit = {
    require(numRanges >= 1, s"writeSnmLayout: numRanges must be >= 1")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"DROP TABLE IF EXISTS `${table}_manifest`")
    val ranged = df.select(col(idCol).as("id"), col(keyCol).as("key"))
      .repartitionByRange(numRanges, col("key"), col("id"))
      .withColumn("range_id", spark_partition_id())
    ranged.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .partitionBy("range_id")
      .format("parquet")
      .saveAsTable(table)
    refreshManifest(spark, table)
  }

  /** Recompute the per-range bounds manifest from the stored layout —
    * O(ranges) output from one partition-local aggregation. The manifest
    * lives UNDER the layout's own location (a `_`-prefixed dir, hidden
    * from the layout's file listing), never in the warehouse: a managed
    * table's warehouse dir outlives the in-memory catalog, so a second
    * JVM reusing a deterministic layout name would hit
    * LOCATION_ALREADY_EXISTS on a directory its catalog has never heard
    * of. External + explicit path keeps the whole structure
    * self-contained and idempotent across sessions.
    */
  private def refreshManifest(spark: SparkSession, table: String): Unit = {
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).location
    val manPath = new java.net.URI(loc.toString.stripSuffix("/") +
      "/_graft_manifest").toString
    spark.sql(s"DROP TABLE IF EXISTS `${table}_manifest`")
    spark.table(table)
      .groupBy(col("range_id"))
      .agg(min(struct(col("key"), col("id"))).as("lo"),
        max(struct(col("key"), col("id"))).as("hi"),
        count(lit(1)).as("n_rows"))
      .select(col("range_id"), col("lo.key").as("lo_key"), col("lo.id").as("lo_id"),
        col("hi.key").as("hi_key"), col("hi.id").as("hi_id"), col("n_rows"))
      .write.mode(SaveMode.Overwrite).option("path", manPath).format("parquet")
      .saveAsTable(s"${table}_manifest")
  }

  /** Route new rows to their covering ranges by the STORED bounds (rows
    * below the first range's lo go to range 0; above the last hi, to the
    * last range) and append — no re-sort of what's at rest. The manifest
    * is refreshed (an O(ranges) aggregation).
    */
  def appendToSnmLayout(newDf: DataFrame, table: String,
      keyCol: String, idCol: String): Unit = {
    val spark = newDf.sparkSession
    val routed = routeToRanges(spark, table,
      newDf.select(col(idCol).as("id"), col(keyCol).as("key")))
    routed.select(col("id"), col("key"), col("range_id"))
      .write.mode(SaveMode.Append)
      .partitionBy("range_id")
      .format("parquet")
      .saveAsTable(table)
    refreshManifest(spark, table)
  }

  /** Assign each row the id of the range whose [lo, hi] interval covers
    * its (key, id) — by broadcast-joining the tiny manifest on
    * row >= lo and taking the max matching range (range 0 when below
    * all). Cost: |rows| x |ranges| predicate evaluations on a broadcast,
    * no shuffle of `rows`.
    */
  private def routeToRanges(spark: SparkSession, table: String,
      rows: DataFrame): DataFrame = {
    val manifest = spark.table(s"${table}_manifest")
      .select(col("range_id"), col("lo_key"), col("lo_id"))
    rows
      .join(broadcast(manifest),
        struct(col("key"), col("id")) >= struct(col("lo_key"), col("lo_id")),
        "left")
      .groupBy(col("id"), col("key"))
      .agg(coalesce(max(col("range_id")), lit(0)).as("range_id"))
  }

  /** Sorted-neighborhood pairs INVOLVING a new batch, against the stored
    * layout + the batch, exchange-free on the corpus side: only the
    * ranges the batch touches (plus one adjacent range each side) are
    * scanned — partition-pruned on `range_id` — and the windowed pairing
    * ([[Dedup.sortedNeighborPairs]]) runs on that contiguous slice of
    * the global order, which preserves every rank DIFFERENCE and hence
    * every window decision of the full union (see the object scaladoc
    * for the exactness argument). Output: (id_a, id_b, key_a, key_b)
    * with order(a) < order(b), restricted to pairs with a batch member.
    *
    * Refuses loudly when any stored range holds fewer than `window - 1`
    * rows (a window could then span past the adjacent range).
    */
  def probeSnm(spark: SparkSession, table: String, batch: DataFrame,
      keyCol: String, idCol: String, window: Int): DataFrame = {
    val slice = snmSlice(spark, table, batch, keyCol, idCol, window)
    val pairs = Dedup.sortedNeighborPairs(slice, "key", "id", window)
    val bIds = batch.select(col(idCol).as("id"))
    pairs.join(bIds.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
      .unionByName(
        pairs.join(bIds.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
          .select(pairs.columns.map(col).toSeq: _*))
      .distinct()
  }

  /** FULL-corpus sorted-neighborhood pairs from the stored layout, with
    * NO corpus-wide range exchange: [[Dedup.sortedNeighborPairs]] pays a
    * RangePartitioner sampling pass + range shuffle + checkpoint + count
    * collect on EVERY run to derive global ranks; the layout already
    * paid that once at build time, so here rank = manifest cumulative
    * offset (at rest, O(ranges)) + a row_number WITHIN each `range_id`
    * partition — one hash exchange on range_id, no sampling job, no
    * checkpoint. Ranges are contiguous intervals of the global
    * (key, id) order by construction, so the ranks (hence the pairs)
    * are identical to the from-scratch form. Empty ranges contribute a
    * zero offset and are harmless here (no probe adjacency argument is
    * involved). Per-range work is bounded by the layout's range
    * granularity — size `numRanges` to the corpus at build time (the
    * window sort is per-range, not global).
    */
  def snmPairsAtRest(spark: SparkSession, table: String,
      window: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranges = spark.table(s"${table}_manifest")
      .select(col("range_id"), col("n_rows")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    require(ranges.nonEmpty,
      s"snmPairsAtRest: '$table' manifest is empty — build the layout first")
    val offsets = ranges.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (rid, n)) => (rid, acc + n)
    }.init.map { case (_, off) => off } // offset BEFORE each range, in order
    val spark0 = spark
    import spark0.implicits._
    val offDf = ranges.map(_._1).zip(offsets).toSeq.toDF("range_id", "__off")
    val ranked = spark.table(table)
      .join(broadcast(offDf), Seq("range_id"))
      .withColumn("__r",
        row_number().over(
          Window.partitionBy(col("range_id")).orderBy(col("key"), col("id")))
          .cast("long") + col("__off") - 1L)
    Dedup.snmPairsFromRanked(ranked, "key", "id", window)
  }

  /** The contiguous corpus slice a batch probe runs over: the batch's
    * ranges ± 1 adjacent (an O(|batch ranges|) driver-side set pushed as
    * a PARTITION filter — the scan prunes every other range) unioned with
    * the routed batch rows. Package-visible so specs can pin the pruned
    * scan; [[probeSnm]] builds on it.
    */
  private[pipeline] def snmSlice(spark: SparkSession, table: String,
      batch: DataFrame, keyCol: String, idCol: String,
      window: Int): DataFrame = {
    require(window >= 2, s"probeSnm: window must be >= 2, got $window")
    // O(ranges) driver-side manifest audit. The ±1-adjacency argument
    // needs every range_id in 0..max to EXIST with >= window-1 rows: a
    // range_id absent from the manifest is an EMPTY partition (e.g. a
    // trailing range narrower than realizable bounds) — n_rows = 0 —
    // which the old n_rows filter could not see, so treat missing ids as
    // zero-row ranges and refuse them by the same rule.
    val ranges = spark.table(s"${table}_manifest")
      .select(col("range_id"), col("n_rows")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    require(ranges.nonEmpty, s"probeSnm: '$table' manifest is empty — build the layout first")
    val maxId = ranges.map(_._1).max
    val missing = (0 to maxId).toSet -- ranges.map(_._1).toSet
    val tooThin = ranges.count(_._2 < window - 1) + missing.size
    require(tooThin == 0,
      s"probeSnm: $tooThin stored range(s) hold fewer than window-1 rows" +
        (if (missing.nonEmpty)
          s" (range ids ${missing.toSeq.sorted.mkString(",")} are empty — absent from the manifest)"
        else "") +
        " — a window could span past the adjacent range; rebuild with fewer ranges")
    val b = routeToRanges(spark, table,
      batch.select(col(idCol).as("id"), col(keyCol).as("key")))
      .localCheckpoint(true)
    val touched = b.select(col("range_id")).distinct().collect()
      .map(_.getInt(0)).flatMap(r => Seq(r - 1, r, r + 1)).distinct.sorted
    spark.table(table)
      .filter(col("range_id").isin(touched.map(Integer.valueOf): _*))
      .select(col("id"), col("key"))
      .unionByName(b.select(col("id"), col("key")))
  }
}
