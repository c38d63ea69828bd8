package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (see /root/repo/TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` handles — lazy, column-pruned and
  * predicate-pushdown friendly. Nothing is cached here; callers decide.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** `events.ts` is TIMESTAMP(NANOS) which Spark's parquet reader rejects at
    * schema inference; an explicit schema skips the column (consumers needing
    * event time use [[eventsWithTs]], which reads ts as nanos-since-epoch).
    */
  def events(s: SparkSession, d: String): DataFrame =
    s.read.schema(
      "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")

  /** events incl. `ts` read as LONG nanoseconds (legacy nanosAsLong). */
  def eventsWithTs(s: SparkSession, d: String): DataFrame =
    s.read.schema(
      "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")
  /** Spread a CPU-bound corpus scan across the session's cores when the
    * file layout under-parallelizes it. A single small parquet file (one
    * row group) scans as ONE task, serializing every md5/regex-heavy text
    * kernel downstream; a repartition of a few MB is the correct plan then.
    * At production scale the scan already has >= cores splits, the
    * condition is false, and NO shuffle is added — this must never turn
    * into an unconditional repartition of a 100 TB corpus.
    */
  private def spread(s: SparkSession, df: DataFrame, key: String): DataFrame = {
    val want = s.sparkContext.defaultParallelism
    // hash-partition on the downstream group key (not round-robin): per-doc
    // windows and groupBys then REUSE this partitioning instead of adding
    // their own exchange on top
    if (df.rdd.getNumPartitions * 4 <= want)
      df.repartition(want, org.apache.spark.sql.functions.col(key))
    else df
  }

  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(s, t(s, d, "embeddings"), "vec_id")

  /** [[documents]], spread across the session's cores when the file layout
    * under-parallelizes the scan (a single small parquet file = ONE task,
    * serializing md5/regex-heavy per-doc kernels onto one core; at
    * production scale the scan already has >= cores splits and no shuffle
    * is added). Use for embarrassingly-parallel per-document compute; for
    * join-heavy pipelines (LSH banding and friends) use the plain scan —
    * measured at sf0.1, the pre-shuffle costs those MORE than the extra
    * parallelism returns, while per-doc kernels speed up 4-5x.
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spread(s, t(s, d, "documents"), "doc_id")
}
