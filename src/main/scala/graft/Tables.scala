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

  /** events incl. `ts` read as LONG nanoseconds-since-epoch regardless of
    * the file's physical timestamp unit. Reading an int64 timestamp column
    * through an explicit LONG schema yields the RAW stored integer, so the
    * footer's logical-type unit (the driver has generated both
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) fixtures across rounds)
    * decides the scale factor to normalize back to the ns contract every
    * event-time consumer assumes. One driver-side footer read per call.
    */
  def eventsWithTs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val raw = s.read.schema(
      "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")
    val toNs = tsUnit(s, s"$d/events.parquet") match {
      case "NANOS" => 1L
      case "MICROS" => 1000L
      case "MILLIS" => 1000000L
      case u => throw new IllegalStateException(s"unsupported events.ts unit $u")
    }
    if (toNs == 1L) raw else raw.withColumn("ts", col("ts") * toNs)
  }

  /** Timestamp unit ("NANOS"/"MICROS"/"MILLIS") of the `ts` column from the
    * parquet footer's logical-type annotation.
    */
  private def tsUnit(s: SparkSession, path: String): String = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(s"no parquet part under $path"))
      else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      schema.getType(schema.getFieldIndex("ts"))
        .asPrimitiveType().getLogicalTypeAnnotation match {
        case t: TimestampLogicalTypeAnnotation => t.getUnit.toString
        case other => throw new IllegalStateException(
          s"events.ts is not a timestamp column (logical type $other)")
      }
    } finally reader.close()
  }
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
