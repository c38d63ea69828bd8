package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest Bloom-filter SIDECAR for key point-lookups over a partitioned
  * layout — the third member of the at-rest index family (VectorIndex:
  * IVF-PQ partition dirs; TextIndex: bucketed band/postings tables). The
  * layout is partitioned by a column the KEY does not determine (source,
  * date, language); a point lookup would otherwise scan every partition.
  * The sidecar holds one Bloom bitmap per partition value (`bits` bits as
  * bits/64 longs, `hashes` Kirsch–Mitzenmacher probes from the two md5
  * words — the same family as the MinHash/CMS kernels), so lookup planning
  * reads O(partitions · bits/64) sidecar rows, never the data, and the
  * scan touches only partitions whose bitmap holds every probe of some
  * requested key. Bloom false positives cost an extra partition scan; the
  * exact key predicate (pushed to parquet row groups) removes their rows,
  * so results are EXACT. No false negatives by construction.
  *
  * At 100 TB: the sidecar is ~(partitions · bits/8) bytes — a 4 KiB bitmap
  * per partition indexes ~4k keys/partition at 1% fp; the planning
  * collect is an O(index) driver handoff like ZOrder's range planning,
  * and the data scan is PartitionFilters + PushedFilters all the way.
  */
object BloomIndex {

  /** Sidecar parameters persisted with the layout. */
  final case class BloomMeta(partCol: String, keyCol: String, bits: Int,
    hashes: Int, salt: String)

  /** (word, mask) probe rows for every key row: probe j lands on bit
    * (w1 + j·w2) mod bits; word = bit >> 6, mask = 1 << (bit & 63).
    */
  private def probes(df: DataFrame, keyCol: String, bits: Int, hashes: Int,
      salt: String, carry: Seq[String]): DataFrame = {
    val (w1, w2) = Sketches.hashWords(keyCol, salt)
    df.select(carry.map(col) :+ w1.as("__w1") :+ w2.as("__w2"): _*)
      .select(carry.map(col) :+
        explode(sequence(lit(0), lit(hashes - 1))).as("__j") :+
        col("__w1") :+ col("__w2"): _*)
      .select(carry.map(col) :+ col("__j") :+
        pmod(col("__w1") + col("__j") * col("__w2"), lit(bits.toLong))
          .as("__pos"): _*)
      .select(carry.map(col) :+ col("__j") :+
        shiftright(col("__pos"), 6).as("word") :+
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))")
          .as("mask"): _*)
  }

  /** Write `df` partitioned by `partCol` with a per-partition Bloom bitmap
    * over `keyCol` in the `_bloom` sidecar (underscore-prefixed — invisible
    * to parquet readers of `path`). The bitmap build is one probe explode
    * (hashes rows/key) + one (part, word) bit_or aggregation whose shuffle
    * carries at most partitions · bits/64 partial words per map task.
    */
  def writeBloomIndexed(df: DataFrame, path: String, partCol: String,
      keyCol: String, bits: Int = 1 << 15, hashes: Int = 3,
      salt: String = "bf"): Unit = {
    require(bits >= 64 && bits % 64 == 0,
      s"writeBloomIndexed: bits must be a positive multiple of 64, got $bits")
    require(hashes >= 1, s"writeBloomIndexed: hashes must be >= 1, got $hashes")
    // cluster by the partition column first: an unclustered dynamic-
    // partition write opens one file per (task, partition value) — tasks x
    // values tiny files; clustered, each value is written by one task
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)
    probes(df.select(col(partCol).as("part"), col(keyCol)),
        keyCol, bits, hashes, salt, Seq("part"))
      .groupBy(col("part"), col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
      .write.mode("overwrite").parquet(s"$path/_bloom")
    df.sparkSession.createDataFrame(Seq((partCol, keyCol, bits, hashes, salt)))
      .toDF("partCol", "keyCol", "bits", "hashes", "salt")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_bloom_meta")
  }

  /** INCREMENTAL append: new rows land in the partitioned layout and the
    * bitmap sidecar merges by per-(partition, word) bit_or — Bloom
    * bitmaps are OR-mergeable by construction, so append == rebuild with
    * no rescan of resident data. Temp-dir + rename rewrite, same note as
    * the zone-map merge. (Bitmaps only fill; deletes need a rebuild —
    * the standard Bloom limitation.)
    */
  def appendBloomIndexed(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val m = readMeta(spark, path).getOrElse(throw new IllegalArgumentException(
      s"appendBloomIndexed: no _bloom_meta under $path"))
    df.repartition(col(m.partCol)) // one task per partition value — see write
      .write.mode("append").partitionBy(m.partCol).parquet(path)
    val fresh = probes(df.select(col(m.partCol).as("part"), col(m.keyCol)),
        m.keyCol, m.bits, m.hashes, m.salt, Seq("part"))
      .groupBy(col("part"), col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
    val merged = spark.read.parquet(s"$path/_bloom")
      .unionByName(fresh)
      .groupBy(col("part"), col("word"))
      .agg(expr("bit_or(bits)").as("bits"))
    val tmp = s"$path/_bloom__merging"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_bloom"), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$path/_bloom"))
    ()
  }

  /** Sidecar parameters of a [[writeBloomIndexed]] layout. */
  def readMeta(spark: SparkSession, path: String): Option[BloomMeta] =
    try {
      val r = spark.read.parquet(s"$path/_bloom_meta").collect().head
      Some(BloomMeta(r.getAs[String]("partCol"), r.getAs[String]("keyCol"),
        r.getAs[Int]("bits"), r.getAs[Int]("hashes"), r.getAs[String]("salt")))
    } catch { case _: Exception => None }

  /** EXACT point lookup of `keys` through the sidecar: candidate
    * partitions are those whose bitmap contains every probe of at least
    * one requested key (a join over the tiny sidecar + keys-row frame,
    * collected as an O(index) planning handoff), then ONE scan of only
    * those partition dirs with the exact key predicate pushed down.
    * Key values hash through their string form (`cast("string")`), the
    * same contract as every md5 kernel here — long and string keys are
    * engine-stable; don't index float keys.
    */
  def lookupKeys(spark: SparkSession, path: String, keys: Seq[Any]): DataFrame = {
    val m = readMeta(spark, path).getOrElse(throw new IllegalArgumentException(
      s"lookupKeys: no _bloom_meta under $path — write with writeBloomIndexed"))
    require(keys.nonEmpty, "lookupKeys: empty key set")
    val data = spark.read.parquet(path)
    val sidecar = spark.read.parquet(s"$path/_bloom")
    import spark.implicits._
    val keysDf = keys.map(_.toString).toDF(m.keyCol)
    val cand = probes(keysDf, m.keyCol, m.bits, m.hashes, m.salt, Seq(m.keyCol))
      .join(sidecar, Seq("word"))
      .filter(col("bits").bitwiseAND(col("mask")) === col("mask"))
      .groupBy(col("part"), col(m.keyCol))
      .agg(count_distinct(col("__j")).as("__hits"))
      .filter(col("__hits") === m.hashes)
      .select(col("part")).distinct()
      .collect().map(_.get(0))
    if (cand.isEmpty) data.filter(lit(false))
    else data.filter(col(m.partCol).isin(cand: _*) &&
      col(m.keyCol).isin(keys: _*))
  }
}
