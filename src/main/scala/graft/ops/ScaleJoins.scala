package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-shape primitives for skewed and co-located equi-joins — the two
  * knobs the builder prompt calls out for 100 TB joins that Spark does not
  * apply by itself in every case:
  *
  *  - [[saltedJoin]]: scatter a hot key's rows across `salts` reduce tasks
  *    when the dim side is too large to broadcast and AQE's skew split
  *    cannot kick in (e.g. skew introduced by an upstream agg in the same
  *    stage). The join RESULT is salt-invariant (the dim side carries every
  *    salt value, so each big row matches the same dim rows whatever its
  *    salt) — reproducible and oracle-checkable regardless of placement.
  *  - [[writeBucketed]] / [[bucketedJoin]]: persist both join sides
  *    bucketed+sorted on the join key so repeated joins on that key plan
  *    with NO shuffle exchange on either side — the "pre-shuffled on disk"
  *    layout for fact-to-fact joins re-run per training batch.
  */
object ScaleJoins {

  /** Inner equi-join on `key` with the dim side replicated `salts` times
    * and the big side's rows scattered across salt buckets by a
    * deterministic content hash. Row-for-row equal to
    * `big.join(dim, key)` — the salt only changes which reduce task a row
    * lands in, splitting a hot key across `salts` tasks instead of one
    * straggler.
    *
    * The salt mixes the big row's full content with a per-row position
    * disambiguator (`monotonically_increasing_id`, i.e. partition id +
    * in-partition index). Content alone is NOT enough: the duplicate-heavy
    * corpora this engine targets have hot keys whose rows are
    * byte-identical, and a pure content hash would put ALL of them in one
    * salt bucket — the straggler returns. The position term spreads
    * identical rows uniformly; it never affects WHICH rows join, only
    * where they meet. Cost: dim is shuffled `salts`× larger; size `salts`
    * to the observed straggler factor, not the partition count.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!big.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt column name collides with an input column")
    val bigS = big.withColumn("__salt", saltOf(big, salts))
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(dimS, Seq(key, "__salt")).drop("__salt")
  }

  /** Write `df` as a bucketed + in-bucket-sorted external parquet table so
    * equi-joins on `key` between tables bucketed the same way need no
    * shuffle on either side (Exchange-free SortMergeJoin — the plan shape
    * ScaleJoinsSpec pins). The in-bucket sort additionally elides the
    * join's Sort when each bucket holds a single file (Spark only trusts
    * sortBy metadata then). Overwrites both the table entry and the data
    * path.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Inner join of two [[writeBucketed]] tables on `key`. The bucketing
    * metadata makes Catalyst plan this without an Exchange when both
    * tables share the bucket count on the join key.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** The big-side salt expression, exposed for tests asserting that a hot
    * key's rows actually spread across buckets — content hash mixed with
    * the row's physical position so byte-identical rows still scatter.
    */
  private[graft] def saltOf(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col) :+ monotonically_increasing_id(): _*),
      lit(salts))
}
