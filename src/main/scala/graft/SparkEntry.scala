package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from per-layer query packs so each
  * operator family (relational, spatial, aggregate, raster, pipeline) registers
  * its own correctness-gate entries next to its implementation.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    graft.queries.RelationalPack,
    graft.queries.SpatialPack,
    graft.queries.AggregatePack,
    graft.queries.RasterPack,
    graft.queries.PipelinePack,
    graft.queries.ExtraPack,
    graft.queries.NgffPack,
    graft.queries.DataloaderPack,
    graft.queries.ExtentPack,
    graft.queries.RefStorePack,
    graft.queries.CorpusPack,
    graft.queries.SqlPack,
    graft.queries.CurationPack,
    graft.queries.ScalePack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}

/** One family of correctness-gate queries + their DuckDB oracles. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
