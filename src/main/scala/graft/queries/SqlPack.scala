package graft.queries

import graft.{QueryPack, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface gates: the same kernels every other pack exercises through
  * the Column DSL, driven ENTIRELY through `spark.sql(...)` against the
  * registered function surface ([[GraftFunctions]]) — proving a SQL-only
  * warehouse user gets identical semantics. Oracles are closed-form
  * coordinate / hash algebra (DuckDB has no graft functions, so the mirror
  * IS the independent recomputation).
  */
object SqlPack extends QueryPack {

  // region-derived query boxes with off-grid edges (no point coordinate
  // lands exactly on a boundary, so inclusive-edge IEEE coin flips can't
  // occur); widths grow with the region key so each box covers a different
  // fraction of the point cloud
  private val boxCols =
    """CAST(r_regionkey AS DOUBLE) * 8.0 + 0.017 AS minx,
      |    1.013 AS miny,
      |    CAST(r_regionkey AS DOUBLE) * 8.0 + 0.017 + (CAST(r_regionkey AS DOUBLE) + 1.0) * 14.003 AS maxx,
      |    1.013 + (CAST(r_regionkey AS DOUBLE) + 2.0) * 16.007 AS maxy""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // geometry kernels from pure SQL: box construction, shoelace area,
    // ray-cast containment — grouped point counts per region box
    "q135_sql_geom" -> ((s, d) => {
      GraftFunctions.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("q135_lineitem")
      Tables.region(s, d).createOrReplaceTempView("q135_region")
      s.sql(
        s"""WITH pts AS (
           |  SELECT CAST(l_extendedprice / 1000.0 AS DOUBLE) AS x,
           |         CAST(l_quantity AS DOUBLE) AS y
           |  FROM q135_lineitem),
           |boxes AS (
           |  SELECT r_regionkey,
           |    $boxCols
           |  FROM q135_region)
           |SELECT r_regionkey,
           |  FLOOR(st_area(st_make_box(minx, miny, maxx, maxy)) * 1e6 + 0.5) / 1e6 AS box_area,
           |  SUM(CASE WHEN st_contains_point(st_make_box(minx, miny, maxx, maxy), x, y)
           |      THEN 1 ELSE 0 END) AS n_inside
           |FROM boxes CROSS JOIN pts
           |GROUP BY r_regionkey, minx, miny, maxx, maxy
           |ORDER BY r_regionkey""".stripMargin)
    }),

    // text kernels from pure SQL: token counts, fingerprint, key hash,
    // first minhash word — one row per document
    "q136_sql_text" -> ((s, d) => {
      GraftFunctions.register(s)
      Tables.documents(s, d).createOrReplaceTempView("q136_docs")
      s.sql(
        """SELECT doc_id,
          |  CAST(graft_token_count(text) AS BIGINT) AS n_tokens,
          |  CAST(graft_subword_count(text) AS BIGINT) AS n_subwords,
          |  graft_fingerprint(text) AS fp,
          |  graft_hash32(CAST(doc_id AS STRING), 'q136') AS h32,
          |  element_at(graft_minhash(text, 3, 2), 1) AS mh0
          |FROM q136_docs ORDER BY doc_id""".stripMargin)
    })
  )

  override def oracleSql: Map[String, String] = {
    val wordsSql =
      "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
    val shingles3 =
      s"""CASE WHEN len($wordsSql) >= 3
         |  THEN list_transform(range(1, len($wordsSql) - 1),
         |         i -> array_to_string(list_slice($wordsSql, i, i + 2), ' '))
         |  ELSE [] END""".stripMargin
    Map(
      "q135_sql_geom" ->
        s"""WITH pts AS (
           |  SELECT CAST(l_extendedprice / 1000.0 AS DOUBLE) AS x,
           |         CAST(l_quantity AS DOUBLE) AS y
           |  FROM lineitem),
           |boxes AS (
           |  SELECT r_regionkey,
           |    $boxCols
           |  FROM region)
           |SELECT r_regionkey,
           |  FLOOR((maxx - minx) * (maxy - miny) * 1e6 + 0.5) / 1e6 AS box_area,
           |  CAST(SUM(CASE WHEN x >= minx AND x <= maxx AND y >= miny AND y <= maxy
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
           |FROM boxes CROSS JOIN pts
           |GROUP BY r_regionkey, minx, miny, maxx, maxy
           |ORDER BY r_regionkey""".stripMargin,
      "q136_sql_text" ->
        s"""SELECT doc_id,
           |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
           |       ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
           |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
           |       ELSE len(string_split_regex(trim(text), '\\s+'))
           |          + len(regexp_extract_all(text, '[a-z][A-Z]'))
           |          + len(regexp_extract_all(text, '[a-zA-Z][0-9]'))
           |          + len(regexp_extract_all(text, '[0-9][a-zA-Z]')) END AS BIGINT) AS n_subwords,
           |  md5(array_to_string($wordsSql, ' ')) AS fp,
           |  CAST('0x' || substr(md5('q136:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h32,
           |  list_min(list_transform($shingles3, s ->
           |    CAST('0x' || substr(md5(s), 1, 8) AS BIGINT))) AS mh0
           |FROM documents ORDER BY doc_id""".stripMargin
    )
  }
}
