package graft.functions

import graft.SparkTestBase
import graft.pipeline.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.functions._

/** SQL surface: every registered function evaluates identically to its
  * Column-DSL form, wrong arity fails analysis, and the
  * `spark.sql.extensions` injection path works on a fresh session sharing
  * the test SparkContext.
  */
class GraftFunctionsSpec extends SparkTestBase {

  private lazy val sql: SparkSession = { GraftFunctions.register(spark); spark }

  test("geometry functions evaluate in SQL") {
    val r = sql.sql(
      """SELECT st_area(st_make_box(0.0D, 0.0D, 2.0D, 3.0D)) AS a,
        |       st_contains_point(st_make_box(0.0D, 0.0D, 2.0D, 3.0D), 1.0D, 1.0D) AS inside,
        |       st_contains_point(st_make_box(0.0D, 0.0D, 2.0D, 3.0D), 5.0D, 1.0D) AS outside,
        |       st_geom_type(st_point(1.0D, 2.0D)) AS t
        |""".stripMargin).head()
    assert(r.getDouble(0) === 6.0)
    assert(r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getString(3) === "point")
  }

  test("SQL text kernels match the Column DSL") {
    import sql.implicits._
    val docs = Seq((1L, "The quick brown fox jumps over the lazy dog again"),
      (2L, "short"), (3L, "")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("gf_docs")
    val viaSql = sql.sql(
      """SELECT doc_id, graft_token_count(text) AS n,
        |       graft_fingerprint(text) AS fp,
        |       graft_simhash64(text) AS sh,
        |       graft_minhash(text, 3, 4) AS mh,
        |       graft_hash32(CAST(doc_id AS STRING), 'salt') AS h
        |FROM gf_docs ORDER BY doc_id""".stripMargin).collect()
    val viaDsl = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      Dedup.simhash64Col(col("text")).as("sh"),
      Dedup.minhashCol(col("text"), lit(3), lit(4)).as("mh"),
      Sampling.keyHash32(col("doc_id").cast("string"), "salt").as("h"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq === viaDsl.toSeq)
  }

  test("graft_canonical_url in SQL matches the Column DSL") {
    val r = sql.sql(
      "SELECT graft_canonical_url('https://WWW.Example.com:443/a/?utm_source=x&q=1#f') AS c")
      .head()
    assert(r.getString(0) === "https://example.com/a/?q=1")
  }

  test("graft_cosine in SQL") {
    val r = sql.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same, " +
        "graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("vec folds refuse null ARRAY ELEMENTS loudly (no silent 0.0 read)") {
    // parquet-cast array<double> is containsNull=true; ArrayData.getDouble on
    // a null slot would silently read 0.0 — the expression must throw instead
    val ex = intercept[Exception] {
      sql.sql("SELECT graft_cosine(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS c")
        .head()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
        .mkString(" | "))
    assert(rootMsg(ex).contains("null element"), rootMsg(ex))
    // whole-NULL array still propagates NULL (BinaryExpression null-safety)
    val r = sql.sql("SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS c").head()
    assert(r.isNullAt(0))
  }

  test("graft_jaro_winkler: textbook values, conventions, NULL propagation") {
    val r = sql.sql(
      """SELECT graft_jaro_winkler('martha', 'marhta') AS a,
        |       graft_jaro_winkler('dixon', 'dicksonx') AS b,
        |       graft_jaro_winkler('jellyfish', 'smellyfish') AS c,
        |       graft_jaro_winkler('abc', 'abc') AS same,
        |       graft_jaro_winkler('', 'abc') AS empty,
        |       graft_jaro_winkler('', '') AS both_empty,
        |       graft_jaro_winkler('xyz', 'abc') AS disjoint,
        |       graft_jaro_winkler(CAST(NULL AS STRING), 'abc') AS nul""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(math.abs(r.getDouble(1) - 0.8133333333333332) < 1e-15)
    // prefix l=0: boost is a no-op, jw == jaro
    assert(math.abs(r.getDouble(2) - 0.8962962962962964) < 1e-15)
    assert(r.getDouble(3) === 1.0)
    // DuckDB/RapidFuzz conventions: any empty side -> 0 (incl. both)
    assert(r.getDouble(4) === 0.0 && r.getDouble(5) === 0.0)
    assert(r.getDouble(6) === 0.0) // no matches
    assert(r.isNullAt(7))
    // boost applies only above jaro 0.7: shared 4-char prefix, low jaro
    val low = sql.sql(
      "SELECT graft_jaro_winkler('abcdxxxxxx', 'abcdyyyyyyyyyyyy') AS j").head()
    assert(math.abs(low.getDouble(0) - 0.5499999999999999) < 1e-15)
  }

  test("graft_fold_accents: marks stripped, non-mark letters pass through") {
    val r = sql.sql(
      """SELECT graft_fold_accents('café naïve Müller François') AS a,
        |       graft_fold_accents('łódź ćma źrebię Ångström') AS b,
        |       graft_fold_accents('Ærøskøbing ß Đorđe 北京') AS c,
        |       graft_fold_accents('plain ascii!') AS d,
        |       graft_fold_accents(CAST(NULL AS STRING)) AS e""".stripMargin).head()
    assert(r.getString(0) === "cafe naive Muller Francois")
    assert(r.getString(1) === "łodz cma zrebie Angstrom")
    // Æ/ß/Đ/CJK are single letters, not base+mark — folding leaves them
    assert(r.getString(2) === "Ærøskøbing ß Đorđe 北京")
    assert(r.getString(3) === "plain ascii!")
    assert(r.isNullAt(4))
  }

  test("graft_luhn_valid: textbook cards pass, off-by-one fails, non-cards refuse") {
    val r = sql.sql(
      """SELECT graft_luhn_valid('4111111111111111') AS visa,
        |       graft_luhn_valid('4111111111111112') AS bad_check,
        |       graft_luhn_valid('5500005555555559') AS mc,
        |       graft_luhn_valid('123456789012') AS too_short,
        |       graft_luhn_valid('41111111111111x1') AS non_digit,
        |       graft_luhn_valid(CAST(NULL AS STRING)) AS nul""".stripMargin).head()
    assert(r.getBoolean(0) && r.getBoolean(2))
    assert(!r.getBoolean(1) && !r.getBoolean(3) && !r.getBoolean(4))
    assert(r.isNullAt(5))
  }

  test("graft_deflate_ratio: repetition compresses, prose doesn't, empty is 0") {
    val rep = "spam spam spam " * 100
    val prose = (1 to 120).map(i => s"w${i * 7919 % 9973}x$i").mkString(" ")
    val r = sql.sql(
      s"""SELECT graft_deflate_ratio('$rep') AS rep,
         |       graft_deflate_ratio('$prose') AS prose,
         |       graft_deflate_ratio('') AS empty,
         |       graft_deflate_ratio('$rep') AS again""".stripMargin).head()
    assert(r.getDouble(0) < 0.05, s"pure repetition must compress hard: ${r.getDouble(0)}")
    assert(r.getDouble(1) > 0.3, s"varied text must not: ${r.getDouble(1)}")
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === r.getDouble(0), "deterministic per input")
  }

  test("wrong arity fails analysis loudly") {
    val e = intercept[Exception](sql.sql("SELECT st_area()").collect())
    assert(e.getMessage.contains("st_area expects 1 arguments"))
  }

  test("SQL plan stays codegen'd StaticInvoke (no UDF)") {
    val plan = sql.sql(
      "SELECT st_area(st_make_box(0.0D, 0.0D, 2.0D, 3.0D)) AS a").queryExecution
      .executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("spark.sql.extensions injection path registers on a fresh session") {
    val orig = SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions drives the same injectFunction path the
      // spark.sql.extensions config string does (applyExtensions
      // instantiates the class and calls apply) — the config string
      // itself is only read from the SparkContext conf at context
      // creation, which a shared test context predates.
      val fresh = SparkSession.builder()
        .withExtensions(new GraftSqlExtensions()(_))
        .getOrCreate() // reuses the JVM's SparkContext, fresh session state
      assert(fresh ne orig)
      val r = fresh.sql(
        "SELECT st_area(st_make_box(0.0D, 0.0D, 4.0D, 2.5D)) AS a").head()
      assert(r.getDouble(0) === 10.0)
      // the original session is untouched unless register() was called on it
      assert(fresh.sessionState ne orig.sessionState)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
