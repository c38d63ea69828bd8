package graft.functions

import graft.geom.st
import graft.pipeline.{Dedup, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL surface for the graft kernels.
  *
  * Every entry wraps an existing Column-DSL builder, so the SQL call lowers
  * to the exact expression tree the Scala API produces — the spatial and
  * text functions stay codegen'd `StaticInvoke`s, never UDFs. Two ways in:
  *
  *   - existing session: `GraftFunctions.register(spark)`
  *   - at build time:    `.config("spark.sql.extensions",
  *                        "graft.functions.GraftSqlExtensions")`
  *
  * Mirrors the reference's accessor-style API exposure
  * (`spatialdata/__init__.py` public surface) as SQL functions — the form
  * a Spark warehouse user expects (`SELECT st_area(geom) FROM ...`).
  */
object GraftFunctions {

  /** (name, arity, Column builder). Arity is enforced loudly at resolution
    * (a wrong-arity SQL call fails analysis, not codegen).
    */
  val all: Seq[(String, Int, Seq[Column] => Column)] = Seq(
    // geometry (WKB binary columns)
    ("st_area", 1, (a: Seq[Column]) => st.st_area(a(0))),
    ("st_centroid_x", 1, (a: Seq[Column]) => st.st_centroid_x(a(0))),
    ("st_centroid_y", 1, (a: Seq[Column]) => st.st_centroid_y(a(0))),
    ("st_minx", 1, (a: Seq[Column]) => st.st_minx(a(0))),
    ("st_miny", 1, (a: Seq[Column]) => st.st_miny(a(0))),
    ("st_maxx", 1, (a: Seq[Column]) => st.st_maxx(a(0))),
    ("st_maxy", 1, (a: Seq[Column]) => st.st_maxy(a(0))),
    ("st_contains_point", 3, (a: Seq[Column]) => st.st_contains_point(a(0), a(1), a(2))),
    ("st_intersects", 2, (a: Seq[Column]) => st.st_intersects(a(0), a(1))),
    ("st_intersects_box", 5,
      (a: Seq[Column]) => st.st_intersects_box(a(0), a(1), a(2), a(3), a(4))),
    ("st_affine", 7,
      (a: Seq[Column]) => st.st_affine(a(0), a(1), a(2), a(3), a(4), a(5), a(6))),
    ("st_point", 2, (a: Seq[Column]) => st.st_point(a(0), a(1))),
    ("st_make_box", 4, (a: Seq[Column]) => st.st_make_box(a(0), a(1), a(2), a(3))),
    ("st_buffer_point", 4,
      (a: Seq[Column]) => st.st_buffer_point(a(0), a(1), a(2), a(3))),
    ("st_clip", 2, (a: Seq[Column]) => st.st_clip(a(0), a(1))),
    ("st_clip_convex", 2, (a: Seq[Column]) => st.st_clip_convex(a(0), a(1))),
    ("st_intersection_area", 2,
      (a: Seq[Column]) => st.st_intersection_area(a(0), a(1))),
    ("st_intersection_area_convex", 2,
      (a: Seq[Column]) => st.st_intersection_area_convex(a(0), a(1))),
    ("st_force_2d", 1, (a: Seq[Column]) => st.st_force_2d(a(0))),
    ("st_geom_type", 1, (a: Seq[Column]) => st.st_geom_type(a(0))),
    // text kernels
    ("graft_words", 1, (a: Seq[Column]) => Dedup.words(a(0))),
    ("graft_token_count", 1, (a: Seq[Column]) => TextAnalysis.tokenCount(a(0))),
    ("graft_subword_count", 1,
      (a: Seq[Column]) => TextAnalysis.subwordCountEstimate(a(0))),
    ("graft_fingerprint", 1, (a: Seq[Column]) => TextAnalysis.fingerprint(a(0))),
    ("graft_minhash", 3, (a: Seq[Column]) => Dedup.minhashCol(a(0), a(1), a(2))),
    ("graft_simhash", 1, (a: Seq[Column]) => Dedup.simhashCol(a(0))),
    ("graft_simhash64", 1, (a: Seq[Column]) => Dedup.simhash64Col(a(0))),
    // sampling / similarity
    ("graft_hash32", 2, (a: Seq[Column]) => Sampling.keyHash32(a(0), a(1))),
    ("graft_canonical_url", 1,
      (a: Seq[Column]) => TextAnalysis.canonicalUrl(a(0))),
    ("graft_nfc", 1, (a: Seq[Column]) => TextAnalysis.nfcNormalize(a(0))),
    ("graft_jaro_winkler", 2,
      (a: Seq[Column]) => TextAnalysis.jaroWinklerCol(a(0), a(1))),
    ("graft_fold_accents", 1, (a: Seq[Column]) => TextAnalysis.foldAccents(a(0))),
    ("graft_luhn_valid", 1, (a: Seq[Column]) => TextAnalysis.luhnValidCol(a(0))),
    ("graft_deflate_ratio", 1, (a: Seq[Column]) => TextAnalysis.deflateRatio(a(0))),
    ("graft_cosine", 2, (a: Seq[Column]) => Similarity.cosineCol(a(0), a(1)))
  )

  /** Register every function into an existing session (idempotent —
    * re-registration replaces with an identical builder).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, arity, b) =>
      Bridge.registerColumnFunction(spark, name, arity, b)
    }
}

/** `spark.sql.extensions` entry point: sessions built with
  * `.config("spark.sql.extensions", "graft.functions.GraftSqlExtensions")`
  * get every graft function injected at session construction — the
  * standard deployment path on a shared cluster where user code never
  * holds the builder.
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, arity, b) =>
      ext.injectFunction(Bridge.functionDescription(name, arity, b))
    }
}
