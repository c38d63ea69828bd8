package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Empirical scale-stress harness for the pair-generating and
  * at-rest-index gate families — one order of magnitude of EVIDENCE on
  * top of the design-by-inspection 100 TB argument. Generates an
  * sf-dir-compatible directory whose `documents` / `embeddings` /
  * `customer` tables are `factor`× the base scale (near-duplicate-rich:
  * copy k of a document appends one ` variantk` token, copy k of a
  * customer name appends one character — so the dedup/ER candidate
  * graphs GROW super-linearly in pairs, the honest worst direction),
  * then runs the UNMODIFIED gate registry entries against it, recording
  * per gate: wall seconds, output rows, PlanLint findings, and
  * total/peak shuffle bytes from stage metrics. Run with factor=1 for
  * the same-harness baseline the ratios are computed against.
  *
  * Usage: runMain graft.tools.ScaleStress [baseSfDir] [outDir] [factor]
  * One JSON line per gate + one summary line (prefix `[scale]`).
  */
object ScaleStress {

  /** The families the round-12 verdict asked for evidence on: FastSS
    * edit-distance pairs, prefix-filtered similarity joins, LSH+CC
    * dedup, at-rest ANN/hybrid indexes. (Raster CC is exercised
    * separately below — its gate synthesizes a fixed-size mask.)
    */
  private val Gates = Seq(
    "q226_edit_pairs",
    "q252_prefix_jaccard",
    "q253_containment_join",
    "q97_dedup_clusters",
    "q109_dedup_corpus",
    "q153_ivf_pq_at_rest",
    "q356_hybrid_batch_at_rest")

  private def exists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Scale the three tables the stress gates read. Ids shift by
    * k·1_000_000 per copy so the gates' own synthetic-id offsets
    * (+20000/+30000) never collide with a scaled id.
    */
  private def generate(spark: SparkSession, base: String, out: String,
      factor: Int): Unit = {
    if (exists(spark, s"$out/documents.parquet")) return
    def copies(df: DataFrame)(mk: Int => DataFrame): DataFrame =
      (0 until factor).map(mk).reduce(_ unionByName _)

    val docs = Tables.documents(spark, base)
    copies(docs) { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * 1000000L)).as("doc_id"),
        (if (k == 0) col("text")
         else concat(col("text"), lit(s" variant$k"))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    copies(emb) { k =>
      emb.select(
        (col("vec_id") + lit(k.toLong * 1000000L)).as("vec_id"),
        transform(col("embedding"), x => x + lit((k * 1e-4).toFloat))
          .cast("array<float>").as("embedding"),
        col("label"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val cust = Tables.customer(spark, base)
    copies(cust) { k =>
      cust.select(
        (col("c_custkey") + lit(k.toLong * 10000000L)).as("c_custkey"),
        (if (k == 0) col("c_name")
         else concat(col("c_name"), lit(k.toString))).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/customer.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/scale_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out, factor)

    val shufW = new AtomicLong(); val shufR = new AtomicLong()
    val peakStageW = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          val w = m.shuffleWriteMetrics.bytesWritten
          shufW.addAndGet(w)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          peakStageW.accumulateAndGet(w, math.max(_, _))
        }
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect() // warm the stack

    def timed(name: String, df: => DataFrame): Unit = {
      val frame = df
      val lint = PlanLint.lint(frame)
      shufW.set(0); shufR.set(0); peakStageW.set(0)
      val t0 = System.nanoTime()
      // noop write materializes every row+column (Bench semantics)
      frame.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // listener bus drain
      println(f"""[scale] {"gate":"$name","factor":$factor,"sec":$sec%.2f,""" +
        s""""lint":${lint.size},"lint_detail":"${lint.mkString("; ")}",""" +
        s""""shuffle_write_mb":${shufW.get / 1048576},""" +
        s""""shuffle_read_mb":${shufR.get / 1048576},""" +
        s""""peak_stage_write_mb":${peakStageW.get / 1048576}}""")
      spark.catalog.clearCache()
      graft.pipeline.CacheScope.drainAll(spark)
    }

    Gates.foreach { g => timed(g, SparkEntry.queries(g)(spark, out)) }

    // raster CC at factor× the q313 pixel count (the gate's own mask is
    // fixed-size): same bars+dots closed-form mask, scaled grid
    val H = 48 * math.max(1, math.sqrt(factor.toDouble).round.toInt)
    val W = 64 * math.max(1, math.sqrt(factor.toDouble).round.toInt)
    timed(s"raster_cc_${H}x$W", {
      val pix = spark.range(0, H.toLong * W).select(
          (col("id") / W).cast("int").as("y"),
          (col("id") % W).cast("int").as("x"))
        .withColumn("bar", col("y") % 7 < 2 || col("x") % 11 < 2)
        .withColumn("dot", col("y") % 7 >= 3 && col("y") % 7 <= 5 &&
          col("x") % 11 >= 3 && col("x") % 11 <= 9 &&
          (col("y") * 31 + col("x") * 17) % 29 === 0)
        .select(col("y"), col("x"),
          when(col("bar") || col("dot"), 1.0).otherwise(0.0).as("value"))
      val tiles = graft.ops.RasterOps.pixelsToTilesExact(pix, H, W,
        tileSize = 16, channelCol = None)
      graft.ops.RasterOps.labelConnected(tiles, widthPx = W, tileSize = 16)
    })

    println(s"""[scale] {"done":true,"factor":$factor,"out":"$out"}""")
    spark.stop()
  }
}
