package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: run gate queries repeatedly, print timings + plan.
  * Usage: runMain graft.tools.Profile <name[,name2,...]> <sfDir> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        // EXACTLY Bench's measurement: noop write of the top-Sort-stripped
        // plan. The previous `.count()` let Catalyst prune every projection
        // column — q152's entire segment computation was optimized away,
        // yielding a fictitious 0.2 s "isolated" number vs the real 7 s.
        // Isolated numbers must measure what Bench measures.
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.analyzed match {
          case org.apache.spark.sql.catalyst.plans.logical.Sort(_, true, child, _) => child
          case p => p
        }
        val stripped = org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, plan)
        stripped.write.mode("overwrite").format("noop").save()
        println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // emulate Bench's cache hygiene: persisted intermediates from one rep
        // must not subsidize the next (set PROFILE_KEEPCACHE to disable)
        if (!sys.env.contains("PROFILE_KEEPCACHE")) spark.catalog.clearCache()
      }
      if (sys.env.contains("PROFILE_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
