package graft.tools

/** One-shot scale-safety audit: run [[PlanLint]] over EVERY registered
  * gate's plan at sf0.001 and print findings. Expected state (audited
  * round 10): zero cartesian products; nested-loop joins only where a
  * 1-row stats frame / tiny query batch broadcasts by design; global
  * windows only over BOUNDED aggregated inputs (sketch bins, distinct
  * snapped scores, top-k frames — each justified in its operator's
  * scaladoc). Anything new in this report is a regression to explain.
  *
  * Usage: sbt "runMain graft.tools.LintAll [sfDir]"
  */
object LintAll {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (a.nonEmpty) a(0) else "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try PlanLint.lint(fn(spark, d)).foreach(f => println(s"LINT $name $f"))
      catch { case e: Throwable =>
        println(s"LINT $name [build-error] ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(120))
      }
      spark.catalog.clearCache()
    }
    println("LINT_DONE")
    spark.stop()
  }
}
