package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-group top-k operator (logical node + strategy + exec
  * pair): window-form equivalence, whole-group k, duplicate rows across
  * the k boundary, and the partial→exchange→final plan shape.
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("__rn") <= k).drop("__rn")

  test("perGroup equals the window form on random skewed data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      val gname = if (i % 3 == 0) "hot" else s"g${rnd.nextInt(40)}"
      (i.toLong, gname, rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("id", "g", "v").repartition(8)
    val got = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), 5)
      .as[(Long, String, Double)].collect().toSet
    val want = windowTopK(df, 5).as[(Long, String, Double)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("duplicate rows straddling the k boundary stay multiset-correct") {
    // group 'a': value 9 twice (identical rows), k = 2 must keep both 9s
    val df = Seq((1L, "a", 9.0), (1L, "a", 9.0), (2L, "a", 5.0), (3L, "b", 1.0))
      .toDF("id", "g", "v").repartition(4)
    val got = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), 2)
      .as[(Long, String, Double)].collect().toSeq
      .groupBy(_._2).view.mapValues(_.sorted).toMap
    assert(got("a") === Seq((1L, "a", 9.0), (1L, "a", 9.0)))
    assert(got("b") === Seq((3L, "b", 1.0)))
  }

  test("k >= group size returns whole groups; plan shape is partial -> exchange -> final") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 9.0))
      .toDF("id", "g", "v").repartition(3)
    val out = TopK.perGroup(df, Seq("g"), Seq(("v", true), ("id", true)), 10)
    assert(out.count() == 3)
    val phys = out.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllMatchIn(phys).size == 2,
      s"expected the partial/final exec pair in:\n$phys")
    assert(phys.toLowerCase.contains("exchange hashpartitioning"),
      s"expected a hash exchange on the group keys in:\n$phys")
  }

  test("ascending order with NULLS-FIRST default; guards") {
    val df = Seq((1L, "a", Some(2.0)), (2L, "a", None), (3L, "a", Some(1.0)))
      .toDF("id", "g", "v")
    // Spark ASC default is NULLS FIRST: the NULL row is rank 1
    val got = TopK.perGroup(df, Seq("g"), Seq(("v", true), ("id", true)), 1)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(2L))
    intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq("g"), Seq(("missing", true)), 1)
    }
    intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq.empty, Seq(("v", true)), 1)
    }
  }
}
