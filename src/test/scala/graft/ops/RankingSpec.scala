package graft.ops

import graft.SparkTestBase
import graft.pipeline.Dedup
import graft.tools.PlanLint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkTestBase {
  import spark.implicits._

  // shuffled insert order so ranks can't ride arrival order
  private lazy val toy = Seq(
    (7L, 30L), (1L, 10L), (4L, 20L), (2L, 10L), (9L, 30L),
    (3L, 20L), (8L, 30L), (5L, 20L), (6L, 20L), (0L, 5L)
  ).toDF("id", "key")

  test("globalRank equals the single-reducer ROW_NUMBER under the same total order") {
    val got = Ranking.globalRank(toy, Seq("key", "id"), "rank", partitions = 4)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = toy
      .withColumn("rank",
        row_number().over(Window.orderBy(col("key"), col("id"))).cast("long") - 1)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("globalRank is dense 0..n-1, deterministic across runs, more partitions than rows is fine") {
    val a = Ranking.globalRank(toy, Seq("key", "id"), "rank", partitions = 32)
      .select("rank").as[Long].collect().sorted
    assert(a.toSeq === (0L until 10L))
    val b = Ranking.globalRank(toy, Seq("key", "id"), "rank", partitions = 32)
      .select("rank").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("globalRank plan has no corpus-wide window and releases its internal cache") {
    val out = Ranking.globalRank(toy, Seq("key", "id"), "rank", partitions = 4)
    val globalWindows = PlanLint.lint(out).filter(_.rule == "global-window")
    assert(globalWindows.isEmpty,
      s"globalRank must not plan a single-reducer window: $globalWindows")
    out.collect() // first action -> CacheScope releases the sorted frame
    // the release lands via the async execution-listener bus — poll
    val deadline = System.currentTimeMillis + 15000
    while (!spark.sharedState.cacheManager.isEmpty &&
      System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(spark.sharedState.cacheManager.isEmpty,
      "internal range-sorted cache must be released after the first action")
  }

  test("globalRank refuses an existing output column and empty sort keys") {
    intercept[IllegalArgumentException] {
      Ranking.globalRank(toy, Seq("key"), "id")
    }
    intercept[IllegalArgumentException] {
      Ranking.globalRank(toy, Nil, "rank")
    }
  }

  test("skyline2D: hand frontier, duplicate frontier points kept, dominated rows gone") {
    // frontier: (10,1), (5,5) and its duplicate, (1,9); dominated: rest
    val pts = Seq(
      (1L, 10.0, 1.0), (2L, 5.0, 5.0), (3L, 5.0, 5.0), (4L, 1.0, 9.0),
      (5L, 4.0, 4.0),   // dominated by (5,5)
      (6L, 10.0, 0.5),  // same x as (10,1), lower y
      (7L, 0.5, 9.0),   // lower x than (1,9), same y
      (8L, Double.NaN, 1.0)
    ).toDF("id", "x", "y").filter(!isnan(col("x")))
    val got = Ranking.skyline2D(pts, "x", "y", partitions = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L, 4L))
    // NULLs on either axis drop rather than rank
    val withNull = Seq((1L, Some(1.0), Some(1.0)), (2L, None, Some(9.0)))
      .toDF("id", "x", "y")
    assert(Ranking.skyline2D(withNull, "x", "y").select("id")
      .as[Long].collect().toSeq === Seq(1L))
    // plan stays scale-safe: no global window, no product
    val lint = graft.tools.PlanLint.lint(
      Ranking.skyline2D(pts, "x", "y", partitions = 3))
    assert(lint.isEmpty, s"skyline must be scale-safe: $lint")
  }

  test("sortedNeighborPairs: exact window semantics vs brute-force rank distance") {
    val got = Dedup.sortedNeighborPairs(toy, "key", "id", window = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force from the known total order (key, id):
    val order = toy.as[(Long, Long)].collect().sortBy(t => (t._2, t._1)).map(_._1)
    val want = (for {
      i <- order.indices; j <- (i + 1) until math.min(i + 3, order.length)
    } yield (order(i), order(j))).toSet
    assert(got === want)
    assert(got.size === 9 + 8) // n-1 at distance 1, n-2 at distance 2
  }

  test("sortedNeighborPairs window=2 is exactly the adjacency chain") {
    val got = Dedup.sortedNeighborPairs(toy, "key", "id", window = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val order = toy.as[(Long, Long)].collect().sortBy(t => (t._2, t._1)).map(_._1)
    assert(got === order.zip(order.tail).toSet)
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborPairs(toy, "key", "id", window = 1)
    }
  }
}
