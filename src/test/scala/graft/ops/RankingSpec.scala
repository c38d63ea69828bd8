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
