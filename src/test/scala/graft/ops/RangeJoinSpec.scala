package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 1L, 0L, 100L), (2L, 1L, 250L, 300L), (3L, 2L, 0L, 50L)
  ).toDF("lid", "key", "s", "e")
  private lazy val right = Seq(
    (10L, 1L, 90L, 120L),   // overlaps lid 1 at [90,100]
    (11L, 1L, 100L, 100L),  // point-interval touching lid 1's end (closed)
    (12L, 1L, 301L, 400L),  // just past lid 2 — no overlap
    (13L, 2L, 60L, 70L)     // same key, disjoint
  ).toDF("rid", "key", "s", "e")

  private def pairs(binSize: Long): Set[(Long, Long)] =
    RangeJoin.overlapJoin(left, right, Seq("key"), "s", "e", "s", "e", binSize)
      .select("lid", "r_rid").as[(Long, Long)].collect().toSet

  test("closed-interval overlap, keyed; pair emitted exactly once at any bin size") {
    val want = Set((1L, 10L), (1L, 11L))
    for (bin <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.overlapJoin(left, right, Seq("key"),
        "s", "e", "s", "e", bin)
        .select("lid", "r_rid").as[(Long, Long)].collect()
      assert(got.toSet === want, s"binSize=$bin")
      assert(got.length === want.size, s"binSize=$bin emitted duplicates: ${got.toSeq}")
    }
  }

  test("interval spanning many bins still pairs once; degenerate end<start drops") {
    val l2 = Seq((1L, 1L, 0L, 10000L), (9L, 1L, 500L, 400L)).toDF("lid", "key", "s", "e")
    val r2 = Seq((10L, 1L, 9990L, 9995L)).toDF("rid", "key", "s", "e")
    val got = RangeJoin.overlapJoin(l2, r2, Seq("key"), "s", "e", "s", "e", 64L)
      .select("lid", "r_rid").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 10L)))
  }

  test("prefixed right columns clashing with left columns are rejected") {
    val lClash = left.withColumn("r_rid", lit(0L))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(lClash, right, Seq("key"), "s", "e", "s", "e", 64L)
    }
    assert(e.getMessage.contains("r_rid"))
  }

  test("plan: equi-join on (key, bin) — no CartesianProduct / BNLJ") {
    val plan = RangeJoin.overlapJoin(left, right, Seq("key"),
      "s", "e", "s", "e", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"product in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$plan")
  }

  test("pointInIntervalJoin: closed containment, exactly once at any bin size") {
    val pts = Seq((1L, 1L, 95L), (2L, 1L, 100L), (3L, 1L, 121L), (4L, 2L, 65L))
      .toDF("pid", "key", "p")
    val want = Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 13L))
    for (bin <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointInIntervalJoin(pts, right, Seq("key"),
        "p", "s", "e", bin)
        .select("pid", "r_rid").as[(Long, Long)].collect()
      assert(got.toSet === want, s"binSize=$bin")
      assert(got.length === want.size, s"binSize=$bin duplicates: ${got.toSeq}")
    }
    val plan = RangeJoin.pointInIntervalJoin(pts, right, Seq("key"),
      "p", "s", "e", 64L).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"product in:\n$plan")
  }

  test("mergeIntervals: islands, touching edges, gap tolerance, per-key isolation") {
    import spark.implicits._
    val iv = Seq(
      ("u", 1L, 3L), ("u", 2L, 5L), ("u", 7L, 8L),  // [1,5] and [7,8]
      ("v", 1L, 3L), ("v", 3L, 4L),                  // touching -> [1,4]
      ("v", 10L, 9L),                                // inverted: dropped
      ("w", 1L, 2L), ("w", 4L, 5L))                  // gap 2 apart
      .toDF("k", "s", "e")
    val got = RangeJoin.mergeIntervals(iv, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("u", 1L, 5L, 2L), ("u", 7L, 8L, 1L),
      ("v", 1L, 4L, 2L), ("w", 1L, 2L, 1L), ("w", 4L, 5L, 1L)))
    // gap = 2 bridges w's islands; containment collapses correctly
    val gapped = RangeJoin.mergeIntervals(iv, Seq("k"), "s", "e", gap = 2L)
      .filter($"k" === "w").as[(String, Long, Long, Long)].collect().toSet
    assert(gapped === Set(("w", 1L, 5L, 2L)))
    val contained = Seq(("u", 1L, 10L), ("u", 2L, 3L), ("u", 4L, 6L))
      .toDF("k", "s", "e")
    assert(RangeJoin.mergeIntervals(contained, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet === Set(("u", 1L, 10L, 3L)))
  }
}
