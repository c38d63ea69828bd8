package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L),
    (4L, 20L, 50L), (5L, 20L, 400L)
  ).toDF("event_id", "key", "ts")
  private lazy val right = Seq(
    (10L, 100L, "a"), (10L, 200L, "b"), (10L, 290L, "c"),
    (20L, 399L, "x")
  ).toDF("key", "rts", "tag")

  test("backward inclusive: equal ts matches; latest at-or-before wins; no-match is NULL") {
    val out = AsOfJoin.asOfJoin(left, right, "key", "ts", "rts", Seq("tag"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4))))
    assert(out(0) === ((1L, Some(100L), Some("a"))), "equal timestamp is inclusive")
    assert(out(1) === ((2L, Some(200L), Some("b"))))
    assert(out(2) === ((3L, Some(290L), Some("c"))))
    assert(out(3) === ((4L, None, None)), "left row before every right row")
    assert(out(4) === ((5L, Some(399L), Some("x"))))
  }

  test("tolerance nulls out matches older than the window, keeps the left row") {
    val out = AsOfJoin.asOfJoin(left, right, "key", "ts", "rts", Seq("tag"),
      toleranceNs = Some(5L))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    assert(out(0)._2 === Some(100L), "gap 0 is inside tolerance 5")
    assert(out(1)._2 === Some(200L), "gap 5 is inside tolerance 5 (inclusive)")
    assert(out(2)._2 === None, "gap 10 exceeds tolerance 5")
    assert(out.length === 5, "left rows survive with NULL matches")
  }

  test("a NULL right value column cannot mix rows (struct travels atomically)") {
    val r2 = Seq((10L, 100L, Some("a"), 1L), (10L, 200L, None, 2L))
      .toDF("key", "rts", "tag", "seq")
    val out = AsOfJoin.asOfJoin(
      left.filter(col("event_id") === 2L), r2, "key", "ts", "rts",
      Seq("tag", "seq"))
      .collect()(0)
    // ts=205 matches rts=200 whose tag is legitimately NULL — seq must be
    // 2 (same row), never 1 (older row's value bleeding through)
    assert(out.getLong(3) === 200L)
    assert(out.isNullAt(4))
    assert(out.getLong(5) === 2L)
  }

  test("TIMESTAMP ts columns: converted to epoch-ns, toleranceNs means nanoseconds") {
    val lts = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10")),
      (2L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00")))
      .toDF("event_id", "key", "ts")
    val rts = Seq((10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), "a"))
      .toDF("key", "rts", "tag")
    // gap from rts for event 1 is 5s, for event 2 is 55s; 10s tolerance in ns
    val out = AsOfJoin.asOfJoin(lts, rts, "key", "ts", "rts", Seq("tag"),
      toleranceNs = Some(10L * 1000000000L))
      .orderBy("event_id").collect()
    assert(out(0).getString(4) === "a", "5s gap inside 10s tolerance")
    assert(out(1).isNullAt(4), "55s gap outside 10s tolerance — a seconds " +
      "misinterpretation (cast-to-long) would wrongly match here")
    // without tolerance both match
    val all = AsOfJoin.asOfJoin(lts, rts, "key", "ts", "rts", Seq("tag"))
      .orderBy("event_id").collect()
    assert(all(0).getString(4) === "a" && all(1).getString(4) === "a")
  }

  test("mixed ts kinds (TIMESTAMP vs long) are rejected loudly") {
    val lts = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10")))
      .toDF("event_id", "key", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(lts, right, "key", "ts", "rts", Seq("tag"))
    }
    assert(e.getMessage.contains("kinds differ"))
  }

  test("NULL join keys never match: NULL-key left rows get NULL payload") {
    val lNull = Seq((1L, Some(10L), 100L), (2L, None, 100L))
      .toDF("event_id", "key", "ts")
    val rNull = Seq((Some(10L), 50L, "a"), (None, 50L, "ghost"))
      .toDF("key", "rts", "tag")
    val out = AsOfJoin.asOfJoin(lNull, rNull, "key", "ts", "rts", Seq("tag"))
      .orderBy("event_id").collect()
    assert(out(0).getString(4) === "a")
    assert(out(1).isNullAt(4), "NULL-key left row must not match NULL-key right row")
    assert(out.length === 2, "NULL-key left rows survive (left-join semantics)")
  }

  test("plan: one keyed shuffle + per-key sort, no product") {
    val plan = AsOfJoin.asOfJoin(left, right, "key", "ts", "rts", Seq("tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"product in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected union inputs to shuffle once by key:\n$plan")
  }

  test("forward: smallest right ts at-or-after; inclusive; no-match is NULL") {
    val out = AsOfJoin.asOfJoin(left, right, "key", "ts", "rts", Seq("tag"),
      direction = "forward")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out(0)._2 === Some(100L), "equal ts is inclusive going forward")
    assert(out(1)._2 === Some(290L), "205 -> next right at 290")
    assert(out(2)._2 === None, "300 has no later right row")
    assert(out(3)._2 === Some(399L), "50 -> first right at 399")
    assert(out(4)._2 === None, "400 is after the last right row (399)")
  }

  test("forward distance vs backward distance on the same row") {
    // left ts 400, right only at 399: backward matches, forward does not
    val l1 = Seq((5L, 20L, 400L)).toDF("event_id", "key", "ts")
    val r1 = Seq((20L, 399L, "x")).toDF("key", "rts", "tag")
    val fwd = AsOfJoin.asOfJoin(l1, r1, "key", "ts", "rts", Seq("tag"),
      direction = "forward").collect()(0)
    assert(fwd.get(3) == null, "399 is before 400 — no forward match")
    val bwd = AsOfJoin.asOfJoin(l1, r1, "key", "ts", "rts", Seq("tag")).collect()(0)
    assert(bwd.getLong(3) === 399L)
  }

  test("nearest: closer side wins, exact ties go backward, tolerance applies per side") {
    // left at 205: backward 200 (d=5), forward 290 (d=85) -> backward
    // left at 250: backward 200 (d=50), forward 290 (d=40) -> forward
    // left at 245: d=45 both ways -> tie goes backward (200)
    val l2 = Seq((1L, 10L, 205L), (2L, 10L, 250L), (3L, 10L, 245L))
      .toDF("event_id", "key", "ts")
    val out = AsOfJoin.asOfJoin(l2, right, "key", "ts", "rts", Seq("tag"),
      direction = "nearest")
      .orderBy("event_id").collect().map(_.getLong(3))
    assert(out.toSeq === Seq(200L, 290L, 200L))
    // tolerance 40: at 250 forward (40) stays, at 205 backward (5) stays,
    // at 245 BOTH exceed? backward 45 > 40 and forward 45 > 40 -> NULL
    val tol = AsOfJoin.asOfJoin(l2, right, "key", "ts", "rts", Seq("tag"),
      direction = "nearest", toleranceNs = Some(40L))
      .orderBy("event_id").collect().map(r => Option(r.get(3)))
    assert(tol.toSeq === Seq(Some(200L), Some(290L), None))
  }
}
