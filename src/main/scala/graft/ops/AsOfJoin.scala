package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AS-OF join — for every left row, the single right row with the largest
  * right timestamp <= the left timestamp, per key (pandas `merge_asof`,
  * kdb `aj`, DuckDB `ASOF JOIN`): the canonical point-in-time enrichment
  * (trades->quotes, purchases->latest click, reading->latest calibration).
  *
  * Spark has no native as-of join; the scale-correct distributed form is
  * the union-and-window trick, composed entirely from built-in operators
  * (preference (a) of the custom-operator ladder): tag both inputs with a
  * side bit, union them, and run ONE per-key ordered window in which each
  * left row picks up `last(right payload, ignoreNulls)` over rows
  * unbounded-preceding..current. Ordering by (ts, side) with right = 0
  * makes an equal-timestamp right row visible to the left row (backward
  * INCLUSIVE). Cost: one hash shuffle of |L| + |R| rows keyed by the join
  * key plus a per-key sort — the same lower bound any merge-based as-of
  * algorithm pays — with no product, no range-explode, no driver state.
  *
  * The right payload travels as ONE struct (its ts + the value columns),
  * so a legitimately-NULL right value column can never mix rows: the
  * window resolves the whole struct atomically.
  *
  * `toleranceNs`: matches older than the tolerance are nulled out (pandas
  * `tolerance=`) — the match columns become NULL, the left row survives
  * (left-join semantics). Units: for INTEGRAL ts columns the values pass
  * through untouched, so the tolerance is in whatever unit the caller's
  * columns use (epoch-ns, epoch-ms, a sequence number — caller's choice);
  * for TIMESTAMP ts columns both sides are converted to epoch-nanoseconds
  * internally (`unix_micros * 1000`), so the tolerance is nanoseconds.
  * Mixing a TIMESTAMP side with an integral side is rejected loudly — the
  * silent 1e9x unit mismatch is exactly the footgun this guard removes.
  *
  * NULL join keys never match (SQL equality semantics, pandas `merge_asof`,
  * DuckDB ASOF JOIN): NULL-key right rows are dropped before the union, so
  * a NULL-key left row always comes back with NULL match columns.
  *
  * Determinism: multiple right rows sharing one (key, ts) are ambiguous by
  * the as-of definition; pre-reduce the right side to one row per
  * (key, ts) (e.g. struct-max by a sequence column) before joining —
  * [[asOfJoin]] itself is deterministic whenever that uniqueness holds.
  *
  * `direction` (pandas merge_asof parity): `"backward"` (default) takes
  * the largest right ts <= left ts; `"forward"` the smallest right ts >=
  * left ts (the mirror window over the same keyed exchange, one extra
  * sort); `"nearest"` whichever of the two is closer, exact ties going
  * backward. Tolerance applies per direction (backward distance
  * `ts - rts`, forward `rts - ts`) BEFORE the nearest pick.
  *
  * Output: every left column, then `asof_ts` (matched right timestamp)
  * and the requested right value columns (NULL when unmatched / out of
  * tolerance).
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, rightValueCols: Seq[String],
      toleranceNs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asOfJoin: direction must be backward|forward|nearest, got $direction")
    require(rightValueCols.nonEmpty, "asOfJoin: need at least one right value column")
    val clash = rightValueCols.toSet intersect left.columns.toSet
    require(clash.isEmpty, s"asOfJoin: right value columns clash with left: $clash")

    // Canonicalize both ts columns to one comparable long: integral columns
    // pass through (caller-owned unit), TIMESTAMP becomes epoch-nanoseconds.
    // A mixed pair is a unit bug waiting to happen — reject it.
    def tsKind(dt: DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case TimestampType => "timestamp"
      case other => throw new IllegalArgumentException(
        s"asOfJoin: ts column must be integral or TIMESTAMP, got $other")
    }
    def tsLong(dt: DataType, c: Column): Column = tsKind(dt) match {
      case "integral" => c.cast("long")
      case _ => unix_micros(c) * lit(1000L)
    }
    val lTsType = left.schema(leftTsCol).dataType
    val rTsType = right.schema(rightTsCol).dataType
    require(tsKind(lTsType) == tsKind(rTsType),
      s"asOfJoin: ts column kinds differ (left $lTsType vs right $rTsType) — " +
        "convert one side so both are integral or both TIMESTAMP")

    val leftCols = left.columns.toSeq
    val rvStruct = struct(
      col(rightTsCol).as("__rts") +:
        tsLong(rTsType, col(rightTsCol)).as("__rtsN") +:
        rightValueCols.map(col): _*)
    val rvType = right.select(rvStruct.as("__rv")).schema.head.dataType

    val l = left.select(
      leftCols.map(col) ++ Seq(tsLong(lTsType, col(leftTsCol)).as("__ts"),
        lit(1).as("__side"), lit(null).cast(rvType).as("__rv")): _*)
    // NULL-key right rows can never match anything — drop them up front so
    // the null window partition holds only left rows (which then get NULL).
    val r = right.filter(col(keyCol).isNotNull).select(
      leftCols.map(c =>
        if (c == keyCol) col(keyCol)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(tsLong(rTsType, col(rightTsCol)).as("__ts"), lit(0).as("__side"),
          rvStruct.as("__rv")): _*)

    // Backward: right rows (side 0) sort BEFORE an equal-ts left row, so
    // `last(..) over (..preceding, current)` sees them (inclusive <=).
    // Forward: the mirror image — right rows must sort AFTER the left row
    // (ordering key `1 - side`), and `first(..) over (current, following..)`
    // picks the earliest right ts >= the left ts (inclusive >=). Both
    // windows share one keyed exchange; forward adds a second sort.
    val wB = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), lit(1) - col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val mB = last(col("__rv"), ignoreNulls = true).over(wB)
    val mF = first(col("__rv"), ignoreNulls = true).over(wF)
    def withTol(m: Column, dist: Column => Column): Column = toleranceNs match {
      case Some(tol) => when(dist(m) <= tol, m)
      case None => m
    }
    val b = withTol(mB, m => col("__ts") - m("__rtsN"))
    val f = withTol(mF, m => m("__rtsN") - col("__ts"))
    val matched = direction match {
      case "backward" => b
      case "forward" => f
      // nearest: smaller absolute distance wins; exact ties go backward
      // (the pandas merge_asof direction="nearest" contract)
      case _ =>
        when(b.isNull, f).when(f.isNull, b)
          .when(col("__ts") - b.getField("__rtsN") <=
            f.getField("__rtsN") - col("__ts"), b)
          .otherwise(f)
    }
    l.unionAll(r)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        (col("__m")("__rts").as("asof_ts") +:
          rightValueCols.map(c => col("__m")(c).as(c))): _*)
  }
}
