package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of (nearest-prior) join — for every left row, attach
  * the single right row with the greatest `rightTs <= leftTs` for the
  * same key, or nulls when no prior right row exists (left-outer
  * semantics). The classic quotes-to-trades / last-touch-attribution
  * primitive that Spark's join operators lack and DuckDB exposes as
  * `ASOF LEFT JOIN` (which serves as the cross-engine oracle).
  *
  * Implementation is the union + ordered carry-forward formulation, NOT
  * an inequality join:
  *
  *   1. union both sides into one keyed stream tagged `__side`
  *      (0 = right, 1 = left), with each side's payload packed into a
  *      nullable struct;
  *   2. one hash exchange on the key, one per-partition sort by
  *      `(ts, side, tie)`;
  *   3. a running `last(rightPayload, ignoreNulls = true)` window
  *      (unbounded preceding → current row) carries the latest right
  *      struct forward into every left row;
  *   4. keep the left rows and unpack both structs.
  *
  * Why this shape at 100 TB: a naive `l JOIN r ON key AND lts >= rts`
  * materializes every (left, prior-right) PAIR before a window prunes
  * to rank 1 — quadratic in rows-per-key, fatal for long histories. The
  * carry-forward plan is one shuffle whose width is the two payload
  * structs and O(1) running state per row inside the sort — the same
  * work a dedicated sort-merge as-of operator (e.g. DuckDB's) does,
  * expressed with stock Catalyst operators so AQE/codegen still apply.
  * Known caveat shared with every keyed window: a single hot key lands
  * in one task; for bounded-horizon workloads use
  * [[SkewJoin.intervalJoinBucketed]], whose time-bucket salt bounds
  * per-task work (an as-of match has no horizon, so it cannot be
  * time-salted without changing semantics).
  *
  * Determinism: ties at equal `(key, rightTs)` resolve to the LARGEST
  * `rightTieCol` (the sort places it last; the running `last` keeps it).
  * `(rightTs, rightTieCol)` must be unique per key — with a unique id
  * column as the tie-break this holds trivially. Left rows at equal
  * timestamps all observe the same carried struct, so their relative
  * order cannot matter. Equal-timestamp right rows sort BEFORE the left
  * row (`side` 0 < 1), giving the standard inclusive `rightTs <= leftTs`
  * match.
  *
  * Column contract: `left` and `right` must share ONLY `keyCol`; all
  * other names must be disjoint (rename before calling) so the output —
  * key, left payload, right payload (nullable) — is unambiguous.
  *
  * Reference: smoltable has no join engine; this extends the extension
  * surface the same way the interval join family does
  * (`SkewJoin.scala`, `StreamOps.attributionJoinStream`).
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      rightTieCol: String): DataFrame = {
    val leftCols = left.columns.filterNot(_ == keyCol)
    val rightCols = right.columns.filterNot(_ == keyCol)
    val overlap = leftCols.toSet.intersect(rightCols.toSet)
    require(overlap.isEmpty,
      s"left/right payload columns must be disjoint, both have: $overlap")
    require(rightCols.contains(rightTieCol),
      s"tie-break column $rightTieCol must be a non-key right column")
    // ts contract: integral columns are taken as epoch longs verbatim;
    // TIMESTAMP columns convert via unix_micros (NOT cast("long"),
    // which silently yields epoch SECONDS — the sharp edge this guard
    // existed to block, now handled instead of rejected). Mixing a
    // TIMESTAMP side with an integral side is fine ONLY when the
    // integral side is epoch-µs. Anything else still rejects.
    def tsExpr(df: DataFrame, c: String): Column = {
      import org.apache.spark.sql.types._
      df.schema(c).dataType match {
        case TimestampType => unix_micros(col(c))
        case LongType | IntegerType | ShortType | ByteType =>
          col(c).cast("long")
        case other => throw new IllegalArgumentException(
          s"$c must be an integral epoch or TIMESTAMP column, got $other")
      }
    }
    // the tie column stays integral-only: a non-numeric id would cast
    // to NULL and silently destroy the largest-id tie-break.
    {
      import org.apache.spark.sql.types._
      require(Seq[DataType](LongType, IntegerType, ShortType, ByteType)
          .contains(right.schema(rightTieCol).dataType),
        s"$rightTieCol must be an integral column, got " +
          s"${right.schema(rightTieCol).dataType}")
    }

    val lStruct = StructType(leftCols.map(c => left.schema(c)))
    val rStruct = StructType(rightCols.map(c => right.schema(c)))
    // NULL semantics must mirror the SQL ASOF LEFT JOIN this operator
    // claims: a right row with NULL ts or NULL key can never satisfy
    // `l.ts >= r.ts AND l.key = r.key`, so it is dropped BEFORE the
    // union (otherwise NULL __ts sorts first and the carry-forward
    // would hand it to every early left row). Left rows stay: a NULL
    // left ts sorts before every surviving right row and a NULL left
    // key shares its partition with no right row — both emit with a
    // null match, exactly the SQL outer behavior.
    val rightClean = right.filter(
      col(rightTsCol).isNotNull && col(keyCol).isNotNull)
    val lu = left.select(
      col(keyCol).as("__k"), tsExpr(left, leftTsCol).as("__ts"),
      lit(1).as("__side"), lit(Long.MaxValue).as("__tie"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val ru = rightClean.select(
      col(keyCol).as("__k"), tsExpr(right, rightTsCol).as("__ts"),
      lit(0).as("__side"), col(rightTieCol).cast("long").as("__tie"),
      lit(null).cast(lStruct).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))

    // rowsBetween keeps the frame a running one: Spark evaluates
    // last(ignoreNulls) over a growing frame in O(1) state per row.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = lu.unionByName(ru)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val cols: Seq[Column] = col("__k").as(keyCol) +:
      (leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightCols.map(c => col("__match").getField(c).as(c)))
    out.select(cols: _*)
  }
}
