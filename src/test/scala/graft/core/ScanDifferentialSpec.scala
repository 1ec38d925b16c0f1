package graft.core

import scala.collection.mutable
import scala.util.Random

import graft.SparkSuite
import graft.model._

/** Differential fuzzing: [[CellOps.scanCells]] vs a direct sequential
  * transcription of the reference's scan-loop SEMANTICS
  * (`smoltable/src/table/mod.rs:685-787`) over seeded random fixtures.
  *
  * Three generator regimes:
  *  - multi-version fixtures exercise the limit interplay (per-column,
  *    per-row, global, row limit) with sampling/offset disabled;
  *  - single-cell-per-row fixtures additionally exercise sampling and
  *    offset. (The reference's sampling counter and offset comparison
  *    advance once per *cell* of a skipped row — rows it skips never enter
  *    the row map, so each of their cells re-triggers the new-row branch.
  *    With multi-cell rows that behavior is order-dependent and flagged
  *    `TODO: test` upstream; the per-row DEFAULT covers the regime where
  *    both definitions coincide.)
  *  - `perCellDiffusion = true` re-enables multi-cell fixtures WITH
  *    sampling/offset: the flag-gated parity mode must reproduce the
  *    reference's per-cell advancement exactly, including mid-row
  *    acceptance losing the row's earlier cells.
  */
class ScanDifferentialSpec extends SparkSuite {

  private case class TCell(row: String, fam: String, qual: String, ts: Long)

  /** Sequential reference semantics. Cells must arrive in key order.
    * Returns the output cells AND the loop's final `rows_scanned_count`
    * (`smoltable/src/table/mod.rs:656,726`). */
  private def refScan(cells: Seq[TCell], in: ScanInput): (Seq[TCell], Long) = {
    val rowLimit = in.rowLimit.getOrElse(65535)
    val colLimit = in.columnCellLimit.getOrElse(65535)
    val rowCellLimit = in.rowCellLimit.getOrElse(65535)
    val globalLimit = in.globalCellLimit.getOrElse(65535)
    val offset = in.rowOffset.getOrElse(0L)

    var cellCount = 0
    var rowsScanned = 0L
    var sampleCounter = 1.0f
    val rows = mutable.LinkedHashMap.empty[String, mutable.ListBuffer[TCell]]
    val out = mutable.ListBuffer.empty[TCell]
    var break = false

    val it = cells.iterator
    while (it.hasNext && !break) {
      val cell = it.next()
      if (cellCount >= globalLimit) { break = true }
      else {
        val inBounds = in.mode match {
          case ScanMode.Prefix(p) => cell.row.startsWith(p)
          case ScanMode.Range(s, e, incl) =>
            cell.row >= s && (if (incl) cell.row <= e else cell.row < e)
        }
        val passesFilter = in.filter.forall {
          case ColumnFilter.Key(k) => cell.fam == k.family &&
            k.qualifier.forall(_ == cell.qual)
          case ColumnFilter.Multi(ks) => ks.exists(k =>
            cell.fam == k.family && k.qualifier.forall(_ == cell.qual))
          case ColumnFilter.Prefix(k) => cell.fam == k.family &&
            k.qualifier.forall(q => cell.qual.startsWith(q))
        }
        if (inBounds && passesFilter) {
          var skipCell = false
          if (!rows.contains(cell.row)) {
            rowsScanned += 1
            rows.filterInPlace((_, cs) => cs.nonEmpty)
            if (rows.size == rowLimit) { break = true; skipCell = true }
            else in.sample.filter(_ < 1.0f).foreach { rate =>
              sampleCounter += rate
              if (sampleCounter < 1.0f) skipCell = true
              else sampleCounter -= 1.0f
            }
          }
          if (!break && !skipCell && rowsScanned >= math.max(offset, 0)) {
            // offset check: reference is `rows_scanned < offset -> continue`
            val rowCells = rows.getOrElseUpdate(cell.row, mutable.ListBuffer.empty)
            if (rowCells.size < rowCellLimit) {
              val colCells = rowCells.count(c =>
                c.fam == cell.fam && c.qual == cell.qual)
              if (colCells < colLimit) {
                rowCells += cell
                out += cell
                cellCount += 1
              }
            }
          }
        }
      }
    }
    (out.toSeq, rowsScanned)
  }

  private def runCase(rnd: Random, multiVersion: Boolean, caseId: Int,
      perCell: Boolean = false): Unit = {
    val rowKeys = Seq("a", "ab", "b", "ba", "c", "d")
    val fams = Seq("f1", "f2")
    val quals = Seq("", "q1", "q2")
    val tss = if (multiVersion) Seq(1L, 2L, 3L) else Seq(1L)

    val all =
      if (multiVersion)
        for {
          r <- rowKeys; f <- fams; q <- quals; t <- tss
          if rnd.nextDouble() < 0.6
        } yield TCell(r, f, q, t)
      else
        // truly one cell per row: sampling/offset semantics only coincide
        // with the reference loop in this regime (see class doc)
        for (r <- rowKeys if rnd.nextDouble() < 0.85)
          yield TCell(r, fams(rnd.nextInt(2)), quals(rnd.nextInt(3)), 1L)
    val cells = all.sortBy(c => (c.row, c.fam, c.qual, -c.ts))

    val mode =
      if (rnd.nextBoolean()) ScanMode.Prefix(Seq("", "a", "b", "ba")(rnd.nextInt(4)))
      else {
        val s = rowKeys(rnd.nextInt(3))
        val e = rowKeys(3 + rnd.nextInt(3))
        ScanMode.Range(s, e, rnd.nextBoolean())
      }
    val filter = rnd.nextInt(4) match {
      case 0 => None
      case 1 => Some(ColumnFilter.Key(ColumnKey(fams(rnd.nextInt(2)),
        if (rnd.nextBoolean()) None else Some(quals(rnd.nextInt(3))))))
      case 2 => Some(ColumnFilter.Multi(Seq(
        ColumnKey("f1", Some("q1")), ColumnKey("f2", None))))
      case 3 => Some(ColumnFilter.Prefix(ColumnKey(fams(rnd.nextInt(2)), Some("q"))))
    }
    // sampling/offset: single-cell regime always may have them; the
    // per-cell parity regime exercises them on multi-cell fixtures too
    // (arbitrary f32 rates — the parity mode is an exact f32 simulation,
    // not the closed form, so no rate restriction applies)
    val samplingOk = !multiVersion || perCell
    val in = ScanInput(
      mode = mode,
      filter = filter,
      rowLimit = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(4)) else None,
      rowOffset = if (samplingOk && rnd.nextBoolean()) Some(rnd.nextInt(4).toLong) else None,
      rowCellLimit = if (multiVersion && rnd.nextBoolean()) Some(1 + rnd.nextInt(5)) else None,
      columnCellLimit = if (multiVersion && rnd.nextBoolean()) Some(1 + rnd.nextInt(3)) else None,
      globalCellLimit = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(8)) else None,
      sample = if (samplingOk && rnd.nextBoolean()) {
        if (perCell) Some(0.05f + rnd.nextFloat() * 0.9f)
        else Some(Seq(0.25f, 0.5f, 0.75f)(rnd.nextInt(3)))
      } else None,
      perCellDiffusion = perCell)

    val (refCells, refRowsScanned) = refScan(cells, in)
    val expected = refCells.map(c => (c.row, c.fam, c.qual, c.ts)).sorted

    import spark.implicits._
    val df = cells.map(c => (c.row, c.fam, c.qual, c.ts))
      .toDF("row_key", "family", "qualifier", "ts")
    // the diffused branch publishes the reference's rows_scanned_count as
    // qual_rows — assert metric parity whenever that branch is active
    val diffused = perCell &&
      (in.sample.exists(_ < 1.0f) || in.rowOffset.exists(_ > 0))
    val obs = org.apache.spark.sql.Observation()
    val got = CellOps.scanCells(df, in, if (diffused) Some(obs) else None)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq

    assert(got == expected,
      s"case $caseId diverged\n input: $in\n cells: ${cells.size}\n" +
        s" expected: $expected\n got: $got")
    if (diffused) {
      val gotRows = obs.get.get("qual_rows")
        .map(_.asInstanceOf[Number].longValue).getOrElse(0L)
      assert(gotRows == refRowsScanned,
        s"case $caseId rows_scanned diverged\n input: $in\n" +
          s" expected: $refRowsScanned got: $gotRows")
    }
  }

  /** get_row semantics (`smoltable/src/table/mod.rs:824-882`): cells are
    * visited in key order; the row-level cell limit counts every VISITED
    * cell — including ones the per-column limit then drops (unlike scan,
    * where only appended cells count). */
  private def refGetRow(cells: Seq[TCell], in: GetRowInput): Seq[TCell] = {
    val colLimit = in.columnCellLimit.getOrElse(65535)
    val globalLimit = in.rowCellLimit.getOrElse(65535)
    val perCol = mutable.Map.empty[(String, String), Int]
    val out = mutable.ListBuffer.empty[TCell]
    var visited = 0
    val it = cells.iterator
      .filter(_.row == in.key)
      .filter(c => in.filter.forall {
        case ColumnFilter.Key(k) => c.fam == k.family &&
          k.qualifier.forall(_ == c.qual)
        case ColumnFilter.Multi(ks) => ks.exists(k =>
          c.fam == k.family && k.qualifier.forall(_ == c.qual))
        case ColumnFilter.Prefix(k) => c.fam == k.family &&
          k.qualifier.forall(q => c.qual.startsWith(q))
      })
    var break = false
    while (it.hasNext && !break) {
      if (visited >= globalLimit) break = true
      else {
        val c = it.next()
        val n = perCol.getOrElse((c.fam, c.qual), 0)
        if (n < colLimit) {
          perCol((c.fam, c.qual)) = n + 1
          out += c
        }
        visited += 1
      }
    }
    out.toSeq
  }

  test("differential fuzz: get_row visited-count limits (80 cases)") {
    val rnd = new Random(777001L)
    val fams = Seq("f1", "f2"); val quals = Seq("", "q1", "q2")
    import spark.implicits._
    for (caseId <- 1 to 80) {
      val all = for {
        r <- Seq("k1", "k2"); f <- fams; q <- quals; t <- 1L to 3L
        if rnd.nextDouble() < 0.6
      } yield TCell(r, f, q, t)
      val cells = all.sortBy(c => (c.row, c.fam, c.qual, -c.ts))
      val in = GetRowInput(
        key = "k1",
        filter = if (rnd.nextBoolean()) None else Some(ColumnFilter.Key(
          ColumnKey(fams(rnd.nextInt(2)),
            if (rnd.nextBoolean()) None else Some(quals(rnd.nextInt(3)))))),
        rowCellLimit = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(7)) else None,
        columnCellLimit = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(3)) else None)

      val expected = refGetRow(cells, in)
        .map(c => (c.row, c.fam, c.qual, c.ts)).sorted
      val df = cells.map(c => (c.row, c.fam, c.qual, c.ts))
        .toDF("row_key", "family", "qualifier", "ts")
      val got = CellOps.getRowCells(df, in).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sorted.toSeq
      assert(got == expected, s"get_row case $caseId diverged: $in")
    }
  }

  test("differential fuzz: multi-version limit interplay (80 cases)") {
    val rnd = new Random(20260812L)
    for (i <- 1 to 80) runCase(rnd, multiVersion = true, i)
  }

  test("differential fuzz: sampling + offset on single-cell rows (80 cases)") {
    val rnd = new Random(42424242L)
    for (i <- 1 to 80) runCase(rnd, multiVersion = false, i)
  }

  test("differential fuzz: per-cell diffusion parity on multi-cell rows " +
      "(80 cases)") {
    val rnd = new Random(606060606L)
    for (i <- 1 to 80) runCase(rnd, multiVersion = true, i, perCell = true)
  }

  test("differential fuzz: per-cell mode coincides with reference on " +
      "single-cell rows (40 cases)") {
    val rnd = new Random(909090909L)
    for (i <- 1 to 40) runCase(rnd, multiVersion = false, i, perCell = true)
  }
}
