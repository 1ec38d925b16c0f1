package graft.model

/** Core wide-column data model.
  *
  * Mirrors the reference's public semantics (see Scaladoc citations), but the
  * representation is Spark-native: typed nullable struct legs instead of the
  * reference's tag-byte binary codec.
  */

/** Typed cell value. Seven scalar types, JSON wire form is a tagged union
  * `{"type": "...", "value": ...}`.
  *
  * Reference: `smoltable/src/cell.rs:12-40` (enum `Value`).
  */
sealed trait CellValue {
  def typeName: String
  def jsonValue: String
}
object CellValue {
  final case class S(v: String) extends CellValue {
    def typeName = "string"; def jsonValue = Json.quote(v)
  }
  final case class B(v: Boolean) extends CellValue {
    def typeName = "boolean"; def jsonValue = v.toString
  }
  /** Unsigned byte (0-255). Spark has no u8; ShortType carries the range. */
  final case class Byte(v: Short) extends CellValue {
    require(v >= 0 && v <= 255, s"byte out of range: $v")
    def typeName = "byte"; def jsonValue = v.toString
  }
  final case class I32(v: Int) extends CellValue {
    def typeName = "i32"; def jsonValue = v.toString
  }
  final case class I64(v: Long) extends CellValue {
    def typeName = "i64"; def jsonValue = v.toString
  }
  final case class F32(v: Float) extends CellValue {
    def typeName = "f32"; def jsonValue = Json.num(v.toDouble)
  }
  final case class F64(v: Double) extends CellValue {
    def typeName = "f64"; def jsonValue = Json.num(v)
  }
}

/** Spark-row-compatible cell payload: `type` discriminator + one non-null leg.
  * This is the `value` struct of the canonical cell table (SURVEY.md §7.1).
  */
final case class CellPayload(
    vtype: String,
    s: Option[String] = None,
    b: Option[Boolean] = None,
    u8: Option[Short] = None,
    i32: Option[Int] = None,
    i64: Option[Long] = None,
    f32: Option[Float] = None,
    f64: Option[Double] = None
) {
  def toValue: CellValue = vtype match {
    case "string"  => CellValue.S(s.get)
    case "boolean" => CellValue.B(b.get)
    case "byte"    => CellValue.Byte(u8.get)
    case "i32"     => CellValue.I32(i32.get)
    case "i64"     => CellValue.I64(i64.get)
    case "f32"     => CellValue.F32(f32.get)
    case "f64"     => CellValue.F64(f64.get)
    case other     => throw new IllegalArgumentException(s"unknown type $other")
  }
}
object CellPayload {
  def apply(v: CellValue): CellPayload = v match {
    case CellValue.S(x)    => CellPayload("string", s = Some(x))
    case CellValue.B(x)    => CellPayload("boolean", b = Some(x))
    case CellValue.Byte(x) => CellPayload("byte", u8 = Some(x))
    case CellValue.I32(x)  => CellPayload("i32", i32 = Some(x))
    case CellValue.I64(x)  => CellPayload("i64", i64 = Some(x))
    case CellValue.F32(x)  => CellPayload("f32", f32 = Some(x))
    case CellValue.F64(x)  => CellPayload("f64", f64 = Some(x))
  }
}

/** One physical cell row of the canonical cell table.
  * Timestamps are nanoseconds since epoch as signed Long (sufficient until
  * 2262; the reference uses u128 ns — `smoltable/src/table/writer.rs:28-33`).
  * `seq` is a monotonically increasing write-batch sequence used for
  * last-write-wins resolution on identical `(row_key, family, qualifier, ts)`
  * (the reference gets LWW for free from LSM upsert).
  */
final case class CellRow(
    row_key: String,
    family: String,
    qualifier: String,
    ts: Long,
    value: CellPayload,
    seq: Long = 0L
)

/** Column key `family:qualifier`; qualifier `None` and `""` address the same
  * column ("default column").
  *
  * Reference: `smoltable/src/column_key.rs:19-31`, `:54-58`.
  */
final case class ColumnKey(family: String, qualifier: Option[String]) {
  override def toString: String = s"$family:${qualifier.getOrElse("")}"
}
object ColumnKey {
  private val Allowed: Set[Char] =
    ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_.#$").toSet

  /** Reference: `smoltable/src/column_key.rs:6-11`. */
  def isValidIdentifier(s: String): Boolean =
    s.nonEmpty && s.length < 512 && s.forall(Allowed.contains)

  /** Parse "fam", "fam:" (whole family) or "fam:qual".
    * Reference: `smoltable/src/column_key.rs:46-76` (`TryFrom<&str>`).
    */
  def parse(value: String): Either[String, ColumnKey] = {
    val splits = value.split(":", -1).toList
    splits match {
      case fam :: Nil            => Right(ColumnKey(fam, None))
      case fam :: "" :: _        => Right(ColumnKey(fam, None))
      case fam :: qual :: _ =>
        if (!isValidIdentifier(fam)) Left(s"invalid family: $fam")
        else Right(ColumnKey(fam, Some(qual)))
      case Nil                   => Left("empty column key")
    }
  }
  def of(s: String): ColumnKey =
    parse(s).fold(e => throw new IllegalArgumentException(e), identity)
}

/** Column filter: simultaneously a predicate and a projection (wide-column
  * column pruning). Reference: `smoltable/src/column_filter.rs:10-19`,
  * predicate semantics `smoltable/src/cell.rs:214-266`
  * (`satisfies_column_filter`).
  */
sealed trait ColumnFilter {
  /** All referenced families (used for locality-group pruning,
    * `smoltable/src/table/row_reader.rs:6-69`). */
  def families: Seq[String]
}
object ColumnFilter {
  final case class Key(key: ColumnKey) extends ColumnFilter {
    def families: Seq[String] = Seq(key.family)
  }
  final case class Multi(keys: Seq[ColumnKey]) extends ColumnFilter {
    def families: Seq[String] = keys.map(_.family).distinct
  }
  final case class Prefix(key: ColumnKey) extends ColumnFilter {
    def families: Seq[String] = Seq(key.family)
  }
}

/** Scan mode. Reference: `smoltable/src/query/scan.rs:4-21`. */
sealed trait ScanMode
object ScanMode {
  final case class Prefix(prefix: String) extends ScanMode
  final case class Range(start: String, end: String, inclusive: Boolean)
      extends ScanMode
}

/** GC settings per column family.
  * Reference: `smoltable/src/table/mod.rs:82-93`.
  */
final case class GcSettings(
    versionLimit: Option[Int] = None,
    ttlSecs: Option[Long] = None
) {
  def needsGc: Boolean =
    versionLimit.exists(_ > 0) || ttlSecs.exists(_ > 0)
}

final case class ColumnFamilyDefinition(
    name: String,
    gc: GcSettings = GcSettings()
)

/** Scan query input. `None` means "caller imposed no bound" — the raw
  * [[graft.core.CellOps]] pipelines treat it as unlimited (the analytics
  * surface), while the engine verbs ([[graft.core.Smoltable.scan]]) apply
  * the reference's u16::MAX defaults via [[withEngineDefaults]]
  * (`smoltable/src/table/mod.rs:635-650`).
  */
final case class ScanInput(
    mode: ScanMode,
    filter: Option[ColumnFilter] = None,
    rowLimit: Option[Int] = None,
    rowOffset: Option[Long] = None,
    rowCellLimit: Option[Int] = None,
    columnCellLimit: Option[Int] = None,
    globalCellLimit: Option[Int] = None,
    sample: Option[Float] = None,
    /** Reference-faithful PER-CELL sampling/offset advancement: the
      * reference loop never inserts a sampling/offset-rejected row into its
      * row map, so every further cell of that row re-triggers the new-row
      * branch — the sample counter and `rows_scanned_count` advance once
      * per *cell* of a skipped row, and a row can be accepted mid-row with
      * its earlier cells lost (`smoltable/src/table/mod.rs:724-756`,
      * `TODO: test` upstream). Default `false` keeps the per-row
      * definition (rank-based, fully distributed, coincides on single-cell
      * rows); `true` reproduces the reference's CELL VISIBILITY exactly at
      * the cost of a sequential diffusion fold over per-column count
      * summaries ([[graft.core.CellOps.scanCells]] step 3), and publishes
      * the reference's `rows_scanned_count` verbatim — per-cell ticks of
      * skipped rows, the row-limit break tick, and the global-cell-limit
      * stop included. */
    perCellDiffusion: Boolean = false,
    /** Reference-faithful CHUNK-GRANULAR `cells_scanned`/`bytes_scanned`
      * accounting: the reference reader fetches the keyspace in adaptive
      * chunks (10 cells, doubling to a 128k cap — `table/reader.rs:90-131`)
      * and its counters reflect FETCHED chunks, so a scan terminated early
      * by the global-cell or row limit reports up to one chunk past the
      * break per locality group. Default `false` reports the visited-range
      * totals in one action (exact whenever the scan runs to range end —
      * which is also what the reference does there, since out-of-bounds
      * cells only `continue` its loop). `true` replays the chunk-fetch
      * arithmetic with bounded follow-up aggregation jobs on early breaks
      * ([[graft.core.Smoltable]] `chunkEmulated`); exact for scans without
      * sampling/offset, and with them too when [[perCellDiffusion]] is on
      * (the acceptance fold publishes the break position). */
    chunkGranularMetrics: Boolean = false
) {
  /** Engine-verb view: every omitted limit becomes the reference default
    * 65535 (`scan`, `mod.rs:635-650`). Besides wire parity this bounds the
    * driver-side row assembly — a limit-less scan can never collect more
    * than 65535 cells. */
  def withEngineDefaults: ScanInput = copy(
    rowLimit = rowLimit.orElse(Some(ScanInput.DefaultLimit)),
    rowCellLimit = rowCellLimit.orElse(Some(ScanInput.DefaultLimit)),
    columnCellLimit = columnCellLimit.orElse(Some(ScanInput.DefaultLimit)),
    globalCellLimit = globalCellLimit.orElse(Some(ScanInput.DefaultLimit)))
}
object ScanInput {
  /** u16::MAX — the reference's default for every omitted limit. */
  val DefaultLimit = 65535
}

/** Point-get input. Reference: `smoltable/src/query/row.rs:26-31`. */
final case class GetRowInput(
    key: String,
    filter: Option[ColumnFilter] = None,
    rowCellLimit: Option[Int] = None,
    columnCellLimit: Option[Int] = None
) {
  /** Engine-verb view: reference defaults (u16::MAX) for omitted limits
    * (`get_row`, `smoltable/src/table/mod.rs:824-831`). */
  def withEngineDefaults: GetRowInput = copy(
    rowCellLimit = rowCellLimit.orElse(Some(ScanInput.DefaultLimit)),
    columnCellLimit = columnCellLimit.orElse(Some(ScanInput.DefaultLimit)))
}

final case class CountInput(
    mode: ScanMode,
    filter: Option[ColumnFilter] = None
)

/** User-facing cell: `{"time": ts, "type": ..., "value": ...}`.
  * Reference: `smoltable/src/cell.rs:269-277`.
  */
final case class GCell(time: Long, value: CellValue) {
  def toJson: String =
    s"""{"time":$time,"type":${Json.quote(value.typeName)},"value":${value.jsonValue}}"""
}

/** Query-output row: family -> qualifier -> versions (newest first).
  * Reference: `smoltable/src/row.rs:5-25`.
  */
final case class GRow(
    rowKey: String,
    columns: Map[String, Map[String, Seq[GCell]]]
) {
  def familyCount: Int = columns.size
  def columnCount: Int = columns.valuesIterator.map(_.size).sum
  def cellCount: Int =
    columns.valuesIterator.flatMap(_.valuesIterator.map(_.size)).sum

  /** Deterministic JSON (sorted keys) for golden comparisons. */
  def toJson: String = {
    val fams = columns.toSeq.sortBy(_._1).map { case (fam, quals) =>
      val qs = quals.toSeq.sortBy(_._1).map { case (q, cells) =>
        s"${Json.quote(q)}:${cells.map(_.toJson).mkString("[", ",", "]")}"
      }
      s"${Json.quote(fam)}:${qs.mkString("{", ",", "}")}"
    }
    s"""{"row_key":${Json.quote(rowKey)},"columns":${fams.mkString("{", ",", "}")}}"""
  }
}

final case class ScanMetrics(
    affectedLocalityGroups: Int,
    cellsScanned: Long,
    rowsScanned: Long,
    bytesScanned: Long
)

final case class ScanOutput(rows: Seq[GRow], metrics: ScanMetrics)
final case class GetRowOutput(row: Option[GRow], metrics: ScanMetrics)
final case class CountOutput(
    rowCount: Long,
    cellCount: Long,
    affectedLocalityGroups: Int,
    bytesScanned: Long
)

/** Minimal JSON helpers (no external deps in the zero-egress build). */
object Json {
  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }
  /** JSON number rendering: integral doubles print without ".0" to match
    * serde_json's shortest-round-trip behavior closely enough for goldens. */
  def num(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
}
