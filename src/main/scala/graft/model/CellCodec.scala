package graft.model

import java.nio.charset.StandardCharsets

/** The reference's binary storage codec, byte-for-byte:
  *
  *  - '''values''' are tag-byte-prefixed (`smoltable/src/cell.rs:43-133`):
  *    tag 0 = utf-8 string, 1 = boolean (1 byte), 2 = u8, 3 = i32 BE,
  *    4 = i64 BE, 5 = f32 BE, 6 = f64 BE;
  *  - '''raw keys''' are `"{row}:{family}:{qualifier}:"` + 16 bytes of the
  *    BITWISE-NEGATED u128 nanosecond timestamp, big-endian, so newer
  *    versions sort first (`cell.rs:168-212`); parsing splits on the LAST
  *    two `:` before the timestamp (row keys may contain `:`).
  *
  * The engine itself stores cells as a typed Parquet struct (SURVEY §7.3
  * keeps the binary codec optional — Parquet gets column stats and
  * dictionary encoding out of a typed layout that an opaque binary blob
  * would forfeit), but interchange with a reference store needs the exact
  * bytes. Timestamps here are the engine's signed-64 nanoseconds embedded
  * in the u128 slot (high 64 bits zero), matching every timestamp the
  * engine can produce.
  */
object CellCodec {

  // ------------------------------------------------------------- values

  def valueToBytes(v: CellValue): Array[Byte] = v match {
    case CellValue.S(s) =>
      val sb = s.getBytes(StandardCharsets.UTF_8)
      val out = new Array[Byte](1 + sb.length)
      out(0) = 0
      System.arraycopy(sb, 0, out, 1, sb.length)
      out
    case CellValue.B(b)    => Array[Byte](1, if (b) 1 else 0)
    case CellValue.Byte(u) => Array[Byte](2, (u & 0xff).toByte)
    case CellValue.I32(i) =>
      java.nio.ByteBuffer.allocate(5).put(3.toByte).putInt(i).array()
    case CellValue.I64(i) =>
      java.nio.ByteBuffer.allocate(9).put(4.toByte).putLong(i).array()
    case CellValue.F32(f) =>
      java.nio.ByteBuffer.allocate(5).put(5.toByte).putFloat(f).array()
    case CellValue.F64(d) =>
      java.nio.ByteBuffer.allocate(9).put(6.toByte).putDouble(d).array()
  }

  def valueFromBytes(bytes: Array[Byte]): Option[CellValue] = {
    if (bytes.isEmpty) return None
    val bb = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
    bytes(0) match {
      case 0 => Some(CellValue.S(
        new String(bytes, 1, bytes.length - 1, StandardCharsets.UTF_8)))
      case 1 if bytes.length >= 2 => Some(CellValue.B(bytes(1) != 0))
      case 2 if bytes.length >= 2 =>
        Some(CellValue.Byte((bytes(1) & 0xff).toShort))
      case 3 if bytes.length >= 5 => Some(CellValue.I32(bb.getInt))
      case 4 if bytes.length >= 9 => Some(CellValue.I64(bb.getLong))
      case 5 if bytes.length >= 5 => Some(CellValue.F32(bb.getFloat))
      case 6 if bytes.length >= 9 => Some(CellValue.F64(bb.getDouble))
      case _ => None
    }
  }

  // --------------------------------------------------------------- keys

  /** `"{row}:{family}:{qualifier}:" + !ts as u128 BE`. */
  def formatKey(rowKey: String, column: ColumnKey, tsNanos: Long): Array[Byte] = {
    val prefix =
      s"$rowKey:${column.family}:${column.qualifier.getOrElse("")}:"
        .getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](prefix.length + 16)
    System.arraycopy(prefix, 0, out, 0, prefix.length)
    // u128 = (0L, tsNanos); negate both halves
    val bb = java.nio.ByteBuffer.wrap(out, prefix.length, 16)
    bb.putLong(~0L) // high 64 bits of !(0:ts)
    bb.putLong(~tsNanos)
    out
  }

  /** Inverse of [[formatKey]]: (row_key, column, tsNanos). */
  def parseKey(key: Array[Byte]): (String, ColumnKey, Long) = {
    require(key.length >= 16 + 3, s"key too short: ${key.length}")
    val bb = java.nio.ByteBuffer.wrap(key, key.length - 16, 16)
    val hi = ~bb.getLong
    val ts = ~bb.getLong
    require(hi == 0L, s"timestamp beyond i64 range (high bits $hi)")
    // drop ts and the ':' delimiter before it, then rsplit twice on ':'
    val strPart = new String(key, 0, key.length - 17, StandardCharsets.UTF_8)
    val qSplit = strPart.lastIndexOf(':')
    val fSplit = strPart.lastIndexOf(':', qSplit - 1)
    require(fSplit >= 0, s"malformed key: $strPart")
    val row = strPart.substring(0, fSplit)
    val fam = strPart.substring(fSplit + 1, qSplit)
    val qual = strPart.substring(qSplit + 1)
    (row, ColumnKey(fam, if (qual.isEmpty) None else Some(qual)), ts)
  }
}
