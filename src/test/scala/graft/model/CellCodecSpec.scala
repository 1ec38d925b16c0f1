package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level goldens for the reference storage codec
  * (`smoltable/src/cell.rs:43-133` values, `:168-212` keys) plus
  * round-trip properties.
  */
class CellCodecSpec extends AnyFunSuite {

  test("value encodings match the reference byte layout") {
    // tag 0 + utf-8 bytes
    assert(CellCodec.valueToBytes(CellValue.S("test")).toSeq ==
      Seq[Byte](0, 't', 'e', 's', 't'))
    assert(CellCodec.valueToBytes(CellValue.S("")).toSeq == Seq[Byte](0))
    // tag 1 + 0/1
    assert(CellCodec.valueToBytes(CellValue.B(true)).toSeq == Seq[Byte](1, 1))
    assert(CellCodec.valueToBytes(CellValue.B(false)).toSeq == Seq[Byte](1, 0))
    // tag 2 + u8 (255 must encode as 0xFF)
    assert(CellCodec.valueToBytes(CellValue.Byte(255)).toSeq ==
      Seq[Byte](2, -1))
    // tag 3 + i32 BE
    assert(CellCodec.valueToBytes(CellValue.I32(1)).toSeq ==
      Seq[Byte](3, 0, 0, 0, 1))
    assert(CellCodec.valueToBytes(CellValue.I32(-1)).toSeq ==
      Seq[Byte](3, -1, -1, -1, -1))
    // tag 4 + i64 BE
    assert(CellCodec.valueToBytes(CellValue.I64(258)).toSeq ==
      Seq[Byte](4, 0, 0, 0, 0, 0, 0, 1, 2))
    // tag 5 + f32 BE (1.0f = 0x3F800000)
    assert(CellCodec.valueToBytes(CellValue.F32(1.0f)).toSeq ==
      Seq[Byte](5, 0x3f, -0x80, 0, 0))
    // tag 6 + f64 BE (1.0 = 0x3FF0000000000000)
    assert(CellCodec.valueToBytes(CellValue.F64(1.0)).toSeq ==
      Seq[Byte](6, 0x3f, -0x10, 0, 0, 0, 0, 0, 0))
  }

  test("key format: string prefix + negated u128 BE timestamp") {
    val key = CellCodec.formatKey("row", ColumnKey.of("fam:q"), 1L)
    val prefix = "row:fam:q:".getBytes("UTF-8").toSeq
    assert(key.take(prefix.length).toSeq == prefix)
    assert(key.length == prefix.length + 16)
    // !(u128 value 1) = 0xFFFF...FE big-endian
    assert(key.drop(prefix.length).toSeq ==
      Seq.fill[Byte](15)(-1) :+ (-2).toByte)
    // newer ts sorts FIRST in unsigned byte order
    val newer = CellCodec.formatKey("row", ColumnKey.of("fam:q"), 2L)
    val cmp = java.util.Arrays.compareUnsigned(newer, key)
    assert(cmp < 0, "negated-timestamp keys must sort newest first")
  }

  test("round-trip: values") {
    val samples: Seq[CellValue] = Seq(
      CellValue.S("hello äöü"), CellValue.S(""),
      CellValue.B(true), CellValue.B(false),
      CellValue.Byte(0), CellValue.Byte(255),
      CellValue.I32(Int.MinValue), CellValue.I32(Int.MaxValue),
      CellValue.I64(Long.MinValue), CellValue.I64(Long.MaxValue),
      CellValue.F32(Float.MinPositiveValue), CellValue.F32(-1.5f),
      CellValue.F64(math.Pi), CellValue.F64(-0.0))
    samples.foreach { v =>
      assert(CellCodec.valueFromBytes(CellCodec.valueToBytes(v)) == Some(v))
    }
    assert(CellCodec.valueFromBytes(Array.emptyByteArray).isEmpty)
    assert(CellCodec.valueFromBytes(Array[Byte](9, 9)).isEmpty)
  }

  test("round-trip: keys (row keys may contain ':')") {
    val rnd = new scala.util.Random(20260812L)
    val alphabet = "abcXYZ019-_.#$"
    def ident(max: Int) =
      (0 to rnd.nextInt(max)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    for (_ <- 1 to 200) {
      val row = if (rnd.nextBoolean()) s"${ident(6)}:${ident(6)}" else ident(10)
      val fam = "f" + ident(8)
      val qual = if (rnd.nextBoolean()) "" else ident(8)
      val ts = rnd.nextLong(1L << 62)
      val ck = ColumnKey(fam, if (qual.isEmpty) None else Some(qual))
      val (r2, c2, t2) = CellCodec.parseKey(CellCodec.formatKey(row, ck, ts))
      assert(r2 == row && c2 == ck && t2 == ts, s"($row, $ck, $ts)")
    }
  }
}
