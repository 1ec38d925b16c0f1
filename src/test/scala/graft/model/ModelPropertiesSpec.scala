package graft.model

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests for the pure model layer (SURVEY §5 port
  * strategy: codec round-trip + column-key invariants).
  */
object ModelPropertiesSpec extends Properties("model") {

  private val genValue: Gen[CellValue] = Gen.oneOf(
    Gen.asciiPrintableStr.map(CellValue.S.apply),
    Gen.oneOf(true, false).map(CellValue.B.apply),
    Gen.choose(0, 255).map(i => CellValue.Byte(i.toShort)),
    Gen.choose(Int.MinValue, Int.MaxValue).map(CellValue.I32.apply),
    Gen.choose(Long.MinValue, Long.MaxValue).map(CellValue.I64.apply),
    Gen.choose(-1e30f, 1e30f).map(CellValue.F32.apply),
    Gen.choose(-1e300, 1e300).map(CellValue.F64.apply))

  property("CellPayload round-trips every value type") = Prop.forAll(genValue) {
    v => CellPayload(v).toValue == v
  }

  property("payload has exactly one non-null leg") = Prop.forAll(genValue) { v =>
    val p = CellPayload(v)
    Seq(p.s, p.b, p.u8, p.i32, p.i64, p.f32, p.f64).count(_.isDefined) == 1
  }

  private val genIdent: Gen[String] = for {
    n <- Gen.choose(1, 20)
    cs <- Gen.listOfN(n, Gen.oneOf(
      ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('-', '_', '.', '#', '$')))
  } yield cs.mkString

  property("ColumnKey display/parse round-trip (fam:qual)") =
    Prop.forAll(genIdent, genIdent) { (fam, qual) =>
      val parsed = ColumnKey.of(s"$fam:$qual")
      parsed.family == fam && parsed.qualifier.contains(qual) &&
        ColumnKey.of(parsed.toString) == parsed
    }

  property("empty qualifier forms normalize: 'fam' == 'fam:'") =
    Prop.forAll(genIdent) { fam =>
      val a = ColumnKey.of(fam)
      val b = ColumnKey.of(s"$fam:")
      a == b && a.qualifier.isEmpty && a.toString == s"$fam:"
    }

  property("identifier validation rejects illegal chars") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val legal = s.nonEmpty && s.length < 512 &&
        s.forall(("abcdefghijklmnopqrstuvwxyz" +
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_.#$").contains(_))
      ColumnKey.isValidIdentifier(s) == legal
    }

  property("GCell JSON shape is the reference tagged union") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue), Gen.alphaNumStr) { (ts, s) =>
      GCell(ts, CellValue.S(s)).toJson ==
        s"""{"time":$ts,"type":"string","value":${Json.quote(s)}}"""
    }

  property("Json.quote output always re-parses to the input") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      graft.json.JsonValue.parse(Json.quote(s)).asString == s
    }
}
