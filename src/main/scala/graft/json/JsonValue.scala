package graft.json

/** Minimal JSON ADT + recursive-descent parser (the build environment is
  * zero-egress, so no external JSON library). Covers the full JSON grammar;
  * numbers keep their lexical form so integer timestamps up to the
  * reference's u128 range survive round-trips losslessly.
  */
sealed trait JsonValue {
  def asString: String = this match {
    case JsonValue.JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }
  def asLong: Long = this match {
    case JsonValue.JNumber(lex) => lex.toLong
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }
  def asDouble: Double = this match {
    case JsonValue.JNumber(lex) => lex.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }
  def asBoolean: Boolean = this match {
    case JsonValue.JBool(b) => b
    case other => throw new IllegalArgumentException(s"expected bool, got $other")
  }
  def asObject: Map[String, JsonValue] = this match {
    case JsonValue.JObject(m) => m
    case other => throw new IllegalArgumentException(s"expected object, got $other")
  }
  def asArray: Seq[JsonValue] = this match {
    case JsonValue.JArray(a) => a
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }
  def get(field: String): Option[JsonValue] = this match {
    case JsonValue.JObject(m) =>
      m.get(field).filterNot(_ == JsonValue.JNull)
    case _ => None
  }
}

object JsonValue {
  case object JNull extends JsonValue
  final case class JBool(v: Boolean) extends JsonValue
  /** Lexical form preserved (no premature double conversion). */
  final case class JNumber(lexical: String) extends JsonValue
  final case class JString(v: String) extends JsonValue
  final case class JArray(items: Seq[JsonValue]) extends JsonValue
  final case class JObject(fields: Map[String, JsonValue]) extends JsonValue

  def parse(input: String): JsonValue = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    require(p.atEnd, s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && (s(pos) == ' ' || s(pos) == '\n' || s(pos) == '\r' || s(pos) == '\t'))
        pos += 1
    private def expect(c: Char): Unit = {
      require(!atEnd && s(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    def parseValue(): JsonValue = {
      skipWs()
      require(!atEnd, "unexpected end of input")
      s(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JString(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _   => parseNumber()
      }
    }

    private def literal(lit: String): Unit = {
      require(s.regionMatches(pos, lit, 0, lit.length), s"bad literal at $pos")
      pos += lit.length
    }

    private def parseObject(): JsonValue = {
      expect('{'); skipWs()
      if (!atEnd && s(pos) == '}') { pos += 1; return JObject(Map.empty) }
      val b = scala.collection.mutable.LinkedHashMap.empty[String, JsonValue]
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        b(k) = parseValue()
        skipWs()
        if (!atEnd && s(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObject(b.toMap)
    }

    private def parseArray(): JsonValue = {
      expect('['); skipWs()
      if (!atEnd && s(pos) == ']') { pos += 1; return JArray(Nil) }
      val b = Vector.newBuilder[JsonValue]
      var done = false
      while (!done) {
        b += parseValue()
        skipWs()
        if (!atEnd && s(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArray(b.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          s(pos) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u'  =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case c => throw new IllegalArgumentException(s"bad escape \\$c")
          }
          pos += 1
        } else {
          sb.append(s(pos)); pos += 1
        }
      }
      pos += 1
      sb.toString
    }

    private def parseNumber(): JsonValue = {
      val start = pos
      if (!atEnd && s(pos) == '-') pos += 1
      while (!atEnd && (s(pos).isDigit || "+-.eE".contains(s(pos)))) pos += 1
      require(pos > start, s"bad number at $start")
      JNumber(s.substring(start, pos))
    }
  }
}
