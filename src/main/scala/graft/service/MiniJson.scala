package graft.service

/** Dependency-free JSON for the HTTP facade: a recursive-descent parser to
  * plain Scala values (Map[String, Any] / List[Any] / String / Double /
  * Boolean / null) and the matching renderer. Request bodies are small
  * (filters + aggregation specs), so a simple parser is the right tool —
  * result rows never pass through here (they are serialized plan-side via
  * `to_json`). */
object MiniJson {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing characters at ${p.i}")
    v
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      require(!eof && s.charAt(i) == c, s"expected '$c' at $i")
      i += 1
    }
    def value(): Any = {
      ws()
      require(!eof, "unexpected end of input")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    def lit(word: String, v: Any): Any = {
      require(s.regionMatches(i, word, 0, word.length), s"bad literal at $i")
      i += word.length; v
    }
    def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (!eof && s.charAt(i) == '}') { i += 1; return Map.empty }
      val b = Seq.newBuilder[(String, Any)]
      var done = false
      while (!done) {
        ws(); val k = str(); ws(); expect(':')
        b += k -> value(); ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      // ListMap preserves key order for deterministic re-render
      scala.collection.immutable.ListMap(b.result(): _*)
    }
    def arr(): List[Any] = {
      expect('['); ws()
      if (!eof && s.charAt(i) == ']') { i += 1; return Nil }
      val b = List.newBuilder[Any]
      var done = false
      while (!done) {
        b += value(); ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      b.result()
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while ({ require(i < s.length, "unterminated string"); s.charAt(i) != '"' }) {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          require(i < s.length, "unterminated escape")
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              require(i + 5 <= s.length, "truncated unicode escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb += c
        i += 1
      }
      i += 1
      sb.result()
    }
    def num(): Any = {
      val start = i
      while (!eof && ("+-.eE0123456789".indexOf(s.charAt(i)) >= 0)) i += 1
      val t = s.substring(start, i)
      require(t.nonEmpty, s"expected number at $start")
      // integers stay integral (filter values compare against int columns)
      if (t.matches("-?\\d+") && t.length < 19) t.toLong else t.toDouble
    }
  }

  def render(v: Any): String = v match {
    case null => "null"
    case None => "null"
    case Some(x) => render(x)
    case s: String => "\"" + escape(s) + "\""
    case b: Boolean => b.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null" // bare NaN/Infinity is not JSON
      else if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case f: Float => render(f.toDouble)
    case n: Number => n.toString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => "\"" + escape(String.valueOf(k)) + "\":" + render(x) }
        .mkString("{", ",", "}")
    case it: Iterable[_] => it.map(render).mkString("[", ",", "]")
    case other => "\"" + escape(String.valueOf(other)) + "\""
  }

  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
