package graft.api

/** Minimal dependency-free JSON reader/writer for the API layer (request
  * bodies are rule-group sized — parsing stays driver-side and tiny).
  * Reader returns Map[String, Any] / List[Any] / String / Double / Boolean
  * / null. Writer mirrors the Prometheus response conventions.
  */
object MiniJson {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    if (!p.eof) throw new IllegalArgumentException(s"trailing JSON at ${p.i}")
    v
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    private def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"bad JSON ($what) at offset $i")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def value(): Any = {
      ws()
      if (eof) fail("eof")
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

    private def lit(text: String, v: Any): Any = {
      if (!s.startsWith(text, i)) fail(text)
      i += text.length
      v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (!eof && s.charAt(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        b += k -> value()
        ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      expect('['); ws()
      if (!eof && s.charAt(i) == ']') { i += 1; return Nil }
      val b = List.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (eof) fail("escape")
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
              if (i + 4 >= s.length) fail("unicode escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case o => fail(s"escape \\$o")
          }
        } else sb += c
        i += 1
      }
      expect('"')
      sb.result()
    }

    private def num(): Double = {
      val start = i
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) fail("number")
      s.substring(start, i).toDouble
    }
  }

  // ---- writer -----------------------------------------------------------

  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Go-style shortest float formatting for sample values. */
  def num(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isPosInfinity) "+Inf"
    else if (v.isNegInfinity) "-Inf"
    else if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  def arr(xs: Seq[String]): String = xs.map(str).mkString("[", ",", "]")

  def objOf(kvs: Seq[(String, String)]): String =
    kvs.map { case (k, v) => s"${str(k)}:$v" }.mkString("{", ",", "}")

  def strMap(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s"${str(k)}:${str(v)}" }.mkString("{", ",", "}")
}
