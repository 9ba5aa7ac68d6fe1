package graft.sources

/** Minimal, dependency-free JSON reader/escaper for the versioned
  * table's manifests (and any other builder-owned sidecar metadata).
  *
  * A real recursive-descent parser, not substring surgery: handles
  * field order, whitespace, nested values, `\`-escapes and `\uXXXX`,
  * and IGNORES unknown fields — so a manifest written by a newer
  * builder (extra fields) stays readable by an older one, the
  * forward-compatibility property every table-format spec requires
  * of its readers. Deliberately small: objects parse to
  * `Map[String, Any]` with String / Long / Double / Boolean / null /
  * List[Any] / Map[String, Any] values; no streaming, no numbers
  * beyond long/double — manifests are KB-sized control metadata, not
  * data.
  */
object ManifestJson {

  /** Escape + quote a string for embedding in rendered JSON. */
  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"')
    b.toString
  }

  /** Parse a JSON object document. Throws IllegalArgumentException
    * with position info on malformed input. */
  def parseObject(s: String): Map[String, Any] = {
    val p = new Parser(s)
    val v = p.value()
    p.expectEnd()
    v match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalArgumentException(
        s"manifest JSON: expected an object, got $other")
    }
  }

  private final class Parser(s: String) {
    private var i = 0

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"manifest JSON: $msg at offset $i")

    private def ws(): Unit =
      while (i < s.length && s.charAt(i).isWhitespace) i += 1

    private def peek(): Char = {
      ws()
      if (i >= s.length) fail("unexpected end of input")
      s.charAt(i)
    }

    private def expect(c: Char): Unit = {
      if (peek() != c) fail(s"expected '$c', found '${s.charAt(i)}'")
      i += 1
    }

    def expectEnd(): Unit = {
      ws()
      if (i != s.length) fail("trailing content")
    }

    def value(): Any = peek() match {
      case '"' => string()
      case '{' => obj()
      case '[' => array()
      case 't' => literal("true", java.lang.Boolean.TRUE)
      case 'f' => literal("false", java.lang.Boolean.FALSE)
      case 'n' => literal("null", null)
      case c if c == '-' || c.isDigit => number()
      case c => fail(s"unexpected character '$c'")
    }

    private def literal(lit: String, v: Any): Any = {
      if (!s.startsWith(lit, i)) fail(s"malformed literal (want $lit)")
      i += lit.length
      v
    }

    private def obj(): Map[String, Any] = {
      expect('{')
      if (peek() == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        val k = { if (peek() != '"') fail("object key must be a string"); string() }
        expect(':')
        b += k -> value()
        peek() match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case c => fail(s"expected ',' or '}', found '$c'")
        }
      }
      b.result()
    }

    private def array(): List[Any] = {
      expect('[')
      if (peek() == ']') { i += 1; return Nil }
      val b = List.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        peek() match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case c => fail(s"expected ',' or ']', found '$c'")
        }
      }
      b.result()
    }

    private def string(): String = {
      expect('"')
      val b = new StringBuilder
      while (true) {
        if (i >= s.length) fail("unterminated string")
        s.charAt(i) match {
          case '"' => i += 1; return b.toString
          case '\\' =>
            i += 1
            if (i >= s.length) fail("unterminated escape")
            s.charAt(i) match {
              case '"' => b.append('"'); i += 1
              case '\\' => b.append('\\'); i += 1
              case '/' => b.append('/'); i += 1
              case 'n' => b.append('\n'); i += 1
              case 'r' => b.append('\r'); i += 1
              case 't' => b.append('\t'); i += 1
              case 'b' => b.append('\b'); i += 1
              case 'f' => b.append('\f'); i += 1
              case 'u' =>
                if (i + 4 >= s.length) fail("truncated \\u escape")
                b.append(Integer.parseInt(s.substring(i + 1, i + 5), 16)
                  .toChar)
                i += 5
              case c => fail(s"unknown escape '\\$c'")
            }
          case c => b.append(c); i += 1
        }
      }
      b.toString // unreachable
    }

    private def number(): Any = {
      val start = i
      if (s.charAt(i) == '-') i += 1
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(
        s.charAt(i)))) i += 1
      val tok = s.substring(start, i)
      if (tok.exists(c => c == '.' || c == 'e' || c == 'E'))
        tok.toDouble
      else
        tok.toLong
    }
  }
}
