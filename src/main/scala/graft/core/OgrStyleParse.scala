package graft.core

/** OGR feature-style string engine — the slice of
  * `gdal/ogr/ogrfeaturestyle.cpp` behind OGR_STYLE introspection:
  * `OGRStyleMgr::GetPartCount` (`:601` — deliberately naive semicolon
  * counting, FIXME parity preserved), `GetPart` (';'-tokenized honoring
  * double-quoted strings), and `OGRStyleTool::Parse` (`:1680` — `Type(...)`
  * split, comma-separated `key:value` pairs honoring quotes, value quotes
  * stripped, recognized unit suffixes g/px/pt/mm/cm/in stripped from
  * numeric values like `SetInternalInputUnitFromParam`).
  */
object OgrStyleParse {

  /** Part count: semicolons not at end-of-string + 1 (exact parity with
    * the reference's documented-naive counting — a quoted ';' counts).
    */
  def partCount(style: String): Int = {
    if (style == null || style.isEmpty) return 0
    var n = 1
    var i = style.indexOf(';')
    while (i >= 0) {
      if (i + 1 < style.length) n += 1
      i = style.indexOf(';', i + 1)
    }
    n
  }

  /** Split honoring double-quoted strings (CSLTokenizeString2 with
    * HONOURSTRINGS | PRESERVEQUOTES | PRESERVEESCAPES).
    */
  private def tokenize(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && inQ) {
        cur += c; cur += s.charAt(i + 1); i += 1
      } else if (c == '"') { inQ = !inQ; cur += c }
      else if (c == sep && !inQ) { out += cur.toString; cur.clear() }
      else cur += c
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().filter(_.nonEmpty)
  }

  /** i-th style part (tool string), or null. */
  def part(style: String, i: Int): String = {
    val ps = tokenize(style, ';').map(_.trim)
    if (i >= 0 && i < ps.length) ps(i) else null
  }

  /** Tool name of a part: the text before '(' (uppercased — the
    * reference compares names case-insensitively).
    */
  def toolName(partStr: String): String = {
    if (partStr == null) return null
    val p = partStr.indexOf('(')
    val name = (if (p < 0) partStr else partStr.substring(0, p)).trim
    if (name.isEmpty) null else name.toUpperCase
  }

  private val UnitSuffixes = Seq("px", "pt", "mm", "cm", "in", "g")

  private def stripQuotes(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.head == '"' && t.last == '"')
      t.substring(1, t.length - 1).replace("\\\"", "\"")
    else t
  }

  /** Strip a recognized unit suffix from a numeric value (the input-unit
    * side effect of SetParamStr); non-numeric values pass through.
    */
  private def stripUnit(v: String): String = {
    UnitSuffixes.find(u => v.endsWith(u)) match {
      case Some(u) =>
        val head = v.dropRight(u.length)
        if (head.nonEmpty && head.forall(c => c.isDigit || c == '.' || c == '-' || c == '+'))
          head
        else v
      case None => v
    }
  }

  /** Unit suffix of a param value ("" when none). */
  def paramUnit(partStr: String, key: String): String = {
    val raw = rawParam(partStr, key)
    if (raw == null) return null
    if (raw.startsWith("\"")) return ""
    UnitSuffixes.find(u => raw.endsWith(u) && {
      val head = raw.dropRight(u.length)
      head.nonEmpty && head.forall(c => c.isDigit || c == '.' || c == '-' || c == '+')
    }).getOrElse("")
  }

  private def rawParam(partStr: String, key: String): String = {
    if (partStr == null) return null
    val open = partStr.indexOf('(')
    val close = partStr.lastIndexOf(')')
    if (open < 0 || close <= open) return null
    val content = partStr.substring(open + 1, close)
    tokenize(content, ',').iterator.flatMap { el =>
      val c = el.indexOf(':')
      if (c < 0) None
      else {
        val k = el.substring(0, c).trim
        if (k.equalsIgnoreCase(key)) Some(el.substring(c + 1).trim) else None
      }
    }.toSeq.headOption.orNull
  }

  /** Param value with quotes stripped and numeric unit suffixes removed
    * (GetParamStr semantics); null when absent.
    */
  def param(partStr: String, key: String): String = {
    val raw = rawParam(partStr, key)
    if (raw == null) null
    else if (raw.startsWith("\"")) stripQuotes(raw) // quoted: literal text
    else stripUnit(raw)
  }
}
