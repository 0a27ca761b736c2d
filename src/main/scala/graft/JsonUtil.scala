package graft

/** Minimal JSON string escaping shared by Verify's oracle dump and the
  * test-side oracle lint fixture. Escapes backslash, quote, and ALL
  * control chars (<0x20) — a tab or CR in builder-authored SQL would
  * otherwise make a consumer's json.load fail. */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Sorted-key JSON object of a string map. */
  def obj(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ",", "}")
}
