package graft.core

/** Minimal JSON string escaping shared by the mains that hand-author JSON
  * (Verify's oracle_sql.json, Bench's in-window oracle request): backslash,
  * quote, and ALL control chars (<0x20) — a tab or CR in builder-authored
  * SQL would otherwise make the consumer's json.load fail and silently zero
  * a round's correctness. */
object Jsons {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
