package graft

/** The one JSON string escaper both mains use. Backslash, quote, and ALL
  * control chars (<0x20) are escaped — a tab or CR in builder-authored SQL
  * or an exception message would otherwise break the driver's json.load
  * and silently zero a round's artifact. */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
