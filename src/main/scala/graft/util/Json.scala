package graft.util

/** The one JSON string escaper (r11 review: four byte-identical copies
  * had grown in Verify, PlanAudit, Profile and the HTTP sink — a fix
  * applied to one would leave the committed artifacts disagreeing on
  * escaping). Escapes backslash, quote, and ALL control chars < 0x20 —
  * a tab or CR in builder-authored SQL or a Spark exception message
  * would otherwise make a consumer's json.load fail exactly in the
  * failure round where the machine-readable record matters most.
  * StringBuilder, not flatMap: the HTTP sink calls this per cell over
  * 50k-row chunks.
  */
object Json {
  /** `s` escaped AND double-quoted, ready to splice into a JSON text. */
  def str(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString()
  }
}
