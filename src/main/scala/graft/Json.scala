package graft

/** The ONE JSON string-escape used by every harness artifact writer
  * (Bench's bench.json, Verify's oracle_sql.json / errors.json /
  * expected_no_oracle.json). Escapes backslash, quote and ALL control
  * chars (< 0x20) — a tab or CR in builder-authored SQL would otherwise
  * make the driver's json.load fail and silently zero a round's
  * correctness. Two private copies of this logic had already drifted
  * once (r9 code review); keep exactly one.
  */
object Json {
  def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < 0x20 => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** An escaped, quoted JSON string literal. */
  def str(s: String): String = "\"" + esc(s) + "\""
}
