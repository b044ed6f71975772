package graft.parse

/**
 * moment.js → java.time DateTimeFormatter pattern translation.
 *
 * The reference parses message timestamps STRICTLY against a moment
 * format string from the MESSAGE_FORMAT config (default
 * `YYYY-MM-DD HH:mm:ss.SSSSSSZZ`,
 * reference machine-data-parser.ts:61,135 and
 * solution-helper-construct.ts:146). Spark's `to_timestamp` uses
 * java.time patterns, so config-supplied formats are translated here.
 *
 * Only the token set moment documents for parsing is handled; unknown
 * alpha tokens pass through unchanged (and will fail loudly at parse
 * time rather than silently mis-parse).
 */
object MomentFormat {

  private val tokenMap: Seq[(String, String)] = Seq(
    // order matters: longest first
    "YYYY" -> "yyyy",
    "YY" -> "yy",
    "DDDD" -> "DDD", // day of year
    "DD" -> "dd",
    "D" -> "d",
    "MMMM" -> "MMMM",
    "MMM" -> "MMM",
    "MM" -> "MM",
    "M" -> "M",
    "HH" -> "HH",
    "H" -> "H",
    "hh" -> "hh",
    "h" -> "h",
    "mm" -> "mm",
    "m" -> "m",
    "ss" -> "ss",
    "s" -> "s",
    "SSSSSSSSS" -> "SSSSSSSSS",
    "SSSSSS" -> "SSSSSS",
    "SSS" -> "SSS",
    "SS" -> "SS",
    "S" -> "S",
    // moment parses Z and ZZ with the same offset regex — "+00:00",
    // "+0000" and literal "Z" all match strictly. java.time has no
    // single pattern letter for both offset shapes, so the primary
    // translation is XXX (colon form — what the reference's seeded
    // data uses, FIXTURES.md §1); compact offsets are normalized to
    // the colon shape before the single parse
    // (MessageParser.strictTimestamp).
    "ZZ" -> "XXX",
    "Z" -> "XXX",
    "A" -> "a",
    "a" -> "a",
    "dddd" -> "EEEE",
    "ddd" -> "EEE")

  /** moment X / x (epoch seconds / millis) have no java.time pattern —
   * the parser special-cases them (MessageParser.strictTimestamp). */
  def isEpochSeconds(momentFmt: String): Boolean = momentFmt.trim == "X"
  def isEpochMillis(momentFmt: String): Boolean = momentFmt.trim == "x"

  /** Translate a moment.js format string to a java.time pattern. */
  def toJavaTime(momentFmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = momentFmt.length
    while (i < n) {
      val c = momentFmt.charAt(i)
      if (c == '[') { // moment literal escape [..] → java 'literal'
        val close = momentFmt.indexOf(']', i)
        val end = if (close < 0) n else close
        sb.append('\'').append(momentFmt.substring(i + 1, end)).append('\'')
        i = if (close < 0) n else close + 1
      } else if (c.isLetter || c == 'Z') {
        tokenMap.find { case (tok, _) => momentFmt.startsWith(tok, i) } match {
          case Some((tok, rep)) => sb.append(rep); i += tok.length
          case None => sb.append('\'').append(c).append('\''); i += 1
        }
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /**
   * All java.time patterns a moment format may strictly match:
   * the primary translation, plus a compact-offset (XX) variant when
   * the format carries a Z/ZZ token — moment accepts "+0000" where
   * java's XXX requires "+00:00". A 2-element result signals the
   * caller that both offset shapes must be accepted;
   * MessageParser.strictTimestamp normalizes compact→colon once and
   * parses only with the primary (XXX) pattern.
   */
  def toJavaTimeVariants(momentFmt: String): Seq[String] = {
    val primary = toJavaTime(momentFmt)
    // XXX only ever comes from the Z/ZZ translation above
    val compact = primary.replace("XXX", "XX")
    if (compact == primary) Seq(primary) else Seq(primary, compact)
  }

  /** True iff the format's ONLY offset token is also its final token —
   * the precondition for the end-anchored compact→colon offset
   * normalization fast path (MessageParser.strictTimestamp). A format
   * placing Z/ZZ anywhere else (legal in moment, e.g. "Z YYYY-MM-DD")
   * must take the two-variant coalesce instead: the trailing-anchored
   * regexp can't reach a mid-string compact offset. */
  def offsetIsFormatFinal(momentFmt: String): Boolean = {
    val p = toJavaTime(momentFmt)
    p.endsWith("XXX") && p.indexOf("XXX") == p.length - 3
  }
}
