package graft.functions

/** Translation of BigQuery strptime-style datetime format strings into Spark
  * datetime patterns (and DuckDB strptime variants for the test oracle).
  *
  * The reference's one real UDF parses with five such formats
  * (/root/reference/models/udf/function/parse_datetime.sql:10-15):
  * `%Y/%m/%d %H:%M:%S`, `%Y/%m/%d`, `%Y-%m-%d %H:%M:%S`, `%Y-%m-%d`,
  * `%Y-%m-%dT%H:%M:%E*SZ`.
  *
  * `%E*S` is BigQuery's "seconds with any number of fractional digits"; Spark
  * expresses that as `ss` plus an optional-section fraction `[.SSSSSS]`
  * (verified: parses 0, 3 and 6 fractional digits). Literal letters in the
  * format (`T`, `Z`) must be single-quoted for Spark's pattern language.
  */
object BqDateFormat {

  /** BQ format element -> Spark datetime pattern element. Longest match wins. */
  private val tokens: Seq[(String, String)] = Seq(
    "%E*S" -> "ss[.SSSSSS]",
    "%E4Y" -> "yyyy",
    "%Y" -> "yyyy",
    "%m" -> "MM",
    "%d" -> "dd",
    "%H" -> "HH",
    "%I" -> "hh",
    "%M" -> "mm",
    "%S" -> "ss",
    "%j" -> "DDD",
    "%e" -> "d",
    "%p" -> "a",
    "%b" -> "MMM",
    "%B" -> "MMMM",
    "%a" -> "EEE",
    "%A" -> "EEEE",
    "%%" -> "%"
  )

  /** Translate a BigQuery format string to a Spark datetime pattern. */
  def toSpark(bqFormat: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < bqFormat.length) {
      tokens.find { case (bq, _) => bqFormat.startsWith(bq, i) } match {
        case Some((bq, spark)) =>
          out.append(spark); i += bq.length
        case None =>
          val c = bqFormat.charAt(i)
          if (c.isLetter) out.append('\'').append(c).append('\'')
          else out.append(c)
          i += 1
      }
    }
    // collapse adjacent quoted literals ('T''Z' -> 'TZ') for readability
    out.toString.replace("''", "")
  }

  /** DuckDB strptime variants for the oracle. DuckDB has no optional-section
    * syntax, so `%E*S` expands to two concrete formats (with and without a
    * `.%f` fraction); every other element is already strptime-compatible.
    */
  def toDuckDbVariants(bqFormat: String): Seq[String] =
    if (bqFormat.contains("%E*S"))
      Seq(
        bqFormat.replace("%E*S", "%S.%f"),
        bqFormat.replace("%E*S", "%S")
      )
    else Seq(bqFormat)
}
