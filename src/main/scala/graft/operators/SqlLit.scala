package graft.operators

/** Shared SQL-literal quoting for library surfaces that assemble
  * expression text from caller-supplied strings (language markers,
  * stopwords, query terms). Escapes backslash and single-quote — the
  * two characters Spark's SQL parser treats specially inside a
  * single-quoted literal — so a token like `don't` is counted rather
  * than parsed (or worse, spliced in as expression text). Attribute
  * references get the backtick form, where a dot is literal instead of
  * a nesting step.
  */
object SqlLit {

  /** `s` as a single-quoted Spark SQL string literal. */
  def quote(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** `xs` as an `array('a', 'b', …)` literal. */
  def quoteArray(xs: Seq[String]): String =
    xs.map(quote).mkString("array(", ", ", ")")

  /** `name` as a backtick-quoted attribute reference — safe for column
    * names containing dots, quotes, or spaces. */
  def quoteName(name: String): String =
    "`" + name.replace("`", "``") + "`"
}
