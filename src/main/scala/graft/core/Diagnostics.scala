package graft.core

import org.apache.spark.sql.DataFrame

/** Frame diagnostics (SURVEY §2.12 C6, reference `utils.py:357-386`).
  *
  * `print_full_df` / shape+columns summary, made scale-safe: the summary
  * costs one `count()`; the full print is explicitly capped (the reference's
  * uncapped `pd.set_option('display.max_rows', None)` print is exactly the
  * driver-materialization anti-pattern the engine bans at 100 TB).
  */
object Diagnostics {

  /** Shape + columns one-liner (`utils.py:376-386`). */
  def summarize(df: DataFrame): String =
    s"${df.count()} rows, ${df.columns.length} cols: ${df.columns.mkString("[", ", ", "]")}"

  /** Full-frame render, capped. Returns the rendered string rather than
    * printing, so callers (and tests) own the channel.
    */
  def render(df: DataFrame, maxRows: Int = 1000): String = {
    val rows = df.limit(maxRows).collect()
    val header = df.columns.mkString(" | ")
    (header +: rows.map(_.toSeq.map(v => if (v == null) "null" else v.toString)
      .mkString(" | "))).mkString("\n")
  }
}
