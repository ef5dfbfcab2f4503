package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parameterized SQL entry point (SURVEY §2.1 S6/S7, §3 entry point 3).
  *
  * The reference reads a `.sql` file, substitutes `{param}` placeholders with
  * Python `str.format` kwargs, and ships the string to Exasol
  * (`return_df_from_sql_script`, `utils.py:312-339`; effect-only twin
  * `execute_sql_script`, `utils.py:342-352`). Here the executor is Spark SQL —
  * the whole relational surface (Catalyst parse → optimize → execute) rides in
  * through this one function.
  */
object SqlScript {

  /** `{param}` template substitution (same contract as `str.format` with
    * kwargs; unknown placeholders raise, literal `{{`/`}}` escape braces).
    */
  def render(template: String, params: Map[String, Any]): String = {
    val sb = new StringBuilder
    var i = 0
    val n = template.length
    while (i < n) {
      val c = template.charAt(i)
      if (c == '{' && i + 1 < n && template.charAt(i + 1) == '{') { sb.append('{'); i += 2 }
      else if (c == '}' && i + 1 < n && template.charAt(i + 1) == '}') { sb.append('}'); i += 2 }
      else if (c == '{') {
        val close = template.indexOf('}', i)
        require(close > i, s"unclosed placeholder at offset $i")
        val name = template.substring(i + 1, close)
        val v = params.getOrElse(name,
          throw new IllegalArgumentException(s"missing SQL template param: $name"))
        sb.append(v.toString)
        i = close + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** S6 — read file, substitute, execute, return frame. */
  def fromFile(spark: SparkSession, path: String, params: Map[String, Any] = Map.empty): DataFrame =
    fromString(spark, Files.readString(Paths.get(path)), params)

  def fromString(spark: SparkSession, sql: String, params: Map[String, Any] = Map.empty): DataFrame =
    spark.sql(render(sql, params))

  /** S7 — effect-only execution (DDL etc.). */
  def execute(spark: SparkSession, sql: String, params: Map[String, Any] = Map.empty): Unit = {
    spark.sql(render(sql, params))
    ()
  }
}
