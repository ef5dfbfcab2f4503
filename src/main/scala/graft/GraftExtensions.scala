package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.functions.expressions.CosineSimilarity

/** Session extensions (SURVEY §4.2): SQL-callable registrations of the
  * engine's native expressions, injected via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  *   - `cosine_similarity(a, b)` — the codegen'd kernel (CosineSimilarity)
  *   - `graft_hash_id(s)`       — the reference's hash_id contract
  *     (`utils.py:46-55`): sha1 hex, null/empty → null, as pure Catalyst
  *     nodes so SQL callers get the same null semantics as the Column API
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes two arrays")
        CosineSimilarity(args.head, args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_hash_id"),
      new ExpressionInfo(classOf[Sha1].getName, "graft_hash_id"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hash_id(s) takes one argument")
        val c = args.head
        If(Or(IsNull(c), EqualTo(c, Literal(""))),
          Literal(null, StringType),
          Sha1(Cast(c, BinaryType)))
      }))
  }
}
