package graft

import graft.core.Logging
import graft.nested.Normalize

/** C4 logger-registry contract + N2 legacy inner explode. */
class LoggingSpec extends SparkSpec {
  import spark.implicits._

  test("C4 one logger per name, memoized (utils.py:22-43)") {
    assert(Logging.logger("x") eq Logging.logger("x"))
    assert(Logging.logger("x") ne Logging.logger("y"))
  }

  test("Logging trait exposes a class-named logger") {
    object Holder extends graft.core.Logging {
      def name: String = log.getName
    }
    assert(Holder.name.contains("Holder"))
  }

  test("N2 legacy inner explode drops null/empty-array rows (commercetools_utils.py:72)") {
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "xs")
    assert(Normalize.explodeColumn(df, "xs").count() == 4)      // outer keeps 2,3
    assert(Normalize.explodeColumnInner(df, "xs").count() == 2) // inner drops them
  }
}
