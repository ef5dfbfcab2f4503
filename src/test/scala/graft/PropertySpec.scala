package graft

import org.scalacheck.Gen
import graft.core.Deployment
import graft.sources.SqlScript

/** Property-based contracts (SURVEY §5.2 item 2), via scalacheck generators
  * sampled in-suite (no scalatestplus bridge needed offline). Spark-bound
  * fixpoint properties live in NormalizeSpec with adversarial nested cases.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("C2 deployment: never runs when both flags off; env-unset runs iff any flag on") {
    val envs = Gen.option(Gen.oneOf("prod", "dev", "staging", "", "PROD"))
    samples(envs).foreach { env =>
      assert(!Deployment.shouldRun(env, prod = false, dev = false))
    }
    for (p <- Seq(true, false); d <- Seq(true, false))
      assert(Deployment.shouldRun(None, p, d) == (p || d))
  }

  test("C2 deployment: prod-only and dev-only are mirror images over all envs") {
    samples(Gen.oneOf("prod", "dev")).foreach { env =>
      assert(Deployment.shouldRun(Some(env), prod = true, dev = false) == (env == "prod"))
      assert(Deployment.shouldRun(Some(env), prod = false, dev = true) == (env == "dev"))
    }
  }

  test("F9 render: brace-free templates pass through unchanged") {
    samples(Gen.listOf(Gen.alphaNumStr).map(_.mkString(" "))).foreach { t =>
      assert(SqlScript.render(t, Map.empty) == t)
    }
  }

  test("F9 render: substitution is exhaustive — no placeholder survives") {
    val names = Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)).map(_.distinct)
    samples(names, 100).foreach { ns =>
      val template = ns.map(n => s"{$n}").mkString(" + ")
      val rendered = SqlScript.render(template, ns.map(n => n -> s"v_$n").toMap)
      assert(!rendered.contains("{"))
      ns.foreach(n => assert(rendered.contains(s"v_$n")))
    }
  }

  test("U1-ish: merge PK-string parsing tolerates arbitrary whitespace") {
    samples(Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)), 100).foreach { cols =>
      val joined = cols.mkString(" , ")
      assert(graft.operators.Upsert.parsePkColumns(joined) == cols)
    }
  }
}
