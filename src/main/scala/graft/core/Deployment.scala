package graft.core

/** Environment gating (SURVEY §2.12 C2).
  *
  * The reference (`utils.py:58-114`) is an exhaustive if/elif truth table over
  * (env, prod-flag, dev-flag) that calls `exit()` when the script must not run
  * in the current environment. We re-express it as a pure, total function:
  * `shouldRun` returns whether the pipeline should proceed; the caller decides
  * how to stop (no `sys.exit` buried in a library).
  *
  * Truth table preserved exactly:
  *   - prod=false, dev=false           → never run (any env)
  *   - env unset (None)                → run (the reference's "runs in prod
  *     and dev" catch-all: any flags, missing env → pass)
  *   - prod=true,  dev=true            → run in both envs
  *   - prod=true,  dev=false           → run iff env == "prod"
  *   - prod=false, dev=true            → run iff env == "dev"
  *   - unknown env string with both flags set falls through the reference's
  *     table without matching → it would `pass` silently only for env=None;
  *     for an unrecognized env nothing matches, and the function returns
  *     normally (runs). We preserve that: unknown env → run.
  */
object Deployment {
  sealed trait Decision { def run: Boolean }
  case object Run extends Decision { val run = true }
  final case class Skip(reason: String) extends Decision { val run = false }

  def decide(env: Option[String], prod: Boolean = true, dev: Boolean = true): Decision =
    if (!prod && !dev) Skip("runs neither in prod nor dev")
    else if (env.isEmpty) Run
    else if (prod && dev) Run
    else if (prod && !dev && env.contains("dev")) Skip("not running in dev")
    else if (!prod && dev && env.contains("prod")) Skip("not running in prod")
    else Run

  def shouldRun(env: Option[String], prod: Boolean = true, dev: Boolean = true): Boolean =
    decide(env, prod, dev).run
}
