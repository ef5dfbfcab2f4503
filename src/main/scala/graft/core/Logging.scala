package graft.core

import java.util.concurrent.ConcurrentHashMap
import org.slf4j.{Logger, LoggerFactory}

/** Name-keyed logger registry (SURVEY §2.12 C4).
  *
  * The reference (`utils.py:22-43`) memoizes one logger per name with a
  * uniform format; slf4j/log4j2 already guarantee per-name singletons, so this
  * is a thin, allocation-free wrapper that keeps the same "ask by name, get
  * the same logger" contract plus a mixin trait for classes.
  */
object Logging {
  private val cache = new ConcurrentHashMap[String, Logger]()
  def logger(name: String = "graft"): Logger =
    cache.computeIfAbsent(name, LoggerFactory.getLogger(_))
}

trait Logging {
  @transient protected lazy val log: Logger =
    Logging.logger(getClass.getName.stripSuffix("$"))
}
