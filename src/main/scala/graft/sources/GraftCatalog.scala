package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.connector.catalog.{DelegatingCatalogExtension, Identifier, Table}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Session-catalog extension adding SQL TIME TRAVEL for snapshot tables —
  * the one statement shape the analyzer resolves through the CATALOG
  * (`V2SessionCatalog.loadTable(ident, version)` throws
  * `UNSUPPORTED_FEATURE.TIME_TRAVEL` before any injected rule can run, so
  * a `DelegatingCatalogExtension` is the supported Spark mechanism —
  * exactly how the public lakehouse formats wire theirs in):
  *
  * {{{
  *   spark.sql.catalog.spark_catalog = graft.sources.GraftCatalog
  *
  *   SELECT * FROM t VERSION AS OF 3
  *   SELECT * FROM t TIMESTAMP AS OF '2026-08-16 07:00:00'
  * }}}
  *
  * Every other catalog operation — `CREATE TABLE`, plain loads, DROP,
  * ALTER, namespaces — DELEGATES verbatim to the built-in session
  * catalog: registering this catalog changes nothing but the time-travel
  * overloads, and those only for tables whose provider is
  * `graft-snapshot` (anything else keeps the delegate's behavior,
  * including its refusal).
  *
  * Version resolution matches the reader options: `VERSION AS OF n` is
  * the committed version number ([[SnapshotManifest.readVersion]]'s
  * contract); `TIMESTAMP AS OF ts` resolves through
  * [[SnapshotManifest.versionAsOf]] (newest retained version published at
  * or before `ts` — manifest mtimes order the commits, the same contract
  * as `readAsOf`).
  */
class GraftCatalog extends DelegatingCatalogExtension {

  private def spark: SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "GraftCatalog: no active SparkSession"))

  /** (root, catalog-declared schema) when `ident` is a graft-snapshot
    * table in the session catalog. The declared schema matters only
    * pre-bootstrap (CREATE TABLE with columns, then INSERT): once a
    * snapshot exists its manifest is authoritative.
    */
  private def snapshotRoot(ident: Identifier)
      : Option[(String, Option[org.apache.spark.sql.types.StructType])] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val id = TableIdentifier(ident.name,
      ident.namespace.lastOption.orElse(Some("default")))
    try {
      val meta = classic.sessionState.catalog.getTableMetadata(id)
      if (meta.provider.exists(_.equalsIgnoreCase("graft-snapshot")))
        Some((meta.location.toString, Some(meta.schema).filter(_.nonEmpty)))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Snapshot tables load as THE V2 [[SnapshotTable]] (current version)
    * — with a catalog extension registered, plain loads no longer take
    * the built-in provider-conversion path, so returning the table here
    * is what keeps SQL reads on the pruning scan, INSERT on the V2 write,
    * and DELETE/UPDATE/MERGE visible to the
    * [[graft.plans.SnapshotStatements]] rewrite (the same pattern the
    * public lakehouse catalogs use). Everything else delegates.
    */
  override def loadTable(ident: Identifier): Table =
    snapshotRoot(ident) match {
      case Some((root, declared)) =>
        new SnapshotTable(spark, root, None, declared,
          CaseInsensitiveStringMap.empty())
      case None => super.loadTable(ident)
    }

  override def loadTable(ident: Identifier, version: String): Table =
    snapshotRoot(ident) match {
      case Some((root, _)) =>
        val v = try version.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft-snapshot: VERSION AS OF takes a version NUMBER, got " +
              s"'$version'")
        }
        require(SnapshotManifest.hasVersion(spark, root, v),
          s"graft-snapshot: version $v of $root is not retained " +
            "(never committed, or vacuumed)")
        new SnapshotTable(spark, root, Some(v), None,
          CaseInsensitiveStringMap.empty())
      case None => super.loadTable(ident, version)
    }

  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    snapshotRoot(ident) match {
      case Some((root, _)) =>
        val v = SnapshotManifest.versionAsOf(spark, root,
          timestampMicros / 1000L).getOrElse(
          throw new IllegalStateException(
            s"graft-snapshot: no retained snapshot of $root as of " +
              s"$timestampMicros µs — the first retained commit is newer " +
              "(or the table is empty)"))
        new SnapshotTable(spark, root, Some(v), None,
          CaseInsensitiveStringMap.empty())
      case None => super.loadTable(ident, timestampMicros)
    }
}
