package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** `spark.read.format("graft-snapshot").load(tableRoot)` — the snapshot
  * table format as a NAMED Spark reader, sugar over
  * [[SnapshotManifest.table]]'s Catalyst relation (planning-time
  * manifest-stats pruning with the query's own pushed filters, native
  * parquet scan underneath). Options:
  *
  *   - `versionAsOf` — read that committed version instead of the latest
  *     (time travel; same contract as `SnapshotManifest.readVersion`).
  *
  * Versions carrying live deletion-vector sidecars cannot be a pure file
  * relation (every reader must anti-join the sidecar), so this reader
  * REFUSES them loudly — use `SnapshotManifest.table` (which falls back
  * to the materialized read) or fold the DVs first
  * (`SnapshotManifest.foldDeletes`).
  */
final class SnapshotSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot: a table root is required — .load(<tableRoot>)"))
    val spark = sqlContext.sparkSession
    val v = parameters.get("versionAsOf").map(s =>
      try s.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft-snapshot: versionAsOf must be a version NUMBER, got '$s'")
      }).getOrElse(
      SnapshotManifest.currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(
          s"graft-snapshot: no committed snapshot under $root")))
    SnapshotManifest.relationFor(spark, root, v).getOrElse(
      throw new IllegalArgumentException(
        s"graft-snapshot: version $v of $root has live deletion-vector " +
          "sidecars (or an empty body) and cannot be a pure file relation " +
          "— use SnapshotManifest.table/read, or foldDeletes first"))
  }
}
