package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

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
  *
  * WRITES map `SaveMode` onto the format's commit verbs —
  * `df.write.format("graft-snapshot").mode(m).save(root)`:
  *
  *   - a first write bootstraps the table (`SnapshotManifest.commit`)
  *     under any mode;
  *   - `Append` → `appendRows` (a new version adding the frame's files;
  *     declared table properties carry);
  *   - `Overwrite` → a full-overwrite `commit` (the new frame defines
  *     the content; pk/bloom/partition/txn properties persist per the
  *     commit contract);
  *   - `ErrorIfExists` refuses an existing table; `Ignore` no-ops.
  *
  * Write options (all optional, comma-separated column lists):
  * `statsCols` (per-file min/max stats for data skipping), and on
  * bootstrap/overwrite `bloomCols` / `partitionCols` (the 6-arg commit).
  */
final class SnapshotSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {
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

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot: a table root is required — .save(<tableRoot>)"))
    val spark = sqlContext.sparkSession
    def cols(key: String): Seq[String] = parameters.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val statsCols = cols("statsCols")
    val exists = SnapshotManifest.currentVersion(spark, root).isDefined
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft-snapshot: a committed snapshot already exists under " +
            s"$root (mode ErrorIfExists)")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Append if exists =>
        SnapshotManifest.appendRows(spark, root, data, statsCols)
        ()
      case _ => // Overwrite on an existing table, or any-mode bootstrap
        SnapshotManifest.commit(spark, root, data, statsCols,
          cols("bloomCols"), cols("partitionCols"))
        ()
    }
    // nominal return (Spark's save command discards it): schema-only, so
    // writing never pays a relation build — or a DV refusal — on the way out
    new BaseRelation {
      override val sqlContext: SQLContext = spark.sqlContext
      override val schema: org.apache.spark.sql.types.StructType = data.schema
    }
  }
}
