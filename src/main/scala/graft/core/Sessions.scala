package graft.core

import org.apache.spark.sql.SparkSession

/** Session bootstrap (SURVEY §2.12 C7: the reference builds its Exasol
  * connection from env vars, `utils.py:299-309`; here the "connection" is the
  * SparkSession itself).
  *
  * Scale notes: AQE on (runtime re-plan, skew-join splitting, partition
  * coalescing), UTC session timezone for deterministic timestamp semantics,
  * shuffle partitions sized for the local harness but overridable — on a real
  * cluster this would be `spark.sql.shuffle.partitions ≈ 2-3× total cores`
  * plus AQE coalescing.
  */
object Sessions {
  def builder(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .withExtensions(new graft.GraftExtensions) // SQL-callable native fns
      // session-catalog extension: SQL time travel (VERSION/TIMESTAMP AS
      // OF) for snapshot tables; everything else delegates verbatim
      .config("spark.sql.catalog.spark_catalog",
        "graft.sources.GraftCatalog")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // object-hash agg (TypedImperativeAggregate: topk, collect_*) falls
      // back to SORT-based aggregation after this many in-memory keys —
      // the default 128 turns any high-cardinality topk into a full sort.
      // Buffers are ≤ k elements, so thousands of entries are cheap.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      // plain (un-adjusted) parquet timestamps read as TIMESTAMP, not
      // TIMESTAMP_NTZ: the engine's temporal operators (unix_micros as-of
      // arithmetic, RANGE frames) are defined over the instant type, and
      // with a UTC session the wall-clock values are identical either way
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // NOTE on timestamps: the INT96 write default stays for GENERAL
      // writes — downstream consumers (the oracle harness reads result
      // dumps through DuckDB/pandas) type INT64-micros-adjustedToUTC as
      // TIMESTAMPTZ, which changes their rendered values. Engine-INTERNAL
      // snapshot data files (only ever read back by this engine) are
      // written as INT64 micros instead — see SnapshotManifest
      // .writeDataFiles — because INT96 chunks carry no footer statistics
      // and Spark disables parquet predicate pushdown on INT96 entirely.
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
