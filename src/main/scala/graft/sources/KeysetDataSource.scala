package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 keyset-paginated source (SURVEY §4.2's one real custom extension
  * point): the reference's incremental REST contract (`ct_utils.py:183-263`)
  * as a first-class Spark connector, batch + streaming.
  *
  *   - pages live as `page_*.json` files (one JSON record per line) under
  *     `option("path", dir)` — the offline stand-in for a REST cursor; each
  *     page is one input partition (parallel scan)
  *   - `option("sortField", ...)` names the keyset column
  *     (`lastModifiedAt` by default, as in the reference)
  *   - batch reads support filter pushdown on the sort field (`>=`/`>`): the
  *     watermark predicate is evaluated source-side, exactly where the
  *     reference pushes `where sort_key > last_seen` into the request URL
  *   - `readStream` makes the source a first-class `MicroBatchStream` whose
  *     OFFSET IS THE SORT-KEY WATERMARK — the durable form of the
  *     reference's `last_sort_value` cursor (`ct_utils.py:232-249`): a
  *     checkpointed offset `{"last": v}` means "every row with sort key
  *     <= v is consumed", so restart resumes from the value, not from a
  *     file position, exactly like re-issuing `where sort_key > v`
  *     against the REST cursor. `option("maxRowsPerTrigger", n)` bounds
  *     each micro-batch (admission control, value-granular: rows sharing
  *     the cut's sort value land in the same batch so the strict `>`
  *     resume can never skip them). Combined with the idempotent PK merge
  *     sink (graft.streaming.IncrementalLoad) this reproduces the
  *     at-least-once + dedup = effectively-once contract (SURVEY §2.11).
  *     Keyset streaming consumes rows in sort-key order, so a row whose
  *     key is null — or one appended late with a key at or below the
  *     consumed watermark — is by definition unreachable (the same
  *     contract as the reference's cursor; batch reads still see them)
  *
  * Registered as `spark.read.format("graft-keyset")` via DataSourceRegister.
  */
class KeysetDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-keyset"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = KeysetDataSource.pathOf(options)
    val spark = SparkSession.active
    val files = KeysetDataSource.pageFiles(dir)
    if (files.isEmpty) new StructType()
    else spark.read.json(files.map(_.getAbsolutePath): _*).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeysetTable(schema, new CaseInsensitiveStringMap(properties))
}

object KeysetDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-keyset requires option(\"path\", <dir>)"))

  def pageFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page_") && f.getName.endsWith(".json"))
      .sortBy(_.getName).toSeq

  /** Sort value of one raw JSON line (null for missing/null/unparseable) —
    * the ONE extraction both the driver-side offset scan and the reader's
    * pruned-sort-field fallback share, so their semantics can't diverge.
    *
    * A NUMERIC sort value fails loudly: value offsets compare as text
    * (lexicographic — the ISO-8601 keyset contract), and "10" < "9" would
    * silently and permanently drop rows. The schema-level guard in
    * [[KeysetScan.toMicroBatchStream]] catches this only when the sort
    * field is in the schema; this data-level check covers user schemas
    * that omit it.
    */
  private[sources] def sortValueOf(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      line: String, sortField: String): String =
    try {
      val n = mapper.readTree(line).get(sortField)
      if (n == null || n.isNull) null
      else if (n.isNumber) throw new IllegalArgumentException(
        s"graft-keyset: sort field '$sortField' is numeric in the data — " +
          "value offsets order lexicographically (the ISO-8601 keyset " +
          "contract); a numeric key would compare as text and silently " +
          "lose rows")
      else n.asText()
    } catch {
      case e: IllegalArgumentException => throw e
      case _: Exception => null
    }
}

class KeysetTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-keyset(${KeysetDataSource.pathOf(options)})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new KeysetScanBuilder(schema, options)
}

class KeysetScanBuilder(schema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private val sortField = Option(options.get("sortField")).getOrElse("lastModifiedAt")
  private var watermark: Option[KeysetWatermark] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema
  private var pushedAgg: Option[Aggregation] = None

  /** Column pruning (the DSv2 twin of parquet's ReadSchema): the JSON
    * parser is handed only the required fields, so unrequested fields are
    * skipped at parse time — for a REST-backed cursor this would become
    * the projection parameter in the request (the reference's `columns`
    * param, `ct_utils.py:116-119`). If a watermark filter was pushed but
    * the sort field was pruned, the scan re-adds it internally (Spark's
    * post-scan projection drops the surplus column).
    */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept >= / > / IS NOT NULL on the sort field — the keyset watermark —
    * source-side. Accepted filters are FULLY pushed (Spark drops them from
    * the plan), so the reader must honour strictness and SQL null semantics
    * exactly; multiple accepted filters keep the most restrictive bound.
    * `IsNotNull(sortField)` — which the optimizer infers next to every
    * comparison — maps onto the non-strict `>= ""` watermark (every
    * non-null string is >= the empty string), so a watermark query leaves
    * NO post-scan filter behind and stays eligible for aggregate pushdown.
    */
  // IsNotNull is only safe to absorb when the sort field is a STRING (the
  // >=/> cases are implicitly guarded by their `_: String` value match): a
  // timestamp-typed sort field would otherwise gain a ">= \"\"" watermark
  // whose reader-side string extraction breaks on the non-string column
  private def sortIsStringTyped: Boolean =
    schema.fieldNames.contains(sortField) && schema(sortField).dataType == StringType

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual(a, _: String) if a == sortField => true
      case GreaterThan(a, _: String) if a == sortField => true
      case IsNotNull(a) if a == sortField && sortIsStringTyped => true
      case _ => false
    }
    pushed = accepted
    accepted.foreach {
      case GreaterThanOrEqual(_, v: String) => tighten(KeysetWatermark(v, strict = false))
      case GreaterThan(_, v: String)        => tighten(KeysetWatermark(v, strict = true))
      case IsNotNull(_)                      => tighten(KeysetWatermark("", strict = false))
      case _                                 => ()
    }
    rejected // Spark still applies these
  }

  private def tighten(w: KeysetWatermark): Unit = watermark = watermark match {
    case None => Some(w)
    case Some(cur) =>
      // larger value wins; at equal values strict (>) beats non-strict (>=)
      if (w.value > cur.value || (w.value == cur.value && w.strict)) Some(w) else Some(cur)
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown — the delta-load watermark probe (`MAX(sortField)`,
    * reference `utils.py` watermark read / SURVEY A1) answered source-side:
    * each page partition emits ONE row of per-page partials instead of its
    * rows, the exact shape a REST cursor backend answers with a server-side
    * `max` endpoint. PARTIAL pushdown (`supportCompletePushDown` = false):
    * Spark re-aggregates the per-page rows (max-of-maxes, sum-of-counts),
    * so multi-page parallelism is preserved and correctness never depends
    * on this source seeing all pages in one partition. Accepted only for
    * ungrouped `MAX(sortField)` / `COUNT(*)` combinations over a STRING
    * sort field — everything else stays in the plan untouched.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions().nonEmpty) return false
    if (aggregation.aggregateExpressions().isEmpty) return false
    val sortIsString = schema.fieldNames.contains(sortField) &&
      schema(sortField).dataType == StringType
    val ok = aggregation.aggregateExpressions().forall {
      case m: Max => sortIsString && (m.column() match {
        case nr: NamedReference => nr.fieldNames().toSeq == Seq(sortField)
        case _ => false
      })
      case _: CountStar => true
      case _ => false
    }
    if (ok) pushedAgg = Some(aggregation)
    ok
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) =>
      new KeysetAggScan(KeysetDataSource.pathOf(options), sortField, watermark,
        agg.aggregateExpressions().toSeq.map {
          case _: Max => KeysetAggScan.MaxSort
          case _: CountStar => KeysetAggScan.Count
          case other => throw new IllegalStateException(s"unexpected pushed agg $other")
        })
    case None =>
      val effective =
        if (watermark.isEmpty || required.fieldNames.contains(sortField) ||
            !schema.fieldNames.contains(sortField)) required
        else StructType(required.fields :+ schema(sortField))
      new KeysetScan(effective, schema, options, sortField, watermark)
  }
}

/** Batch scan for a pushed-down ungrouped aggregation: one output row per
  * page partition carrying that page's partials in `aggs` order. Rows and
  * filters follow the SAME acceptance rule as the row scan (pushed
  * watermark bounds, null sort values excluded by a bound, counted
  * otherwise), so pushing the aggregate can never change the answer.
  */
class KeysetAggScan(dir: String, sortField: String,
    watermark: Option[KeysetWatermark], aggs: Seq[KeysetAggScan.AggKind])
    extends Scan {
  import KeysetAggScan._
  override def readSchema(): StructType =
    StructType(aggs.zipWithIndex.map {
      case (MaxSort, i) => org.apache.spark.sql.types.StructField(
        s"_agg$i", StringType, nullable = true)
      case (Count, i) => org.apache.spark.sql.types.StructField(
        s"_agg$i", org.apache.spark.sql.types.LongType, nullable = false)
    })
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val pages = KeysetDataSource.pageFiles(dir)
      // zero pages must still answer: COUNT(*) over an empty source is 0,
      // not NULL (Spark's partial-agg rewrite sums the per-page counts —
      // no partial rows would sum to NULL). One synthetic empty-page
      // partition yields the (null max, 0 count) identity partial.
      if (pages.isEmpty)
        Array(KeysetInputPartition("", watermark.toSeq, None): InputPartition)
      else pages
        .map(f => KeysetInputPartition(f.getAbsolutePath, watermark.toSeq, None): InputPartition)
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new KeysetAggReaderFactory(sortField, aggs)
  }
}

object KeysetAggScan {
  sealed trait AggKind
  case object MaxSort extends AggKind
  case object Count extends AggKind
}

class KeysetAggReaderFactory(sortField: String, aggs: Seq[KeysetAggScan.AggKind])
    extends PartitionReaderFactory {
  import KeysetAggScan._
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val kp = partition.asInstanceOf[KeysetInputPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (done) return false
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        var maxV: String = null
        var count = 0L
        // empty path = the synthetic empty-source partition: emit the
        // (null, 0) identity partial without touching the filesystem
        if (kp.path.nonEmpty) {
          val src = scala.io.Source.fromFile(kp.path)("UTF-8")
          try src.getLines().filter(_.trim.nonEmpty).foreach { line =>
            val v = KeysetDataSource.sortValueOf(mapper, line, sortField)
            // same acceptance as the row reader: a pushed bound excludes
            // null sort values (SQL comparison semantics); no bound = every
            // row counts, nulls contribute nothing to MAX
            if (kp.lowers.isEmpty || kp.lowers.forall(_.accepts(v))) {
              count += 1
              if (v != null && (maxV == null || v > maxV)) maxV = v
            }
          } finally src.close()
        }
        val values: Seq[Any] = aggs.map {
          case MaxSort => if (maxV == null) null else UTF8String.fromString(maxV)
          case Count => count
        }
        row = InternalRow.fromSeq(values)
        done = true
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** A fully-pushed keyset predicate: sort value must be > (strict) or >= the
  * bound, and — per SQL comparison semantics — null sort values never pass.
  */
case class KeysetWatermark(value: String, strict: Boolean) {
  def accepts(v: String): Boolean =
    v != null && (if (strict) v > value else v >= value)
}

class KeysetScan(schema: StructType, fullSchema: StructType,
    options: CaseInsensitiveStringMap,
    sortField: String, watermark: Option[KeysetWatermark])
    extends Scan with SupportsReportStatistics {
  private val dir = KeysetDataSource.pathOf(options)

  /** Real size/row statistics from the page files (JSON bytes as the size
    * proxy, newline count as rows). Without this a DSv2 relation reports
    * "unknown = huge" and a keyset-backed dimension NEVER broadcasts; with
    * it, Catalyst's broadcast threshold sees the actual few-KB pages and
    * plans the join like any small dimension. One driver-side listing +
    * line count, memoized per scan.
    */
  // memoized on the SCAN (not inside the Statistics object, which Spark
  // may request repeatedly during planning): one listing + line count per
  // scan lifetime
  private lazy val scanStats: (Long, Long) = {
    val files = KeysetDataSource.pageFiles(dir)
    val b = files.map(_.length()).sum
    val r = files.map { f =>
      val src = scala.io.Source.fromFile(f)("UTF-8")
      try src.getLines().count(_.trim.nonEmpty) finally src.close()
    }.sum
    (b, r.toLong)
  }
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(scanStats._1)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(scanStats._2)
  }
  private val maxRowsPerTrigger: Option[Long] =
    Option(options.get("maxRowsPerTrigger")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxRowsPerTrigger must be positive, got $n")
      n
    }
  override def readSchema(): StructType = schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      KeysetDataSource.pageFiles(dir)
        .map(f => KeysetInputPartition(f.getAbsolutePath, watermark.toSeq, None): InputPartition)
        .toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new KeysetReaderFactory(schema, sortField)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // offsets compare sort values as TEXT — correct for the reference's
    // ISO-8601 cursor, silently wrong for numeric keys ("10" < "9" would
    // permanently drop rows). Fail loudly instead of losing data.
    if (fullSchema.fieldNames.contains(sortField)) {
      val dt = fullSchema(sortField).dataType
      require(dt == StringType,
        s"graft-keyset streaming requires a STRING sort field: '$sortField' is " +
          s"$dt, and the value offset orders lexicographically (the ISO-8601 " +
          "keyset contract) — a numeric key would compare as text and " +
          "silently lose rows")
    }
    // no schema surgery for a pruned sort field: the reader falls back to
    // extracting the sort value from the raw JSON line (KeysetReaderFactory),
    // so reader rows always match readSchema() exactly
    new KeysetMicroBatchStream(dir, schema, sortField, watermark, maxRowsPerTrigger)
  }
}

/** One page file, scanned with value bounds: every `lowers` watermark must
  * accept the row's sort value, and — for streaming batches — the value must
  * be `<= upperInclusive`. Bounds travel IN the partition (not the factory)
  * so batch and streaming share one reader.
  */
case class KeysetInputPartition(path: String, lowers: Seq[KeysetWatermark],
    upperInclusive: Option[String]) extends InputPartition

/** Streaming offset = the sort-key watermark itself (the durable twin of the
  * reference's `last_sort_value` cursor, `ct_utils.py:232-249`): `last = v`
  * means every row with sort key <= v is consumed; the next batch reads
  * `(last, end]`. `None` = nothing consumed yet.
  */
case class KeysetOffset(last: Option[String]) extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    last match {
      case Some(v) => node.put("last", v)
      case None    => node.putNull("last")
    }
    m.writeValueAsString(node)
  }
}

object KeysetOffset {
  def fromJson(json: String): KeysetOffset = {
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    // strict: an unrecognized shape (e.g. a legacy integer page-index
    // checkpoint) must FAIL, not alias the "nothing consumed" offset —
    // silently mapping it to None would replay the entire history
    require(n != null && n.isObject && n.has("last"),
      s"""not a keyset offset (expected {"last": <value|null>}): $json""")
    val l = n.get("last")
    KeysetOffset(if (l.isNull) None else Some(l.asText()))
  }
}

/** Micro-batch keyset stream: offset = sort-key watermark, admission bounded
  * by `maxRowsPerTrigger` (value-granular — the cut lands on a sort VALUE, so
  * rows sharing it are admitted together and the strict-`>` resume is
  * gap-free even with duplicate keys). Implements
  * [[SupportsAdmissionControl]] (rate limiting under every trigger) and
  * [[SupportsTriggerAvailableNow]] (the end offset is frozen at start, so a
  * writer appending pages mid-run cannot keep the run alive forever).
  *
  * The driver-side page scan below is the offline stand-in for the REST
  * server's cursor endpoint (which answers "values after X" natively); it
  * parses each page file ONCE per (size, mtime) via a memoized per-file
  * sorted value list, so steady-state triggers cost one directory listing
  * plus the new pages' parse — not a re-read of consumed history.
  */
class KeysetMicroBatchStream(dir: String, schema: StructType,
    sortField: String, watermark: Option[KeysetWatermark],
    maxRowsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // (path, length, mtime) -> sorted non-null sort values (one entry per row)
  private val pageValueCache =
    scala.collection.mutable.HashMap.empty[(String, Long, Long), Array[String]]
  // end-offset cap frozen by prepareForTriggerAvailableNow
  @volatile private var availableNowCap: Option[Option[String]] = None

  private def sortValuesOf(f: java.io.File): Array[String] = synchronized {
    val key = (f.getAbsolutePath, f.length(), f.lastModified())
    pageValueCache.get(key) match {
      case Some(vs) => vs
      case None =>
        // a re-written page changes (length, mtime): evict the stale
        // generation's array first, so the cache is bounded by the CURRENT
        // page set, not by every generation ever observed. (An in-place
        // rewrite preserving BOTH byte length and mtime tick is not
        // detectable this way — out of contract: keyset pages are
        // immutable-once-written, like the REST responses they stand for.)
        pageValueCache.filterInPlace { case ((p, _, _), _) => p != f.getAbsolutePath }
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        var nLines = 0
        val src = scala.io.Source.fromFile(f)("UTF-8")
        val vs =
          try src.getLines().filter(_.trim.nonEmpty)
            .flatMap { l =>
              nLines += 1
              Option(KeysetDataSource.sortValueOf(mapper, l, sortField))
            }
            .toArray.sorted
          finally src.close()
        // a page with rows where the sort field is ABSENT from every one is
        // a misconfiguration (wrong or case-mismatched sortField — Jackson
        // lookup is case-sensitive), not data: every row would be silently
        // unreachable forever. Fail loudly. Rows with an explicit null sort
        // value stay in-contract (unreachable by the cursor) — only checked
        // on the already-empty path, so the common case pays nothing.
        if (nLines > 0 && vs.isEmpty) {
          val src2 = scala.io.Source.fromFile(f)("UTF-8")
          val anyFieldPresent =
            try src2.getLines().filter(_.trim.nonEmpty).exists { l =>
              try mapper.readTree(l).has(sortField)
              catch { case _: Exception => false }
            } finally src2.close()
          if (!anyFieldPresent)
            throw new IllegalArgumentException(
              s"graft-keyset: sort field '$sortField' present in NO row of " +
                s"$f ($nLines rows) — wrong or case-mismatched sortField?")
        }
        pageValueCache.put(key, vs)
        vs
    }
  }

  /** Unconsumed, watermark-accepted sort values (one per row), ascending.
    * Pages whose cached max value is already consumed are skipped outright,
    * so the per-trigger cost tracks the BACKLOG (plus one listing), not the
    * total history.
    */
  private def pendingValues(after: Option[String]): Array[String] =
    KeysetDataSource.pageFiles(dir).iterator
      .map(sortValuesOf)
      .filter(vs => vs.nonEmpty && after.forall(vs.last > _))
      .flatten
      .filter(v => after.forall(v > _) && watermark.forall(_.accepts(v)))
      .toArray.sorted

  override def initialOffset(): Offset = KeysetOffset(None)

  override def deserializeOffset(json: String): Offset = KeysetOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startLast = start.asInstanceOf[KeysetOffset].last
    val pending0 = pendingValues(startLast)
    // AvailableNow: never advance past the end frozen at start
    val pending = availableNowCap match {
      case Some(cap) => pending0.filter(v => cap.exists(v <= _))
      case None      => pending0
    }
    val admitted = limit match {
      case r: ReadMaxRows if pending.length > r.maxRows() =>
        // cut ON a value: everything <= it is admitted, so the batch may
        // exceed maxRows by the cut value's duplicate count — the price of
        // a resumable value-offset (identical to a keyset LIMIT page whose
        // last key repeats)
        Some(pending(r.maxRows().toInt - 1))
      case _ => pending.lastOption
    }
    KeysetOffset(admitted.orElse(startLast))
  }

  override def reportLatestOffset(): Offset =
    KeysetOffset(pendingValues(None).lastOption)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(pendingValues(None).lastOption)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KeysetOffset].last
    val hi = end.asInstanceOf[KeysetOffset].last
    if (hi.isEmpty) return Array.empty
    val lowers = watermark.toSeq ++ lo.map(KeysetWatermark(_, strict = true))
    // prune pages with no row in (lo, hi] up front — consumed or future
    // pages plan no partition at all
    KeysetDataSource.pageFiles(dir)
      .filter(f => sortValuesOf(f).exists(v =>
        lowers.forall(_.accepts(v)) && hi.exists(v <= _)))
      .map(f => KeysetInputPartition(f.getAbsolutePath, lowers, hi): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeysetReaderFactory(schema, sortField)
}

class KeysetReaderFactory(schema: StructType, sortField: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val kp = partition.asInstanceOf[KeysetInputPartition]
    val path = kp.path
    val lowers = kp.lowers
    val upper = kp.upperInclusive
    new PartitionReader[InternalRow] {
      private val parser = new JacksonParser(schema,
        new JSONOptions(Map.empty[String, String], "UTC"), allowArrayAsStructs = true)
      private val createParser = CreateJacksonParser.string _
      private val sortIdx =
        if (schema.fieldNames.contains(sortField)) schema.fieldIndex(sortField) else -1
      // pruned-sort-field fallback: when bounds exist but the row schema
      // lacks the sort field (column pruning on a streaming read), the
      // value comes from the raw line via the SHARED extraction
      // (KeysetDataSource.sortValueOf) — bounds must NEVER silently
      // short-circuit, or a page straddling a batch cut double-delivers.
      // Cost: a second Jackson parse per line, only on this path — the
      // price of keeping reader rows identical to readSchema()
      private val rawMapper = new com.fasterxml.jackson.databind.ObjectMapper()
      private def lineSortValue(line: String): String =
        KeysetDataSource.sortValueOf(rawMapper, line, sortField)
      private val lines = scala.io.Source.fromFile(path)("UTF-8").getLines()
        .filter(_.trim.nonEmpty)
      private var batch: Iterator[InternalRow] = Iterator.empty
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (!batch.hasNext && lines.hasNext) {
          val line = lines.next()
          val parsed = parser.parse(line, createParser, UTF8String.fromString)
          // source-side bound filters (the pushed keyset predicate and/or the
          // streaming batch's (start, end] value range): strictness
          // preserved, null sort values excluded (SQL semantics — a pushed
          // filter was dropped from the plan, nobody re-checks it)
          batch = parsed.iterator.filter { row =>
            (lowers.isEmpty && upper.isEmpty) || {
              val v =
                if (sortIdx >= 0) {
                  val u = row.getUTF8String(sortIdx)
                  if (u == null) null else u.toString
                } else lineSortValue(line)
              lowers.forall(_.accepts(v)) &&
                upper.forall(hi => v != null && v <= hi)
            }
          }
        }
        if (batch.hasNext) { current = batch.next(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
