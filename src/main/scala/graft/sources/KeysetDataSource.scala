package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual}
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
  *   - `readStream` plans one micro-batch per new page; the streaming offset
  *     is the page index — the durable form of the reference's
  *     `last_sort_value` cursor. Combined with the idempotent PK merge sink
  *     (graft.streaming.IncrementalLoad) this reproduces the
  *     at-least-once + dedup = effectively-once contract (SURVEY §2.11)
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
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private val sortField = Option(options.get("sortField")).getOrElse("lastModifiedAt")
  private var watermark: Option[KeysetWatermark] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema

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

  /** Accept >= / > on the sort field — the keyset watermark — source-side.
    * Accepted filters are FULLY pushed (Spark drops them from the plan), so
    * the reader must honour strictness and SQL null semantics exactly;
    * multiple accepted filters keep the most restrictive bound.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual(a, _: String) if a == sortField => true
      case GreaterThan(a, _: String) if a == sortField => true
      case _ => false
    }
    pushed = accepted
    accepted.foreach {
      case GreaterThanOrEqual(_, v: String) => tighten(KeysetWatermark(v, strict = false))
      case GreaterThan(_, v: String)        => tighten(KeysetWatermark(v, strict = true))
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

  override def build(): Scan = {
    val effective =
      if (watermark.isEmpty || required.fieldNames.contains(sortField) ||
          !schema.fieldNames.contains(sortField)) required
      else StructType(required.fields :+ schema(sortField))
    new KeysetScan(effective, options, sortField, watermark)
  }
}

/** A fully-pushed keyset predicate: sort value must be > (strict) or >= the
  * bound, and — per SQL comparison semantics — null sort values never pass.
  */
case class KeysetWatermark(value: String, strict: Boolean) {
  def accepts(v: String): Boolean =
    v != null && (if (strict) v > value else v >= value)
}

class KeysetScan(schema: StructType, options: CaseInsensitiveStringMap,
    sortField: String, watermark: Option[KeysetWatermark]) extends Scan {
  private val dir = KeysetDataSource.pathOf(options)
  override def readSchema(): StructType = schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      KeysetDataSource.pageFiles(dir)
        .map(f => KeysetInputPartition(f.getAbsolutePath): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new KeysetReaderFactory(schema, sortField, watermark)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KeysetMicroBatchStream(dir, schema, sortField, watermark)
}

case class KeysetInputPartition(path: String) extends InputPartition

/** Streaming offset = count of pages consumed (the durable twin of the
  * reference's `last_sort_value`, `ct_utils.py:232-249`).
  */
case class KeysetOffset(pageIdx: Int) extends Offset {
  override def json(): String = pageIdx.toString
}

class KeysetMicroBatchStream(dir: String, schema: StructType,
    sortField: String, watermark: Option[KeysetWatermark]) extends MicroBatchStream {
  override def initialOffset(): Offset = KeysetOffset(0)
  override def latestOffset(): Offset =
    KeysetOffset(KeysetDataSource.pageFiles(dir).length)
  override def deserializeOffset(json: String): Offset = KeysetOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KeysetOffset].pageIdx
    val e = end.asInstanceOf[KeysetOffset].pageIdx
    KeysetDataSource.pageFiles(dir).slice(s, e)
      .map(f => KeysetInputPartition(f.getAbsolutePath): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KeysetReaderFactory(schema, sortField, watermark)
}

class KeysetReaderFactory(schema: StructType, sortField: String,
    watermark: Option[KeysetWatermark]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[KeysetInputPartition].path
    new PartitionReader[InternalRow] {
      private val parser = new JacksonParser(schema,
        new JSONOptions(Map.empty[String, String], "UTC"), allowArrayAsStructs = true)
      private val createParser = CreateJacksonParser.string _
      private val sortIdx =
        if (schema.fieldNames.contains(sortField)) schema.fieldIndex(sortField) else -1
      private val lines = scala.io.Source.fromFile(path)("UTF-8").getLines()
        .filter(_.trim.nonEmpty)
      private var batch: Iterator[InternalRow] = Iterator.empty
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (!batch.hasNext && lines.hasNext) {
          val parsed = parser.parse(lines.next(), createParser, UTF8String.fromString)
          // source-side watermark filter (the pushed keyset predicate):
          // strictness preserved, null sort values excluded (SQL semantics —
          // the filter was dropped from the plan, nobody re-checks it)
          batch = parsed.iterator.filter { row =>
            watermark.isEmpty || sortIdx < 0 || {
              val v = row.getUTF8String(sortIdx)
              watermark.get.accepts(if (v == null) null else v.toString)
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
