package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Batch DataSource V2 for JSONL event files with REAL scan-level
  * pushdown — the batch sibling of [[PollSource]]'s micro-batch stream
  * (reference ingest shape: services/ingestion/app/ingest.py writes
  * exactly such JSON records):
  *
  *  - '''column pruning''' (`SupportsPushDownRequiredColumns`): the
  *    reader materializes ONLY the pruned schema's fields — a 2-column
  *    projection never builds the other columns' values;
  *  - '''filter pushdown''' (`SupportsPushDownFilters`): comparison
  *    predicates on long/string columns evaluate on the PARSED LINE
  *    before a row is built — filtered rows cost one JSON parse, no
  *    row materialization, no downstream CPU (Spark re-checks nothing:
  *    accepted filters are removed from the residual);
  *  - '''partition planning''': one `InputPartition` per file —
  *    parallelism scales with the file count, the layout contract
  *    [[PartitionedStore]] maintains.
  *
  * `JsonlSourceSpec` pins all three (pruned build counts, source-side
  * skip counts, explain-visible pushdown); `q_jsonl_source` closes the
  * loop end-to-end: events → Spark's JSONL writer → THIS source →
  * aggregate, hash-matched against the DuckDB oracle on the original
  * parquet — a cross-format identity check.
  *
  * Scale notes: schemas are declared via option (no inference pass);
  * readers stream lines (no whole-file buffering); at 100 TB the
  * per-file partitions feed the usual scan parallelism and AQE
  * coalescing downstream.
  */
object JsonlSource {
  val format = "graft-jsonl"

  /** Test-visible reader instrumentation (local-mode counters): lines
    * parsed vs rows emitted — the difference is source-side skips.
    */
  val linesParsed = new java.util.concurrent.atomic.AtomicLong
  val rowsEmitted = new java.util.concurrent.atomic.AtomicLong

  /** Option-declared schema: "name:type,name:type" with type in
    * {long, string}.
    */
  def parseSchema(spec: String): StructType =
    spec.split(",").foldLeft(new StructType()) { (st, f) =>
      val Array(n, t) = f.trim.split(":")
      t match {
        case "long" => st.add(n, LongType)
        case "string" => st.add(n, StringType)
        case other => throw new IllegalArgumentException(
          s"graft-jsonl schema type '$other' (want long|string)")
      }
    }
}

case class JsonlInputPartition(path: String) extends InputPartition

/** Evaluates a pushed filter against a parsed JSON line. */
private[sources] object JsonlFilterEval {
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _) => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case _ => false
  }

  private def cmp(node: com.fasterxml.jackson.databind.JsonNode,
      attr: String, v: Any): Option[Int] = {
    val field = node.get(attr)
    if (field == null || field.isNull) None
    else v match {
      case l: Long => Some(java.lang.Long.compare(field.asLong(), l))
      case i: Int => Some(java.lang.Long.compare(field.asLong(), i.toLong))
      case s: String => Some(field.asText().compareTo(s))
      case other => Some(field.asText().compareTo(other.toString))
    }
  }

  def eval(node: com.fasterxml.jackson.databind.JsonNode, f: Filter): Boolean =
    f match {
      case EqualTo(a, v) => cmp(node, a, v).contains(0)
      case GreaterThan(a, v) => cmp(node, a, v).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(node, a, v).exists(_ >= 0)
      case LessThan(a, v) => cmp(node, a, v).exists(_ < 0)
      case LessThanOrEqual(a, v) => cmp(node, a, v).exists(_ <= 0)
      case _ => false
    }
}

class JsonlPartitionReaderFactory(
    required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[JsonlInputPartition].path
    new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper
      private val lines = java.nio.file.Files.lines(
        java.nio.file.Paths.get(path))
      private val it = lines.iterator()
      private var row: InternalRow = _
      override def next(): Boolean = {
        row = null
        while (row == null && it.hasNext) {
          val line = it.next()
          if (line.nonEmpty) {
            JsonlSource.linesParsed.incrementAndGet()
            val node = mapper.readTree(line)
            if (filters.forall(JsonlFilterEval.eval(node, _))) {
              // build ONLY the pruned columns
              val vals = required.fields.map { f =>
                val n = node.get(f.name)
                if (n == null || n.isNull) null
                else f.dataType match {
                  case LongType => n.asLong(): java.lang.Long
                  case _ => UTF8String.fromString(n.asText())
                }
              }
              JsonlSource.rowsEmitted.incrementAndGet()
              row = InternalRow.fromSeq(vals.toIndexedSeq)
            }
          }
        }
        row != null
      }
      override def get(): InternalRow = row
      override def close(): Unit = lines.close()
    }
  }
}

class JsonlScan(
    dir: String, full: StructType, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .toArray.sortBy(_.toString)
      .map(p => JsonlInputPartition(p.toString): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlPartitionReaderFactory(required, pushed)
  override def description(): String =
    s"graft-jsonl $dir, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
}

class JsonlScanBuilder(dir: String, full: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) =
      filters.partition(JsonlFilterEval.supported(full, _))
    pushed = ok
    residual // Spark keeps evaluating only these
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve OUR field order; requiredSchema may be reordered
    required = new StructType(
      full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new JsonlScan(dir, full, required, pushed)
}

/** Per-task JSONL writer: a temp file renamed into place on COMMIT —
  * task-level atomicity (an aborted/speculated task leaves no partial
  * visible file), the standard two-phase sink contract.
  */
class JsonlDataWriter(dir: String, partitionId: Int, taskId: Long,
    schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val tmp = java.nio.file.Paths.get(
    dir, s".part-$partitionId-$taskId.json.inprogress")
  private val out = java.nio.file.Files.newBufferedWriter(tmp)
  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder("{")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (i > 0) sb.append(", ")
      sb.append('"').append(f.name).append("\": ")
      if (row.isNullAt(i)) sb.append("null")
      else f.dataType match {
        case LongType => sb.append(row.getLong(i))
        case _ =>
          // minimal JSON string escape (quotes/backslash/control)
          val v = row.getUTF8String(i).toString
          sb.append('"')
          v.foreach {
            case '"' => sb.append("\\\"")
            case '\\' => sb.append("\\\\")
            case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
            case c => sb.append(c)
          }
          sb.append('"')
      }
    }
    out.write(sb.append('}').toString)
    out.newLine()
  }
  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(
      dir, s"part-$partitionId-$taskId.json"))
    new org.apache.spark.sql.connector.write.WriterCommitMessage {}
  }
  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(tmp)
  }
  override def close(): Unit = ()
}

class JsonlBatchWrite(dir: String, schema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    if (truncate)
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .foreach(java.nio.file.Files.delete)
    val dirS = dir
    val sch = schema
    new org.apache.spark.sql.connector.write.DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long)
          : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
        new JsonlDataWriter(dirS, partitionId, taskId, sch)
    }
  }
  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = ()
  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = ()
}

class JsonlTable(dir: String, schema0: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-jsonl($dir)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlScanBuilder(dir, schema0)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var doTruncate = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        doTruncate = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch
              : org.apache.spark.sql.connector.write.BatchWrite =
            new JsonlBatchWrite(dir, info.schema(), doTruncate)
        }
    }
}

/** `spark.read.format("graft-jsonl").option("path", dir)
  * .option("schema", "a:long,b:string")` entry point.
  */
class JsonlSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = JsonlSource.format
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spec = options.get("schema")
    require(spec != null, "graft-jsonl requires option 'schema'")
    JsonlSource.parseSchema(spec)
  }
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val dir = opts.get("path")
    require(dir != null, "graft-jsonl requires option 'path'")
    new JsonlTable(dir, schema)
  }
}
