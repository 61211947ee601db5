package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
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
  *  - '''filter pushdown''' (`SupportsPushDownV2Filters` — the V2
  *    predicate API, REQUIRED for composing with aggregate pushdown;
  *    V1 Filter pushdown is advisory so Spark refuses the combination):
  *    comparison + null predicates evaluate on the PARSED LINE before a
  *    row is built — filtered rows cost one JSON parse, no row
  *    materialization, no downstream CPU (accepted predicates leave
  *    the residual; IS_NOT_NULL matters — Spark derives it from every
  *    comparison, and an untranslated residual Filter node blocks the
  *    aggregate-pushdown pattern);
  *  - '''aggregate pushdown''' (`SupportsPushDownAggregates`, PARTIAL):
  *    count/sum/min/max over long columns with group-by columns — each
  *    file's reader hash-aggregates its own lines and emits one row per
  *    group (output layout [group cols ++ agg buffers]); Spark plans
  *    the final merge, and avg arrives pre-decomposed as sum+count.
  *    The map-side combine moves INTO the source: only #groups rows
  *    per file reach Spark;
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
  val aggScans = new java.util.concurrent.atomic.AtomicLong

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

  /** List the directory's .json data files, CLOSING the directory
    * stream (java.nio.file.Files.list holds an open handle until
    * closed — leaking one per scan planning would exhaust fds on a
    * long-lived driver).
    */
  def listJsonFiles(dir: String): Array[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .toArray.sortBy(_.toString)
    finally s.close()
  }
}

case class JsonlInputPartition(path: String) extends InputPartition

/** A pushed comparison in source-internal form: (op, column, value) —
  * translated from Spark's V2 `Predicate`s (the V2 API is REQUIRED
  * here: V1 Filter pushdown is advisory, so Spark refuses to compose
  * it with aggregate pushdown, where a wrongly-filtered row could not
  * be repaired after aggregation).
  */
case class JsonlPred(op: String, col: String, value: Any)
    extends Serializable

private[sources] object JsonlFilterEval {
  import org.apache.spark.sql.connector.expressions.filter.Predicate
  import org.apache.spark.sql.connector.expressions.{Literal => CLit, NamedReference}

  /** Translate a V2 predicate to internal form (None = unsupported). */
  def translate(schema: StructType, p: Predicate)
      : Option[JsonlPred] = p.name() match {
    case op @ ("IS_NULL" | "IS_NOT_NULL") =>
      p.children() match {
        case Array(n: NamedReference)
            if n.fieldNames().length == 1 &&
              schema.fieldNames.contains(n.fieldNames()(0)) =>
          Some(JsonlPred(op, n.fieldNames()(0), null))
        case _ => None
      }
    case op @ ("=" | ">" | ">=" | "<" | "<=") =>
      p.children() match {
        case Array(n: NamedReference, l: CLit[_])
            if n.fieldNames().length == 1 &&
              schema.fieldNames.contains(n.fieldNames()(0)) =>
          val v = l.value() match {
            case u: UTF8String => u.toString
            case other => other
          }
          Some(JsonlPred(op, n.fieldNames()(0), v))
        case _ => None
      }
    case _ => None
  }

  private def cmp(node: com.fasterxml.jackson.databind.JsonNode,
      attr: String, v: Any): Option[Int] = {
    val field = node.get(attr)
    if (field == null || field.isNull) None
    else v match {
      case l: Long => Some(java.lang.Long.compare(field.asLong(), l))
      case i: Int => Some(java.lang.Long.compare(field.asLong(), i.toLong))
      case i: Integer => Some(java.lang.Long.compare(field.asLong(), i.toLong))
      case l: java.lang.Long => Some(java.lang.Long.compare(field.asLong(), l))
      // Spark compares strings in UTF-8 BINARY order; String.compareTo
      // is UTF-16 code-unit order and diverges on supplementary
      // characters. Accepted predicates are removed from the residual,
      // so the source MUST match Spark's collation exactly.
      case s: String => Some(UTF8String.fromString(field.asText())
        .compareTo(UTF8String.fromString(s)))
      case other => Some(UTF8String.fromString(field.asText())
        .compareTo(UTF8String.fromString(other.toString)))
    }
  }

  def eval(node: com.fasterxml.jackson.databind.JsonNode,
      f: JsonlPred): Boolean = f.op match {
    case "IS_NULL" =>
      val v = node.get(f.col); v == null || v.isNull
    case "IS_NOT_NULL" =>
      val v = node.get(f.col); v != null && !v.isNull
    case "=" => cmp(node, f.col, f.value).contains(0)
    case ">" => cmp(node, f.col, f.value).exists(_ > 0)
    case ">=" => cmp(node, f.col, f.value).exists(_ >= 0)
    case "<" => cmp(node, f.col, f.value).exists(_ < 0)
    case "<=" => cmp(node, f.col, f.value).exists(_ <= 0)
    case _ => false
  }
}

class JsonlPartitionReaderFactory(
    required: StructType, filters: Array[JsonlPred])
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

/** Source-reported size statistics: the sum of the data files' bytes.
  * Without this a DSv2 relation defaults to
  * `spark.sql.defaultSizeInBytes` (Long.Max-ish) and can NEVER be
  * chosen as a broadcast side — at 100 TB that turns every join
  * against a small JSONL dim table into a shuffle. File size is the
  * same proxy Spark's own FileScan reports.
  */
private[sources] trait JsonlFileStats
    extends org.apache.spark.sql.connector.read.SupportsReportStatistics {
  def statsDir: String
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val bytes = JsonlSource.listJsonFiles(statsDir)
        .map(java.nio.file.Files.size).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
}

class JsonlScan(
    dir: String, full: StructType, required: StructType,
    pushed: Array[JsonlPred]) extends Scan with Batch with JsonlFileStats {
  override def statsDir: String = dir
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new JsonlMicroBatchStream(dir, required, pushed, checkpointLocation)
  override def planInputPartitions(): Array[InputPartition] =
    JsonlSource.listJsonFiles(dir)
      .map(p => JsonlInputPartition(p.toString): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlPartitionReaderFactory(required, pushed)
  override def description(): String =
    s"graft-jsonl $dir, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.map(p => s"${p.col} ${p.op} ${p.value}").mkString(", ")}]"
}

/** Streaming (micro-batch) read leg over the SAME per-file readers and
  * pushdown state as the batch path. File-discovery offsets follow
  * Spark's own FileStreamSource design: a persistent discovery log in
  * the CHECKPOINT FILESYSTEM (one immutable `<i>.batch` file per
  * discovery round, written through the Hadoop FileSystem API — so
  * hdfs:/s3a:/file: checkpoints all work and restart from a different
  * host/CWD replays exactly the logged prefix), offsets are just the
  * batch index — O(1) offset JSON no matter how many files accumulate.
  * New files are admitted in whole-file units (each micro-batch = the
  * files discovered since the last), which is the right granularity
  * for an append-only ingest directory ([[PartitionedStore]]'s layout
  * contract).
  */
class JsonlMicroBatchStream(
    dir: String, required: StructType, pushed: Array[JsonlPred],
    checkpointLocation: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class BatchIndexOffset(n: Int) extends Offset {
    override def json(): String = s"""{"batchIndex":$n}"""
  }

  // The discovery log lives in the checkpoint's OWN filesystem —
  // resolving the location through Hadoop handles any scheme (the
  // raw string through java.nio.Paths would turn "file:/..." or
  // "hdfs://..." into a bogus CWD-relative local directory, silently
  // breaking exactly-once on restart). The filesystem is resolved with
  // the SESSION's Hadoop conf, not a bare `new Configuration()`, so
  // `spark.hadoop.*` settings (s3a credentials/endpoints, hdfs
  // nameservices) reach the checkpoint FS.
  private val logDir = new org.apache.hadoop.fs.Path(
    checkpointLocation, "graft-jsonl-files")
  private val fs = logDir.getFileSystem(
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration()))
  fs.mkdirs(logDir)

  private def batchFile(i: Int) =
    new org.apache.hadoop.fs.Path(logDir, f"$i%010d.batch")
  private def batchCount(): Int = {
    val st = fs.listStatus(logDir)
    st.count(_.getPath.getName.endsWith(".batch"))
  }
  private def readBatch(i: Int): Array[String] = {
    val in = fs.open(batchFile(i))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toArray
    finally in.close()
  }
  /** Write an immutable discovery-round file. Concurrent/zombie-driver
    * protection: on HDFS the rename-to-existing-destination fails
    * atomically, so a second driver on the same checkpoint loses
    * cleanly. On LOCAL filesystems POSIX rename overwrites, so the
    * guard is the (non-atomic, best-effort) exists() check below —
    * file: checkpoints are a single-driver deployment by construction,
    * and the window is two drivers sealing the SAME round in the same
    * instant.
    */
  private def writeBatch(i: Int, files: Array[String]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(logDir, f".$i%010d.tmp")
    // a crash between create and rename leaves a stale tmp; the name is
    // deterministic and the writer is single (the restarted driver), so
    // clear it rather than wedging every restart on FileAlreadyExists
    fs.delete(tmp, false)
    val out = fs.create(tmp, false)
    try out.write(files.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(batchFile(i)) || !fs.rename(tmp, batchFile(i))) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"graft-jsonl: discovery log ${batchFile(i)} already exists " +
          "(concurrent stream on one checkpoint?)")
    }
  }

  override def initialOffset(): Offset = BatchIndexOffset(0)
  override def deserializeOffset(json: String): Offset = {
    val n = (new ObjectMapper).readTree(json).get("batchIndex").asInt()
    BatchIndexOffset(n)
  }
  // Seen-file state, replayed from the log ONCE at (re)start and then
  // maintained in memory as rounds are sealed — per-trigger cost is one
  // directory listing of the data dir, not a re-read of every .batch
  // file ever written (which would grow O(total files discovered) for a
  // long-lived stream; FileStreamSource compacts its log for the same
  // reason). Driver-side, single logical writer, so memory and log
  // cannot diverge.
  private var seenCount: Int = -1
  private val seenFiles = scala.collection.mutable.HashSet.empty[String]
  private def replayLogOnce(): Unit = if (seenCount < 0) {
    seenCount = batchCount()
    (0 until seenCount).foreach(i => seenFiles ++= readBatch(i))
  }

  /** Discover files not yet logged; if any, seal them as the next
    * discovery-round file. Driver-side, single logical writer.
    */
  override def latestOffset(): Offset = {
    replayLogOnce()
    val fresh = JsonlSource.listJsonFiles(dir)
      .map(_.toString).filterNot(seenFiles)
    if (fresh.isEmpty) BatchIndexOffset(seenCount)
    else {
      writeBatch(seenCount, fresh)
      seenFiles ++= fresh
      seenCount += 1
      BatchIndexOffset(seenCount)
    }
  }
  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BatchIndexOffset].n
    val e = end.asInstanceOf[BatchIndexOffset].n
    (s until e).flatMap(readBatch).toArray
      .map(p => JsonlInputPartition(p): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlPartitionReaderFactory(required, pushed)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class JsonlScanBuilder(dir: String, full: StructType)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  private var required: StructType = full
  private var pushed: Array[JsonlPred] = Array.empty
  private var pushedV2: Array[Predicate] = Array.empty
  private var aggGroup: Array[String] = Array.empty
  private var aggFuncs: Array[(String, String)] = Array.empty // (op, col)
  private var aggPushed = false

  override def pushPredicates(
      predicates: Array[Predicate]): Array[Predicate] = {
    val translated = predicates.map(p =>
      p -> JsonlFilterEval.translate(full, p))
    pushedV2 = translated.collect { case (p, Some(_)) => p }
    pushed = translated.collect { case (_, Some(t)) => t }
    translated.collect { case (p, None) => p } // residual
  }
  override def pushedPredicates(): Array[Predicate] = pushedV2
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (!aggPushed)
      // preserve OUR field order; requiredSchema may be reordered
      required = new StructType(
        full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  private def fieldName(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: org.apache.spark.sql.connector.expressions.NamedReference
        if f.fieldNames().length == 1 &&
          full.fieldNames.contains(f.fieldNames()(0)) =>
      Some(f.fieldNames()(0))
    case _ => None
  }

  /** PARTIAL aggregate pushdown (supportCompletePushDown stays false):
    * each file's reader emits per-group partial rows — count/sum/min/
    * max over long columns, grouped by schema columns — and Spark
    * plans the final merge on top. The scan's output schema becomes
    * [agg buffers ++ group columns] (Spark's expected layout).
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val groups = aggregation.groupByExpressions().map(fieldName)
    if (groups.exists(_.isEmpty)) return false
    val funcs = aggregation.aggregateExpressions().map {
      case _: CountStar => Some(("count_star", ""))
      case c: Count if !c.isDistinct =>
        fieldName(c.column).filter(n =>
          full(n).dataType == LongType).map(("count", _))
      case s: Sum if !s.isDistinct =>
        fieldName(s.column).filter(n =>
          full(n).dataType == LongType).map(("sum", _))
      case m: Min =>
        fieldName(m.column).filter(n =>
          full(n).dataType == LongType).map(("min", _))
      case m: Max =>
        fieldName(m.column).filter(n =>
          full(n).dataType == LongType).map(("max", _))
      case _ => None
    }
    if (funcs.exists(_.isEmpty)) return false
    aggGroup = groups.map(_.get)
    aggFuncs = funcs.map(_.get)
    aggPushed = true
    // output layout Spark expects: group columns, then aggregate columns
    var st = new StructType()
    aggGroup.foreach(g => st = st.add(g, full(g).dataType))
    aggFuncs.zipWithIndex.foreach { case ((op, c), i) =>
      st = st.add(s"agg_$i", LongType, op != "count_star" && op != "count")
    }
    required = st
    true
  }

  override def build(): Scan =
    if (aggPushed)
      new JsonlAggScan(dir, full, required, pushed, aggGroup, aggFuncs)
    else new JsonlScan(dir, full, required, pushed)
}

/** Scan variant with a pushed partial aggregation: one reader per file
  * computes its own hash aggregate over the (filter-surviving) lines
  * and emits one row per group — at 100 TB this is the map-side
  * combine moved INTO the source, so only #groups rows per file reach
  * Spark.
  */
class JsonlAggScan(
    dir: String, full: StructType, outSchema: StructType,
    filters: Array[JsonlPred], groupCols: Array[String],
    aggFuncs: Array[(String, String)]) extends Scan with Batch
    with JsonlFileStats {
  override def statsDir: String = dir
  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    JsonlSource.listJsonFiles(dir)
      .map(p => JsonlInputPartition(p.toString): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlAggReaderFactory(full, filters, groupCols, aggFuncs)
  override def description(): String =
    s"graft-jsonl $dir, PushedAggregates: [${aggFuncs.map(f => s"${f._1}(${f._2})").mkString(", ")}], " +
      s"GroupBy: [${groupCols.mkString(", ")}], " +
      s"PushedFilters: [${filters.map(p => s"${p.col} ${p.op} ${p.value}").mkString(", ")}]"
}

/** Top-level (serializable capture-free) factory for the aggregating
  * reader: each file's reader hash-aggregates its (filter-surviving)
  * lines and emits one partial row per group.
  */
class JsonlAggReaderFactory(
    full: StructType, filters: Array[JsonlPred], groupCols: Array[String],
    aggFuncs: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[JsonlInputPartition].path
    val (f, g, a) = (filters, groupCols, aggFuncs)
    new PartitionReader[InternalRow] {
      private val groups = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], Array[Long]]
      private val nulls = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], Array[Boolean]]
      locally {
        val mapper = new ObjectMapper
        val lines = java.nio.file.Files.lines(
          java.nio.file.Paths.get(path))
        try lines.iterator().asScala
          .filter(_.nonEmpty).map(mapper.readTree)
          .filter(n => f.forall(JsonlFilterEval.eval(n, _)))
          .foreach { n =>
            val key = g.toSeq.map { c =>
              val v = n.get(c)
              if (v == null || v.isNull) null
              else full(c).dataType match {
                case LongType => v.asLong(): java.lang.Long
                case _ => UTF8String.fromString(v.asText())
              }
            }
            val buf = groups.getOrElseUpdate(key,
              a.map { case (op, _) => op match {
                case "min" => Long.MaxValue
                case "max" => Long.MinValue
                case _ => 0L
              }})
            // sum's flag starts true too: SQL SUM over zero non-null
            // inputs is NULL, not 0 (count/count_star stay 0).
            val nl = nulls.getOrElseUpdate(key,
              a.map { case (op, _) =>
                op == "min" || op == "max" || op == "sum" })
            a.zipWithIndex.foreach { case ((op, c), i) =>
              lazy val cv = n.get(c)
              lazy val has = cv != null && !cv.isNull
              op match {
                case "count_star" => buf(i) += 1
                case "count" => if (has) buf(i) += 1
                case "sum" => if (has) { buf(i) += cv.asLong(); nl(i) = false }
                case "min" => if (has) { buf(i) = math.min(buf(i), cv.asLong()); nl(i) = false }
                case "max" => if (has) { buf(i) = math.max(buf(i), cv.asLong()); nl(i) = false }
              }
            }
          }
        finally lines.close()
        // GLOBAL aggregate (empty group-by): partial hash-aggregate
        // semantics require one initial-buffer row even over zero
        // input lines — Spark rewrites the final COUNT merge as SUM
        // over partials, so an absent partial would turn count(*)
        // over empty/fully-filtered input into NULL instead of 0.
        if (g.isEmpty && groups.isEmpty) {
          groups(Seq.empty) = a.map { case (op, _) => op match {
            case "min" => Long.MaxValue
            case "max" => Long.MinValue
            case _ => 0L
          }}
          nulls(Seq.empty) = a.map { case (op, _) =>
            op == "min" || op == "max" || op == "sum" }
        }
        JsonlSource.aggScans.incrementAndGet()
      }
      private val it = groups.iterator
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val (key, buf) = it.next()
          val nl = nulls(key)
          val aggVals = buf.zipWithIndex.map { case (v, i) =>
            if (nl(i) && a(i)._1 != "count" && a(i)._1 != "count_star")
              null
            else v: java.lang.Long
          }
          row = InternalRow.fromSeq(key.toIndexedSeq ++ aggVals)
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** Commit message carrying a committed TASK's staged file: the final
  * move into place happens in the driver's job-level commit, so a
  * failed job neither destroys pre-existing data (truncate is applied
  * there too) nor leaves partial task output visible.
  */
case class JsonlCommitMsg(staged: String, finalName: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** Per-task JSONL writer: writes to a JOB-scoped staged file; task
  * commit closes it (flushed to the OS — like Spark's own file sinks,
  * durability against power loss is the filesystem's job, not a
  * per-task fsync) and reports the path — VISIBILITY is deferred to
  * [[JsonlBatchWrite.commit]] (job-level atomicity; an aborted/
  * speculated task just deletes its staged file, and job commit
  * sweeps any zombie attempt's leftovers).
  */
class JsonlDataWriter(dir: String, jobId: String, partitionId: Int,
    taskId: Long, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val tmp = java.nio.file.Paths.get(
    dir, s".part-$partitionId-$taskId.$jobId.staged")
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
    // the final name carries the job id: task ids restart from small
    // numbers in every application, so "part-P-T.json" could collide
    // with a previous app's output in append mode — and a collision
    // surfacing as Files.move failure inside the DRIVER's job commit
    // has no retry. The (uuid) job id makes names globally unique.
    JsonlCommitMsg(tmp.toString, s"part-$partitionId-$taskId-$jobId.json")
  }
  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(tmp)
  }
  override def close(): Unit = ()
}

class JsonlBatchWrite(dir: String, jobId: String, schema: StructType,
    truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val (dirS, jid, sch) = (dir, jobId, schema)
    new org.apache.spark.sql.connector.write.DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long)
          : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
        new JsonlDataWriter(dirS, jid, partitionId, taskId, sch)
    }
  }
  /** Job-level commit: ONLY here do staged files become visible. A
    * failure BEFORE commit() starts leaves pre-existing data untouched.
    * The commit itself is not atomic (it is a sequence of file moves,
    * the best a plain file sink can do), but it is RECOVERABLE: truncate
    * moves old data aside to `<name>.<jobId>.trash` rather than deleting
    * it, and only after every committed task's staged file has moved
    * into place are the trash files dropped — a driver crash mid-commit
    * leaves a mixed directory, with all pre-existing rows still on disk
    * under `.trash` names for manual recovery.
    */
  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val trashed: Seq[java.nio.file.Path] = if (truncate)
      JsonlSource.listJsonFiles(dir).map { p =>
        val t = p.resolveSibling(s"${p.getFileName}.$jobId.trash")
        java.nio.file.Files.move(p, t)
        t
      }.toSeq
    else Seq.empty
    messages.foreach { case JsonlCommitMsg(staged, finalName) =>
      java.nio.file.Files.move(java.nio.file.Paths.get(staged),
        java.nio.file.Paths.get(dir, finalName))
    }
    trashed.foreach(java.nio.file.Files.deleteIfExists(_))
    // sweep staged files from LOSING attempts of this job (zombie /
    // speculated tasks whose abort() never ran — executor loss): the
    // committed winners were just moved away, anything left with this
    // job id is garbage that truncate-overwrite would never collect
    // (listJsonFiles only sees .json).
    dropStaged()
  }
  private def dropStaged(): Unit = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(s".$jobId.staged"))
      .toArray.foreach(java.nio.file.Files.deleteIfExists(_))
    finally s.close()
  }
  /** Job-level abort: delete every staged file this job produced —
    * both the task-committed ones (carried in messages) and any
    * stragglers matching the job id.
    */
  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    messages.filter(_ != null).foreach { case JsonlCommitMsg(staged, _) =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(staged))
    }
    dropStaged()
  }
}

class JsonlTable(dir: String, schema0: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-jsonl($dir)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
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
            new JsonlBatchWrite(dir, info.queryId(), info.schema(),
              doTruncate)
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
