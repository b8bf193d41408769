package graft.sources

import java.io.{BufferedWriter, IOException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsDeleteV2, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 SINK (+ read-back): newline-delimited text shards
  * with the full two-phase commit protocol — the write-side counterpart of
  * [[SynthDocsSource]] (which exercises the read-side V2 surface;
  * SURVEY.md §7.3 custom-source path).
  *
  * Exactly-once batch semantics, the way V2 writers are supposed to get
  * them:
  *
  *   1. Every task writer streams rows to a PRIVATE staging file
  *      `_staging/part-<partition>-<task>.tmp` — task attempts (retries,
  *      speculation) never collide because the task id is in the name.
  *   2. Task commit returns a [[LinesCommitMessage]] naming its staging
  *      file; task abort deletes it. Nothing under the output root is
  *      visible yet.
  *   3. JOB commit (driver, once, with the winning attempt of every
  *      partition) promotes exactly the named staging files to
  *      `part-<partition>.txt` via atomic rename and stamps `_SUCCESS`;
  *      job abort deletes all staged files. Readers therefore see the
  *      whole result or none of it — a mid-job crash leaves only staging
  *      garbage, never a torn table.
  *
  * At cluster scale the same protocol runs against a shared FS whose
  * rename is atomic (HDFS) or an object store with a manifest commit;
  * the local-FS rename here is the single-node instantiation of it.
  * Writes are one file per task — the data path is never funneled
  * through the driver (commit messages carry PATHS, not rows).
  *
  * The STREAMING face ([[GraftLinesStreamingWrite]]) runs the same staged
  * protocol per epoch with deterministic promote names as the idempotence
  * key — exactly-once under kill/restart/epoch-replay (SourcesSpec).
  *
  * Schema is fixed at `value: string` (the rawest text-shard format).
  * Options: `path` (output root, required).
  */
class GraftLinesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLines.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graftlines requires a 'path' option")
    new GraftLinesTable(path)
  }
}

object GraftLines {
  /** Nullable so parquet-derived (nullable) columns bind without an
    * analysis-time nullability mismatch; an actual null at write time is a
    * task error (the line format cannot represent it), which exercises the
    * abort path rather than corrupting a shard.
    */
  val schema: StructType =
    StructType(Seq(StructField("value", StringType, nullable = true)))

  def stagingDir(root: String): Path = Paths.get(root, "_staging")

  def dataFiles(root: String): Seq[Path] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator.asScala.toSeq
      .filter(p => p.getFileName.toString.startsWith("part-")
        && p.getFileName.toString.endsWith(".txt"))
      .sortBy(_.getFileName.toString)
  }
}

class GraftLinesTable(root: String) extends Table with SupportsRead
    with SupportsWrite with SupportsDeleteV2 {
  override def name(): String = s"graft_lines($root)"
  override def schema(): StructType = GraftLines.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftLinesScan(root)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftLinesWriteBuilder(root)

  // ------------------------------------------------- row-level DELETE
  // `DELETE FROM <table> WHERE p` arrives here as the split conjunction of
  // v2 Predicates. canDeleteWhere is the honest gate: only predicate
  // shapes we can evaluate line-side are accepted — anything else makes
  // Spark raise its standard "cannot delete" analysis error instead of us
  // silently deleting the wrong rows. The rewrite is per-shard
  // copy-on-write (filter surviving lines to a sibling tmp file, atomic
  // rename over the shard, drop shards that empty out) — the local-FS
  // instantiation of the copy-on-write delete a lakehouse table format
  // runs distributed; shards not touched by the predicate rewrite to
  // identical bytes and could be skipped with per-shard min/max stats.

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    predicates.forall(p => LinesDelete.compile(p).isDefined)

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    val tests = predicates.map(p => LinesDelete.compile(p).getOrElse(
      throw new UnsupportedOperationException(s"cannot delete by $p")))
    GraftLines.dataFiles(root).foreach { f =>
      val lines = Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      val kept = lines.filterNot(l => tests.forall(_(l)))
      if (kept.size != lines.size) {
        if (kept.isEmpty) Files.delete(f)
        else {
          val tmp = f.resolveSibling(f.getFileName.toString + ".del.tmp")
          Files.write(tmp, kept.asJava, StandardCharsets.UTF_8)
          Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
        }
      }
    }
  }
}

/** Translates v2 [[Predicate]]s over the single `value` column into plain
  * line-side tests. Comparison literals must be strings; the column may sit
  * on either side of a binary comparison (the test flips). Unsupported
  * shapes return None (→ canDeleteWhere=false → analysis error upstream).
  */
object LinesDelete {
  private def isValueCol(e: Expression): Boolean = e match {
    case r: NamedReference => r.fieldNames.sameElements(Array("value"))
    case _ => false
  }

  private def litStr(e: Expression): Option[String] = e match {
    // match the Literal interface, not LiteralValue (scalac pickle quirk
    // with the unmanaged spark jars); value() is UTF8String for strings
    case l: Literal[_] if l.dataType == StringType =>
      Option(l.value).map(_.toString)
    case _ => None
  }

  private def cmp(op: String): (String, String) => Boolean = op match {
    case "="  => _ == _
    case "<>" => _ != _
    case "<"  => _ < _
    case "<=" => _ <= _
    case ">"  => _ > _
    case ">=" => _ >= _
  }

  private val Flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=",
    "=" -> "=", "<>" -> "<>")

  def compile(p: Predicate): Option[String => Boolean] = p.name() match {
    // boolean structure arrives intact below the top-level conjunction
    // split (e.g. `<>` comes in as NOT(=), OR groups arrive whole)
    case "NOT" => p.children() match {
      case Array(c: Predicate) => compile(c).map(t => (s: String) => !t(s))
      case _ => None
    }
    case "AND" => p.children() match {
      case Array(a: Predicate, b: Predicate) =>
        for (ta <- compile(a); tb <- compile(b))
          yield (s: String) => ta(s) && tb(s)
      case _ => None
    }
    case "OR" => p.children() match {
      case Array(a: Predicate, b: Predicate) =>
        for (ta <- compile(a); tb <- compile(b))
          yield (s: String) => ta(s) || tb(s)
      case _ => None
    }
    // a written line is never SQL NULL (write rejects nulls)
    case "IS_NULL" if p.children().length == 1 && isValueCol(p.children()(0)) =>
      Some(_ => false)
    case "IS_NOT_NULL" if p.children().length == 1 && isValueCol(p.children()(0)) =>
      Some(_ => true)
    case "STARTS_WITH" => p.children() match {
      case Array(c, l) if isValueCol(c) =>
        litStr(l).map(v => (s: String) => s.startsWith(v))
      case _ => None
    }
    case op @ ("=" | "<>" | "<" | "<=" | ">" | ">=") => p.children() match {
      case Array(c, l) if isValueCol(c) =>
        litStr(l).map(v => (s: String) => cmp(op)(s, v))
      case Array(l, c) if isValueCol(c) =>
        litStr(l).map(v => (s: String) => cmp(Flip(op))(s, v))
      case _ => None
    }
    case _ => None
  }
}

// ------------------------------------------------------------------ write

class GraftLinesWriteBuilder(root: String) extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftLinesBatchWrite(root, truncateFirst)
    override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftLinesStreamingWrite(root, truncateFirst)
  }
}

case class LinesCommitMessage(stagingPath: String, partitionId: Int, rows: Long)
  extends WriterCommitMessage

class GraftLinesBatchWrite(root: String, truncateFirst: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(GraftLines.stagingDir(root))
    new GraftLinesWriterFactory(root)
  }

  /** Driver-side job commit: the only step that makes data visible.
    * PROMOTE first, truncate after: promoting overwrites same-named
    * predecessors atomically, and only then do stale files from a
    * previous layout (e.g. a higher partition count) get deleted — the
    * reverse order would open a crash window in which the directory is
    * EMPTY (old deleted, new still staged), a state no committed write
    * ever produced.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val promoted = messages.map { case LinesCommitMessage(staged, pid, _) =>
      val target = Paths.get(root, f"part-$pid%05d.txt")
      Files.move(Paths.get(staged), target,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      target.getFileName.toString
    }.toSet
    if (truncateFirst)
      GraftLines.dataFiles(root)
        .filterNot(p => promoted.contains(p.getFileName.toString))
        .foreach(Files.delete)
    cleanupStaging()
    Files.write(Paths.get(root, "_SUCCESS"), Array.empty[Byte])
  }

  /** Driver-side job abort: nothing was promoted; drop all staging files. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanupStaging()

  private def cleanupStaging(): Unit = {
    val st = GraftLines.stagingDir(root)
    if (Files.isDirectory(st)) {
      Files.list(st).iterator.asScala.toSeq.foreach(Files.deleteIfExists)
      Files.deleteIfExists(st)
    }
  }
}

/** Streaming face of the sink: the SAME staged-2PC protocol, keyed by
  * epoch. Task writers stage to epoch-private files; the driver's
  * per-epoch commit promotes them to DETERMINISTIC names
  * `part-e<epoch>-<partition>.txt`. Exactly-once across failures falls
  * out of two properties:
  *
  *   1. Nothing is visible until the driver commits the epoch (staging is
  *      invisible to the reader), so a kill mid-epoch leaves no partial
  *      output — the restarted query replans the batch from the
  *      checkpointed offsets and re-stages.
  *   2. Epoch REPLAY (restart after a commit that didn't reach the
  *      checkpoint WAL) re-promotes onto the same target names with an
  *      atomic replace — the deterministic name is the idempotence key, so
  *      a twice-committed epoch lands once, byte-identical, never
  *      appended twice. A replayed commit whose staging is already gone
  *      but whose targets exist is a no-op (the earlier promote won).
  *
  * Per-epoch abort deletes only that epoch's staged files — concurrent
  * epochs' staging (continuous-mode style pipelining) is untouched.
  */
class GraftLinesStreamingWrite(root: String, truncateFirst: Boolean)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    Files.createDirectories(GraftLines.stagingDir(root))
    // top-level class: the factory ships to executors and must not drag
    // this (non-serializable) driver-side object into the closure
    new GraftLinesStreamingWriterFactory(root)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    // Complete-output-mode contract (Spark calls WriteBuilder.truncate()
    // before toStreaming): each epoch REPLACES the visible snapshot.
    // PROMOTE first, truncate older epochs after — epoch-distinct target
    // names make the two steps collision-free, and the reverse order
    // opens a crash window (old epoch deleted, new one still staged)
    // where a reader sees an EMPTY directory: a snapshot no epoch ever
    // committed. Promote-then-delete keeps the invariant "the latest
    // committed epoch is always fully present"; the transient old+new
    // mix is resolved by the trailing delete, and on replay (commit
    // re-run after a crash anywhere inside it) re-promotes are no-ops
    // and the delete re-runs to completion.
    messages.collect { case m: LinesCommitMessage => m }.foreach { m =>
      val staged = Paths.get(m.stagingPath)
      val target = Paths.get(root, f"part-e$epochId-${m.partitionId}%05d.txt")
      if (Files.exists(staged))
        Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      else if (!Files.exists(target))
        throw new IOException(
          s"graftlines epoch $epochId part ${m.partitionId}: " +
            "staged file lost before promote")
    }
    if (truncateFirst) {
      val keep = f"part-e$epochId-"
      GraftLines.dataFiles(root)
        .filterNot(_.getFileName.toString.startsWith(keep))
        .foreach(Files.delete)
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: LinesCommitMessage => m }
      .foreach(m => Files.deleteIfExists(Paths.get(m.stagingPath)))
}

class GraftLinesStreamingWriterFactory(root: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftLinesWriter(root, partitionId, taskId, s"e$epochId-")
}

class GraftLinesWriterFactory(root: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftLinesWriter(root, partitionId, taskId)
}

class GraftLinesWriter(root: String, partitionId: Int, taskId: Long,
                       prefix: String = "")
  extends DataWriter[InternalRow] {

  private val staged: Path =
    GraftLines.stagingDir(root).resolve(s"${prefix}part-$partitionId-$taskId.tmp")
  private lazy val out: BufferedWriter =
    Files.newBufferedWriter(staged, StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val v = record.getUTF8String(0)
    if (v == null) throw new IOException("graftlines: null value")
    out.write(v.toString)
    out.write('\n')
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    LinesCommitMessage(staged.toString, partitionId, rows)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: IOException => }
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = ()
}

// ------------------------------------------------------------------- read

class GraftLinesScan(root: String) extends Scan with Batch {
  override def readSchema(): StructType = GraftLines.schema
  override def description(): String = s"GraftLines[$root]"
  override def toBatch: Batch = this

  /** One partition per committed shard file — read parallelism tracks
    * write parallelism (at scale, shard size is governed by the writing
    * job's partitioning, exactly like parquet part files).
    */
  override def planInputPartitions(): Array[InputPartition] =
    GraftLines.dataFiles(root)
      .map(p => LinesPartition(p.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new GraftLinesReader(partition.asInstanceOf[LinesPartition].file)
}

case class LinesPartition(file: String) extends InputPartition

class GraftLinesReader(file: String) extends PartitionReader[InternalRow] {
  private val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
  private val it = lines.iterator()
  private var cur: String = _

  override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(cur))
  override def close(): Unit = lines.close()
}
