package graft.sources

import java.io.{BufferedWriter, IOException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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

class GraftLinesTable(root: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_lines($root)"
  override def schema(): StructType = GraftLines.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftLinesScan(root)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftLinesWriteBuilder(root)
}

// ------------------------------------------------------------------ write

class GraftLinesWriteBuilder(root: String) extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftLinesBatchWrite(root, truncateFirst)
  }
}

case class LinesCommitMessage(stagingPath: String, partitionId: Int, rows: Long)
  extends WriterCommitMessage

class GraftLinesBatchWrite(root: String, truncateFirst: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(GraftLines.stagingDir(root))
    new GraftLinesWriterFactory(root)
  }

  /** Driver-side job commit: the only step that makes data visible. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncateFirst) GraftLines.dataFiles(root).foreach(Files.delete)
    messages.foreach { case LinesCommitMessage(staged, pid, _) =>
      Files.move(Paths.get(staged), Paths.get(root, f"part-$pid%05d.txt"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
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

class GraftLinesWriterFactory(root: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftLinesWriter(root, partitionId, taskId)
}

class GraftLinesWriter(root: String, partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val staged: Path =
    GraftLines.stagingDir(root).resolve(s"part-$partitionId-$taskId.tmp")
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
