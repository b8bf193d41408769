package graft.sources

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2: a deterministic synthetic document corpus,
  * generated on the executors — the "infinite table" pattern used for
  * benchmarking and load-testing data pipelines without any input bytes
  * (compare TPC-DS dsdgen-as-a-source). SURVEY.md §7.3's custom-source
  * path, exercised for real:
  *
  *   - `SupportsPushDownFilters`: doc_id range predicates (>, >=, <, <=, =)
  *     are absorbed into the GENERATOR — a filter `doc_id < 1000` does not
  *     scan-then-drop, it narrows the id range that is ever produced.
  *     That is the V2 analog of parquet row-group pruning, and at 100 TB
  *     of synthetic load it is the difference between generating a slice
  *     and generating the world. Residual (non-id) filters are reported
  *     back to Spark for post-scan evaluation.
  *   - `SupportsPushDownRequiredColumns`: only requested columns are
  *     materialized (text generation — the expensive field — is skipped
  *     entirely when pruned away).
  *   - `SupportsPushDownLimit` / `SupportsPushDownTopN`: LIMIT n (and
  *     ORDER BY doc_id LIMIT n, either direction) narrow the generated id
  *     range in closed form — the remainder is never produced.
  *   - Rows are split into `slices` independent id-range partitions, so
  *     parallelism scales like any other scan.
  *
  * Every field is a pure md5 function of doc_id (TextHash.h60 semantics),
  * so a DuckDB oracle reproduces the whole table from range(rows) —
  * the source's output is hash-verified end-to-end, not just smoke-read.
  *
  * Options: `rows` (table size, default 1000), `slices` (partitions,
  * default 4).
  */
class SynthDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt,
      properties.getOrDefault("maxPerTrigger", "1000").toLong)
}

/** Deterministic row model shared by the reader and the tests. */
object SynthDocs {
  val Langs: Array[String] = Array("en", "de", "es", "fr", "zh")
  val Vocab = 50
  val MinToks = 4
  val TokSpread = 8

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 15 md5 hex chars parsed base-16 — identical to TextHash.h60 /
    * the oracle's CAST(('0x' || substr(md5(x),1,15)) AS BIGINT).
    */
  def h60(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val hex = md.digest(s.getBytes(StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def langOf(id: Long): String = Langs((h60(s"lang:$id") % Langs.length).toInt)
  def nTokens(id: Long): Long = MinToks + (h60(s"len:$id") % TokSpread)
  def textOf(id: Long): String =
    (0L until nTokens(id)).map(i => "tok" + (h60(s"t:$id:$i") % Vocab)).mkString(" ")
}

class SynthDocsTable(rows: Long, slices: Int, maxPerTrigger: Long)
  extends Table with SupportsRead {
  override def name(): String = s"synth_docs($rows)"
  override def schema(): StructType = SynthDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthDocsScanBuilder(rows, slices, maxPerTrigger)
}

class SynthDocsScanBuilder(rows: Long, slices: Int, maxPerTrigger: Long = 1000L)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthDocs.schema
  private var residualLeft = false
  private var aggPushed: Option[Seq[AggregateFunc]] = None
  /** Accepted LIMIT/TopN: (n, descending). */
  private var limitPushed: Option[(Int, Boolean)] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Comparison values arrive as whatever boxed numeric the literal was
    // typed as (Integer for INT comparisons, Long for BIGINT) — match any
    // integral Number so an INT-typed predicate still prunes the id range.
    object IdVal {
      def unapply(v: Any): Option[Long] = v match {
        case n: java.lang.Integer => Some(n.longValue())
        case n: java.lang.Long => Some(n.longValue())
        case n: java.lang.Short => Some(n.longValue())
        case n: java.lang.Byte => Some(n.longValue())
        case _ => None
      }
    }
    val (accepted, residual) = filters.partition {
      case GreaterThan("doc_id", IdVal(v)) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", IdVal(v)) => lo = math.max(lo, v); true
      case LessThan("doc_id", IdVal(v)) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", IdVal(v)) => hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", IdVal(v)) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull("doc_id") => true // nothing is null here
      case _ => false
    }
    pushed = accepted
    residualLeft = residual.nonEmpty
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown (the V2 analog of parquet footer-stat aggregates):
    * ungrouped COUNT(*) / MIN(doc_id) / MAX(doc_id) over the (already
    * filter-narrowed) id range are CLOSED-FORM — hi−lo, lo, hi−1 — so the
    * scan answers them without generating a single row. Anything else
    * (grouping, other columns) declines and computes normally; complete
    * pushdown is only claimed when every filter was absorbed, otherwise
    * the post-scan residual would see pre-aggregated rows.
    */
  private def docIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("doc_id"))
      case _ => false
    }

  private def canPush(agg: Aggregation): Boolean =
    !residualLeft && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => docIdRef(m.column)
        case m: Max => docIdRef(m.column)
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    canPush(agg) && {
      aggPushed = Some(agg.aggregateExpressions.toSeq)
      true
    }

  /** LIMIT n absorbed by the generator: ids are produced in order, so the
    * first n ids of the (filter-narrowed) range ARE a valid LIMIT answer —
    * the remainder is never generated (`LIMIT 10` over a trillion-row
    * synthetic table generates 10 rows). Declined when a residual filter
    * survives: the post-scan filter could drop rows, and a pre-narrowed
    * range would then under-produce. Reported PARTIAL (Spark keeps its
    * global limit): full pushdown would also be correct for the plain
    * range reader, but this scan can still be thinned AFTER planning by
    * the runtime-filtering face, and partial keeps every composition safe
    * by construction.
    */
  override def pushLimit(limit: Int): Boolean =
    aggPushed.isEmpty && !residualLeft && limit >= 0 && {
      limitPushed = Some((limit, false))
      true
    }

  override def isPartiallyPushed: Boolean = true

  /** ORDER BY doc_id [ASC|DESC] LIMIT n in closed form on the id range:
    * ascending keeps [lo, lo+n), descending keeps [hi−n, hi). Any other
    * sort key declines — the generator's remaining columns are
    * hash-valued, so their TopN needs a real scan anyway.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean =
    aggPushed.isEmpty && !residualLeft && limit >= 0 &&
      orders.length == 1 && docIdRef(orders.head.expression()) && {
        limitPushed = Some((limit,
          orders.head.direction() == SortDirection.DESCENDING))
        true
      }

  override def build(): Scan = {
    var (a, b) = (math.max(lo, 0L), math.max(hi, math.max(lo, 0L)))
    limitPushed.foreach {
      case (n, false) => b = math.min(b, a + n)
      case (n, true) => a = math.max(a, b - n)
    }
    aggPushed match {
      case Some(aggs) => new SynthDocsAggScan(a, b, aggs)
      case None => new SynthDocsScan(a, b, slices, required, maxPerTrigger)
    }
  }
}

/** One-row scan answering a completely-pushed aggregation in closed form. */
class SynthDocsAggScan(lo: Long, hi: Long, aggs: Seq[AggregateFunc])
  extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(aggs.zipWithIndex.map { case (a, i) =>
      StructField(s"agg_$i" + (a match {
        case _: CountStar => "_count"
        case _: Min => "_min"
        case _ => "_max"
      }), LongType, nullable = !a.isInstanceOf[CountStar])
    })

  override def description(): String =
    s"SynthDocs[ids=[$lo,$hi), agg=pushed(${aggs.mkString(",")})]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthDocsPartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    // ship only primitives: the factory must serialize to executors
    new SynthDocsAggReaderFactory(lo, hi, aggs.map {
      case _: CountStar => 0
      case _: Min => 1
      case _ => 2
    }.toArray)
}

class SynthDocsAggReaderFactory(lo: Long, hi: Long, tags: Array[Int])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      private val empty = hi <= lo
      override def next(): Boolean = { val h = !done; done = true; h }
      override def get(): InternalRow =
        InternalRow.fromSeq(tags.toSeq.map {
          case 0 => math.max(0L, hi - lo)
          case 1 => if (empty) null else lo
          case _ => if (empty) null else hi - 1
        })
      override def close(): Unit = ()
    }
}

class SynthDocsScan(lo: Long, hi: Long, slices: Int, required: StructType,
                    maxPerTrigger: Long = 1000L)
  extends Scan with Batch with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  /** Runtime-narrowed id set (the V2 dynamic-partition-pruning analog):
    * when this scan sits on the probe side of a join whose build side is
    * selective, Spark evaluates the build side FIRST and hands the join
    * keys here as an IN predicate — the generator then produces only the
    * matching ids instead of the whole range. None = no runtime filter
    * arrived (scan the range as planned).
    */
  private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("doc_id"))

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val onDocId = p.children().head match {
          case nr: NamedReference => nr.fieldNames.sameElements(Array("doc_id"))
          case _ => false
        }
        val vals = p.children().tail.collect {
          case l: Literal[_] => l.value match {
            case n: java.lang.Number => n.longValue()
          }
        }
        if (onDocId && vals.length == p.children().length - 1) {
          val inRange = vals.filter(v => v >= lo && v < hi).distinct.sorted
          runtimeIds = Some(runtimeIds
            .map(_.toSet.intersect(inRange.toSet).toArray.sorted)
            .getOrElse(inRange))
        }
      }
    }

  override def readSchema(): StructType = required
  override def description(): String =
    s"SynthDocs[ids=[$lo,$hi), cols=${required.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this

  /** Row-count/size stats for the (compile-time-narrowed) range — feeds
    * join-side selection and the DPP benefit heuristic.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    override def sizeInBytes() = java.util.OptionalLong.of(n * 64L)
    override def numRows() = java.util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] =
    runtimeIds match {
      case Some(ids) =>
        val n = math.max(1, slices)
        ids.grouped(math.max(1, (ids.length + n - 1) / n))
          .map(g => SynthDocsIdsPartition(g): InputPartition).toArray
      case None =>
        val n = math.max(1, slices)
        val total = math.max(0L, hi - lo)
        (0 until n).flatMap { i =>
          val a = lo + i * total / n
          val b = lo + (i + 1) * total / n
          if (b > a) Some(SynthDocsPartition(a, b): InputPartition) else None
        }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(required)

  /** Streaming face (MICRO_BATCH_READ): the id range becomes an ordered,
    * replayable log — the offset IS the next unread id, so checkpoint
    * restart/replay is exact by construction (the generator is pure).
    * Each micro-batch advances by at most `maxPerTrigger` ids;
    * `Trigger.AvailableNow` drains to `hi` and stops. Filter/column
    * pushdown compose: the same builder narrowed [lo,hi) and pruned the
    * schema before this stream was built.
    */
  override def toMicroBatchStream(checkpointLocation: String)
    : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthDocsMicroBatchStream(lo, hi, maxPerTrigger, required)
}

class SynthOffset(val pos: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

class SynthDocsMicroBatchStream(lo: Long, hi: Long, maxPerTrigger: Long,
                                required: StructType)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  // Trigger.AvailableNow target: fixed at prepare time so the drain has a
  // stable end even if the table option were to grow mid-run.
  private var availableTarget: Option[Long] = None

  override def initialOffset(): Offset = new SynthOffset(lo)
  override def deserializeOffset(json: String): Offset =
    new SynthOffset(json.toLong)

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(hi)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(math.max(1L, maxPerTrigger))

  /** Admission control: each micro-batch admits at most maxPerTrigger ids
    * past the engine-supplied start — the cursor lives in the CHECKPOINT,
    * not in this object, so restart/replay is exact with no driver state.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = math.max(lo, start.asInstanceOf[SynthOffset].pos)
    val target = availableTarget.getOrElse(hi)
    new SynthOffset(math.min(target, from + math.max(1L, maxPerTrigger)))
  }

  override def reportLatestOffset(): Offset = new SynthOffset(hi)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[SynthOffset].pos
    val b = end.asInstanceOf[SynthOffset].pos
    if (b > a) Array(SynthDocsPartition(a, b)) else Array.empty
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(required)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class SynthDocsPartition(lo: Long, hi: Long) extends InputPartition
case class SynthDocsIdsPartition(ids: Array[Long]) extends InputPartition

class SynthDocsReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case SynthDocsPartition(lo, hi) => new SynthDocsReader(lo, hi, required)
      case SynthDocsIdsPartition(ids) => new SynthDocsIdsReader(ids, required)
    }
}

/** Reader over an explicit (runtime-pruned) id list. */
class SynthDocsIdsReader(ids: Array[Long], required: StructType)
  extends PartitionReader[InternalRow] {
  private val delegate = new SynthDocsReader(0, 0, required) // getter reuse
  private var i = -1
  override def next(): Boolean = { i += 1; i < ids.length }
  override def get(): InternalRow = delegate.rowFor(ids(i))
  override def close(): Unit = ()
}

class SynthDocsReader(lo: Long, hi: Long, required: StructType)
  extends PartitionReader[InternalRow] {
  private var id = lo - 1
  // one getter per required column, bound once (pruned columns are never computed)
  private val getters: Seq[Long => Any] = required.fieldNames.toSeq.map {
    case "doc_id" => (i: Long) => i
    case "lang" => (i: Long) => UTF8String.fromString(SynthDocs.langOf(i))
    case "text" => (i: Long) => UTF8String.fromString(SynthDocs.textOf(i))
    case "n_tokens" => (i: Long) => SynthDocs.nTokens(i)
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def next(): Boolean = { id += 1; id < hi }
  override def get(): InternalRow = rowFor(id)
  private[sources] def rowFor(i: Long): InternalRow =
    InternalRow.fromSeq(getters.map(_(i)))
  override def close(): Unit = ()
}
