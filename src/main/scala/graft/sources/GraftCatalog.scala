package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Catalog plugin (`spark.sql.catalog.<name> = graft.sources.GraftCatalog`)
  * exposing the synthetic corpus as SQL-addressable tables:
  *
  *   SELECT * FROM <name>.synth.docs_<rows>
  *
  * — the third face of the V2 integration (TableProvider is the
  * format-string face, this is the catalog face; same Table object behind
  * both, so every pushdown the scan supports works identically from pure
  * SQL). Read-only by design: mutations raise UnsupportedOperationException
  * the way analysis expects.
  *
  * Table names encode their size (`docs_2000` = ids [0, 2000)) — a
  * catalog-of-generators, the pattern benchmark catalogs (TPC-DS dsdgen
  * connectors) use.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {

  private var catName = "graft"
  private val DocsTable = "docs_(\\d+)".r
  private val LinesTable = "([A-Za-z0-9_]+)".r

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("synth")))
      Array(Identifier.of(namespace, "docs_1000"))
    else if (namespace.sameElements(Array("lines"))) {
      val root = java.nio.file.Paths.get(GraftCatalog.linesRoot)
      if (!java.nio.file.Files.isDirectory(root)) Array.empty
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(root).iterator.asScala
          .filter(java.nio.file.Files.isDirectory(_))
          .map(p => Identifier.of(namespace, p.getFileName.toString))
          .toArray
      }
    }
    else throw new NoSuchNamespaceException(catName +: namespace.toSeq)

  override def loadTable(ident: Identifier): Table =
    ident.name() match {
      case DocsTable(n) if ident.namespace().sameElements(Array("synth")) =>
        new SynthDocsTable(n.toLong, 4, 1000L)
      // lines namespace: catalog-of-paths — <name> maps to a fixed local
      // root; the SAME GraftLinesTable object serves the format-string
      // face, so reads/writes/DELETEs behave identically through both
      case LinesTable(n) if ident.namespace().sameElements(Array("lines")) =>
        new GraftLinesTable(s"${GraftCatalog.linesRoot}/$n")
      case _ => throw new NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  // ------------------------------------------------ FunctionCatalog face

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("fns")))
      Array(Identifier.of(namespace, "h60"))
    else throw new NoSuchNamespaceException(catName +: namespace.toSeq)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().sameElements(Array("fns")) && ident.name() == "h60")
      H60Function
    else throw new NoSuchFunctionException(ident)
}

/** V2 catalog function: the library's portable 60-bit text hash
  * (TextHash.h60 / SynthDocs.h60 — first 15 md5 hex chars as a signed
  * long), callable from pure SQL as `<catalog>.fns.h60(str)`. Implements
  * both the `produceResult` row path and the MAGIC `invoke` method Spark's
  * analyzer binds statically (Invoke expression — no reflection per row,
  * inlines into codegen).
  */
object H60Function extends UnboundFunction {
  override def name(): String = "h60"
  override def description(): String =
    "h60(str) - first 15 hex chars of md5(str) as BIGINT (TextHash.h60)"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 1 ||
      inputType.fields(0).dataType != StringType)
      throw new UnsupportedOperationException("h60 expects a single STRING argument")
    H60Bound
  }
}

object H60Bound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = LongType
  override def name(): String = "h60"
  override def canonicalName(): String = "graft.fns.h60"
  override def isResultNullable: Boolean = true

  /** Magic method — bound statically by the analyzer. */
  def invoke(s: UTF8String): java.lang.Long =
    if (s == null) null else java.lang.Long.valueOf(SynthDocs.h60(s.toString))

  override def produceResult(input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) null
    else java.lang.Long.valueOf(SynthDocs.h60(input.getUTF8String(0).toString))
}

object GraftCatalog {
  /** Root directory for the `lines` namespace (catalog-of-paths). */
  val linesRoot: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_lines_cat"
}
