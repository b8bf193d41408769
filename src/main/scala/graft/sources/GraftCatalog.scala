package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
class GraftCatalog extends TableCatalog {

  private var catName = "graft"
  private val DocsTable = "docs_(\\d+)".r

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("synth")))
      Array(Identifier.of(namespace, "docs_1000"))
    else throw new NoSuchNamespaceException(catName +: namespace.toSeq)

  override def loadTable(ident: Identifier): Table =
    ident.name() match {
      case DocsTable(n) if ident.namespace().sameElements(Array("synth")) =>
        new SynthDocsTable(n.toLong, 4, 1000L)
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
}
