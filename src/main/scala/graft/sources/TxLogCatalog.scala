package graft.sources

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table,
  TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL surface for [[TxLog]] tables — a DataSource V2 `TableCatalog`
  * so the FIRST-TOUCH API a real user reaches for works verbatim:
  *
  * {{{
  *   SELECT * FROM graft.`/data/corpus`                  -- latest
  *   SELECT * FROM graft.`/data/corpus` VERSION AS OF 3  -- time travel
  *   SELECT * FROM graft.`/data/corpus` TIMESTAMP AS OF '2026-01-01'
  * }}}
  *
  * Registered via `spark.sql.catalog.graft = graft.sources.TxLogCatalog`
  * ([[graft.GraftSession]] sets it). Identifiers ARE table paths (the
  * path-addressed model every public lakehouse ships first); versioned
  * loads resolve through the same [[TxLog.read]]/[[TxLog.versionAtTime]]
  * the library API uses, so SQL and library reads can never diverge.
  *
  * Read path: the table surfaces as a [[V1Scan]] whose relation builds
  * the pinned [[TxLog.read]] frame — snapshot resolution, deletion
  * vectors, column mapping, and declared-schema promotion all ride the
  * one implementation. Filters/pruning still apply above the scan;
  * the file-skipping entry points ([[TxLog.readWhere]] family) remain
  * the surgical path for stats-pruned scans. Writes stay library-side
  * (append/merge/delete are operations with OCC semantics, not blind
  * INSERTs), so the catalog is read-only and says so loudly. */
class TxLogCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** The identifier IS the path: `graft.`/tmp/t`` parses to name
    * "/tmp/t" (multi-part idents re-join — `graft.data.t` = "data/t"). */
  private def path(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    val spark = SparkSession.active
    val p = path(ident)
    if (TxLog.versions(spark, p).isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, p))
    new TxLogV2Table(p, asOf)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` — the literal commit version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    require(version.forall(_.isDigit),
      s"txlog: VERSION AS OF takes a commit version, got '$version'")
    load(ident, Some(version.toLong))
  }

  /** `TIMESTAMP AS OF <ts>` — DSv2 delivers MICROseconds since epoch;
    * resolved through the same monotonized commit-time mapping as the
    * library's [[TxLog.readAsOfTime]]. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val spark = SparkSession.active
    load(ident, Some(TxLog.versionAtTime(spark, path(ident),
      timestampMicros / 1000L)))
  }

  override def tableExists(ident: Identifier): Boolean =
    TxLog.versions(SparkSession.active, path(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no enumerable namespace

  private def readOnly(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"txlog: the graft catalog is read-only — $what goes through the " +
        "TxLog library API (append/mergeMor/deleteWhere*/restore), whose " +
        "commits carry OCC semantics SQL DML cannot express here")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}

/** A pinned TxLog snapshot as a DSv2 read-only table: schema and rows
  * come from the SAME [[TxLog.read]] the library serves, via a V1 scan
  * relation (declarative enough for Catalyst to push filters/pruning
  * above it; the stats-pruned entry points remain the surgical path). */
private[sources] class TxLogV2Table(tablePath: String, asOf: Option[Long])
  extends Table with SupportsRead {

  private def snapshot = TxLog.read(SparkSession.active, tablePath, asOf)

  override def name(): String =
    tablePath + asOf.map(v => s" VERSION AS OF $v").getOrElse("")

  override def schema(): StructType = snapshot.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = TxLogV2Table.this.schema()
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = TxLogV2Table.this.schema()
            override def buildScan(): RDD[Row] = snapshot.rdd
          }.asInstanceOf[T]
      }
    }
}
