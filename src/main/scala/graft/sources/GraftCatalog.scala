package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only path-based catalog exposing Hudi tables to Spark SQL with
  * time travel — the SQL-native surface for S2:
  *
  * {{{
  *   SET spark.sql.catalog.hudi_graft = graft.sources.GraftCatalog;
  *   SELECT * FROM hudi_graft.`/data/trips`;
  *   SELECT * FROM hudi_graft.`/data/trips` FOR VERSION AS OF '20240102000000000';
  *   SELECT * FROM hudi_graft.`/data/trips` TIMESTAMP AS OF '2024-01-02 00:00:00';
  * }}}
  *
  * Identifiers are table paths (a backquoted absolute path, or segments
  * resolved under the catalog's `warehouse` option). `VERSION AS OF`
  * takes a commit timestamp in any format [[graft.core.Timestamps]]
  * accepts; `TIMESTAMP AS OF` arrives from Spark as epoch micros and is
  * forwarded as epoch millis (normalized per the table's timeline
  * timezone). Writes are not supported — the engine is a reader, like
  * the reference (reader-spec.md:345).
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String = {
    val joined = (ident.namespace() :+ ident.name()).mkString("/")
    if (joined.startsWith("/") || joined.contains("://")) joined
    else warehouse match {
      case Some(w) => s"$w/$joined"
      case None => throw new NoSuchTableException(ident)
    }
  }

  private def hoodieExists(path: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(path, ".hoodie/hoodie.properties")
      p.getFileSystem(org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
        .exists(p)
    } catch { case _: Exception => false }

  private def load(ident: Identifier, pinned: Map[String, String]): Table = {
    val path = pathOf(ident)
    if (!hoodieExists(path)) throw new NoSuchTableException(ident)
    new GraftTable(path, null, None, pinned)
  }

  override def loadTable(ident: Identifier): Table = load(ident, Map.empty)

  /** `FOR VERSION AS OF 'ts'` — a commit (request) timestamp. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Map("as.of.timestamp" -> version))

  /** `FOR TIMESTAMP AS OF ...` — Spark hands epoch MICROS. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, Map("as.of.timestamp" -> (timestamp / 1000L).toString))

  override def tableExists(ident: Identifier): Boolean =
    try hoodieExists(pathOf(ident))
    catch { case _: NoSuchTableException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] = Array.empty

  /** `CREATE TABLE hudi_graft.\`/path\` (...) USING hudi-graft
    * PARTITIONED BY (...) TBLPROPERTIES('primaryKey'='id', ...)`:
    * writes the empty table's `.hoodie` metadata (incl. the declared
    * schema as `hoodie.table.create.schema`); the first `INSERT INTO`
    * then commits data through the same writer as the DataFrame API.
    */
  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    import scala.jdk.CollectionConverters._
    val path = pathOf(ident)
    val partitionCols = partitions.toSeq.map { t =>
      if (t.name != "identity" || t.references().length != 1)
        throw new UnsupportedOperationException(
          s"hudi-graft: unsupported partition transform $t (identity columns only)")
      t.references()(0).fieldNames.mkString(".")
    }
    graft.write.HudiWriter.createTable(
      org.apache.spark.sql.SparkSession.active, path, schema, partitionCols,
      properties.asScala.toMap)
    new GraftTable(path, schema, None, Map.empty)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("hudi-graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("hudi-graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("hudi-graft catalog is read-only")

  // --- Stored procedures (SQL `CALL`) -----------------------------------
  //
  // The hudi-cli-style ops surface as Spark 4 catalog procedures:
  //   CALL hudi_graft.show_commits(table => '/path');
  //   CALL hudi_graft.show_file_slices(table => '/path');
  //   CALL hudi_graft.show_indexes(table => '/path');
  // Each reads driver-side planning metadata only (never data files) and
  // returns it as rows — the SQL analog of the reference's public
  // get_timeline / get_file_slices APIs (table/mod.rs:422/441).

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(n => Identifier.of(namespace, n))

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure =
    GraftProcedures.load(ident.name()).getOrElse(
      throw new RuntimeException(s"Unknown procedure: ${ident.name()}"))
}
