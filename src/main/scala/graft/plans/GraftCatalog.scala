package graft.plans

import java.util

import graft.operators.MergeTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-text catalog over the [[MergeTable]] lake (SURVEY §3.1: the
  * reference's only IR is SQL text, and until this the engine's lake
  * verbs — MERGE, time travel — were API-only). Register with
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.plans.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse/dir
  * }}}
  *
  * after which `graft.<ns...>.<table>` names the merge table rooted at
  * `<root>/<ns...>/<table>`:
  *
  *   - `SELECT … FROM graft.db.t` reads the current snapshot,
  *   - `SELECT … FROM graft.db.t VERSION AS OF n` time-travels
  *     (`loadTable(ident, version)`, the DSv2 contract for the syntax),
  *   - `MERGE INTO graft.db.t USING … ON t.k = s.k WHEN MATCHED …`
  *     drives [[MergeTable.merge]] (rewritten by [[GraftLakeRule]]),
  *   - `CREATE TABLE graft.db.t (…) TBLPROPERTIES ('key'='k')`
  *     bootstraps a table by committing an empty batch that declares
  *     the schema (the lake's schema-on-write path).
  *
  * Reads do NOT go through a hand-rolled DSv2 reader: [[GraftLakeRule]]
  * swaps the relation for the snapshot's native parquet plan during
  * resolution, so scans keep file-source pushdown, vectorization, and
  * whole-stage codegen — a row-at-a-time PartitionReader here would
  * throw away exactly the scan performance the lake's stats pruning
  * buys. The Table object is deliberately just metadata (schema +
  * identity); its declared BATCH_READ capability is honored by the
  * rewrite, not by a Scan. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private[plans] var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.root = <warehouse dir>")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private[plans] def rootOf(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString(s"$root/", "/", "")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path((root +: namespace).mkString("/"))
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    MergeTable.versions(spark, rootOf(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    GraftLakeTable(rootOf(ident), asOf = None)
  }

  /** `VERSION AS OF <v>` — the DSv2 time-travel hook. The version must
    * actually be committed: the manifest fold for a FUTURE version
    * would silently answer with the current state (every commit ≤ v is
    * every commit), which is not time travel — fail loudly instead. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val vs = MergeTable.versions(spark, rootOf(ident))
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    // Spark routes TIMESTAMP AS OF strings through this same hook —
    // name the integer-version contract instead of leaking a raw
    // NumberFormatException
    val v = version.toLongOption.getOrElse(throw new UnsupportedOperationException(
      s"VERSION AS OF '$version': graft lake versions are integer commit " +
        "versions (TIMESTAMP AS OF is not supported)"))
    require(vs.contains(v),
      s"VERSION AS OF $v: table ${rootOf(ident)} has committed versions " +
        s"${vs.min}..${vs.max} only")
    GraftLakeTable(rootOf(ident), asOf = Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val key = properties.get(MergeTableKeyProp)
    require(key != null && key.nonEmpty,
      s"CREATE TABLE on catalog '$catalogName' requires TBLPROPERTIES " +
        s"('$MergeTableKeyProp' = '<merge key column>')")
    require(schema.fieldNames.contains(key),
      s"merge key '$key' is not a column of ${schema.fieldNames.mkString(",")}")
    // schema-on-write bootstrap: an empty committed batch declares the
    // schema, exactly like the API's first append
    val empty = spark.createDataFrame(new util.ArrayList[org.apache.spark.sql.Row](), schema)
    MergeTable.append(spark, rootOf(ident), empty, key)
    GraftLakeTable(rootOf(ident), asOf = None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(rootOf(ident))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.delete(p, true)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE: evolve the schema through a merge/append with " +
        "evolveSchema = true (the lake's schema-on-write contract)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")

  private val MergeTableKeyProp = "key"
}

object GraftCatalog {
  /** Register the `graft` catalog on a live session (idempotent) and
    * return the warehouse root actually in effect. The CatalogManager
    * caches the initialized instance at first reference, so the FIRST
    * registration in a session wins — later callers must use the root
    * already configured, not their own, or their table paths and the
    * catalog's would silently diverge. */
  def ensure(s: SparkSession, defaultRoot: => String): String = synchronized {
    val root = s.conf.getOption("spark.sql.catalog.graft.root")
      .getOrElse(defaultRoot)
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", root)
    root
  }
}

/** Metadata-only handle for one merge table (+ optional pinned
  * version). [[GraftLakeRule]] replaces its relation with the
  * snapshot's parquet plan during resolution. */
case class GraftLakeTable(root: String, asOf: Option[Long]) extends Table {

  override def name(): String =
    root + asOf.map(v => s"@v$v").getOrElse("")

  override def schema(): StructType =
    MergeTable.snapshot(SparkSession.active, root, asOf).schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
}
