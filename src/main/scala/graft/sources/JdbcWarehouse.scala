package graft.sources

import java.sql.DriverManager
import java.util.Properties

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types.{DataType, StringType}

/** JDBC warehouse backend — the reference's REAL sink (Postgres via
  * sqlx: per-row `INSERT … ON CONFLICT` upserts inside one transaction,
  * /root/reference/src/warehouse.rs:41-139,201-249) re-expressed
  * Spark-first. This closes the S13 warehouse axis beyond file formats:
  * the same [[graft.ingest.Backfill]] pipeline lands in parquet, orc,
  * or a SQL database by swapping the sink value.
  *
  *  - READS go through `spark.read.jdbc` — slot-range predicates push
  *    down to the database's WHERE clause (the JDBC source reports
  *    pushed filters), so the replay guard's sink probe stays
  *    range-sized server-side, exactly like the parquet row-group
  *    pruning on the file path.
  *  - APPENDS use Spark's parallel JDBC writer: one batched INSERT
  *    stream per partition — the reference's per-chunk connection
  *    (backfill.rs:64-102) as executor-side parallelism.
  *  - UPSERTS resolve last-write-wins IN SPARK first
  *    ([[Upsert.lastWriteWins]] — one shuffle, defined tie semantics),
  *    then land as per-partition DELETE+INSERT transactions: the
  *    portable spelling of `ON CONFLICT (key) DO UPDATE` (MERGE
  *    dialects differ across databases; delete-then-insert of a
  *    key-unique batch is semantically identical and batches cleanly
  *    through `addBatch`/`executeBatch`). Each partition is ONE
  *    transaction — a mid-batch failure rolls back, so replays stay
  *    idempotent (the reference wraps its per-batch upserts in a
  *    transaction for the same reason, warehouse.rs:209-248).
  *
  * At 100 TB the analytic store is the lake ([[graft.operators.MergeTable]]);
  * a JDBC warehouse is the serving/metadata-sized sink the reference
  * actually shipped — bounded tables, not the fact corpus. The writer
  * parallelism (= partitions) is therefore the knob that keeps a real
  * database from being connection-stormed: [[upsert]] caps itself at
  * `maxConnections`; [[append]] callers repartition, mirroring
  * `--workers`.
  */
object JdbcWarehouse {

  /** Derby maps Spark strings to CLOB by default — a type that refuses
    * equality predicates (breaking the replay guard's key anti-join)
    * and mismatches at `setNull` against VARCHAR-typed columns. A
    * registered dialect overrides the mapping everywhere at once
    * (CREATE DDL, writer bind types, reader getters) — the supported
    * Spark extension point (`JdbcDialects.registerDialect`), not a
    * per-write option. 32672 is Derby's max VARCHAR width. */
  private object DerbyVarcharDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby")
    // a registered dialect falls back to the COMMON JDBC mapping (not
    // the built-in DerbyDialect), so re-state Derby's own deviations
    // from common SQL alongside the VARCHAR override
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType => Some(JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR))
      case org.apache.spark.sql.types.BooleanType =>
        Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
      case org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType =>
        Some(JdbcType("SMALLINT", java.sql.Types.SMALLINT))
      case org.apache.spark.sql.types.FloatType =>
        Some(JdbcType("REAL", java.sql.Types.REAL))
      case org.apache.spark.sql.types.BinaryType =>
        Some(JdbcType("BLOB", java.sql.Types.BLOB))
      case _ => None // common JDBC mapping is Derby-valid for the rest
    }
  }

  @volatile private var registered = false
  private[sources] def ensureDialect(): Unit =
    if (!registered) synchronized {
      if (!registered) { JdbcDialects.registerDialect(DerbyVarcharDialect); registered = true }
    }

  /** SQLStates for "relation/table does not exist" across the dialects
    * this backend targets: 42X05 (Derby), 42P01 (Postgres), 42S02
    * (SQL standard / MySQL). */
  private val TableMissingStates = Set("42X05", "42P01", "42S02")

  /** Walks the cause chain for a table-not-found SQLException. */
  private[sources] def isTableMissing(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      t match {
        case s: java.sql.SQLException
            if s.getSQLState != null &&
              TableMissingStates.contains(s.getSQLState) => return true
        case _ =>
      }
      t = if (t.getCause eq t) null else t.getCause
    }
    false
  }
}

/** @param createColumnTypes optional `createTableColumnTypes` clause for
  *   first-write table creation — for column-precise DDL (e.g.
  *   `"event_id VARCHAR(64)"`) where the dialect default is wider than
  *   a production table wants.
  * @param maxConnections upsert's connection budget: each partition of
  *   the resolved batch opens one DB connection, so [[upsert]] caps the
  *   partition count at this value — a wide micro-batch (partitions =
  *   source parallelism) must not connection-storm the database. */
case class JdbcWarehouse(url: String, table: String,
    user: Option[String] = None, password: Option[String] = None,
    createColumnTypes: Option[String] = None,
    maxConnections: Int = 8) {

  private def props: Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p
  }

  /** The sink's current rows, or None when the table does not exist
    * yet (first run) — the JDBC twin of `Backfill.readSinkIfAny`.
    *
    * ONLY table-absence maps to None: a transient error (connection
    * blip, lock timeout, permission change) must PROPAGATE — swallowed
    * into None it would silently disable Backfill's replay guard and
    * duplicate every replayed event. */
  def readIfAny(spark: SparkSession): Option[DataFrame] =
    try {
      JdbcWarehouse.ensureDialect()
      val df = spark.read.jdbc(url, table, props)
      df.schema // force resolution: a missing table fails HERE
      Some(df)
    } catch {
      case e: Exception if JdbcWarehouse.isTableMissing(e) => None
    }

  /** Parallel batched append (no conflict handling — callers guard with
    * the event-level anti-join, as on the file path). */
  def append(df: DataFrame): Unit = {
    JdbcWarehouse.ensureDialect()
    val w = df.write.mode(SaveMode.Append)
    createColumnTypes.fold(w)(w.option("createTableColumnTypes", _))
      .jdbc(url, table, props)
  }

  /** `INSERT … ON CONFLICT (key) DO UPDATE` for a whole batch:
    * last-write-wins resolution in Spark, then per-partition
    * DELETE+INSERT in one transaction each. Creates the table (via an
    * empty append) when absent so first-run and replay share one code
    * path.
    *
    * NULL keys are pure inserts, exactly like SQL `ON CONFLICT` (no
    * two NULLs conflict — the [[Upsert.lastWriteWins]] contract): a
    * replayed batch is idempotent for KEYED rows; null-key rows insert
    * again, as they would under the reference's `ON CONFLICT
    * (event_id)` against a nullable key. The reference's PK columns
    * are NOT NULL, so keyed pipelines never hit this edge. */
  def upsert(batch: DataFrame, key: String, versionCol: String): Unit = {
    JdbcWarehouse.ensureDialect()
    // coalesce only ever DECREASES the partition count, so this is a
    // pure cap: a batch already inside the budget keeps its layout
    val resolved = Upsert.lastWriteWins(batch, key, versionCol)
      .coalesce(math.max(1, maxConnections))
    if (readIfAny(batch.sparkSession).isEmpty)
      append(resolved.limit(0)) // CREATE TABLE from the schema, no rows
    val cols = resolved.schema.fieldNames.toSeq
    // quote identifiers: Spark's writer creates case-exact quoted
    // columns, so unquoted names would case-fold at the database
    def q(c: String) = "\"" + c + "\""
    val insertSql = s"INSERT INTO $table (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val deleteSql = s"DELETE FROM $table WHERE ${q(key)} = ?"
    val keyIdx = cols.indexOf(key)
    require(keyIdx >= 0, s"upsert key '$key' not in batch columns $cols")
    // capture plain values, not `this` (executor-side serialization);
    // credentials must ride along — a raw url-only connect would fail
    // against any authenticated database
    val u = url
    val (usr, pwd) = (user, password)
    resolved.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val cp = new Properties()
        usr.foreach(cp.setProperty("user", _))
        pwd.foreach(cp.setProperty("password", _))
        val conn = DriverManager.getConnection(u, cp)
        try {
          conn.setAutoCommit(false) // one transaction per partition
          val del = conn.prepareStatement(deleteSql)
          val ins = conn.prepareStatement(insertSql)
          try {
            rows.foreach { r =>
              del.setObject(1, r.get(keyIdx))
              del.addBatch()
              cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
              ins.addBatch()
            }
            del.executeBatch()
            ins.executeBatch()
            conn.commit()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally { del.close(); ins.close() }
        } finally conn.close()
      }
    }
  }
}
