package graft.sources

import graft.operators.SnapshotLog
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.ProcedureCatalog
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A PATH catalog for snapshot-log tables — the `delta.`/path`` /
  * Iceberg Hadoop-tables addressing idea: register once per session
  *
  *   spark.conf.set("spark.sql.catalog.graft_lake",
  *     "graft.sources.GraftCatalog")
  *
  * and every snapshot table becomes addressable from PLAIN SQL TEXT by
  * its directory,
  *
  *   SELECT * FROM graft_lake.`/abs/table/dir`
  *   DELETE FROM graft_lake.`/abs/table/dir` WHERE ...
  *   MERGE INTO graft_lake.`/abs/table/dir` t USING src ON ...
  *
  * `loadTable` resolves the identifier to the directory, infers the
  * schema from the manifest (the published-line head — branch-staged
  * commits stay invisible, the same WAP rule the options door applies)
  * and returns the same [[SnapshotTable]] the DSv2 provider serves, so
  * SELECT, DML (row-level position delta), and time travel behave
  * identically through both doors. Tables are CREATED by the engine's
  * writers (writeInitial / DSv2 append), not by DDL — create/alter/
  * drop refuse loudly rather than half-supporting a second lifecycle.
  *
  * The catalog is also a [[ProcedureCatalog]]: the kernel's
  * maintenance jobs are callable as SQL stored procedures
  * (`CALL graft_lake.system.expire_snapshots('/dir', 5)` …) — see
  * [[GraftProcedures]] for the full surface.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {
  private var catalogName = "graft_lake"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name

  override def name(): String = catalogName

  /** `graft_lake.`/abs/dir`` parses to a one-part identifier whose name
    * IS the directory; an unquoted multipart identifier joins with "/"
    * (namespace segments are path segments). */
  private def dirOf(ident: Identifier): String = {
    val dir = (ident.namespace() :+ ident.name()).mkString("/")
    if (dir.startsWith("/")) dir else s"/$dir"
  }

  override def tableExists(ident: Identifier): Boolean =
    SnapshotLog.latest(dirOf(ident)) >= 1

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (SnapshotLog.latest(dir) == 0) throw new NoSuchTableException(ident)
    val v = SnapshotTables.defaultVersion(dir)
    new SnapshotTable(SnapshotTables.dataSchema(dir, v), Some(dir))
  }

  /** SQL `VERSION AS OF`: a raw snapshot id, a TAG, or a BRANCH name —
    * the same three addressings the options door serves, now reachable
    * as literal SQL text:
    *
    *   SELECT * FROM graft_lake.`/dir` VERSION AS OF 3
    *   SELECT * FROM graft_lake.`/dir` VERSION AS OF 'rel-1'
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (SnapshotLog.latest(dir) == 0) throw new NoSuchTableException(ident)
    val v = version.toIntOption.getOrElse {
      if (graft.operators.SnapshotRefs.branchExists(dir, version) &&
          scala.util.Try(
            graft.operators.SnapshotRefs.resolveTag(dir, version)).isFailure)
        graft.operators.SnapshotRefs.head(dir, version)
      else graft.operators.SnapshotRefs.resolveTag(dir, version)
    }
    require(SnapshotLog.committed(dir, v),
      s"no snapshot v$v at $dir (expired or never committed)")
    new SnapshotTable(SnapshotTables.dataSchema(dir, v), Some(dir),
      pinned = Some(v))
  }

  /** SQL `TIMESTAMP AS OF`: Spark hands micros since epoch; commit
    * stamps are millis — resolved over the PUBLISHED line only (the
    * same WAP rule every unpinned read applies). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident)
    if (SnapshotLog.latest(dir) == 0) throw new NoSuchTableException(ident)
    val v = SnapshotTables.resolveTimestampVisible(dir,
      Math.floorDiv(timestampMicros, 1000L))
    new SnapshotTable(SnapshotTables.dataSchema(dir, v), Some(dir),
      pinned = Some(v))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft_lake tables are created by the snapshot writers " +
        "(SnapshotMerge.writeInitial / DSv2 append), not by DDL")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "alter graft_lake tables through SnapshotLog.commitSchemaChange")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft_lake tables are addressed by directory; move the directory")

  // ---- stored procedures (CALL graft_lake.system.<name>(...)) -------

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"procedures live in the 'system' namespace; got " +
        s"${ident.namespace().mkString(".")}.${ident.name()}")
    GraftProcedures.load(ident.name())
  }

  override def listProcedures(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.procedures.keys.toSeq.sorted
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty
}
