package graft.sources

import graft.operators.SnapshotLog
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.ProcedureCatalog
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, StructField, StructType}
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
  * identically through both doors. DDL lands on the kernel too:
  * `CREATE TABLE … PARTITIONED BY` commits an empty schema-carrying
  * snapshot, and `ALTER TABLE RENAME/ADD COLUMN` / widening type
  * changes are the S40 pure-metadata evolution — while DROP COLUMN,
  * narrowing casts and table renames refuse loudly rather than
  * half-supporting a second lifecycle.
  *
  * The catalog is also a [[ProcedureCatalog]]: the kernel's
  * maintenance jobs are callable as SQL stored procedures
  * (`CALL graft_lake.system.expire_snapshots('/dir', 5)` …) — see
  * [[GraftProcedures]] for the full surface.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog
    with StagingTableCatalog {
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

  /** SQL `CREATE TABLE graft_lake.`/dir` (...) [PARTITIONED BY (col)]`:
    * v1 is a pure-metadata snapshot — the recorded schema (the S40
    * face), the optional partition spec (the S47 face), zero entries.
    * `INSERT INTO` then appends through the DSv2 write, whose tasks
    * label every produced file by the spec column, so the created
    * table feeds partition pruning, metadata COUNT and aggregate
    * pushdown exactly like a `writeInitial` table. Only identity
    * partitioning on one column is supported (the kernel's label
    * model); anything fancier refuses loudly.
    */
  private def identitySpec(partitions: Array[Transform],
      schema: StructType): Option[String] = partitions.toSeq match {
    case Nil => None
    case Seq(t) if t.name() == "identity" &&
        t.references().length == 1 =>
      val col = t.references()(0).fieldNames().mkString(".")
      require(schema.fieldNames.contains(col),
        s"PARTITIONED BY column '$col' is not in the table schema")
      Some(col)
    case other => throw new UnsupportedOperationException(
      "graft_lake supports PARTITIONED BY (one identity column); " +
        s"got ${other.map(_.describe()).mkString(", ")}")
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    val spec = identitySpec(partitions, schema)
    val headers =
      SnapshotLog.renderSchemaHeaders(schema, Map.empty) ++
        spec.map(c => s"${SnapshotLog.SpecHeader}\t$c")
    if (!SnapshotLog.publishEntries(dir, 1, Nil, headers))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (ident.namespace() :+ ident.name()).toSeq)
    new SnapshotTable(schema, Some(dir))
  }

  // ---- atomic CTAS / RTAS (StagingTableCatalog) ----------------------
  // `CREATE TABLE … AS SELECT` and `REPLACE TABLE … AS SELECT` stage
  // their writes into the table directory but publish NO manifest until
  // Spark calls commitStagedChanges — a crashed or aborted CTAS leaves
  // zero committed state (only unreferenced files the orphan sweep
  // reclaims), and RTAS replaces content+schema as ONE snapshot commit
  // (prior versions stay time-travelable, the Iceberg REPLACE shape).

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    val dir = dirOf(ident)
    if (SnapshotLog.latest(dir) >= 1)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (ident.namespace() :+ ident.name()).toSeq)
    new StagedGraftTable(dir, ident, schema,
      identitySpec(partitions, schema), mustNotExist = true)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    val dir = dirOf(ident)
    if (SnapshotLog.latest(dir) == 0)
      throw new NoSuchTableException(ident)
    new StagedGraftTable(dir, ident, schema,
      identitySpec(partitions, schema), mustNotExist = false)
  }

  override def stageCreateOrReplace(ident: Identifier,
      schema: StructType, partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable =
    new StagedGraftTable(dirOf(ident), ident, schema,
      identitySpec(partitions, schema), mustNotExist = false)

  /** SQL `ALTER TABLE` onto the kernel's schema-evolution commit
    * (S40): RENAME COLUMN, ADD COLUMN (nullable), and WIDENING type
    * changes (int→bigint, float→double) land as PURE-METADATA
    * snapshots — zero bytes rewritten at any table size; readers of
    * older versions keep each version's own schema, and pre-evolution
    * files serve the new schema through the rename/widen/null-fill
    * reader. Anything the metadata commit cannot express (DROP
    * COLUMN, narrowing casts, NOT NULL additions, renaming the active
    * partition-spec column) refuses loudly — never a silent mis-read.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (SnapshotLog.latest(dir) == 0) throw new NoSuchTableException(ident)
    val v = SnapshotLog.latest(dir)
    var schema = SnapshotTables.dataSchema(dir, v)
    var renames = Map.empty[String, String]
    val activeSpec = SnapshotLog.specOf(dir, v)
    def one(names: Array[String]): String = {
      require(names.length == 1,
        s"nested columns are not supported: ${names.mkString(".")}")
      names(0)
    }
    def idxOf(c: String): Int = {
      val i = schema.fieldNames.indexOf(c)
      require(i >= 0, s"no column '$c' in ${schema.fieldNames.mkString(", ")}")
      i
    }
    changes.foreach {
      case r: TableChange.RenameColumn =>
        val old = one(r.fieldNames())
        require(!activeSpec.contains(old),
          s"cannot rename '$old': it is the table's active partition " +
            "spec column (manifest labels are keyed by name)")
        require(!schema.fieldNames.contains(r.newName()),
          s"cannot rename '$old' to '${r.newName()}': a column with " +
            "that name already exists")
        val i = idxOf(old)
        schema = StructType(schema.fields.updated(i,
          schema.fields(i).copy(name = r.newName())))
        renames += (old -> r.newName())
      case a: TableChange.AddColumn =>
        val name = one(a.fieldNames())
        require(a.isNullable,
          s"ADD COLUMN $name: new columns must be nullable (existing " +
            "files null-fill them)")
        require(!schema.fieldNames.contains(name),
          s"column '$name' already exists")
        schema = StructType(schema.fields :+
          StructField(name, a.dataType(), nullable = true))
      case u: TableChange.UpdateColumnType =>
        val name = one(u.fieldNames())
        val i = idxOf(name)
        val from = schema.fields(i).dataType
        val to = u.newDataType()
        val widening = (from, to) match {
          case (IntegerType, LongType) => true
          case (FloatType, DoubleType) => true
          case _ => false
        }
        require(widening,
          s"ALTER COLUMN $name TYPE: only widening casts are " +
            s"metadata-safe (int→bigint, float→double); got $from → $to")
        schema = StructType(schema.fields.updated(i,
          schema.fields(i).copy(dataType = to)))
      case d: TableChange.DeleteColumn =>
        throw new UnsupportedOperationException(
          s"DROP COLUMN ${one(d.fieldNames())}: a metadata-only drop " +
            "would silently hide data; rewrite the table instead")
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change: $other")
    }
    SnapshotLog.commitSchemaChange(dir, schema, renames)
    loadTable(ident)
  }

  /** SQL `DROP TABLE graft_lake.`/dir``: removes the table — its
    * manifests, segments, data and delete files, everything under the
    * table's OWN directory (the own-root rule: a clone referencing
    * this table's files by absolute path breaks, exactly like
    * dropping a cloned Delta table's source). Returns false when
    * there is no table, so `DROP TABLE IF EXISTS` behaves. */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (SnapshotLog.latest(dir) == 0) false
    else {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p,
            java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          val listing = java.nio.file.Files.list(p)
          try listing.forEach(rm(_)) finally listing.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(dir))
      true
    }
  }

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

/** The staged table behind atomic CTAS/RTAS: the SELECT's tasks write
  * ordinary labeled data files under a writer-unique root inside the
  * table directory, the DRIVER stashes the finished file list, and
  * NOTHING publishes until [[commitStagedChanges]] — which commits the
  * schema+spec headers and the file entries as ONE snapshot (v1 for
  * CREATE, put-if-absent; latest+1 for REPLACE, CAS-retried with the
  * content replaced but history retained). Per-file stats (rows,
  * bounds, null counts, sums) fold in one distributed aggregation at
  * commit, so a CTAS table prunes and answers metadata aggregates
  * from birth. A crash anywhere before the commit leaves zero
  * committed state.
  */
private[sources] class StagedGraftTable(dir: String,
    ident: Identifier, schema0: StructType, spec: Option[String],
    mustNotExist: Boolean)
    extends StagedTable with SupportsWrite {
  import org.apache.spark.sql.connector.write._

  @volatile private var staged: Seq[SnapFile] = Nil
  @volatile private var written = false

  override def name(): String = s"graft_lake.`$dir` (staged)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** the integral spec column's index — the task writers label files
    * only for integral specs (the manifest's label model); a string
    * spec still records the `#spec` header, files stay unlabeled. */
  private def partColIdx: Option[Int] = spec
    .map(schema0.fieldNames.indexOf(_)).filter(_ >= 0)
    .filter { i =>
      schema0.fields(i).dataType == org.apache.spark.sql.types.LongType ||
        schema0.fields(i).dataType == org.apache.spark.sql.types.IntegerType
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // RTAS plans its write as truncate-then-append on the staged
      // table; the staged commit IS the replacement, so accept
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write
          with RequiresDistributionAndOrdering {
        import org.apache.spark.sql.connector.expressions.Expressions
        private val pc = partColIdx.map(schema0.fieldNames(_))
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          pc match {
            case Some(c) =>
              org.apache.spark.sql.connector.distributions.Distributions
                .clustered(Array(Expressions.column(c)))
            case None =>
              org.apache.spark.sql.connector.distributions.Distributions
                .unspecified()
          }
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          pc.map(c => Expressions.sort(Expressions.column(c),
            org.apache.spark.sql.connector.expressions.SortDirection
              .ASCENDING)).toArray
        override def distributionStrictlyRequired(): Boolean = false
        override def toBatch: BatchWrite = new BatchWrite {
          private val root = SnapshotLog.writerRoot(s"$dir/data/ctas")
          override def createBatchWriterFactory(
              info: PhysicalWriteInfo): DataWriterFactory =
            new SnapshotWriterFactory(root, schema0, partColIdx)
          override def commit(
              messages: Array[WriterCommitMessage]): Unit = {
            staged = messages.collect { case SnapFilesCommit(fs) => fs }
              .flatten.filter(_.rows > 0).sortBy(_.path).toSeq
            written = true
          }
          override def abort(
              messages: Array[WriterCommitMessage]): Unit =
            messages.foreach {
              case SnapFilesCommit(fs) =>
                fs.filter(_.path.nonEmpty).foreach(f =>
                  java.nio.file.Files.deleteIfExists(
                    java.nio.file.Paths.get(f.path)))
              case _ =>
            }
        }
      }
    }

  override def commitStagedChanges(): Unit = {
    require(written, "commitStagedChanges before the staged write ran")
    val s = org.apache.spark.sql.SparkSession.active
    // full write-side stats in ONE distributed aggregation: the CTAS
    // table prunes, COUNTs and SUMs from metadata from birth
    val statsCols = schema0.fields.filter(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
    val st =
      if (staged.isEmpty) Map.empty[String, SnapshotLog.FileStats]
      else SnapshotLog.collectFileStats(s, staged.map(_.path), statsCols)
    def entriesAt(t: Long): Seq[SnapshotLog.FileEntry] =
      staged.map { f =>
        val fs = st.getOrElse(SnapshotLog.normPath(f.path),
          SnapshotLog.FileStats(f.rows, Map.empty, Map.empty,
            Map.empty, Map.empty))
        SnapshotLog.FileEntry(f.path, "D", f.label, fs.longs,
          seq = t, rows = f.rows, strStats = fs.strs, bytes = f.bytes,
          nullCounts = fs.nulls, sums = fs.sums,
          splitOffsets = f.splitOffsets)
      }
    val headers = SnapshotLog.renderSchemaHeaders(schema0, Map.empty) ++
      spec.map(c => s"${SnapshotLog.SpecHeader}\t$c")
    if (mustNotExist) {
      if (!SnapshotLog.publishEntries(dir, 1, entriesAt(1L), headers))
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(
            (ident.namespace() :+ ident.name()).toSeq)
    } else {
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        require(attempts <= 1000, "staged replace lost 1000 id races")
        val v = SnapshotLog.latest(dir)
        done = SnapshotLog.publishEntries(dir, v + 1,
          entriesAt(v + 1L), headers)
      }
    }
  }

  override def abortStagedChanges(): Unit =
    staged.foreach(f => java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(f.path)))
}
