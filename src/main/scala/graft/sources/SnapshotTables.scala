package graft.sources

import java.util

import graft.operators.{SnapshotLog, SnapshotRefs}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{MessageType, PrimitiveType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The snapshot-log table as a FIRST-CLASS Spark data source
  * (`spark.read.format("graft-snapshot")`) — the DSv2 face that makes
  * the lake kernel reachable from plain SQL and from Structured
  * Streaming, the Delta/Iceberg connector shape:
  *
  *  - BATCH + `versionAsOf`: `option("path", dir).option("versionAsOf",
  *    "3")` plans EXACTLY snapshot 3's manifest files (one input
  *    partition per data file — no directory walk, planning cost is the
  *    manifest), so `VERSION AS OF` works through a temp view and
  *    ordinary SQL text. Column pruning is pushed into the parquet
  *    read schema (`SupportsPushDownRequiredColumns`).
  *  - STREAMING + `changeFeed=true`: `readStream` replays the table's
  *    COMMIT HISTORY — offsets are snapshot ids, each micro-batch is
  *    one commit's delta (new data files as `_op = "I"` rows, new
  *    equality-delete vectors as `_op = "D"` key rows, stamped with
  *    `_commit`), resumable from the checkpoint and drained by
  *    `Trigger.AvailableNow`. This is the table-as-a-source half of
  *    the story next to `SnapshotCommitSink` (the table-as-a-sink):
  *    a downstream consumer pays each commit's delta, never a table
  *    scan, however large the table — the Delta CDF / Iceberg
  *    incremental-read contract.
  *  - BATCH WRITE: `df.write.format("graft-snapshot").mode("append")`
  *    commits the DataFrame as ONE snapshot (task-local parquet files
  *    under a writer-unique root, driver-side CAS manifest publish —
  *    see [[SnapshotWrite]]); `option("branch", name)` stages the
  *    append on a [[graft.operators.SnapshotRefs]] branch instead.
  *  - Reads address snapshots three ways: `versionAsOf` (a raw id),
  *    `branch` (the ref's current head), `tagAsOf` (an immutable pin).
  *
  * MERGE-ON-READ is served natively: position deletes subtract inside
  * each file's reader, and equality-delete vectors (seq-scoped at plan
  * time) filter rows by key-tuple membership — the same semantics as
  * `SnapshotLog.readMor`, executed as per-task hash probes over
  * churn-sized key sets, so a vectored table reads correctly through
  * plain SQL with zero compaction required. The one loud contract
  * left: the stream refuses COW-rewrite commits on tables without
  * declared keys (their exact U/D split needs the key signature).
  *
  * Executor-side reads use the parquet example Group API over the
  * PROJECTED read schema — self-contained (no SparkSession on the
  * reader path) and column-pruned at the parquet layer. Supported
  * column types: LONG, INT, DOUBLE, FLOAT, BOOLEAN, STRING — the
  * manifest-schema subset the kernel's tables use.
  */
class SnapshotTables extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = SnapshotTables.pathOf(options)
    val v = SnapshotTables.versionOf(options)
    val data = SnapshotTables.dataSchema(dir, v)
    if (options.getBoolean("changeFeed", false))
      StructType(data.fields ++ Seq(
        StructField("_op", StringType, nullable = false),
        StructField("_commit", LongType, nullable = false)))
    else data
  }

  // writes carry their own schema (the DataFrame's): an empty table has
  // nothing to infer from, and the first append DEFINES the schema
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SnapshotTable(schema, None)
}

object SnapshotTables {
  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snapshot needs option(\"path\", <tableDir>)")
    p
  }

  private[sources] def versionOf(options: CaseInsensitiveStringMap): Int = {
    val dir = pathOf(options)
    explicitVersion(dir, options).getOrElse(defaultVersion(dir))
  }

  /** is snapshot `v` on the PUBLISHED line? Branch-staged commits (the
    * `#ref` marker) are invisible to unpinned readers until a
    * fast-forward publishes them — at which point they are ancestors of
    * the `main` head and resolve again. This is the isolation half of
    * write–audit–publish: "no reader of main can see" is enforced at
    * the read door, not just promised by the ref layer.
    */
  private[sources] def visibleVersion(dir: String, v: Int): Boolean =
    SnapshotLog.committed(dir, v) && (SnapshotLog.refOf(dir, v) match {
      case None => true
      case Some(_) => SnapshotRefs.branchExists(dir, "main") &&
        SnapshotRefs.isAncestor(dir, v, SnapshotRefs.head(dir, "main"))
    })

  /** the snapshot an UNPINNED read serves: the newest VISIBLE commit.
    * A table whose every retained commit is branch-staged refuses the
    * default read (address a ref explicitly) rather than serving
    * unpublished data.
    */
  private[sources] def defaultVersion(dir: String): Int = {
    val last = SnapshotLog.latest(dir)
    if (last == 0) 0
    else (last to 1 by -1).find(visibleVersion(dir, _)).getOrElse(
      throw new IllegalArgumentException(
        s"every retained snapshot of $dir is staged on a branch; " +
          "read it via option(\"branch\", ...) or publish first"))
  }

  /** memoized (sumBytes, sumRows | -1) of the DATA entries surviving
    * a static constraint set in snapshot (dir, v) — the scan's
    * statistics. Keyed on the manifest's self-invalidating FILE
    * IDENTITY plus the rendered constraints, bounded LRU; an eviction
    * or a re-created table directory is a re-fold, never a stale
    * answer. Also memoizes [[SnapshotLog.sizeOf]]'s filesystem stats
    * for legacy entries without recorded bytes. */
  private val statsMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (AnyRef, Long, Long)](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (AnyRef, Long, Long)])
          : Boolean = size() > 512
    })
  private[sources] def statsFor(dir: String, v: Int,
      cs: Seq[SnapshotPrune.Constraint]): (Long, Long) = {
    val id = SnapshotLog.manifestIdOf(dir, v).orNull
    val key = s"$dir#$v#${cs.mkString("&")}"
    val hit = if (id == null) null else statsMemo.get(key)
    if (hit != null && hit._1 == id) (hit._2, hit._3)
    else {
      val survivors = SnapshotLog.entries(dir, v).filter(e =>
        e.kind == "D" && cs.forall(SnapshotPrune.survives(e, _)))
      val bytes = survivors.map(SnapshotLog.sizeOf).sum
      val rows =
        if (survivors.exists(_.rows < 0L)) -1L
        else survivors.map(_.rows).sum
      if (id != null) statsMemo.put(key, (id, bytes, rows))
      (bytes, rows)
    }
  }

  /** `TIMESTAMP AS OF` over the PUBLISHED line only — a staged commit's
    * stamp never resolves for an unpinned reader. */
  private[sources] def resolveTimestampVisible(dir: String, ts: Long): Int = {
    val stamped = (1 to SnapshotLog.latest(dir))
      .filter(visibleVersion(dir, _))
      .flatMap(v => SnapshotLog.tsOf(dir, v).map(v -> _))
    require(stamped.nonEmpty, s"no published timestamped snapshots at $dir")
    val hits = stamped.filter(_._2 <= ts)
    require(hits.nonEmpty,
      s"no published snapshot at or before ts=$ts at $dir " +
        s"(earliest retained stamp: ${stamped.head._2})")
    hits.map(_._1).max
  }

  /** the snapshot a read pins, resolved from whichever addressing the
    * caller used: a raw id (`versionAsOf`), a branch head (`branch` —
    * the same option a write targets), or an immutable tag (`tagAsOf`).
    */
  private[sources] def explicitVersion(dir: String,
      options: CaseInsensitiveStringMap): Option[Int] = {
    val picked = Seq(
      Option(options.get("versionAsOf")).map(_.toInt),
      Option(options.get("branch")).map(SnapshotRefs.head(dir, _)),
      Option(options.get("tagAsOf")).map(SnapshotRefs.resolveTag(dir, _)),
      Option(options.get("timestampAsOf"))
        .map(t => resolveTimestampVisible(dir, t.toLong)))
      .flatten
    require(picked.size <= 1, "graft-snapshot: at most one of " +
      "versionAsOf / branch / tagAsOf / timestampAsOf")
    picked.headOption
  }

  /** The data schema snapshot `v` serves: the manifest-recorded schema
    * when present (the evolved-table case), else the first data file's
    * footer mapped to Spark types.
    */
  private[sources] def dataSchema(dir: String, v: Int): StructType =
    SnapshotLog.schemaOf(dir, v).getOrElse {
      val files = SnapshotLog.files(dir, v)
      require(files.nonEmpty, s"snapshot v$v of $dir has no data files")
      val msg = footerSchema(files.head)
      import scala.jdk.CollectionConverters._
      StructType(msg.getFields.asScala.toSeq.map { f =>
        StructField(f.getName, sparkType(f.asPrimitiveType()))
      })
    }

  private[sources] def footerSchema(file: String): MessageType = {
    // plan-time read, once per schema-less table load: the shared
    // local-path InputFile keeps it ~3 ms instead of a fresh Hadoop
    // Configuration + checksum-FS open (~20 ms)
    val reader = ParquetFileReader.open(
      SnapshotLog.footerInputFile(file))
    try reader.getFooter.getFileMetaData.getSchema
    finally reader.close()
  }

  private[sources] def sparkType(p: PrimitiveType): DataType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    p.getPrimitiveTypeName match {
      case INT64 => LongType
      case INT32 => IntegerType
      case DOUBLE => DoubleType
      case FLOAT => FloatType
      case BOOLEAN => BooleanType
      case BINARY => StringType
      case other => throw new IllegalArgumentException(
        s"graft-snapshot: unsupported parquet type $other for " +
          s"column ${p.getName}")
    }
  }
}

/** The table object behind both doors: the path-options provider
  * (`format("graft-snapshot")`) constructs it with `dir0 = None` (the
  * path rides in the scan/write options), the [[GraftCatalog]] with the
  * resolved directory — which is what unlocks SQL DML: catalog tables
  * are addressable by `MERGE INTO` / `DELETE` / `UPDATE`, and this
  * table answers them through [[SupportsRowLevelOperations]] with a
  * POSITION-DELTA operation (`sources/SnapshotDelta.scala`): matched
  * rows are addressed by the `(_file, _pos)` metadata columns the scan
  * itself serves, deletes commit as position-delete vectors and
  * inserts as new data files — ONE merge-on-read snapshot, zero data
  * files rewritten, the Iceberg position-delta write shape.
  */
private[sources] class SnapshotTable(schema0: StructType,
    dir0: Option[String], pinned: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2 {
  override def name(): String =
    dir0.map(d => s"graft_lake.`$d`").getOrElse("graft_snapshot_table")
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    // a catalog time-travel load (SQL VERSION/TIMESTAMP AS OF) pins the
    // snapshot at loadTable time; the pin rides into the scan options
    val opts = pinned match {
      case Some(v) if options.get("versionAsOf") == null =>
        val m = new java.util.HashMap[String, String](options)
        m.put("versionAsOf", v.toString)
        new CaseInsensitiveStringMap(m)
      case _ => options
    }
    new SnapshotScanBuilder(schema0,
      dir0.getOrElse(SnapshotTables.pathOf(opts)), opts)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SnapshotWriteBuilder(
      dir0.getOrElse(SnapshotTables.pathOf(info.options())),
      Option(info.options().get("branch")), info)

  /** the row-address metadata columns the position-delta DML rides on:
    * `_file` (the manifest path of the row's data file) and `_pos`
    * (its physical row index in that file) — served by the scan, never
    * stored. The Iceberg `_file`/`_pos` convention.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    SnapshotDelta.MetaCols

  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    val dir = dir0.getOrElse(SnapshotTables.pathOf(info.options()))
    () => new SnapshotDelta.PositionDeltaOperation(dir, info.command())
  }

  // ---- metadata-only DELETE (SupportsDeleteV2) ----------------------
  // Spark's OptimizeMetadataOnlyDeleteFromTable prefers this over the
  // row-level rewrite whenever canDeleteWhere accepts: a value-set
  // DELETE on one column commits an equality-delete VECTOR — zero data
  // files opened (see SnapshotDelta.MetaDelete). Everything else
  // refuses into the position-delta path.
  override def canDeleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean = dir0.exists(d =>
    SnapshotDelta.MetaDelete.canPlan(d, schema0, predicates).isDefined)

  override def deleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    val d = dir0.getOrElse(
      throw new UnsupportedOperationException(
        "metadata DELETE needs a catalog-addressed table"))
    val (col, vals, dt) = SnapshotDelta.MetaDelete
      .canPlan(d, schema0, predicates)
      .getOrElse(throw new IllegalStateException(
        "deleteWhere called for predicates canDeleteWhere refused"))
    SnapshotDelta.MetaDelete.commit(d, col, vals, dt)
  }
}

/** The ONE constraint model every manifest-pruning face shares —
  * static filter pushdown, runtime (DPP) filtering, scan statistics,
  * and the aggregate pushdown's exact-filter analysis all parse
  * predicates into these constraints and test entries through
  * [[survives]], so the faces cannot drift on semantics.
  */
private[sources] object SnapshotPrune {
  /** one manifest-prunable constraint: a value SET (=, IN) or a
    * one-sided RANGE bound (>, >=, <, <= — bounds kept inclusive,
    * strictness conservatively widened). */
  sealed trait Constraint { def col: String }
  final case class InSet(col: String, vals: Seq[Any]) extends Constraint
  final case class Bound(col: String, lo: Option[Any],
      hi: Option[Any]) extends Constraint
  /** the analyzer's `IS NOT NULL` rider — present in nearly every
    * WHERE. Prunes ALL-NULL files via recorded null counts and pushes
    * `notEq(col, null)` into the parquet read (null-count stats skip
    * all-null row groups). */
  final case class NotNull(col: String) extends Constraint

  /** the constraints we can prune on, parsed through the PUBLIC
    * connector interfaces (NamedReference / Literal — the concrete
    * FieldReference/LiteralValue classes are private[sql] to Spark).
    * Anything not understood is simply not a constraint: Spark
    * re-applies every predicate after the scan. */
  def parseConstraints(
      predicates: Array[
        org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Seq[Constraint] = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    predicates.toSeq.flatMap { p =>
      val kids = p.children()
      // CANONICALIZE literal values: predicates Spark actually pushes
      // carry StringType values as UTF8String (LiteralValue's internal
      // form), so a bare `l.value()` would never match the String-typed
      // label/strStats branches below — the string-bound pruning would
      // be dead code that only hand-built Expressions.literal tests hit
      def lit(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[Any] = e match {
        case l: Literal[_] => l.value() match {
          case u: UTF8String => Some(u.toString)
          case v => Some(v)
        }
        case _ => None
      }
      (p.name(), kids.headOption) match {
        case ("IN", Some(f: NamedReference)) =>
          val vals = kids.tail.flatMap(lit)
          // a non-literal operand means we understood only part of the
          // set — pruning on it could drop matching rows; skip
          if (vals.length == kids.length - 1)
            Some(InSet(f.fieldNames().mkString("."), vals.toSeq))
          else None
        case ("=", Some(f: NamedReference)) =>
          kids.lift(1).flatMap(lit)
            .map(v => InSet(f.fieldNames().mkString("."), Seq(v)))
        case (">" | ">=", Some(f: NamedReference)) =>
          kids.lift(1).flatMap(lit)
            .map(v => Bound(f.fieldNames().mkString("."), Some(v), None))
        case ("<" | "<=", Some(f: NamedReference)) =>
          kids.lift(1).flatMap(lit)
            .map(v => Bound(f.fieldNames().mkString("."), None, Some(v)))
        case ("IS_NOT_NULL", Some(f: NamedReference))
            if kids.length == 1 =>
          Some(NotNull(f.fieldNames().mkString(".")))
        case _ => None
      }
    }
  }

  def asLong(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case s: java.lang.Short => Some(s.longValue)
    case _ => None
  }

  /** typed group value from a label string, or None to refuse. String
    * labels containing '%' are refused: the partitioned writer
    * Hive-escapes special characters into the directory name and the
    * manifest stores the dir name raw, so only escape-free labels
    * round-trip exactly. */
  def typedLabel(raw: String, dt: DataType): Option[Any] =
    dt match {
      case LongType => raw.toLongOption
      case IntegerType => raw.toIntOption
      case StringType if !raw.contains('%') &&
        raw != "__HIVE_DEFAULT_PARTITION__" => Some(raw)
      case _ => None
    }

  /** the `col=value` label value of `e` when one of its label's
    * segments names `col` — multi-column labels ("a=1/b=2") resolve
    * each component. Parsing is [[SnapshotLog.labelValueOf]], the one
    * label grammar every face shares. */
  def labelValue(e: SnapshotLog.FileEntry, col: String): Option[String] =
    SnapshotLog.labelValueOf(e.partition, col)

  /** can `e` possibly hold a row satisfying `c`? Label veto is exact
    * (the writer stamped the value; numeric compare when both sides
    * parse, string equality otherwise); stats veto is range-overlap;
    * everything unresolvable keeps — pruning is an optimization,
    * never a bet. */
  def survives(e: SnapshotLog.FileEntry, c: Constraint): Boolean = {
    // labels are stamped from Hive-ESCAPED directory names: a raw
    // value containing '/', '=', '%', … surfaces here as its %-escape
    // (`a/b` → `a%2Fb`), which would fail both the string and numeric
    // compares and wrongly prune the file. Mirror typedLabel's
    // refusal: an escaped label is unresolvable — fall through to the
    // stats veto (value-based, escape-free) or keep the file.
    val labelVal: Option[String] = labelValue(e, c.col)
      .filterNot(v => v.contains('%') || v == "__HIVE_DEFAULT_PARTITION__")
    c match {
      case InSet(col, vals) =>
        labelVal match {
          case Some(lv) =>
            vals.exists { v =>
              String.valueOf(v) == lv ||
                ((asLong(v), lv.toLongOption) match {
                  case (Some(a), Some(b)) => a == b
                  case _ => false
                })
            }
          case None =>
            val longVals = vals.flatMap(asLong)
            if (e.stats.contains(col) && longVals.size == vals.size)
              longVals.exists(v => e.overlaps(col, v, v))
            else if (e.strStats.contains(col))
              vals.exists(v => e.overlapsStr(col, String.valueOf(v),
                String.valueOf(v)))
            else true
        }
      case Bound(col, lo, hi) =>
        val loL = lo.flatMap(asLong)
        val hiL = hi.flatMap(asLong)
        labelVal match {
          case Some(lv) =>
            lv.toLongOption match {
              case Some(l) =>
                loL.forall(l >= _) && hiL.forall(l <= _)
              case None => (lo.orElse(hi)) match {
                // string-typed bound against a string label value
                case Some(_: String) =>
                  lo.forall(v => lv >= String.valueOf(v)) &&
                    hi.forall(v => lv <= String.valueOf(v))
                case _ => true
              }
            }
          case None =>
            if (e.stats.contains(col) && (loL.isDefined || hiL.isDefined))
              e.overlaps(col, loL.getOrElse(Long.MinValue),
                hiL.getOrElse(Long.MaxValue))
            else if (e.strStats.contains(col) &&
                (lo.orElse(hi)).exists(_.isInstanceOf[String]))
              e.overlapsStr(col,
                lo.collect { case s: String => s }.getOrElse(""),
                hi.collect { case s: String => s }
                  .getOrElse("￿￿"))
            else true
        }
      case NotNull(col) =>
        // veto only the PROVABLY all-null file: recorded rows with a
        // recorded null count equal to them. A label value (already
        // resolved above) implies the writer stamped a non-null value
        // for every row — trivially kept by the default.
        !(e.rows >= 0L && e.nullCounts.get(col).contains(e.rows))
    }
  }
}

private[sources] class SnapshotScanBuilder(full: StructType, dir: String,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  private var required: StructType = full
  private var pruningPreds: Array[Predicate] = Array.empty
  private var exactPreds: Array[Predicate] = Array.empty
  private var plannedAgg: Option[MetaAggScan] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def changeFeed = options.getBoolean("changeFeed", false)

  /** the snapshot this scan will serve, resolved ONCE at pushdown time
    * so the exact-filter and aggregate analyses below reason about the
    * same manifest the scan plans from. */
  private lazy val pinnedV: Int =
    SnapshotTables.explicitVersion(dir, options)
      .getOrElse(SnapshotTables.defaultVersion(dir))

  /** the pinned snapshot's DATA entries, read once per builder — the
    * exact-filter analysis runs per pushed predicate and must not pay
    * one manifest resolution each. */
  private lazy val pinnedData: Seq[SnapshotLog.FileEntry] =
    SnapshotLog.entries(dir, pinnedV).filter(_.kind == "D")

  /** is `p` decided EXACTLY by partition-label pruning — so Spark may
    * drop its post-scan re-check entirely? True only when every data
    * entry of the pinned snapshot is labeled by the predicate's
    * column with an integral value, the column's type is integral,
    * and every operand is an integral literal: each surviving file is
    * then label-pure (the partitioned writers stamp the label FROM
    * the column), so the scan's output contains exactly the matching
    * rows. Anything else stays a post-scan filter — full pushdown is
    * a correctness bet the manifest must be able to honor. */
  private def exactlyDecided(p: Predicate): Boolean = {
    if (changeFeed) return false
    def integralLabeled(col: String): Boolean = {
      val integralCol = full.fields.find(_.name == col).exists(f =>
        f.dataType == LongType || f.dataType == IntegerType ||
          f.dataType == ShortType)
      integralCol && pinnedData.nonEmpty &&
        pinnedData.forall(e => SnapshotPrune.labelValue(e, col)
          .exists(_.toLongOption.isDefined))
    }
    try {
      // IS_NOT_NULL rides along with every SQL equality (the analyzer
      // adds it): on a fully-labeled integral column it is exactly
      // TRUE for every row (label-pure files, null labels spell
      // __HIVE_DEFAULT_PARTITION__ and fail the parse), so claiming it
      // pushes a no-op — and unblocks aggregate pushdown, which Spark
      // only offers when zero post-scan filters remain
      if (p.name() == "IS_NOT_NULL")
        return p.children() match {
          case Array(f: NamedReference) =>
            integralLabeled(f.fieldNames().mkString("."))
          case _ => false
        }
      val cs = SnapshotPrune.parseConstraints(Array(p))
      cs.size == 1 && (cs.head match {
        case SnapshotPrune.InSet(col, vals) =>
          integralLabeled(col) &&
            vals.forall(v => SnapshotPrune.asLong(v).isDefined)
        case _ => false
      })
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  /** STATIC predicate pushdown: every predicate prunes the manifest
    * (the scan drops entries whose partition label or stats exclude
    * every possibly-matching row); predicates the label decides
    * EXACTLY are additionally claimed as fully pushed — Spark drops
    * the post-scan re-check, which is what unlocks aggregate pushdown
    * under a WHERE clause. Everything else is returned as "evaluate
    * after scan" (pruning stays an optimization, never a bet — the
    * same contract the runtime filter path holds). */
  override def pushPredicates(
      predicates: Array[Predicate]): Array[Predicate] = {
    pruningPreds = predicates
    val (exact, rest) = predicates.partition(exactlyDecided)
    exactPreds = exact
    rest
  }
  override def pushedPredicates(): Array[Predicate] = exactPreds

  // ---- aggregate pushdown: SQL answered from the manifest ----------
  // COUNT(*) / MIN / MAX (optionally grouped by the partition-label
  // column) are served from manifest row counts and stats through the
  // STANDARD plan — `SELECT count(*) FROM t GROUP BY part` on a 100 TB
  // table opens zero data files (the first query every user runs).
  // Semantics mirror the programmatic metaCount/stats machinery:
  // position-deleted tables are counted EXACTLY (distinct live-file
  // addresses subtracted, reading only churn-sized delete metadata);
  // equality vectors, missing counts, missing stats, or any grouping
  // the label can't type REFUSE the pushdown — Spark falls back to
  // the real scan, never a wrong answer.

  // Spark consults supportCompletePushDown BEFORE pushAggregation with
  // the same Aggregation — plan once, reuse by reference (Aggregation
  // holds arrays, so value equality is unreliable)
  private var plannedFor: Aggregation = _

  private def planOnce(agg: Aggregation): Option[MetaAggScan] = {
    if (!(plannedFor eq agg)) {
      plannedAgg = planAggregation(agg)
      plannedFor = agg
    }
    plannedAgg
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    planOnce(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    planOnce(agg).isDefined

  private def typedLabel(raw: String, dt: DataType): Option[Any] =
    SnapshotPrune.typedLabel(raw, dt)

  private def planAggregation(agg: Aggregation): Option[MetaAggScan] = {
    if (changeFeed) return None
    try {
      val es = SnapshotLog.entries(dir, pinnedV)
      // an equality vector suppresses rows by KEY — no metadata-only
      // answer exists for any aggregate over a vectored snapshot
      if (es.exists(_.kind == "X")) return None
      // Spark only offers aggregate pushdown when no post-scan filter
      // remains — i.e. every pushed predicate was claimed exact. Hold
      // that as a local invariant too: a non-exact predicate in play
      // here would make the per-file facts below partial answers.
      if (!pruningPreds.forall(exactPreds.contains)) return None
      val data = es.filter(e => e.kind == "D" &&
        SnapshotPrune.parseConstraints(exactPreds)
          .forall(SnapshotPrune.survives(e, _)))
      val posDeletes = es.filter(_.kind == "P")
      // grouping: none, or one column every data entry's label names
      val groupCol: Option[(String, DataType)] =
        agg.groupByExpressions() match {
          case Array() => None
          case Array(g: NamedReference) =>
            val col = g.fieldNames().mkString(".")
            val dt = full.fields.find(_.name == col).map(_.dataType)
              .getOrElse(return None)
            if (data.forall(e => SnapshotPrune.labelValue(e, col)
                .flatMap(typedLabel(_, dt)).isDefined))
              Some(col -> dt)
            else return None
          case _ => return None
        }
      // each aggregate must be answerable from the manifest
      sealed trait Served
      case object ServeCount extends Served
      case class ServeCountCol(col: String) extends Served
      case class ServeSum(col: String) extends Served
      case class ServeMin(col: String, dt: DataType) extends Served
      case class ServeMax(col: String, dt: DataType) extends Served
      def namedCol(e:
          org.apache.spark.sql.connector.expressions.Expression)
          : Option[String] = e match {
        case f: NamedReference => Some(f.fieldNames().mkString("."))
        case _ => None
      }
      val served: Seq[(Served, StructField)] =
        agg.aggregateExpressions().toSeq.map {
          case _: CountStar =>
            if (data.exists(_.rows < 0L)) return None
            (ServeCount, StructField("count", LongType, nullable = false))
          // COUNT(col) = Σ(rows − nulls): exact rows AND recorded null
          // counts on every surviving entry, and no position deletes
          // (a dead row's null-ness is a data question)
          case c: Count if !c.isDistinct && posDeletes.isEmpty =>
            val col = namedCol(c.column()).getOrElse(return None)
            if (data.exists(e =>
                e.rows < 0L || !e.nullCounts.contains(col))) return None
            (ServeCountCol(col),
              StructField("count", LongType, nullable = false))
          // SUM(col): every entry recorded an exact sum for the LONG
          // column, no deletes of either kind, and the fold must not
          // overflow (checked EAGERLY below — overflow refuses the
          // pushdown at plan time, never a wrapped answer)
          case m: Sum if !m.isDistinct && posDeletes.isEmpty &&
              data.nonEmpty =>
            val col = namedCol(m.column()).getOrElse(return None)
            val isLong = full.fields.find(_.name == col)
              .exists(_.dataType == LongType)
            if (!isLong || data.exists(e => !e.sums.contains(col)))
              return None
            (ServeSum(col), StructField("sum", LongType))
          case m: Min => minMax(m.column(), data, posDeletes)
            .map { case (c, dt) => (ServeMin(c, dt): Served,
              StructField("min", dt)) }.getOrElse(return None)
          case m: Max => minMax(m.column(), data, posDeletes)
            .map { case (c, dt) => (ServeMax(c, dt): Served,
              StructField("max", dt)) }.getOrElse(return None)
          case _ => return None // AVG/DISTINCT/…: null semantics and
            // exactness are data questions, not manifest questions
        }
      // an EMPTY aggregate list is a real plan, not a degenerate one:
      // a consumer that prunes every aggregate away (count() over the
      // faces, SELECT DISTINCT part) leaves group-by-only pushdown —
      // the groups (or the global aggregate's always-one row) must
      // still be served, or the fallback scans data the caller proved
      // deleted
      // GROUP EXISTENCE is a row question: a partition whose every row
      // is position-deleted produces NO group in SQL — deciding that
      // needs live counts, so grouped pushdown always requires
      // recorded rows (0-row entries are writer-excluded, but
      // correctness never bets on it)
      if (groupCol.isDefined && data.exists(_.rows < 0L)) return None
      // the complete-pushdown contract: readSchema = group cols then
      // aggregate columns, rows = one per (non-empty) group
      val schema = StructType(
        groupCol.map { case (c, dt) => StructField(c, dt) }.toSeq ++
          served.map(_._2))
      val computeRows: () => Seq[Seq[Any]] = () => {
        val dead: Map[String, Long] =
          if (posDeletes.isEmpty ||
              (served.forall(_._1 != ServeCount) && groupCol.isEmpty))
            Map.empty
          else MetaAggScan.deadByFile(posDeletes.map(_.path),
            data.map(e => SnapshotLog.normPath(e.path)).toSet)
        def live(g: Seq[SnapshotLog.FileEntry]): Long =
          g.map(e =>
            e.rows - dead.getOrElse(SnapshotLog.normPath(e.path), 0L))
            .sum
        val groups: Seq[(Option[Any], Seq[SnapshotLog.FileEntry])] =
          groupCol match {
            case None => Seq(None -> data)
            case Some((c, dt)) => data.groupBy(e =>
              typedLabel(SnapshotPrune.labelValue(e, c).get, dt).get)
              .toSeq.map { case (k, g) => (Some(k): Option[Any]) -> g }
              // SQL group semantics: zero live rows ⇒ no group row
              .filter { case (_, g) => live(g) > 0L }
          }
        groups.map { case (k, g) =>
          k.toSeq ++ served.map {
            case (ServeCount, _) => live(g): Any
            case (ServeCountCol(c), _) =>
              g.map(e => e.rows - e.nullCounts(c))
                .foldLeft(0L)(Math.addExact): Any
            case (ServeSum(c), _) =>
              g.map(_.sums(c)).foldLeft(0L)(Math.addExact): Any
            case (ServeMin(c, dt), _) => dt match {
              case LongType => g.map(_.stats(c)._1).min: Any
              case _ => g.map(_.strStats(c)._1).min: Any
            }
            case (ServeMax(c, dt), _) => dt match {
              case LongType => g.map(_.stats(c)._2).max: Any
              case _ => g.map(_.strStats(c)._2).max: Any
            }
          }
        }
      }
      // EAGER evaluation ONLY for the overflow-sensitive folds: a SUM
      // or COUNT(col) whose Math.addExact fold overflows must throw
      // HERE, where the enclosing catch turns it into a refusal (the
      // fallback scan computes the true answer, never a wrapped one).
      // Both folds refuse under position deletes, so the eager run
      // never decodes a delete file. Every other shape stays LAZY:
      // deadByFile's churn-sized position-delete decode runs when the
      // scan executes, not during every pushAggregation probe Spark
      // may ultimately discard.
      val overflowSensitive = served.exists(s =>
        s._1.isInstanceOf[ServeSum] || s._1.isInstanceOf[ServeCountCol])
      val rowsFn: () => Seq[Seq[Any]] =
        if (overflowSensitive) { val rows = computeRows(); () => rows }
        else () => {
          // post-plan failures (e.g. a position-delete file that no
          // longer decodes) can't be refused into the fallback scan —
          // the plan is already committed to the metadata answer.
          // Rethrow with enough context to tell this apart from a
          // data-path read error instead of surfacing a bare cause.
          try computeRows()
          catch { case scala.util.control.NonFatal(t) =>
            throw new IllegalStateException(
              s"metadata-aggregate scan over $dir@$pinnedV failed after " +
                "planning (the fallback scan is only available at plan " +
                "time)", t)
          }
        }
      Some(new MetaAggScan(schema, rowsFn))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** MIN/MAX over `col` is manifest-answerable when NO delete file
    * exists (either kind could remove the extreme row), the column is
    * a plain reference, and EVERY surviving data entry carries bounds
    * for it (LONG stats or string bounds — absent means an all-null
    * file or a truncated bound, both unanswerable). */
  private def minMax(colExpr:
      org.apache.spark.sql.connector.expressions.Expression,
      data: Seq[SnapshotLog.FileEntry],
      posDeletes: Seq[SnapshotLog.FileEntry])
      : Option[(String, DataType)] = colExpr match {
    case f: NamedReference if posDeletes.isEmpty && data.nonEmpty =>
      val col = f.fieldNames().mkString(".")
      full.fields.find(_.name == col).map(_.dataType) match {
        case Some(LongType) if data.forall(_.stats.contains(col)) =>
          Some(col -> LongType)
        case Some(StringType) if data.forall(_.strStats.contains(col)) =>
          Some(col -> StringType)
        case _ => None
      }
    case _ => None
  }

  override def build(): Scan = plannedAgg.getOrElse {
    // when a predicate was claimed FULLY pushed, the scan must execute
    // against the exact manifest the exactness proof was computed from
    // — re-resolving the head at plan time could adopt a concurrent
    // commit's unlabeled entries with the WHERE re-check already
    // dropped by Spark. Explicit pins win; otherwise the exact-filter
    // path pins the analyzed version, and the plain path keeps
    // resolving the head (fresh reads for unpinned consumers).
    val pin = SnapshotTables.explicitVersion(dir, options)
      .orElse(if (exactPreds.nonEmpty) Some(pinnedV) else None)
    new SnapshotScan(
      dir,
      pin,
      changeFeed,
      options.getInt("startingVersion", 0),
      full, required, pruningPreds,
      options.getLong("maxDeltaRows", 1000000L),
      options.getLong("splitTargetBytes", 128L * 1024 * 1024),
      options.getBoolean("rowMode", false),
      options.getBoolean("parquetFilter", true),
      options.getBoolean("pageFilter", false))
  }
}

/** one literal result partition for a manifest-served aggregate. */
private[sources] case class MetaAggPartition(rows: Seq[Seq[Any]])
    extends InputPartition

/** A scan whose OUTPUT is the completely-pushed-down aggregation,
  * computed from the manifest on the driver (metadata-sized) and
  * served as one literal partition — zero data files opened, which
  * the driver query proves by deleting them first. */
private[sources] class MetaAggScan(schema: StructType,
    compute: () => Seq[Seq[Any]]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftMetaAgg[${schema.fieldNames.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(MetaAggPartition(compute()))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[MetaAggPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            new GenericInternalRow(rows(i).map {
              case s: String => UTF8String.fromString(s)
              case v => v
            }.toArray[Any])
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] object MetaAggScan {
  /** distinct dead-row counts per LIVE data file from position-delete
    * parquet files — read directly (churn-sized delete METADATA, no
    * SparkSession, no data file touched). Addresses naming files no
    * longer referenced are inert, matching readMor. */
  def deadByFile(posPaths: Seq[String],
      live: Set[String]): Map[String, Long] = {
    val seen = new java.util.HashMap[String,
      java.util.HashSet[java.lang.Long]]()
    posPaths.foreach { p =>
      val reader = ParquetReader.builder(
        new GroupReadSupport(), new Path(p))
        .withConf(new Configuration()).build()
      try {
        var g = reader.read()
        while (g != null) {
          if (g.getFieldRepetitionCount("file_path") > 0) {
            val f = SnapshotLog.normPath(
              g.getBinary("file_path", 0).toStringUsingUTF8)
            if (live(f))
              seen.computeIfAbsent(f,
                _ => new java.util.HashSet[java.lang.Long]())
                .add(g.getLong("row_pos", 0))
          }
          g = reader.read()
        }
      } finally reader.close()
    }
    import scala.jdk.CollectionConverters._
    seen.asScala.map { case (k, v) => k -> v.size.toLong }.toMap
  }
}

/** one BYTE RANGE of one snapshot data file (the Hadoop split model:
  * a range reader serves the row groups whose midpoint falls inside
  * [start, start+length)), plus the equality-delete vectors whose key
  * tuples suppress this file's rows (only vectors with seq STRICTLY
  * ABOVE the file's — applicability is resolved at PLAN time, so the
  * reader never sees an out-of-scope vector). `length = -1` means
  * "the whole file" (resolved executor-side for legacy entries whose
  * manifest carries no byte size). */
private[sources] case class SnapChunk(path: String, start: Long,
    length: Long, eqDeletes: Seq[String] = Nil)

/** one scan task: one or more file chunks (a big file splits into
  * several ranges; small files coalesce into one task — both decided
  * at plan time from the manifest's own byte sizes), the op/commit
  * stamp the change-feed rows carry ("" op for plain batch reads),
  * and the position-delete files whose addresses subtract from these
  * files' physical rows. All delete inputs are churn-sized by the
  * delete contract. */
private[sources] case class SnapFilePartition(chunks: Seq[SnapChunk],
    op: String, commit: Long,
    posDeletes: Seq[String] = Nil) extends InputPartition {
  private[sources] def paths: Seq[String] = chunks.map(_.path)
}

private[sources] object SnapFilePartition {
  /** the one-whole-file task every non-batch face plans. */
  def one(path: String, op: String, commit: Long,
      posDeletes: Seq[String] = Nil,
      eqDeletes: Seq[String] = Nil): SnapFilePartition =
    SnapFilePartition(Seq(SnapChunk(path, 0L, -1L, eqDeletes)), op,
      commit, posDeletes)
}

/** a scan task that KNOWS its partition key ([[HasPartitionKey]]) —
  * what storage-partitioned joins ride on: Spark groups tasks by key
  * and aligns two scans reporting the same KeyGroupedPartitioning
  * into an exchange-free join. The key is the ORDERED tuple of the
  * reported partition columns' values (one value for a single-column
  * spec, several for a multi-column one); all chunks of a keyed task
  * share it (the planner never mixes key values into a bin). */
private[sources] final class KeyedSnapFilePartition(
    chunks: Seq[SnapChunk], op: String, commit: Long,
    posDeletes: Seq[String], keyVals: Seq[Any])
    extends SnapFilePartition(chunks, op, commit, posDeletes)
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(keyVals.map {
      case s: String => (UTF8String.fromString(s): Any)
      case v => (v: Any)
    }.toArray)
}

/** a plan-time-computed logical delta (the COW/pos-delete U-split):
  * key tuples + op, churn-sized, carried as literal rows. */
private[sources] case class SnapRowsPartition(keyCols: Seq[String],
    rows: Seq[(Array[Any], String)], commit: Long) extends InputPartition

private class SnapshotScan(dir: String, versionAsOf: Option[Int],
    changeFeed: Boolean, startingVersion: Int,
    full: StructType, required: StructType,
    staticPreds: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate] =
      Array.empty,
    maxDeltaRows: Long = 1000000L,
    splitTargetBytes: Long = 128L * 1024 * 1024,
    // benchmark escape hatch: option("rowMode","true") forces the
    // row-at-a-time reader so the columnar path's gain is MEASURED,
    // not asserted (SCALING.md records the head-to-head)
    rowMode: Boolean = false,
    // measurement escape hatch: option("parquetFilter","false") keeps
    // predicates out of the parquet read so the row-group-skipping
    // gain is measured, not asserted
    pushParquetFilter: Boolean = true,
    // opt-in page-level (column-index) filtering: widens the parquet
    // request by the filter columns so the page evaluation is sound;
    // default off — the widened decode usually costs more than the
    // finer-than-stats skip buys (ScanBench records both faces)
    pageFilter: Boolean = false) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = required

  // ---- storage-partitioned joins (SPJ) ------------------------------
  // When EVERY data entry of the pinned snapshot is labeled by the
  // same ORDERED column list with typed values, the scan reports its
  // layout as KeyGroupedPartitioning over those columns and every
  // task knows its key tuple: two lake tables partitioned the same
  // way then join with ZERO exchanges on either side (under
  // spark.sql.sources.v2.bucketing.enabled) — the Iceberg SPJ
  // contract, incl. multi-key specs, and the difference between
  // shuffling two 100-TB fact tables and shuffling nothing. Mixed
  // spec eras (S47: entries labeled by different columns), unlabeled
  // entries, escape-bearing labels, and any pruned-away partition
  // column all refuse the report conservatively — Spark just plans
  // the ordinary exchange.

  /** the groupable partition columns: non-empty only when every data
    * entry's label names the SAME ordered column list with values
    * each column's type parses exactly, and the scan still SERVES
    * every one of them (Spark resolves the key expressions against
    * the pruned output schema). */
  private lazy val groupCols: Seq[(String, DataType)] = {
    if (changeFeed) Nil
    else {
      val v = versionAsOf.getOrElse(SnapshotTables.defaultVersion(dir))
      // the cached one-pass summary, not a fresh walk: planning asks
      // for groupCols / filterAttributes / outputPartitioning on every
      // plan of the same pinned version, and the label shape is a
      // label-cardinality-sized fact, not a per-file one
      val sum = SnapshotLog.labelSummary(dir, v)
      sum.sigs match {
        case Seq(cols) if cols.nonEmpty =>
          val typed = cols.map(c =>
            required.fields.find(_.name == c).map(f => c -> f.dataType))
          if (typed.exists(_.isEmpty)) Nil
          else {
            val ts = typed.map(_.get)
            // typed-parse check over the DISTINCT partition strings —
            // labelValue is a pure function of the label, so checking
            // each distinct label once is the per-entry check
            if (ts.forall { case (c, dt) =>
              sum.parts.forall(p => SnapshotLog.labelValueOf(p, c)
                .flatMap(SnapshotPrune.typedLabel(_, dt)).isDefined)
            }) ts
            else Nil
          }
        case _ => Nil
      }
    }
  }

  /** one entry's TYPED key tuple under [[groupCols]] (defined for
    * every data entry whenever groupCols is non-empty) — memoized per
    * DISTINCT partition string (they are interned by the manifest
    * parser), so a million-entry plan parses each label once. */
  private val typedKeyMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Any]]()
  private def typedKeyOf(e: SnapshotLog.FileEntry): Seq[Any] =
    typedKeyMemo.computeIfAbsent(e.partition,
      p => groupCols.map { case (c, dt) => SnapshotLog.labelValueOf(p, c)
        .flatMap(SnapshotPrune.typedLabel(_, dt)).get })

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    groupCols match {
      case cols if cols.nonEmpty =>
        val v = versionAsOf.getOrElse(SnapshotTables.defaultVersion(dir))
        // n = the distinct TYPED key tuples surviving static AND
        // runtime pruning — the SAME predicate set the task planner
        // prunes by, so the declared count cannot drift from the
        // planned partitions when a DPP value set lands before
        // planning (runtimeConstraints is Nil until filter(), so the
        // pre-runtime declaration is unchanged). Typed tuples, not raw
        // label strings ("m=1" vs "m=01").
        val rcs = runtimeConstraints
        val n = dataStatic.filter(e => rcs.forall(survives(e, _)))
          .map(typedKeyOf).distinct.size
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            cols.map(c => org.apache.spark.sql.connector.expressions
              .Expressions.identity(c._1)).toArray, n)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  // ---- runtime filtering (DPP for lake tables) ----------------------
  // Spark hands the scan the JOIN-KEY value set it computed at runtime
  // (the dynamic-partition-pruning broadcast); entries whose partition
  // label or manifest stats exclude every value are dropped BEFORE the
  // batch plans its input partitions — a dimension-filtered join over
  // a 100 TB snapshot table reads only the partitions the dim selects,
  // with zero data files opened to decide. Purely an optimization:
  // unlabeled entries, foreign-label columns, and entries without
  // stats are kept conservatively (Spark re-applies the join itself).

  /** runtime-prunable columns: anything a manifest entry can veto on —
    * partition-label columns, INT64 stats columns, string-bound
    * columns. Computed from the pinned manifest (metadata-sized). */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    if (changeFeed) return Array.empty
    val v = versionAsOf.getOrElse(SnapshotTables.defaultVersion(dir))
    val sum = SnapshotLog.labelSummary(dir, v)
    // Spark resolves these against the scan's (column-pruned) OUTPUT —
    // offering a pruned-away column would fail analysis
    val served = required.fieldNames.toSet
    (sum.labelCols ++ sum.statCols ++ sum.strStatCols)
      .distinct.filter(served)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray
  }

  /** static constraints from the pushed-down predicates (fixed at
    * build time) and runtime constraints from DPP (populated by
    * [[filter]]); an entry must survive BOTH sets. */
  private val staticConstraints: Seq[SnapshotPrune.Constraint] =
    SnapshotPrune.parseConstraints(staticPreds)
  private var runtimeConstraints: Seq[SnapshotPrune.Constraint] = Nil

  /** the DATA entries surviving the STATIC constraints, folded once
    * per scan: outputPartitioning (possibly queried several times)
    * and planInputPartitions otherwise each re-walk the full entry
    * list re-checking the fixed static set per entry; only the
    * runtime (DPP) re-filter varies after build. Per-scan lazy — no
    * global cache to pin entry lists beyond the parse caches'
    * budgets. */
  private lazy val dataStatic: Seq[SnapshotLog.FileEntry] = {
    val v = versionAsOf.getOrElse(SnapshotTables.defaultVersion(dir))
    SnapshotLog.entries(dir, v).filter(e =>
      e.kind == "D" && staticConstraints.forall(survives(e, _)))
  }

  override def filter(
      predicates: Array[
        org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit =
    runtimeConstraints = SnapshotPrune.parseConstraints(predicates)

  private def survives(e: SnapshotLog.FileEntry,
      c: SnapshotPrune.Constraint): Boolean = SnapshotPrune.survives(e, c)

  /** Statistics from the MANIFEST ALONE: file sizes are the bytes the
    * committing writer recorded (`FileEntry.bytes` — the Iceberg
    * `file_size_in_bytes` field), so planning performs ZERO filesystem
    * stats at any file count ([[SnapshotLog.sizeOf]] touches the
    * filesystem only for pre-bytes legacy entries). A snapshot-log
    * table joins like a native table — Catalyst sees its true size and
    * auto-broadcasts a small snapshot against a big fact scan, the
    * decision every dimension-table join at 100 TB depends on.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    // statistics reflect STATIC pruning: a WHERE-filtered lake scan
    // reports the surviving entries' size, so Catalyst can broadcast
    // a small selected slice of a huge table — the join decision at
    // 100 TB. Row counts come from the manifest when every survivor
    // recorded one (delete vectors make counts an over-statement —
    // still a sound upper bound for planning). The survivor fold is
    // MEMOIZED per (manifest identity, constraint set): every plan of
    // the same pinned version asks for statistics, and re-walking a
    // million entries per plan was the last repeated O(files) pass on
    // the plan path.
    val (bytes, rows) =
      if (changeFeed) (-1L, -1L)
      else {
        val v = versionAsOf.getOrElse(SnapshotTables.defaultVersion(dir))
        SnapshotTables.statsFor(dir, v, staticConstraints)
      }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (bytes < 0L) java.util.OptionalLong.empty()
        else java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        if (rows < 0L) java.util.OptionalLong.empty()
        else java.util.OptionalLong.of(rows)
    }
  }
  override def toBatch: Batch = {
    require(!changeFeed,
      "changeFeed=true is a STREAMING read (use readStream); the batch " +
        "diff lives in the engine's changeFeed operator")
    this
  }
  override def planInputPartitions(): Array[InputPartition] = {
    val v = versionAsOf.getOrElse(SnapshotTables.defaultVersion(dir))
    val es = SnapshotLog.entries(dir, v)
    // BOTH merge-on-read flavors apply inside each partition's reader:
    // POSITION deletes name their file (no join needed), and EQUALITY
    // vectors are churn-sized key sets — each reader loads the vectors
    // that apply to ITS file (seq strictly above the file's, resolved
    // here at plan time: the Iceberg sequence-number rule) and filters
    // rows by key-tuple membership. Same semantics as readMor's
    // broadcast anti-join, executed as a per-task hash probe.
    val eqVecs = es.filter(_.kind == "X")
    val posDeletes = es.filter(_.kind == "P").map(_.path)
    val rcs = runtimeConstraints
    val data = dataStatic.filter(e => rcs.forall(survives(e, _)))
    def keyOf(e: SnapshotLog.FileEntry): Option[Seq[Any]] =
      if (groupCols.isEmpty) None else Some(typedKeyOf(e))
    // the equality vectors applying to each file, resolved seq-scoped
    // at PLAN time (the Iceberg sequence rule) — the reader never sees
    // an out-of-scope vector
    def vecsFor(e: SnapshotLog.FileEntry): Seq[String] =
      eqVecs.filter(_.seq > e.seq).map(_.path).sorted
    if (rowMode)
      // benchmark escape hatch: one whole-file task each (row-mode
      // `_pos` counts physical rows from the file start, so byte
      // ranges are columnar-only). Tasks still carry their partition
      // key when the layout is groupable, so SPJ survives.
      data.map { e =>
        (keyOf(e) match {
          case Some(k) => new KeyedSnapFilePartition(
            Seq(SnapChunk(e.path, 0L, -1L, vecsFor(e))), "", v,
            posDeletes, k)
          case None => SnapFilePartition.one(e.path, "", v, posDeletes,
            vecsFor(e))
        }): InputPartition
      }.toArray
    else
      // target task size for splitting big files and coalescing small
      // ones (the Iceberg read.split.target-size idea); the scan
      // option "splitTargetBytes" tunes it
      SnapshotScanPlanner.plan(data, v, posDeletes,
        splitTargetBytes, groupCols, vecsFor, typedKeyOf).toArray
  }

  /** every BATCH read is COLUMNAR: batches come straight from Spark's
    * vectorized parquet reader, position deletes apply as a per-batch
    * row-index mask, equality vectors as per-batch KEY PROBES over the
    * same cached churn-sized tuple sets the row path uses, and
    * whole-stage codegen above consumes ColumnarBatch input — the
    * decode constant a 100-TB scan pays on a row-at-a-time path.
    * Change-feed reads (op-stamped deltas) and the `rowMode` bench
    * escape hatch keep the row reader. */
  override def createReaderFactory(): PartitionReaderFactory = {
    val v = versionAsOf.getOrElse(SnapshotTables.defaultVersion(dir))
    // the pushed predicates ride to the executors as the SAME parsed
    // constraints the manifest pruning used (runtime/DPP sets included
    // when populated by now) — each ChunkReader re-translates them
    // against ITS file's schema into a parquet FilterPredicate.
    // Row-mode reads never push: the row reader derives `_pos` by
    // counting rows from the file start, which group skipping breaks.
    val cs =
      if (pushParquetFilter && !rowMode)
        staticConstraints ++ runtimeConstraints
      else Nil
    new SnapshotReaderFactory(required, SnapshotLog.renamesOf(dir, v),
      columnar = !changeFeed && !rowMode, constraints = cs,
      pageFilter = pageFilter)
  }
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(changeFeed,
      "streaming a graft-snapshot table needs option(\"changeFeed\", " +
        "\"true\") — the stream replays commit deltas, not table state")
    new SnapshotChangeStream(dir, startingVersion, required,
      maxDeltaRows)
  }
}

/** Scan-task planning from the manifest's own byte sizes: files above
  * ~1.5x the target split into row-group-aligned byte ranges (the
  * Hadoop split rule: a range serves the row groups whose midpoints
  * fall inside it — ranges partition the file, so every row group is
  * served exactly once), and small files BIN-PACK into shared tasks.
  * Without this, one 10 GB file is one straggler task and a million
  * tiny files are a million scheduler entries; with it, task count
  * tracks ceil(bytes/target) at any file-size distribution. Pure
  * metadata — zero filesystem calls at plan time (legacy entries
  * without recorded bytes stay one-task-per-file, conservatively).
  */
private[sources] object SnapshotScanPlanner {
  /** with `groupCols` set (the SPJ-groupable layout), bins never mix
    * key tuples and every task carries its key. */
  def plan(data: Seq[SnapshotLog.FileEntry], commit: Long,
      posDeletes: Seq[String], targetBytes: Long,
      groupCols: Seq[(String, DataType)] = Nil,
      vecsFor: SnapshotLog.FileEntry => Seq[String] = _ => Nil,
      // the caller's (memoized) key extractor — defaults to a plain
      // per-entry parse for direct/test callers
      keyOf: SnapshotLog.FileEntry => Seq[Any] = null)
      : Seq[InputPartition] = {
    // ADAPTIVE task size (the Iceberg adaptive-split-size idea): the
    // configured target is a CEILING for big tables, but packing a
    // small table into 128 MiB bins would idle the cluster — measured
    // 0.84x on the scan head-to-head when 12 files collapsed into one
    // task. Aim for at least default-parallelism tasks when the bytes
    // allow (a single medium file then SPLITS into ranges), floored at
    // 1 MiB so a tiny table never plans thousand-way confetti.
    val total = data.map(e =>
      if (e.bytes >= 0L) e.bytes else targetBytes).sum
    val par = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.defaultParallelism).getOrElse(32).max(1)
    val adaptive = math.max(1L * 1024 * 1024,
      math.min(targetBytes, math.max(1L, total / par)))
    if (groupCols.isEmpty)
      planOne(data, commit, posDeletes, adaptive, None, vecsFor)
    else {
      val kf: SnapshotLog.FileEntry => Seq[Any] =
        if (keyOf != null) keyOf
        else e => groupCols.map { case (c, dt) =>
          SnapshotPrune.labelValue(e, c)
            .flatMap(SnapshotPrune.typedLabel(_, dt)).get
        }
      data.groupBy(kf)
        .toSeq.sortBy(_._1.mkString("/"))
        .flatMap { case (k, g) =>
          planOne(g, commit, posDeletes, adaptive, Some(k), vecsFor)
        }
    }
  }

  private def planOne(data: Seq[SnapshotLog.FileEntry], commit: Long,
      posDeletes: Seq[String], targetBytes: Long,
      key: Option[Seq[Any]],
      vecsFor: SnapshotLog.FileEntry => Seq[String]): Seq[InputPartition] = {
    // (chunk, weight): weight drives the bin-packing below
    val chunks: Seq[(SnapChunk, Long)] = data.sortBy(_.path).flatMap { e =>
      if (e.bytes > targetBytes * 3 / 2 && e.splitOffsets.size > 1) {
        // GROUP-ALIGNED ranges from the manifest's recorded offsets
        // (the Iceberg split_offsets): consecutive row groups
        // accumulate to ~target, each range holds whole groups — no
        // empty range, no straggler holding two groups by midpoint
        // accident (measured 1.44x vs the native source before this)
        val offs = e.splitOffsets
        val starts = scala.collection.mutable.ArrayBuffer(offs.head)
        offs.tail.foreach { o =>
          if (o - starts.last >= targetBytes) starts += o
        }
        val vecs = vecsFor(e)
        starts.toSeq.zipWithIndex.map { case (st, i) =>
          if (i == starts.size - 1)
            (SnapChunk(e.path, st, -1L, vecs), e.bytes - st)
          else (SnapChunk(e.path, st, starts(i + 1) - st, vecs),
            starts(i + 1) - st)
        }
      } else if (e.bytes > targetBytes * 3 / 2) {
        // no recorded offsets (legacy entry): blind midpoint ranges —
        // every group served exactly once, alignment best-effort
        val n = ((e.bytes + targetBytes - 1) / targetBytes).toInt
        val step = e.bytes / n
        val vecs = vecsFor(e)
        (0 until n).map { i =>
          val s = i.toLong * step
          // the LAST range runs to EOF (-1), so a tail row group is
          // served even if the true size exceeds the recorded bytes
          val len = if (i == n - 1) -1L else step
          (SnapChunk(e.path, s, len, vecs),
            if (i == n - 1) e.bytes - s else step)
        }
      } else
        // unknown size (legacy entry): weigh as one full task so it
        // never coalesces with anything
        Seq((SnapChunk(e.path, 0L, -1L, vecsFor(e)),
          if (e.bytes >= 0L) e.bytes else targetBytes))
    }
    val bins = scala.collection.mutable.ArrayBuffer.empty[Seq[SnapChunk]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[SnapChunk]
    var curW = 0L
    chunks.foreach { case (c, w) =>
      if (cur.nonEmpty && curW + w > targetBytes) {
        bins += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty
        curW = 0L
      }
      cur += c; curW += w
    }
    if (cur.nonEmpty) bins += cur.toSeq
    bins.toSeq.map(cs => (key match {
      case Some(k) =>
        new KeyedSnapFilePartition(cs, "", commit, posDeletes, k)
      case None => SnapFilePartition(cs, "", commit, posDeletes)
    }): InputPartition)
  }
}

/** Offset = the last snapshot id whose delta has been delivered. */
private[sources] case class SnapshotOffset(version: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** The change-feed MicroBatchStream: offsets are SNAPSHOT IDS, one
  * commit per micro-batch (admission control), so a restart resumes at
  * the exact commit boundary the checkpoint recorded and a replayed
  * epoch re-plans the identical file list — idempotent by construction
  * since manifests are immutable.
  */
private[sources] class SnapshotChangeStream(dir: String,
    startingVersion: Int, required: StructType,
    maxDeltaRows: Long = 1000000L)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset =
    SnapshotOffset(startingVersion.toLong)
  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[SnapshotOffset].version
    // one COMMIT per micro-batch regardless of the row limit: the
    // commit is the exactly-once unit the offsets are defined over
    SnapshotOffset(math.min(SnapshotLog.latest(dir).toLong, from + 1))
  }
  override def reportLatestOffset(): Offset =
    SnapshotOffset(SnapshotLog.latest(dir).toLong)
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].version
    val e = end.asInstanceOf[SnapshotOffset].version
    ((s + 1) to e).flatMap { v =>
      // branch-STAGED commits never enter the published change feed
      // (the same isolation the batch default read enforces); their
      // content reaches consumers only through commits that follow the
      // publish. Skipped, not refused: offsets stay contiguous.
      if (SnapshotLog.refOf(dir, v.toInt).nonEmpty) Nil
      else planCommitDelta(v)
    }.toArray
  }

  private def planCommitDelta(v: Long): Seq[InputPartition] = {
    val prev =
      if (v <= 1) Nil else SnapshotLog.entries(dir, (v - 1).toInt)
    val cur = SnapshotLog.entries(dir, v.toInt)
    val prevPaths = prev.map(_.path).toSet
    val curPaths = cur.map(_.path).toSet
    val removed = prev.filterNot(x => curPaths(x.path))
    val added = cur.filterNot(x => prevPaths(x.path))
    // rewrite transitions (COW merge, compaction, bin-pack) and
    // position-delete commits cannot be replayed from file lists alone
    // — pairing old/new rows into the U-split needs the table's
    // LOGICAL KEYS. Tables that declared them (#keys) get the exact
    // batch diff, computed once at plan time over just the rewritten
    // partitions and collected (churn-sized by construction — the
    // diff's output is the commit's logical delta, not its bytes).
    // Undeclared tables keep the loud refusal.
    val needsDiff = removed.exists(_.kind == "D") ||
      added.exists(_.kind == "P")
    if (!needsDiff)
      added.map {
        case x if x.kind == "D" =>
          SnapFilePartition.one(x.path, "I", v): InputPartition
        case x => SnapFilePartition.one(x.path, "D", v)
      }
    else SnapshotLog.keysOf(dir, v.toInt) match {
      case None =>
        throw new IllegalArgumentException(
          s"commit v$v of $dir rewrites data files (copy-on-write) or " +
            "adds position deletes; replaying it as a change feed " +
            "needs the table's logical keys — declare them with " +
            "SnapshotLog.commitKeysChange, or use the batch changeFeed")
      case Some(keys) =>
        val s = org.apache.spark.sql.SparkSession.active
        // BOUNDED plan-time collect: the diff is churn-sized for
        // CDC-shaped commits, but a pathological COW rewrite (half the
        // table changed in one commit) would ship that half through
        // the driver — cap it (option "maxDeltaRows", default 1M rows)
        // and fail LOUDLY pointing at the batch changeFeed, which
        // computes the same delta distributed
        val diff = graft.operators.ChangeDiff
          .diffKeys(s, dir, (v - 1).toInt, v.toInt, keys)
          // saturating: maxDeltaRows = Long.MaxValue ("no cap") must
          // not wrap to limit(0) and silently empty every delta
          .limit(math.min(maxDeltaRows, Int.MaxValue - 2L).toInt + 1)
          .collect()
        if (diff.length > maxDeltaRows) throw new IllegalStateException(
          s"commit v$v of $dir changes more than maxDeltaRows=" +
            s"$maxDeltaRows keys — too large to stream as a plan-time " +
            "delta; raise option(\"maxDeltaRows\", ...) or consume " +
            "this commit through the batch changeFeed")
        if (diff.isEmpty) Nil // e.g. a compaction: zero logical change
        else Seq(SnapRowsPartition(keys,
          diff.map(r => (keys.indices.map(r.get).toArray,
            r.getString(keys.size))).toSeq, v))
    }
  }
  // change-feed batches decode COLUMNAR too: commit deltas ride the
  // same vectorized chunk reader (`_op`/`_commit` as constant
  // vectors), and plan-time U-split deltas (SnapRowsPartition) are
  // served as literal in-memory batches — every partition shape
  // answers columnar, so a mixed multi-commit range can never trip
  // Spark's no-mixing rule
  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotReaderFactory(required, columnar = true)
  override def commit(
      end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** one equality vector's in-memory form: its key column names (as
  * the vector file spells them) and the canonicalized key tuples. */
private[sources] final case class VecSet(keyCols: Seq[String],
    tuples: java.util.HashSet[Seq[Any]]) {
  /** primitive probe set for the single-LONG-key common case (built
    * once per decoded vector, shared by every task via the vector
    * cache); null when the vector has composite or non-long keys —
    * callers fall back to the generic tuple probe. */
  lazy val singleLongSet: LongHashSet =
    if (keyCols.size != 1) null
    else {
      val s = new LongHashSet(tuples.size())
      val it = tuples.iterator()
      var ok = true
      while (ok && it.hasNext) it.next().head match {
        case l: Long => s.add(l)
        case _ => ok = false
      }
      if (ok) s else null
    }
}

/** equality-vector decode shared by the ROW and COLUMNAR readers —
  * one canonical form, one cache, no drift between the paths. */
private[sources] object EqVectors {
  /** load one equality-delete file into a key-tuple set — churn-sized
    * by the delete contract, so a per-executor in-memory set is
    * in-model; decoded ONCE per executor (immutable-file cache).
    * Tuples containing null are DROPPED: a null key matches nothing
    * under the anti-join contract, so keeping them could only cost
    * memory, never change an answer. */
  def load(path0: String): VecSet =
    DeleteFileCaches.boundedPut(DeleteFileCaches.vecs, path0, load0)

  private def load0(path: String): VecSet = {
    import scala.jdk.CollectionConverters._
    val schema = SnapshotTables.footerSchema(path)
    val keyCols = schema.getFields.asScala.map(_.getName).toSeq
    val set = new java.util.HashSet[Seq[Any]]()
    val reader = ParquetReader.builder(
      new GroupReadSupport(), new Path(path))
      .withConf(new Configuration()).build()
    try {
      var g = reader.read()
      while (g != null) {
        val t = keyCols.map(canonValue(g, _))
        if (!t.contains(null)) set.add(t)
        g = reader.read()
      }
    } finally reader.close()
    VecSet(keyCols, set)
  }

  /** one Group field as a CANONICAL comparison value (long / double /
    * string / boolean — ints widened, floats widened, binary as UTF-8)
    * so key tuples compare equal across physically-divergent files.
    * An UNSUPPORTED physical type (FIXED_LEN_BYTE_ARRAY decimals,
    * INT96 timestamps, …) in a vector KEY column refuses loudly —
    * silently returning null here would make the vector delete
    * nothing and deleted rows resurrect. A truly ABSENT value
    * (missing field / null) stays null: a null key matches nothing
    * under the anti-join contract. */
  def canonValue(g: Group, field: String): Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    if (!g.getType.containsField(field) ||
        g.getFieldRepetitionCount(field) == 0) null
    else g.getType.getType(field).asPrimitiveType()
        .getPrimitiveTypeName match {
      case INT64 => g.getLong(field, 0)
      case INT32 => g.getInteger(field, 0).toLong
      case DOUBLE => g.getDouble(field, 0)
      case FLOAT => g.getFloat(field, 0).toDouble
      case BOOLEAN => g.getBoolean(field, 0)
      case BINARY => g.getBinary(field, 0).toStringUsingUTF8
      case other => throw new IllegalArgumentException(
        s"graft-snapshot: equality-delete key column $field has " +
          s"unsupported parquet physical type $other — cannot compare " +
          "key tuples; rewrite the vector with a supported key type")
    }
  }

  /** the CANONICAL Spark type a file field must be requested at so a
    * columnar probe extracts exactly [[canonValue]]'s widened form. */
  def canonSparkType(p: PrimitiveType): DataType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    p.getPrimitiveTypeName match {
      case INT64 | INT32 => LongType
      case DOUBLE | FLOAT => DoubleType
      case BOOLEAN => BooleanType
      case BINARY => StringType
      case other => throw new IllegalArgumentException(
        s"graft-snapshot: equality-delete key column ${p.getName} has " +
          s"unsupported parquet physical type $other — cannot compare " +
          "key tuples; rewrite the vector with a supported key type")
    }
  }
}

/** Executor-side caches of DECODED delete files — the per-executor
  * analogue of a broadcast: vector and position-delete files are
  * immutable once committed, so each executor JVM pays one load per
  * file instead of one per task (without this, a scan over F files
  * re-decodes every vector F times — measured 17.6x/10x on the MOR
  * readback before the cache, ~linear after). Bounded LRU, 512
  * entries per cache: a scan touching more distinct delete files
  * evicts only the least-recently-used decode (a re-read, never a
  * wrong answer) instead of thrashing the whole cache mid-scan. Each
  * entry is churn-sized by the delete contract, so the 512-entry
  * bound is also an approximate memory bound. */
private object DeleteFileCaches {
  private val MaxEntries = 512
  private def lru[V](): java.util.Map[String, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, V](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, V]): Boolean =
          size() > MaxEntries
      })
  val vecs: java.util.Map[String, VecSet] = lru[VecSet]()
  /** pos-delete path → (normalized data path → dead row positions) */
  val pos: java.util.Map[String,
    java.util.HashMap[String, java.util.HashSet[java.lang.Long]]] = lru()
  // PER-KEY load serialization: a cold vector file must decode ONCE
  // per executor even when 32 tasks hit it simultaneously — without
  // this, every cold task holds its own multi-million-tuple decode in
  // flight before the put (32 concurrent duplicates of a large vector
  // OOMed the x100 probe; ConcurrentHashMap.computeIfAbsent gave the
  // old cache this property per bucket for free)
  private val loading =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  def boundedPut[V](m: java.util.Map[String, V],
      k: String, f: String => V): V = {
    val hit = m.get(k)
    if (hit != null) return hit
    val lock = loading.computeIfAbsent(k, _ => new Object)
    lock.synchronized {
      // the lock entry is removed in finally: a loader that THROWS
      // (corrupt/expired delete file) must not leave its lock object
      // in `loading` forever — repeated failures across distinct keys
      // would grow the map unboundedly
      try {
        val again = m.get(k)
        if (again != null) again
        else {
          val v = f(k)
          m.put(k, v)
          v
        }
      } finally loading.remove(k)
    }
  }
}

/** Executor-side parquet Group reader over the PROJECTED read schema:
  * requested columns present in the file are read (column-pruned at
  * the parquet layer), absent ones (a delete vector's non-key columns,
  * a column added after this file was written) are null, and the
  * `_op` / `_commit` stamps come from the partition, not the file.
  *
  * RENAME-AWARE: `renames` is the manifest's historical-name →
  * canonical-name map — a file written before a rename serves the
  * canonical column from its old field (with the usual physical-type
  * widening), so schema-evolved tables read correctly through the SQL
  * door without a rewrite.
  *
  * EQUALITY-VECTOR-AWARE: a partition's applicable vectors (resolved
  * seq-scoped at plan time) are loaded once per task as key-tuple hash
  * sets — churn-sized by the delete contract — and rows whose tuple
  * matches any vector are skipped. Values are canonicalized (ints
  * widen to long, floats to double, binary to string) so a vector
  * written against a widened schema still matches rows in pre-widen
  * files. SQL-null semantics: a null key never matches (the same
  * contract as readMor's anti-join).
  */
private class SnapshotReaderFactory(required: StructType,
    renames: Map[String, String] = Map.empty,
    columnar: Boolean = false,
    constraints: Seq[SnapshotPrune.Constraint] = Nil,
    pageFilter: Boolean = false)
    extends PartitionReaderFactory {

  /** COLUMNAR reads whenever the scan planned them: every partition
    * shape answers alike — Spark refuses mixed row/columnar
    * partitions within one scan. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && (partition.isInstanceOf[SnapFilePartition] ||
      partition.isInstanceOf[SnapRowsPartition])

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    partition match {
      case p: SnapRowsPartition => literalColumnarReader(p)
      case p: SnapFilePartition => fileColumnarReader(p)
    }

  /** a plan-time U-split delta (churn-sized literal key rows) as ONE
    * in-memory ColumnarBatch — what keeps a change feed whose range
    * mixes file commits and rewrite diffs uniformly columnar. */
  private def literalColumnarReader(p: SnapRowsPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    val n = p.rows.length
    val vecs = OnHeapColumnVector.allocateColumns(n, required)
    required.fields.zipWithIndex.foreach { case (f, ci) =>
      val v = vecs(ci)
      val keyIdx = p.keyCols.indexOf(f.name)
      var i = 0
      while (i < n) {
        val (keyVals, op) = p.rows(i)
        val value: Any = f.name match {
          case "_op" => op
          case "_commit" => p.commit
          case _ if keyIdx >= 0 => keyVals(keyIdx)
          case _ => null
        }
        value match {
          case null => v.putNull(i)
          case l: Long => v.putLong(i, l)
          case x: Int => v.putInt(i, x)
          case d: Double => v.putDouble(i, d)
          case fl: Float => v.putFloat(i, fl)
          case b: Boolean => v.putBoolean(i, b)
          case s: String =>
            val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            v.putByteArray(i, bytes, 0, bytes.length)
          case other => throw new IllegalArgumentException(
            s"graft-snapshot: cannot serve a literal ${other.getClass}")
        }
        i += 1
      }
    }
    val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
      vecs.toArray[org.apache.spark.sql.vectorized.ColumnVector])
    batch.setNumRows(n)
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var served = false
      override def next(): Boolean =
        if (served || n == 0) false else { served = true; true }
      override def get()
          : org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit = vecs.foreach(_.close())
    }
  }

  private def fileColumnarReader(p: SnapFilePartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val its = p.chunks.iterator
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var cur: SnapshotVectorized.ChunkReader = _
      @annotation.tailrec
      override def next(): Boolean = {
        if (cur == null) {
          if (!its.hasNext) return false
          val c = its.next()
          cur = new SnapshotVectorized.ChunkReader(c, p.op, p.commit,
            if (p.posDeletes.isEmpty) null
            else deletedPositions(c.path, p.posDeletes),
            required, renames, constraints, pageFilter)
        }
        if (cur.nextBatch()) true
        else { cur.close(); cur = null; next() }
      }
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
        cur.get()
      override def close(): Unit = if (cur != null) cur.close()
    }
  }

  /** the physical row indexes of `file` named by the partition's
    * position-delete files — churn-sized by the delete contract.
    * Each position file decodes ONCE per executor (immutable-file
    * cache) into a per-data-file index; this reader then takes its
    * own file's slice. */
  private def deletedPositions(file: String,
      posDeletes: Seq[String]): java.util.HashSet[java.lang.Long] = {
    val mine = SnapshotLog.normPath(file)
    val out = new java.util.HashSet[java.lang.Long]()
    posDeletes.foreach { p =>
      val byFile = DeleteFileCaches.boundedPut(DeleteFileCaches.pos, p,
        (path: String) => {
          val m = new java.util.HashMap[String,
            java.util.HashSet[java.lang.Long]]()
          val reader = ParquetReader.builder(
            new GroupReadSupport(), new Path(path))
            .withConf(new Configuration()).build()
          try {
            var g = reader.read()
            while (g != null) {
              if (g.getFieldRepetitionCount("file_path") > 0) {
                val k = SnapshotLog.normPath(
                  g.getBinary("file_path", 0).toStringUsingUTF8)
                m.computeIfAbsent(k,
                  _ => new java.util.HashSet[java.lang.Long]())
                  .add(g.getLong("row_pos", 0))
              }
              g = reader.read()
            }
          } finally reader.close()
          m
        })
      val s = byFile.get(mine)
      if (s != null) out.addAll(s)
    }
    out
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: SnapRowsPartition => literalRowsReader(p)
      case p: SnapFilePartition => fileReader(p)
    }

  /** serves a plan-time-computed delta (key tuples + op): key columns
    * populated, non-key data columns null — the same shape the D rows
    * of an equality vector already have. */
  private def literalRowsReader(
      p: SnapRowsPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rows.length }
      override def get(): InternalRow = {
        val (keyVals, op) = p.rows(i)
        val vals = required.fields.map { f =>
          f.name match {
            case "_op" => UTF8String.fromString(op)
            case "_commit" => p.commit
            case n if p.keyCols.contains(n) =>
              p.keyCols.indexOf(n) match {
                case k => keyVals(k) match {
                  case s: String => UTF8String.fromString(s)
                  case other => other
                }
              }
            case _ => null
          }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }

  private def loadVector(path0: String): VecSet = EqVectors.load(path0)

  private def canonValue(g: Group, field: String): Any =
    EqVectors.canonValue(g, field)

  /** a multi-chunk partition read row-by-row: chunks are served in
    * sequence (each a WHOLE file in row mode — byte-range splits are
    * planned only for the columnar path, where parquet's own row
    * indexes keep `_pos` exact under ranges). */
  private def fileReader(
      part: SnapFilePartition): PartitionReader[InternalRow] = {
    val its = part.chunks.iterator
    new PartitionReader[InternalRow] {
      private var cur: PartitionReader[InternalRow] = _
      @annotation.tailrec
      override def next(): Boolean = {
        if (cur == null) {
          if (!its.hasNext) return false
          cur = chunkRowReader(its.next(), part.op, part.commit,
            part.posDeletes)
        }
        if (cur.next()) true
        else { cur.close(); cur = null; next() }
      }
      override def get(): InternalRow = cur.get()
      override def close(): Unit = if (cur != null) cur.close()
    }
  }

  private def chunkRowReader(chunk: SnapChunk, op: String, commit: Long,
      posDeletes: Seq[String]): PartitionReader[InternalRow] = {
    require(chunk.start == 0L && chunk.length < 0L,
      "row-mode readers serve whole files; byte-range chunks are " +
        "columnar-only (physical row positions need parquet row indexes)")
    val file = chunk.path
    val eqDeletes = chunk.eqDeletes
    val conf = new Configuration()
    val fileSchema = SnapshotTables.footerSchema(file)
    import scala.jdk.CollectionConverters._
    val fileFields = fileSchema.getFields.asScala.map(_.getName).toSet
    // canonical column name -> the FILE's field for it: the canonical
    // name itself when present, else the historical name the rename
    // map says this column used to carry (pre-rename files serve the
    // renamed column from their old field)
    def fieldFor(canonical: String): Option[String] =
      if (fileFields(canonical)) Some(canonical)
      else renames.collectFirst {
        case (old, nw) if nw == canonical && fileFields(old) => old
      }
    val dataNames = required.fields.map(_.name)
      .filter(n => n != "_op" && n != "_commit" &&
        n != SnapshotDelta.FileCol && n != SnapshotDelta.PosCol)
    // applicable equality vectors, loaded once per task (plan-time
    // seq-scoping guarantees every one of these covers this file)
    val vecs = eqDeletes.map(loadVector)
    // vector key columns may be pruned from the OUTPUT but are still
    // needed to evaluate membership — widen the parquet projection,
    // never the emitted row
    val vecFields = vecs.flatMap(_.keyCols)
      .flatMap(kc => fieldFor(renames.getOrElse(kc, kc))).distinct
    val projNames =
      (dataNames.flatMap(fieldFor(_)) ++ vecFields).distinct.toSet
    val wanted = fileSchema.getFields.asScala
      .filter(f => projNames.contains(f.getName))
    // an all-pruned projection (count(*)) still needs row COUNT — fall
    // back to the narrowest single column
    val proj = new MessageType(fileSchema.getName,
      (if (wanted.nonEmpty) wanted
       else fileSchema.getFields.asScala.take(1)).asJava)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    val reader = ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf).build()
    val dead =
      if (posDeletes.isEmpty) new java.util.HashSet[java.lang.Long]()
      else deletedPositions(file, posDeletes)
    val fileUtf8 = UTF8String.fromString(file)
    // per-vector FILE FIELDS resolved once per reader, not per row; a
    // vector whose key column this file lacks is a no-op here (every
    // row tuple would hold a null, and null never matches) — dropped
    // up front so the row loop never touches it
    val activeVecs: Array[(Array[String], java.util.HashSet[Seq[Any]])] =
      vecs.flatMap { v =>
        val fields = v.keyCols.map(kc => fieldFor(renames.getOrElse(kc, kc)))
        if (fields.exists(_.isEmpty)) None
        else Some((fields.map(_.get).toArray, v.tuples))
      }.toArray
    // this row's tuple for one vector, read under the same canonical
    // widening the vector's own rows got
    def vecDeleted(g: Group): Boolean = {
      var i = 0
      while (i < activeVecs.length) {
        val (fs, set) = activeVecs(i)
        val t = new Array[Any](fs.length)
        var j = 0
        var hasNull = false
        while (j < fs.length && !hasNull) {
          val v = canonValue(g, fs(j))
          if (v == null) hasNull = true else t(j) = v
          j += 1
        }
        // ArraySeq and the stored List hash/compare alike (Seq equality)
        if (!hasNull && set.contains(scala.collection.immutable.ArraySeq
            .unsafeWrapArray(t))) return true
        i += 1
      }
      false
    }
    new PartitionReader[InternalRow] {
      private var cur: Group = _
      private var pos = -1L // physical row index of `cur` in the file
      override def next(): Boolean = {
        cur = reader.read(); pos += 1
        while (cur != null && (dead.contains(pos) ||
            (activeVecs.nonEmpty && vecDeleted(cur)))) {
          cur = reader.read(); pos += 1
        }
        cur != null
      }
      override def get(): InternalRow = {
        val vals = required.fields.map { f =>
          f.name match {
            case "_op" => UTF8String.fromString(op)
            case "_commit" => commit
            case SnapshotDelta.FileCol => fileUtf8
            case SnapshotDelta.PosCol => pos
            case n => fieldFor(n) match {
              case Some(ff) if cur.getFieldRepetitionCount(ff) > 0 =>
                readValue(cur, ff, f.dataType)
              case _ => null
            }
          }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = reader.close()
    }
  }

  /** read one Group field as the REQUESTED Spark type, widening from
    * the file's physical type where the schemas diverged (an int file
    * column serving a long canonical column after a widen). */
  private def readValue(g: Group, name: String, t: DataType): Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val phys = g.getType.getType(name).asPrimitiveType().getPrimitiveTypeName
    (t, phys) match {
      case (LongType, INT64) => g.getLong(name, 0)
      case (LongType, INT32) => g.getInteger(name, 0).toLong
      case (IntegerType, INT32) => g.getInteger(name, 0)
      case (DoubleType, DOUBLE) => g.getDouble(name, 0)
      case (DoubleType, FLOAT) => g.getFloat(name, 0).toDouble
      case (FloatType, FLOAT) => g.getFloat(name, 0)
      case (BooleanType, BOOLEAN) => g.getBoolean(name, 0)
      case (StringType, BINARY) =>
        UTF8String.fromBytes(g.getBinary(name, 0).getBytes)
      case (want, have) => throw new IllegalArgumentException(
        s"graft-snapshot: cannot serve column $name as $want from " +
          s"parquet $have")
    }
  }
}
