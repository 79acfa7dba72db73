package graft.sources

import java.util.{Collections, Iterator => JIterator}

import graft.operators.{DeleteVectors, SnapshotLog, SnapshotOptimize, SnapshotRefs}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The lake kernel's MAINTENANCE surface as SQL stored procedures —
  * Spark 4's DSv2 `ProcedureCatalog` (the `CALL` statement), the same
  * shape Iceberg ships its `system.*` procedures in. Everything an
  * operator of a 100 TB table runs on a schedule becomes one line of
  * SQL text, no Scala entry point required:
  *
  *   CALL graft_lake.system.expire_snapshots('/dir', 5)
  *   CALL graft_lake.system.remove_orphans('/dir')
  *   CALL graft_lake.system.rollback('/dir', 3)
  *   CALL graft_lake.system.optimize('/dir', 'm', 4194304)
  *   CALL graft_lake.system.optimize_zorder('/dir', 'a,b', 8)
  *   CALL graft_lake.system.compact('/dir', 'm')
  *   CALL graft_lake.system.create_branch('/dir', 'audit')
  *   CALL graft_lake.system.create_tag('/dir', 'rel-1', 3)
  *   CALL graft_lake.system.fast_forward('/dir', 'main', 7)
  *   CALL graft_lake.system.set_keys('/dir', 'k1,k2')
  *   CALL graft_lake.system.clone('/src', '/dst')
  *   CALL graft_lake.system.snapshots('/dir')      -- metadata table
  *   CALL graft_lake.system.files('/dir')          -- metadata table
  *
  * Each procedure delegates to the kernel operator that already owns
  * the semantics (OCC publish, own-root vacuum guard, orphan age
  * cutoff, …) and returns its outcome as a one-row result set (the
  * metadata procedures return one row per snapshot/file — manifest-
  * sized by construction). Side-effecting procedures report
  * `isDeterministic = false` so Spark never caches or re-plans them.
  */
object GraftProcedures {

  /** a procedure result: LocalScan hands Spark the rows directly —
    * procedure outputs are metadata-sized, never distributed work. */
  private final class ResultScan(schema: StructType, rs: Seq[InternalRow])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = rs.toArray
  }

  private def row(vals: Any*): InternalRow =
    new GenericInternalRow(vals.map {
      case s: String => UTF8String.fromString(s)
      case x => x.asInstanceOf[AnyRef]
    }.toArray[Any])

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** one procedure = parameters + output schema + the kernel call.
    * Unbound and bound are the same object: binding is a no-op since
    * parameters are declared statically (Spark handles coercion and
    * defaults from `parameters()`). */
  private final class Proc(pname: String, desc: String,
      params: Seq[ProcedureParameter], out: StructType,
      body: InternalRow => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = pname
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): JIterator[Scan] =
      Collections.singletonList[Scan](
        new ResultScan(out, body(input))).iterator()
  }

  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  private def spark: SparkSession = SparkSession.active

  /** an explicit NULL argument (`CALL ...(..., arg => NULL)`) reaches
    * the body as a null slot — getUTF8String would NPE before any
    * Option wrapper could apply. Required args refuse descriptively;
    * optional ones read through [[strOpt]] and treat NULL like their
    * declared default. */
  private def str(r: InternalRow, i: Int): String = {
    require(!r.isNullAt(i),
      s"procedure argument #${i + 1} is NULL; pass a value " +
        "(or omit the argument to use its default)")
    r.getUTF8String(i).toString
  }

  /** optional string argument: NULL and '' both mean "not given". */
  private def strOpt(r: InternalRow, i: Int): Option[String] =
    if (r.isNullAt(i)) None
    else Option(r.getUTF8String(i).toString).filter(_.nonEmpty)

  private def int(r: InternalRow, i: Int): Int = {
    require(!r.isNullAt(i),
      s"procedure argument #${i + 1} is NULL; pass a value " +
        "(or omit the argument to use its default)")
    r.getInt(i)
  }

  private def lng(r: InternalRow, i: Int): Long = {
    require(!r.isNullAt(i),
      s"procedure argument #${i + 1} is NULL; pass a value " +
        "(or omit the argument to use its default)")
    r.getLong(i)
  }

  val procedures: Map[String, UnboundProcedure] = Seq(
    new Proc("expire_snapshots",
      "delete manifests below keep_from and the data files only they " +
        "reference (own-root rule: a clone's expire never reaches its " +
        "source)",
      Seq(p("table", StringType), p("keep_from", IntegerType)),
      out("deleted_data_files" -> IntegerType, "kept_from" -> IntegerType),
      in => {
        val dead = SnapshotLog.expire(str(in, 0), int(in, 1))
        Seq(row(dead.size, int(in, 1)))
      }),

    new Proc("remove_orphans",
      "delete unreferenced files under the table's data/deletes roots, " +
        "skipping anything newer than older_than_hours (in-flight " +
        "commit guard)",
      Seq(p("table", StringType), pd("older_than_hours", IntegerType, "3")),
      out("deleted_files" -> IntegerType),
      in => {
        val dead = SnapshotLog.removeOrphans(str(in, 0),
          int(in, 1).toLong * 3600 * 1000)
        Seq(row(dead.size))
      }),

    new Proc("rollback",
      "publish a new snapshot whose content is exactly the given " +
        "version's (history stays append-only and inspectable)",
      Seq(p("table", StringType), p("version", IntegerType)),
      out("restored_from" -> IntegerType, "new_version" -> IntegerType),
      in => {
        val nv = SnapshotLog.rollback(str(in, 0), int(in, 1))
        Seq(row(int(in, 1), nv))
      }),

    new Proc("optimize",
      "bin-pack each partition's sub-threshold files; large files are " +
        "shared by reference (no-op when nothing to pack); " +
        "target_bytes > 0 caps each packed output file (one bin per " +
        "~target input bytes)",
      Seq(p("table", StringType), p("part_col", StringType),
        pd("small_bytes", LongType, "33554432"),
        pd("target_bytes", LongType, "0")),
      out("new_version" -> IntegerType),
      in => Seq(row(SnapshotOptimize.binPack(spark, str(in, 0),
        str(in, 1), lng(in, 2),
        targetBytes = Some(lng(in, 3)).filter(_ > 0))))),

    new Proc("optimize_zorder",
      "rewrite the table in z-order over the given dimensions " +
        "(comma-separated); content-preserving, time travel keeps the " +
        "pre-optimize layout; within_part_col keeps the table's " +
        "partition labels (the OPTIMIZE WHERE ... ZORDER shape)",
      Seq(p("table", StringType), p("dims", StringType),
        pd("n_files", IntegerType, "8"),
        pd("within_part_col", StringType, "''")),
      out("new_version" -> IntegerType),
      in => Seq(row(SnapshotOptimize.zorder(spark, str(in, 0),
        str(in, 1).split(",").map(_.trim).toSeq, int(in, 2),
        withinPartCol = strOpt(in, 3))))),

    new Proc("compact",
      "fold every live delete vector into a rewritten table (the " +
        "merge-on-read debt paid down); readers of older snapshots " +
        "keep their view",
      Seq(p("table", StringType), p("part_col", StringType)),
      out("new_version" -> IntegerType),
      in => Seq(row(DeleteVectors.compact(spark, str(in, 0), str(in, 1))))),

    new Proc("create_branch",
      "create a branch at the given snapshot (0 = latest); writers " +
        "then stage commits on it with option('branch', name)",
      Seq(p("table", StringType), p("name", StringType),
        pd("at_version", IntegerType, "0")),
      out("branch" -> StringType, "at_version" -> IntegerType),
      in => {
        val dir = str(in, 0)
        val at = if (int(in, 2) <= 0) SnapshotLog.latest(dir)
          else int(in, 2)
        SnapshotRefs.createBranch(dir, str(in, 1), at)
        Seq(row(str(in, 1), at))
      }),

    new Proc("create_tag",
      "pin a snapshot under an immutable tag (0 = latest); tags never " +
        "move",
      Seq(p("table", StringType), p("name", StringType),
        pd("at_version", IntegerType, "0")),
      out("tag" -> StringType, "at_version" -> IntegerType),
      in => {
        val dir = str(in, 0)
        val at = if (int(in, 2) <= 0) SnapshotLog.latest(dir)
          else int(in, 2)
        SnapshotRefs.tag(dir, str(in, 1), at)
        Seq(row(str(in, 1), at))
      }),

    new Proc("fast_forward",
      "advance a branch to a descendant snapshot — publishing a " +
        "write-audit-publish stage to main is fast_forward('main', head)",
      Seq(p("table", StringType), p("branch", StringType),
        p("to_version", IntegerType)),
      out("branch" -> StringType, "head" -> IntegerType),
      in => {
        SnapshotRefs.fastForward(str(in, 0), str(in, 1), int(in, 2))
        Seq(row(str(in, 1), int(in, 2)))
      }),

    new Proc("set_keys",
      "declare the table's logical key columns (comma-separated) as a " +
        "pure metadata commit — unlocks the streaming change feed's " +
        "U-split over copy-on-write commits",
      Seq(p("table", StringType), p("keys", StringType)),
      out("new_version" -> IntegerType),
      in => Seq(row(SnapshotLog.commitKeysChange(str(in, 0),
        str(in, 1).split(",").map(_.trim).toSeq)))),

    new Proc("clone",
      "shallow-clone a table: the destination's first snapshot " +
        "references the source's files and segments (zero data copied); " +
        "the clones then diverge freely",
      Seq(p("src", StringType), p("dst", StringType)),
      out("version" -> IntegerType),
      in => Seq(row(SnapshotLog.clone(str(in, 0), str(in, 1))))),

    new Proc("snapshots",
      "the snapshots metadata table: one row per retained snapshot, " +
        "built from manifests alone",
      Seq(p("table", StringType)),
      out("version" -> IntegerType, "ts" -> LongType,
        "parent" -> IntegerType, "spec" -> StringType,
        "n_data" -> LongType, "n_eqdel" -> LongType,
        "n_posdel" -> LongType, "n_partitions" -> LongType),
      in => {
        val dir = str(in, 0)
        (1 to SnapshotLog.latest(dir))
          .filter(SnapshotLog.committed(dir, _))
          .map { v =>
            val es = SnapshotLog.entries(dir, v)
            row(v, SnapshotLog.tsOf(dir, v).getOrElse(-1L),
              SnapshotRefs.parentOf(dir, v).getOrElse(-1),
              SnapshotLog.specOf(dir, v).getOrElse("-"),
              es.count(_.kind == "D").toLong,
              es.count(_.kind == "X").toLong,
              es.count(_.kind == "P").toLong,
              es.filter(_.kind == "D").map(_.partition)
                .distinct.size.toLong)
          }
      }),

    new Proc("files",
      "the files metadata table of a snapshot (0 = latest): manifest " +
        "entries as rows — path, kind, partition label, commit seq, " +
        "recorded row count",
      Seq(p("table", StringType), pd("version", IntegerType, "0")),
      out("path" -> StringType, "kind" -> StringType,
        "partition" -> StringType, "seq" -> LongType, "n_rows" -> LongType),
      in => {
        val dir = str(in, 0)
        val v = if (int(in, 1) <= 0) SnapshotLog.latest(dir)
          else int(in, 1)
        SnapshotLog.entries(dir, v).map(e =>
          row(e.path, e.kind, e.partition, e.seq, e.rows))
      })
  ).map(pr => pr.name() -> (pr: UnboundProcedure)).toMap

  def load(name: String): UnboundProcedure =
    procedures.getOrElse(name.toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"unknown graft_lake procedure '$name'; available: " +
          procedures.keys.toSeq.sorted.mkString(", ")))
}
