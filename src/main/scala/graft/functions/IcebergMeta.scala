package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg `metadata.json` planning reader — the second table format's
  * metadata tier, the Iceberg analog of [[OrcMeta]]'s footer walk and
  * the sibling of `operators/DeltaLite`: a table's `vN.metadata.json`
  * (public Iceberg table spec, v1 and v2) carries everything an
  * engine plans from before touching a manifest — format version,
  * current schema, partition spec, and the snapshot log with
  * per-snapshot summaries (operation, total-records, total-files).
  * Parsed with the in-house recursive-descent JSON reader
  * ([[AvroRead.JsonP]]); Avro MANIFEST files (nested records) are the
  * documented decline boundary — this face answers the inventory/
  * lineage questions (how many snapshots, how big, partitioned how,
  * schema drift) that précede any data read.
  *
  * Faces: [[tableMeta]] (format version, current snapshot id,
  * snapshot count, current-schema field names, partition-spec source
  * names, current-snapshot total-records/files) and [[snapshots]]
  * (one row per snapshot: id, parent, sequence number, timestamp,
  * operation, total-records, total-files). Malformed JSON or a
  * structure outside the spec declines to null, the total-parser
  * contract.
  *
  * Reference scope: beyond-reference §2.10.
  */
object IcebergMeta {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  private type JMap = scala.collection.Map[String, Any]

  private def asMap(v: Any): JMap = v match {
    case m: scala.collection.Map[_, _] => m.asInstanceOf[JMap]
    case _ => fail()
  }
  private def asSeq(v: Any): scala.collection.Seq[Any] = v match {
    case s: scala.collection.Seq[_] => s
    case _ => fail()
  }
  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue // JsonP keeps integrals exact
    case d: java.lang.Double => // fractional tokens: never a valid id
      if (d.doubleValue != d.doubleValue.toLong.toDouble) fail()
      d.doubleValue.toLong
    case s: String => try s.toLong catch { case _: Exception => fail() }
    case _ => fail()
  }
  private def asStr(v: Any): String = v match {
    case s: String => s
    case _ => fail()
  }

  private final class Parsed(
      val formatVersion: Long, val uuid: String,
      val currentSnapshotId: Long,
      val schemaFields: Seq[String],
      val partitionNames: Seq[String],
      val snapshots: Seq[JMap])

  private def parse(b: Array[Byte]): Parsed = {
    if (b == null || b.length > (1 << 24)) fail() // metadata is KBs–MBs
    val root = asMap(new AvroRead.JsonP(new String(b, "UTF-8")).parse())
    val fv = asLong(root.getOrElse("format-version", fail()))
    if (fv < 1 || fv > 2) fail()
    val uuid = asStr(root.getOrElse("table-uuid", fail()))
    val curSnap = root.get("current-snapshot-id").map(asLong).getOrElse(-1L)

    // current schema: v2 = schemas[] + current-schema-id; v1 = schema
    val schema: JMap = root.get("schemas") match {
      case Some(ss) =>
        val id = asLong(root.getOrElse("current-schema-id", fail()))
        asSeq(ss).map(asMap)
          .find(m => m.get("schema-id").exists(asLong(_) == id))
          .getOrElse(fail())
      case None => asMap(root.getOrElse("schema", fail()))
    }
    val fields = asSeq(schema.getOrElse("fields", fail())).map(asMap)
      .map(f => asStr(f.getOrElse("name", fail())))
    if (fields.isEmpty) fail()

    // partition spec: v2 = partition-specs[] + default-spec-id;
    // v1 = partition-spec
    val specFields: scala.collection.Seq[JMap] =
      root.get("partition-specs") match {
        case Some(ps) =>
          val id = asLong(root.getOrElse("default-spec-id", fail()))
          asSeq(asMap(asSeq(ps).map(asMap)
            .find(m => m.get("spec-id").exists(asLong(_) == id))
            .getOrElse(fail()))
            .getOrElse("fields", fail())).map(asMap)
        case None => root.get("partition-spec")
          .map(v => asSeq(v).map(asMap)).getOrElse(Seq.empty)
      }
    val partNames = specFields.map(f => asStr(f.getOrElse("name", fail())))

    val snaps = root.get("snapshots").map(v => asSeq(v).map(asMap))
      .getOrElse(Seq.empty)
    if (snaps.length > (1 << 20)) fail()
    new Parsed(fv, uuid, curSnap, fields.toSeq, partNames.toSeq,
      snaps.toSeq)
  }

  private def summaryLong(s: JMap, key: String): Any =
    asMap(s.getOrElse("summary", return null)).get(key) match {
      case Some(v) => java.lang.Long.valueOf(asLong(v))
      case None => null
    }

  /** [format_version, current_snapshot_id (null if none), n_snapshots,
    * schema field names (sorted, comma-joined), partition field names
    * (comma-joined, spec order), current total_records, current
    * total_files] or null. */
  def tableMeta(b: Array[Byte]): InternalRow =
    try {
      val p = parse(b)
      val cur = p.snapshots.find(s =>
        s.get("snapshot-id").exists(asLong(_) == p.currentSnapshotId))
      InternalRow(
        p.formatVersion.toInt,
        if (p.currentSnapshotId < 0) null
        else java.lang.Long.valueOf(p.currentSnapshotId),
        p.snapshots.length,
        UTF8String.fromString(p.schemaFields.sorted.mkString(",")),
        UTF8String.fromString(p.partitionNames.mkString(",")),
        cur.map(s => summaryLong(s, "total-records")).getOrElse(null),
        cur.map(s => summaryLong(s, "total-data-files")).getOrElse(null))
    } catch {
      case Malformed => null
      case e: RuntimeException if e eq AvroRead.Malformed => null
    }

  /** One row per snapshot: [snapshot_id, parent_id, sequence_number,
    * timestamp_ms, operation, total_records, total_files]; null on
    * malformed input. */
  def snapshots(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    try {
      val p = parse(b)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        p.snapshots.map { s =>
          InternalRow(
            asLong(s.getOrElse("snapshot-id", fail())),
            s.get("parent-snapshot-id").map(v =>
              java.lang.Long.valueOf(asLong(v))).orNull,
            s.get("sequence-number").map(v =>
              java.lang.Long.valueOf(asLong(v))).orNull,
            asLong(s.getOrElse("timestamp-ms", fail())),
            asMap(s.getOrElse("summary", fail())).get("operation")
              .map(v => UTF8String.fromString(asStr(v))).orNull,
            summaryLong(s, "total-records"),
            summaryLong(s, "total-data-files"))
        }.toArray)
    } catch {
      case Malformed => null
      case e: RuntimeException if e eq AvroRead.Malformed => null
    }

  // ---- expressions ----

  private val snapshotType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("parent_id", LongType),
    StructField("sequence_number", LongType),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("operation", StringType),
    StructField("total_records", LongType),
    StructField("total_files", LongType)))

  case class IcebergTableMeta(child: Expression) extends UnaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "iceberg_table_meta"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("format_version", IntegerType, nullable = false),
      StructField("current_snapshot_id", LongType),
      StructField("n_snapshots", IntegerType, nullable = false),
      StructField("schema_fields", StringType),
      StructField("partition_fields", StringType),
      StructField("total_records", LongType),
      StructField("total_files", LongType)))
    override def nullSafeEval(v: Any): Any =
      IcebergMeta.tableMeta(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.IcebergMeta.tableMeta($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class IcebergSnapshots(child: Expression) extends UnaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "iceberg_snapshots"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary input")
      }
    override def dataType: DataType =
      ArrayType(snapshotType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      IcebergMeta.snapshots(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.IcebergMeta.snapshots($bytes);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def tableMetaCol(c: Column): Column =
    SparkInternals.column(IcebergTableMeta(SparkInternals.expression(c)))
  def snapshotsCol(c: Column): Column =
    SparkInternals.column(IcebergSnapshots(SparkInternals.expression(c)))
}
