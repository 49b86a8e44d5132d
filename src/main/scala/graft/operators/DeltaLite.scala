package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta-protocol TABLE reader (log replay, no delta library) — the
  * table-format tier on top of the file-format tier: a Delta table is
  * parquet data files plus a `_delta_log/` of versioned JSON commits
  * (and parquet checkpoints), and a snapshot is the replay of those
  * actions. Implemented Spark-first from the PUBLIC Delta protocol
  * spec:
  *
  *  - version discovery from `%020d.json` names; `_last_checkpoint`
  *    honored — the checkpoint parquet is read DISTRIBUTED via
  *    Spark's reader and only commits after it replay as JSON;
  *  - action schema (add / remove / metaData / protocol) read with
  *    `spark.read.schema(...).json` — the log parse itself is a
  *    DataFrame job, not a driver loop;
  *  - tombstone semantics: a path is live iff its latest add is newer
  *    than its latest remove (re-adds supported); `versionAsOf` time
  *    travel replays a prefix;
  *  - schema from the latest `metaData.schemaString` (Spark StructType
  *    JSON — the protocol's own format), partition columns
  *    reconstructed from `add.partitionValues` and CAST per schema;
  *  - protocol gate: `minReaderVersion` > 1 (deletion vectors, column
  *    mapping, v2 checkpoints…) raises rather than misreading.
  *
  * The one driver-side materialization is the LIVE FILE LIST — the
  * metadata every engine (including Delta itself) plans from; it is
  * bounded by table file count, never by row count. Files grouped by
  * partition tuple read as one `spark.read.parquet(...)` each, so
  * data-side scale is Spark's own scan path (pushdown, pruning, AQE
  * all apply downstream).
  *
  * Reference scope: beyond-reference §2.10.
  */
object DeltaLite {

  private val LogDir = "_delta_log"

  /** Latest version present in the log, or -1 if none. */
  def latestVersion(spark: SparkSession, table: String): Long = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(table, LogDir)
    if (!fs.exists(dir)) return -1L
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
  }

  private def actionSchema: StructType = StructType.fromDDL(
    "add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, " +
      "size: BIGINT, dataChange: BOOLEAN, stats: STRING>, " +
      "remove STRUCT<path: STRING, deletionTimestamp: BIGINT, " +
      "dataChange: BOOLEAN>, " +
      "metaData STRUCT<id: STRING, schemaString: STRING, " +
      "partitionColumns: ARRAY<STRING>>, " +
      "protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>")

  /** File-skipping outcome of [[prunedSnapshot]]. */
  final case class Pruned(nFiles: Int, keptFiles: Int, data: DataFrame)

  /** The table as a DataFrame at `versionAsOf` (default: latest). */
  def snapshot(spark: SparkSession, table: String,
               versionAsOf: Long = Long.MaxValue): DataFrame =
    build(spark, table, versionAsOf, pruneCol = null, 0L, 0L).data

  /** File-skipping snapshot: files whose `add.stats` min/max for
    * `colName` cannot intersect [lo, hi] are SKIPPED before any data
    * I/O (files without stats are conservatively kept) — the Delta
    * analog of row-group pruning, the planning move that makes a
    * 100 TB table's point query touch KBs of metadata instead of the
    * table. The caller re-filters exactly; this only bounds I/O. */
  def prunedSnapshot(spark: SparkSession, table: String, colName: String,
                     lo: Long, hi: Long,
                     versionAsOf: Long = Long.MaxValue): Pruned =
    build(spark, table, versionAsOf, colName, lo, hi)

  /** Balanced-brace JSON object following `"key"`, or None. */
  private def jsonObjectAfter(s: String, key: String): Option[String] = {
    val i = s.indexOf("\"" + key + "\"")
    if (i < 0) return None
    val j = s.indexOf('{', i)
    if (j < 0) return None
    var depth = 0
    var k = j
    while (k < s.length) {
      s.charAt(k) match {
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return Some(s.substring(j, k + 1))
        case _ => ()
      }
      k += 1
    }
    None
  }

  private def longField(obj: String, colName: String): Option[Long] = {
    val m = java.util.regex.Pattern.compile(
      "\"" + java.util.regex.Pattern.quote(colName) +
        "\"\\s*:\\s*(-?\\d+)").matcher(obj)
    if (m.find()) scala.util.Try(m.group(1).toLong).toOption else None
  }

  private def build(spark: SparkSession, table: String, versionAsOf: Long,
                    pruneCol: String, lo: Long, hi: Long): Pruned = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, LogDir)
    require(fs.exists(logDir), s"not a Delta table (no $LogDir): $table")

    // checkpoint discovery: use the newest checkpoint at or before the
    // requested version; JSON commits after it replay on top
    val lastCp = {
      val p = new Path(logDir, "_last_checkpoint")
      if (!fs.exists(p)) -1L
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in).mkString
          finally in.close()
        // {"version":N,...} — one tiny JSON object
        val m = java.util.regex.Pattern.compile("\"version\"\\s*:\\s*(\\d+)")
          .matcher(txt)
        if (m.find()) m.group(1).toLong else -1L
      }
    }
    val cpVersion = if (lastCp >= 0 && lastCp <= versionAsOf) lastCp else -1L

    val jsonFiles = fs.listStatus(logDir).map(_.getPath)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .filter { p =>
        val v = p.getName.stripSuffix(".json").toLong
        v > cpVersion && v <= versionAsOf
      }
      .sortBy(_.getName)
    require(cpVersion >= 0 || jsonFiles.nonEmpty,
      s"no commits at or below version $versionAsOf in $table")
    // replay must be ANCHORED (a checkpoint, or commit 0) and GAP-FREE:
    // with a stale _last_checkpoint plus log cleanup, a partial replay
    // would silently return an incomplete snapshot (missing adds)
    val versions = jsonFiles.map(_.getName.stripSuffix(".json").toLong)
    if (versions.nonEmpty) {
      val base = if (cpVersion >= 0) cpVersion + 1 else 0L
      require(versions.head == base,
        s"Delta log replay not anchored: first commit ${versions.head}, " +
          s"expected $base (checkpoint=$cpVersion) in $table")
      versions.zipWithIndex.foreach { case (v, i) =>
        require(v == base + i,
          s"gap in Delta log of $table: expected version ${base + i}, " +
            s"found $v")
      }
    }

    // actions with their commit version (from the file name)
    val jsonActions =
      if (jsonFiles.isEmpty) None
      else Some(spark.read.schema(actionSchema)
        .json(jsonFiles.map(_.toString): _*)
        .withColumn("v", regexp_extract(input_file_name(),
          "(\\d{20})\\.json", 1).cast("long")))
    val cpActions =
      if (cpVersion < 0) None
      else Some(spark.read.schema(actionSchema) // fills absent optional
        // fields (e.g. add.stats) with nulls — checkpoints from other
        // writers carry varying action-struct widths
        .parquet(new Path(logDir,
          f"$cpVersion%020d.checkpoint.parquet").toString)
        .withColumn("v", lit(cpVersion)))
    val actions = (cpActions, jsonActions) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case _ => sys.error("unreachable")
    }

    // protocol gate, latest metaData — tiny driver rows by construction
    val meta = actions
      .select(col("v"), col("metaData"), col("protocol"))
      .filter(col("metaData").isNotNull || col("protocol").isNotNull)
      .collect()
    val minReader = meta.flatMap(r => Option(r.getStruct(2)))
      .map(_.getInt(0)).foldLeft(1)(math.max)
    require(minReader <= 1,
      s"unsupported Delta protocol: minReaderVersion=$minReader " +
        "(reader features beyond the base protocol)")
    val metaRow = meta.filter(!_.isNullAt(1)).sortBy(_.getLong(0)).lastOption
      .getOrElse(sys.error(s"no metaData action in $table"))
    val schema = DataType.fromJson(metaRow.getStruct(1).getString(1))
      .asInstanceOf[StructType]
    val partCols = Option(metaRow.getStruct(1).getSeq[String](2))
      .getOrElse(Seq.empty)

    // tombstone replay: live iff latest add is at least as new as the
    // latest remove (a re-add after a remove resurrects the path; an
    // add SHARING its commit version with the remove wins the tie —
    // protocol reconciliation keeps the add for remove-then-re-add
    // within one commit)
    val adds = actions.filter(col("add").isNotNull)
      .select(col("add.path").as("path"),
        col("add.partitionValues").as("pv"),
        col("add.stats").as("stats"), col("v"))
    val removes = actions.filter(col("remove").isNotNull)
      .select(col("remove.path").as("path"), col("v").as("rv"))
      .groupBy("path").agg(max("rv").as("rv"))
    val latestAdds = adds
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("path").orderBy(col("v").desc)))
      .filter(col("rn") === 1).drop("rn")
    val liveAll = latestAdds.join(removes, Seq("path"), "left")
      .filter(col("rv").isNull || col("v") >= col("rv"))
      .select("path", "pv", "stats")
      .collect() // the snapshot FILE LIST — metadata-bounded
      .map(r => (r.getString(0),
        Option(r.getMap[String, String](1)).map(_.toMap)
          .getOrElse(Map.empty[String, String]),
        if (r.isNullAt(2)) null else r.getString(2)))

    // stats-based file skipping: drop files whose [min, max] for the
    // prune column cannot intersect [lo, hi]; no/partial stats keep
    val live = if (pruneCol == null) liveAll
      else liveAll.filter { case (_, _, stats) =>
        if (stats == null) true
        else {
          val mn = jsonObjectAfter(stats, "minValues")
            .flatMap(longField(_, pruneCol))
          val mx = jsonObjectAfter(stats, "maxValues")
            .flatMap(longField(_, pruneCol))
          !(mn.exists(_ > hi) || mx.exists(_ < lo))
        }
      }

    require(live.nonEmpty, s"empty snapshot of $table")
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))

    // one read per distinct partition tuple; partition columns attach
    // as CAST literals per the table schema
    val groups = live.groupBy(_._2).toSeq.sortBy(_._1.toSeq.sortBy(_._1)
      .map { case (k, x) => s"$k=$x" }.mkString(","))
    val parts = groups.map { case (pv, files) =>
      val paths = files.map { case (rel, _, _) =>
        new Path(table, java.net.URLDecoder.decode(rel, "UTF-8")).toString
      }
      val base = spark.read.schema(dataSchema).parquet(paths: _*)
      partCols.foldLeft(base) { (df, pc) =>
        val f = schema.find(_.name == pc)
          .getOrElse(sys.error(s"partition column $pc missing from schema"))
        df.withColumn(pc,
          pv.get(pc).map(v => lit(v).cast(f.dataType))
            .getOrElse(lit(null).cast(f.dataType)))
      }.select(schema.fieldNames.map(col): _*)
    }
    Pruned(liveAll.length, live.length, parts.reduce(_ unionByName _))
  }
}
