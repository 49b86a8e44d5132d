package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iceberg manifest-count planning probe: a 100 TB table's snapshot can
  * carry thousands of manifests, and round 17's decode was
  * driver-sequential — round 18 moved it to a bounded parallel pool
  * applied in manifest order. This measures the PLANNING cost (the
  * `IcebergLite.scan` call; the data read is lazy) against tables with
  * a ramping manifest count, one file per manifest, reporting wall
  * time and ms/manifest — the per-manifest cost should stay flat (or
  * drop ~poolwise) as the count ramps.
  *
  *   sbt "runMain graft.tools.ManifestProbe"
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val listSchema =
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"content","type":"int"},
        |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
        .stripMargin.replaceAll("\n\\s*", "")
    val manifestSchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"]},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"}]}}]}"""
        .stripMargin.replaceAll("\n\\s*", "")

    def build(m: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"icemp$m")
      val loc = "file:///warehouse/probe"
      val tmp = java.nio.file.Files.createTempDirectory("mp").toString
      spark.range(0, 1000).select(col("id").as("k"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dataDir = dir.resolve("data")
      val metaDir = dir.resolve("metadata")
      java.nio.file.Files.createDirectories(dataDir)
      java.nio.file.Files.createDirectories(metaDir)
      (0 until m).foreach { i =>
        java.nio.file.Files.copy(src, dataDir.resolve(s"part-$i.parquet"))
        java.nio.file.Files.write(metaDir.resolve(s"manifest-$i.avro"),
          graft.functions.AvroWrite.genericFileBytes(manifestSchema,
            Seq(Map[String, Any]("status" -> 1,
              "snapshot_id" -> java.lang.Long.valueOf(1L),
              "data_file" -> Map[String, Any](
                "file_path" -> s"$loc/data/part-$i.parquet",
                "file_format" -> "PARQUET", "record_count" -> 1000L,
                "file_size_in_bytes" -> 1L)))))
      }
      java.nio.file.Files.write(metaDir.resolve("snap-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(listSchema,
          (0 until m).map(i => Map[String, Any](
            "manifest_path" -> s"$loc/metadata/manifest-$i.avro",
            "manifest_length" -> 1L, "partition_spec_id" -> 0,
            "content" -> 0, "added_snapshot_id" -> null))))
      java.nio.file.Files.writeString(metaDir.resolve("v1.metadata.json"),
        s"""{"format-version": 1, "table-uuid": "p-0", "location": "$loc",
          |"last-updated-ms": 1, "schema": {"type": "struct", "fields": [
          |{"id": 1, "name": "k", "required": true, "type": "long"}]},
          |"partition-spec": [], "current-snapshot-id": 1,
          |"snapshots": [{"snapshot-id": 1, "timestamp-ms": 1,
          |"manifest-list": "$loc/metadata/snap-1.avro"}]}"""
          .stripMargin.replaceAll("\n", " "))
      java.nio.file.Files.writeString(
        metaDir.resolve("version-hint.text"), "1\n")
      dir.toString
    }

    Seq(8, 32, 128, 512).foreach { m =>
      val dir = build(m)
      val t = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val sc = graft.operators.IcebergLite.scan(spark, dir)
        require(sc.nManifests == m && sc.nDataFiles == m)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[manifest-probe] m=$m%4d  plan=${t}%7.3f s  " +
        f"${t * 1000 / m}%7.3f ms/manifest")
    }
    spark.stop()
  }
}
