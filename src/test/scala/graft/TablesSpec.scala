package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Guards the table loaders against driver testdata regeneration changing
  * timestamp encodings (round 7: events.parquet flipped ns-int64 → µs-NTZ
  * and 25 gates + 12 specs threw DATATYPE_MISMATCH). The loaders must
  * always hand downstream code a session-TZ TIMESTAMP. */
class TablesSpec extends SparkSpec {

  test("events ts is TimestampType regardless of parquet encoding") {
    val df = Tables.events(spark, sf("sf0.001"))
    assert(df.schema("ts").dataType == TimestampType)
    // downstream consumers rely on these; they throw on NTZ
    df.selectExpr("unix_micros(ts)", "cast(ts as bigint)").head()
  }

  test("all tables expose no TIMESTAMP_NTZ columns") {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    for (n <- names) {
      val df = Tables.table(spark, sf("sf0.001"), n)
      val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
      assert(ntz.isEmpty, s"$n has NTZ columns: ${ntz.map(_.name).mkString(",")}")
    }
  }
}
