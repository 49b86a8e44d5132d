package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The merge law: merge(partial(A), partial(B), ...) == partial(A∪B∪…)
  * for every split of the input — the whole contract of incremental
  * aggregate maintenance. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("merge law holds for arbitrary splits, including empty deltas " +
       "and a 3-way split; avg derives from merged state") {
    val rows = (1 to 60).map(i => ((i % 5).toLong, (i * 37 % 101).toLong))
    val df = rows.toDF("k", "cents")
    val oneShot = canon(Incremental.partialAggregate(df, "k", col("cents")))

    for (cut <- Seq(0, 1, 17, 59, 60)) {
      val (a, b) = rows.splitAt(cut)
      val pa = Incremental.partialAggregate(a.toDF("k", "cents"), "k", col("cents"))
      val pb = Incremental.partialAggregate(b.toDF("k", "cents"), "k", col("cents"))
      assert(canon(Incremental.mergePartials("k", pa, pb)) == oneShot,
        s"cut=$cut")
    }
    // 3-way
    val (x, rest) = rows.splitAt(20)
    val (y, z) = rest.splitAt(20)
    val parts = Seq(x, y, z).map(r =>
      Incremental.partialAggregate(r.toDF("k", "cents"), "k", col("cents")))
    assert(canon(Incremental.mergePartials("k", parts: _*)) == oneShot)

    // avg derived at read time equals the one-shot avg (integer div)
    val merged = Incremental.mergePartials("k", parts: _*)
      .withColumn("avg_cents", expr("sum_cents div cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    val want = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(_._2).sum / rs.size }
    assert(merged == want)
  }
}
