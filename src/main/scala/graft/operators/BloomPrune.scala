package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SparkInternals

/** Manual runtime-filter pruning: the build side's key set, compressed
  * into a Bloom filter, pre-filters the probe side BEFORE its shuffle.
  *
  * Spark's own InjectRuntimeFilter does this automatically — but only
  * within one query, only under size heuristics, and the filter dies
  * with the query. Exposing it as an operator covers the cases that
  * matter at 100 TB and that the optimizer cannot see: a semi-join
  * whose probe side is so large that shuffling the non-matching rows
  * dominates the job, and pipelines where the same key set prunes MANY
  * downstream scans (the bloom aggregate is one row of bytes — persist
  * it like the LSH/IVF artifacts and reuse across jobs).
  *
  * Exactness: the bloom pass admits false positives only, and the
  * final semi-join re-checks exactly — output is bit-identical to the
  * plain semi-join (spec-proved); the bloom just keeps ~(1 - fpp) of
  * the non-matching probe rows out of the exchange. Keys hash through
  * XxHash64 on both sides (the same pairing InjectRuntimeFilter uses).
  */
object BloomPrune {

  /** Exact left-semi join of `probe` on `build`'s key set, with a
    * bloom pre-filter ahead of the probe-side shuffle. `expectedItems`
    * sizes the filter (bits auto-derived at ~8 bits/item ≈ 2% fpp). */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedItems: Long = 4000000L): DataFrame = {
    val numBits = math.min(expectedItems * 8L, Int.MaxValue.toLong)
    val bloom = build.agg(SparkInternals.column(
      BloomFilterAggregate(
        new XxHash64(Seq(SparkInternals.expression(col(buildKey)))),
        Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression()).as("__bf"))
    // might_contain demands a constant or SCALAR SUBQUERY bloom input —
    // the same wiring InjectRuntimeFilter uses: the one-row aggregate
    // rides as a subquery the executor broadcasts, not a join
    val sub = org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      SparkInternals.analyzedPlan(bloom))
    val pruned = probe.filter(SparkInternals.column(BloomFilterMightContain(
      sub, new XxHash64(Seq(SparkInternals.expression(col(probeKey)))))))
    pruned.join(build.select(col(buildKey)).distinct(),
      col(probeKey) === col(buildKey), "left_semi")
  }

  /** `df`'s key column aggregated into ONE serialized bloom blob — the
    * PERSISTABLE face of the filter above (the same `BloomFilterImpl`
    * bytes the runtime-filter rule ships between stages, here collected
    * to the driver so an artifact store can keep it next to the keys it
    * summarizes). An empty `df` returns a valid never-matching blob, so
    * the "every key epoch has a blob" invariant survives empty batches. */
  def bloomBlob(df: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val items = math.max(1L, expectedItems)
    val numBits = math.max(64L, math.min(items * 8L, Int.MaxValue.toLong))
    val row = df.agg(SparkInternals.column(
      BloomFilterAggregate(
        new XxHash64(Seq(SparkInternals.expression(col(key)))),
        Literal(items), Literal(numBits), 0, 0).toAggregateExpression()).as("__bf"))
      .head()
    if (!row.isNullAt(0)) row.getAs[Array[Byte]](0)
    else emptyBlob // zero rows
  }

  /** A valid never-matching blob of the same wire format — the
    * zero-rows answer, computable driver-side with no Spark job (an
    * empty key epoch needs its blob, but not an aggregation over
    * nothing). */
  def emptyBlob: Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1, 64L)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Key-might-be-in-ANY-blob predicate over independently-built blobs
    * (no same-size merge constraint — each blob tests on its own; false
    * negatives remain impossible, so `!mightContainAny` proves absence
    * across every epoch the blobs cover). */
  def mightContainAny(key: org.apache.spark.sql.Column,
                      blobs: Seq[Array[Byte]]): org.apache.spark.sql.Column = {
    require(blobs.nonEmpty, "mightContainAny needs at least one blob")
    blobs.map(b => SparkInternals.column(BloomFilterMightContain(
        Literal.create(b, org.apache.spark.sql.types.BinaryType),
        new XxHash64(Seq(SparkInternals.expression(key))))))
      .reduceLeft(_ || _)
  }
}
