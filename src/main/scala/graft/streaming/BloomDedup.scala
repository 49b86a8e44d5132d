package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.sketch.BloomFilter

/** Approximate streaming dedup with HARD-bounded state.
  *
  * `Dedup.exactStreamingDedup` (dropDuplicatesWithinWatermark) is exact
  * but its state grows with the distinct-hash arrival rate inside the
  * horizon — fine for bounded horizons, unbounded for "dedup everything
  * ever seen". This operator is the other end of the trade: per-bucket
  * Bloom filters whose byte size is FIXED at creation, so total state
  * is exactly `buckets × bloomBytes(expectedPerBucket, fpp)` forever.
  * The price is approximation in one direction only: a false positive
  * DROPS a unique document (at ≤ fpp while under capacity); a true
  * duplicate is never emitted twice. That asymmetry is the right one
  * for corpus ingest — losing ~1% of uniques is a rounding error next
  * to admitting duplicates into training data.
  *
  * Buckets shard the key space so state and work distribute across
  * executors (one Bloom filter would serialize through one task).
  * Saturation beyond `expectedPerBucket` degrades fpp gracefully; the
  * operational knob is bucket count × expected size, or a periodic
  * state reset between epochs (the two-tier pattern: hot filter in
  * state, exact batch compaction downstream).
  */
object BloomDedup {

  case class Doc(docId: Long, hash: Long)

  def dedupStream(in: Dataset[Doc], buckets: Int = 64,
                  expectedPerBucket: Long = 1000000L,
                  fpp: Double = 0.01): Dataset[Doc] = {
    require(buckets > 0 && expectedPerBucket > 0 && fpp > 0 && fpp < 1)
    import in.sparkSession.implicits._
    in.groupByKey(d => ((d.hash % buckets) + buckets) % buckets)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, docs: Iterator[Doc], state: GroupState[Array[Byte]]) => {
          val bloom = state.getOption
            .map(b => BloomFilter.readFrom(new ByteArrayInputStream(b)))
            .getOrElse(BloomFilter.create(expectedPerBucket, fpp))
          // first sight within the batch wins too: put-then-check keeps
          // intra-batch duplicates out without extra bookkeeping
          val kept = docs.filter { d =>
            if (bloom.mightContainLong(d.hash)) false
            else { bloom.putLong(d.hash); true }
          }.toVector
          val bos = new ByteArrayOutputStream()
          bloom.writeTo(bos)
          state.update(bos.toByteArray)
          kept.iterator
        })(Encoders.BINARY, Encoders.product[Doc])
  }
}
