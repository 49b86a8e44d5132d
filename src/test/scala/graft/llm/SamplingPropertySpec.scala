package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Seeded-random property checks for the sampling operators' laws —
  * many configurations, the same invariants: sampling is a subset with
  * exact 1/rate weights and is rerun-stable; a split is a partition of
  * the input for ANY valid fraction vector (zero fractions allowed and
  * never assigned).
  */
class SamplingPropertySpec extends SparkSpec {

  private val langs = Seq("en", "de", "fr", "es", "zh")

  test("stratifiedSample: subset, exact weight law, rerun-stable (12 seeded rate maps)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val total = docs.count()
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 12) {
      // rates in quarters so 1/rate is exact in both engines' doubles
      val rates = langs.filter(_ => rnd.nextBoolean())
        .map(l => l -> (rnd.nextInt(4) + 1) / 4.0).toMap
      val default = (rnd.nextInt(4) + 1) / 4.0
      val out = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, default)
      assert(out.count() <= total)
      out.select($"lang", $"sample_rate", $"sample_weight").distinct().collect()
        .foreach { r =>
          val rate = rates.getOrElse(r.getString(0), default)
          assert(r.getDouble(1) == rate, s"rate for ${r.getString(0)}")
          assert(r.getDouble(2) == 1.0 / rate, s"weight for ${r.getString(0)}")
        }
      val again = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, default)
      assert(out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty &&
        again.select("doc_id").exceptAll(out.select("doc_id")).isEmpty)
    }
  }

  test("deterministicSplit: a partition for any fraction vector in eighths (12 seeded)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val total = docs.count()
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 12) {
      // k parts as differences of sorted cut points in eighths — exact
      // binary fractions summing to exactly 1; zero fractions possible
      val k = rnd.nextInt(3) + 2
      val cuts = (Seq.fill(k - 1)(rnd.nextInt(9)).sorted :+ 8).prepended(0)
      val fractions = cuts.sliding(2).map(w => (w(1) - w(0)) / 8.0).toSeq
      val splits = fractions.zipWithIndex.map { case (f, j) => s"s$j" -> f }
      val out = Sampling.deterministicSplit(docs, "doc_id", splits)
      assert(out.count() == total, "split must preserve row count")
      val byLabel = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byLabel.values.sum == total)
      assert(byLabel.keySet.subsetOf(splits.map(_._1).toSet))
      // a zero-fraction part can never be assigned (every position —
      // the final split is excluded BEFORE filtering, so a zero in the
      // middle is always asserted)
      splits.dropRight(1).filter(_._2 == 0.0).foreach { case (name, _) =>
        assert(!byLabel.contains(name), s"zero-fraction split $name got rows")
      }
    }
  }
}
