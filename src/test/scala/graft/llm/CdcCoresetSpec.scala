package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws for content-defined chunking (edit locality — the property fixed
  * windows can't have) and k-center greedy coreset selection (per-round
  * max-min optimality against an independent in-memory reference).
  */
class CdcCoresetSpec extends SparkSpec {

  test("chunkCdc: chunks reassemble every document and the plan is exchange-free") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val docToks = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = TextAnalysis.chunkCdc(docs)
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunkCdc must be map-side:\n$plan")
    val byDoc = chunks
      .select("doc_id", "chunk_idx", "chunk_text", "n_tokens", "start_pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(byDoc.keySet == docToks.keySet.filter(docToks(_).nonEmpty))
    for ((id, cs) <- byDoc) {
      val ordered = cs.sortBy(_._2)
      // contiguous spans: starts chain, lengths sum to n, text reassembles
      assert(ordered.head._5 == 1L)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._5 == a._5 + a._4, s"doc $id: spans must chain")
        case _ =>
      }
      assert(ordered.map(_._4).sum == docToks(id).size.toLong)
      assert(ordered.map(_._3).mkString(" ") == docToks(id).mkString(" "))
    }
  }

  test("chunkCdc: an insertion only disturbs chunks up to the next boundary (edit locality)") {
    import spark.implicits._
    // the longest real document gives plenty of boundaries to re-sync on
    val base = graft.Tables.documents(spark, sf("sf0.001"))
      .orderBy(col("n_chars").desc, col("doc_id")).select("text")
      .head().getString(0)
    val edited = "zzq wwx yyv " + base // 3-token front insertion
    val two = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    def hashSeq(df: org.apache.spark.sql.DataFrame, id: Long) =
      df.filter(col("doc_id") === id).orderBy("chunk_idx")
        .select("chunk_hash").collect().map(_.getLong(0)).toSeq
    val cdc = TextAnalysis.chunkCdc(two)
    val (a, b) = (hashSeq(cdc, 1L), hashSeq(cdc, 2L))
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
    // CDC guarantee: every chunk strictly after the first boundary past the
    // edit is byte-identical — only the head chunk(s) touching the insertion
    // may differ. Expected chunk length is 8 tokens; allow a 3-chunk head.
    assert(a.size >= 6, s"fixture doc too short to exercise locality (${a.size} chunks)")
    assert(common >= a.size - 3,
      s"CDC must re-sync after the edit: only $common of ${a.size} tail chunks survived")
    // fixed windows lose alignment at the same edit: strictly fewer of the
    // tail chunks survive than under CDC (the motivation for this operator)
    def fixedHashes(id: Long) = TextAnalysis.chunkOverlap(two, window = 8, stride = 8)
      .filter(col("doc_id") === id).orderBy("chunk_idx")
      .select(Dedup.h32(col("chunk_text"))).collect().map(_.getLong(0)).toSeq
    val (fa, fb) = (fixedHashes(1L), fixedHashes(2L))
    val fixedCommon = fa.reverse.zip(fb.reverse).takeWhile { case (x, y) => x == y }.size
    assert(fixedCommon < common,
      s"a 3-token (non-stride-multiple) insert must desync fixed windows " +
        s"($fixedCommon surviving) more than CDC ($common)")
  }

  test("kCenterSelect: greedy trace matches an independent in-memory max-min reference") {
    val vecs = graft.Tables.embeddings(spark, sf("sf0.001"))
    val got = Similarity.kCenterSelect(vecs, k = 8)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: exact integer q8 quantization (round half-away-from-zero,
    // matching Spark's HALF_UP on doubles) + brute-force greedy
    val raw = vecs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .sortBy(_._1)
    def q8(v: Seq[Double]): Array[Long] = {
      val amax = v.map(math.abs).max
      if (amax > 0)
        v.map(x => BigDecimal(x / amax * 127)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
      else Array.fill(v.size)(0L)
    }
    val codes = raw.map { case (id, v) => id -> q8(v) }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var selected = Vector(raw.head._1)
    var expect = Vector((0L, raw.head._1, 0L))
    while (selected.size < 8) {
      val cand = raw.filterNot(r => selected.contains(r._1))
        .map { case (id, _) =>
          (id, selected.map(s => d2(codes(id), codes(s))).min)
        }
      val (bid, bmd) = cand.maxBy { case (id, md) => (md, -id) }
      expect :+= ((selected.size.toLong, bid, bmd))
      selected :+= bid
    }
    assert(got.toSeq == expect, s"greedy trace mismatch:\n got=${got.toSeq}\n exp=$expect")
    // covering radius is non-increasing once the trace starts (rounds >= 1)
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => b <= a })
  }

  test("mmrSelect: greedy trace matches an independent in-memory reference; round 0 is pure relevance") {
    val vecs = graft.Tables.embeddings(spark, sf("sf0.001"))
    val got = Similarity.mmrSelect(vecs, k = 8)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val raw = vecs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .sortBy(_._1)
    def q8(v: Seq[Double]): Array[Long] = {
      val amax = v.map(math.abs).max
      if (amax > 0)
        v.map(x => BigDecimal(x / amax * 127)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
      else Array.fill(v.size)(0L)
    }
    val codes = raw.map { case (id, v) => id -> q8(v) }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qCode = codes(raw.head._1)
    var selected = Vector.empty[Long]
    var expect = Vector.empty[(Long, Long, Long, Long, Long)]
    while (selected.size < 8) {
      val cand = raw.filterNot(r => selected.contains(r._1)).map { case (id, _) =>
        val rel = dot(codes(id), qCode)
        val ms = if (selected.isEmpty) 0L
                 else selected.map(s => dot(codes(id), codes(s))).max
        (id, rel, ms, rel - ms)
      }
      val (bid, brel, bms, bscore) = cand.maxBy { case (id, _, _, sc) => (sc, -id) }
      expect :+= ((selected.size.toLong, bid, brel, bms, bscore))
      selected :+= bid
    }
    assert(got.toSeq == expect, s"MMR trace mismatch:\n got=${got.toSeq}\n exp=$expect")
    // round 0 is the pure-relevance argmax (max_sim pinned to 0)
    assert(got.head._4 == 0L)
  }

  test("kCenterSelect: k past the corpus size returns the full corpus and leaves no cache behind") {
    import spark.implicits._
    val tiny = Seq(
      (10L, Array(1.0f, 0.0f)), (20L, Array(0.0f, 1.0f)), (30L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Similarity.kCenterSelect(tiny, k = 8).orderBy("round").collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(1)).toSet == Set(10L, 20L, 30L))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      "the q8 projection must be unpersisted on every exit path")
  }

  test("incremental maintained-state selection == the re-fold literal " +
       "form, trace-for-trace, past the InSet threshold; no cache leaks") {
    val vecs = graft.Tables.embeddings(spark, sf("sf0.001"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // k=20 crosses the In->InSet conversion threshold (10) and runs 20
    // maintained-column updates — the regime the literal form pays
    // O(k^2 N dim) + a growing expression tree for
    val kc = Similarity.kCenterSelect(vecs, k = 20).orderBy("round")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val kcLit = Similarity.kCenterSelectLiteral(vecs, k = 20).orderBy("round")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(kc == kcLit, s"k-center trace diverged:\n inc=$kc\n lit=$kcLit")
    val mmr = Similarity.mmrSelect(vecs, k = 20).orderBy("round")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val mmrLit = Similarity.mmrSelectLiteral(vecs, k = 20).orderBy("round")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(mmr == mmrLit, s"MMR trace diverged:\n inc=$mmr\n lit=$mmrLit")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, "both selection paths must unpersist all state")
  }
}
