package graft.llm

import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE merge learning vs an independent in-memory reference — the
  * iterative loop has no SQL oracle, so the reference implementation is
  * the ground truth (same tie-break: count DESC, pair ASC; same
  * left-to-right non-overlapping apply).
  */
class BpeSpec extends SparkSpec {

  private def refMergeApply(syms: Vector[String], l: String, r: String): Vector[String] = {
    val acc = Vector.newBuilder[String]
    var pend: String = null
    syms.foreach { s =>
      if (pend == null) pend = s
      else if (pend == l && s == r) { acc += (l + r); pend = null }
      else { acc += pend; pend = s }
    }
    if (pend != null) acc += pend
    acc.result()
  }

  private def refBpe(words: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words
      .groupMapReduce { case (w, _) => w.map(_.toString).toVector :+ "</w>" }(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val pc = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach { case Seq(a, b) => pc((a, b)) += c; case _ => } }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), c) = pc.toSeq.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        out += ((rank, l, r, c))
        vocab = vocab.toSeq.map { case (s, cnt) => refMergeApply(s, l, r) -> cnt }
          .groupMapReduce(_._1)(_._2)(_ + _)
        rank += 1
      }
    }
    out.result()
  }

  test("learnMerges matches the reference for 12 rounds on real documents (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val got = Bpe.learnMerges(docs, 12)
    val words = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(words, 12)
    assert(got == want, s"merge sequences diverge:\n got=$got\nwant=$want")
    assert(got.size == 12 && got.head._4 >= got.last._4,
      "pair counts should be non-increasing-ish from the argmax")
  }

  test("merge apply is left-to-right non-overlapping: aaa under (a,a) -> [aa, a]") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, 3)
    // round 1: (a,a)=4; round 2: tie (a,</w>)=2 vs (aa,a)=2 -> lexicographic
    // left asc picks (a,</w>); round 3: (aa, a</w>)=2
    assert(got == Seq((1, "a", "a", 4L), (2, "a", "</w>", 2L), (3, "aa", "a</w>", 2L)),
      s"got $got")
  }

  private def refEncode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ "</w>"
    var done = false
    while (!done && syms.size >= 2) {
      val cands = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => ranks.get(p).map(r => (r, i)) }
      if (cands.isEmpty) done = true
      else {
        val (_, i) = cands.minBy(_._1)
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  test("encodeDocuments matches the reference greedy encode and stays codegen'd") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val merges = Bpe.learnMerges(docs, 15)
    val enc = Bpe.encodeDocuments(docs, merges)
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.linesIterator.filter(_.contains("bpe_encode")).forall(_.contains("*")),
      s"bpe_encode fell out of codegen:\n$plan")
    val got = enc.select(col("doc_id"), col("subwords")).as[(Long, Seq[String])]
      .collect().toMap
    val ranks = merges.map { case (rank, l, r, _) => (l, r) -> rank }.toMap
    val texts = docs.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("t")).as[(Long, Seq[String])]
      .collect().toMap
    texts.foreach { case (id, words) =>
      val want = words.flatMap(w => refEncode(w, ranks))
      assert(got(id) == want, s"doc $id diverges: ${got(id).take(8)} vs ${want.take(8)}")
    }
    // more merges can only shorten (or keep) the encoding
    val enc0 = Bpe.encodeDocuments(docs, merges.take(3))
      .agg(sum("n_subwords")).head().getLong(0)
    val enc15 = enc.agg(sum("n_subwords")).head().getLong(0)
    assert(enc15 < enc0, s"15 merges must compress below 3 ($enc15 vs $enc0)")
  }

  test("batched mergesPerRound equals exact greedy on a separated corpus") {
    import spark.implicits._
    // Four symbol-disjoint merge groups with well-separated primary
    // counts (100 > 90 > 85 > 80) and every context/cascade pair <= 40,
    // so the top-2 of each recount genuinely don't interact: batched
    // k=2 must reproduce exact greedy (k=1) verbatim, counts included.
    val words = Seq(
      ("pabq", 40), ("rabs", 35), ("tabu", 25), // (a,b) = 100
      ("vcdw", 40), ("xcdy", 30), ("zcd1", 20), // (c,d) = 90
      ("2ef3", 35), ("4ef5", 30), ("6ef7", 20), // (e,f) = 85
      ("8gh9", 30), ("ighj", 30), ("kghl", 20)) // (g,h) = 80
    val docs = words.zipWithIndex
      .map { case ((w, n), i) => (i.toLong, Array.fill(n)(w).mkString(" ")) }
      .toDF("doc_id", "text")
    val exact = Bpe.learnMerges(docs, 4)
    val batched = Bpe.learnMerges(docs, 4, mergesPerRound = 2)
    assert(exact == batched, s"batched diverged:\n exact=$exact\n batch=$batched")
    assert(exact.map(m => (m._2, m._3, m._4)) == Seq(
      ("a", "b", 100L), ("c", "d", 90L), ("e", "f", 85L), ("g", "h", 80L)),
      s"got $exact")
    // reference parity for the same corpus closes the loop
    val wc = words.map { case (w, n) => w -> n.toLong }.toMap
    assert(exact == refBpe(wc, 4))
  }

  test("batched learning on an interacting corpus: unique deterministic merges, valid encode") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val a = Bpe.learnMerges(docs, 9, mergesPerRound = 3)
    val b = Bpe.learnMerges(docs, 9, mergesPerRound = 3)
    assert(a == b, "batched learning must be deterministic")
    assert(a.size == 9 && a.map(m => (m._2, m._3)).distinct.size == 9,
      s"merge list must be 9 unique pairs: $a")
    assert(a.map(_._1) == (1 to 9), s"ranks must be dense: ${a.map(_._1)}")
    // the batched table still drives a well-formed greedy encode
    val n = Bpe.encodeDocuments(docs, a).agg(sum("n_subwords")).head().getLong(0)
    val n0 = Bpe.encodeDocuments(docs, a.take(1)).agg(sum("n_subwords")).head().getLong(0)
    assert(n < n0, s"9 batched merges must compress below 1 ($n vs $n0)")
  }

  test("learnMerges stops when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text") // one-char words: only (x,</w>) pairs
    val got = Bpe.learnMerges(docs, 10)
    // (a,</w>) and (b,</w>) merge in rounds 1-2, then single-symbol words
    // have no pairs left -> early exhaustion, not 10 rounds
    assert(got.size == 2 && got.map(m => (m._2, m._3)).toSet ==
      Set(("a", "</w>"), ("b", "</w>")), s"got $got")
  }
}
