package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge cases for the round-5 corpus operators: chunking, co-occurrence,
  * inverted index, curriculum binning.
  */
class CorpusOpsSpec extends SparkSpec {

  test("chunkDocuments: coverage, overlap, exact-fit and short-doc edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a" * 1000),  // ceil((1000-100)/300)=3 chunks
      (2L, "b" * 400),   // exactly one window
      (3L, "c" * 401),   // one char past -> 2 chunks
      (4L, "d" * 50),    // shorter than overlap -> 1 chunk
      (5L, "")           // empty -> 1 empty chunk
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, "doc_id", size = 400, overlap = 100)
      .select("doc_id", "chunk_id", "char_off", "chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).size == 3 && byDoc(2L).size == 1 && byDoc(3L).size == 2 &&
      byDoc(4L).size == 1 && byDoc(5L).size == 1)
    // chunk 1 of doc 1 starts at 300: 100 chars shared with chunk 0
    assert(byDoc(1L)(1)._3 == 300L && byDoc(1L)(1)._4.length == 400)
    // last chunk of doc 1 is the 400-char tail starting at 600
    assert(byDoc(1L)(2)._4.length == 400 && byDoc(1L)(2)._3 == 600L)
    // full coverage: every char of doc 3 appears in some chunk
    assert(byDoc(3L).map(c => (c._3, c._3 + c._4.length)).foldLeft(0L) {
      case (cov, (off, end)) => assert(off <= cov, "gap in coverage"); math.max(cov, end)
    } == 401L)
    assert(byDoc(5L).head._4 == "")
  }

  test("cooccurrence: hand-computed bigram counts and rational PMI") {
    import spark.implicits._
    val docs = Seq("x y x y z", "x y q").toDF("text")
    // bigrams: (x,y)x2+(x,y)=3? doc1: x-y, y-x, x-y, y-z; doc2: x-y, y-q
    val got = TextAnalysis.cooccurrence(docs, minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (x,y) reaches minCount=2: c12=3, c(x)=3, c(y)=3, N=8
    assert(got.keySet == Set(("x", "y")))
    val (c12, c1, c2, pmi) = got(("x", "y"))
    assert(c12 == 3L && c1 == 3L && c2 == 3L)
    assert(pmi == 3.0 * 8 / (3 * 3))
  }

  test("invertedIndex: exact df, sorted capped postings") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, if (i <= 40) "common word" else "rare term"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", cap = 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got("common")._1 == 40L && got("rare")._1 == 10L)
    // cap: only the 8 smallest doc ids survive, in order
    assert(got("common")._2 == (1L to 8L).mkString(","))
    assert(got("rare")._2 == (41L to 48L).mkString(","))
  }

  test("invertedIndex: smallest-cap selection stays exact for ids above 2^53") {
    import spark.implicits._
    // ids around 2^60, 1 apart: a double-cast ordering key collapses
    // them to equal keys (2^60 and 2^60+1 round to the same double) and
    // the smallest-cap contract silently degrades; the constant-value
    // TopKAgg tie-break keeps the ordering in int64.
    val base = 1L << 60
    val docs = (0L to 19L).map(i => (base + i, "bigid")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", cap = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got("bigid")._1 == 20L)
    assert(got("bigid")._2 == (0L to 4L).map(base + _).mkString(","),
      s"exact smallest-5 ids expected, got ${got("bigid")._2}")
  }

  test("cooccurrence: unigram joins carry no forced broadcast hint (AQE owns the strategy)") {
    import spark.implicits._
    val docs = Seq("x y x y z", "x y q").toDF("text")
    val joins = TextAnalysis.cooccurrence(docs, minCount = 2L)
      .queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
    val hinted = joins.count(j =>
      j.hint.leftHint.exists(_.strategy.isDefined) ||
        j.hint.rightHint.exists(_.strategy.isDefined))
    // 3 joins total; only the one-row N scalar cross join is
    // hint-broadcast — a vocabulary-sized forced broadcast is a driver
    // OOM at corpus scale, so the two unigram joins must be hint-free
    assert(joins.size == 3, s"expected 3 joins, got ${joins.size}")
    assert(hinted == 1, s"only the scalar join may carry a hint, got $hinted")
  }

  test("curriculumBins: 4 near-equal stages, monotone in the signal") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, i % 97 + 3)).toDF("doc_id", "n")
    val got = Sampling.curriculumBins(docs, "n", numBins = 4)
      .select("doc_id", "n", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3), s"all four bins populated: $sizes")
    assert(sizes.values.forall(s => s > 60 && s < 140), s"roughly balanced: $sizes")
    // monotone: a doc with a larger signal never lands in a smaller bin
    val sorted = got.sortBy(_._2)
    assert(sorted.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }
}
