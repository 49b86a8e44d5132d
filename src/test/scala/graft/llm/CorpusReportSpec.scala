package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed laws for the corpus-report operators: per-source
  * boilerplate removal and the cross-source overlap matrix.
  */
class CorpusReportSpec extends SparkSpec {

  test("removeBoilerplate: per-source frequency law on a hand fixture") {
    import spark.implicits._
    // sa: "hdr foo bar" opens 3 of 4 docs (75% >= 50% -> boilerplate);
    // sb: the same line opens only 1 of 3 docs (33% < 50% -> content)
    val docs = Seq(
      (1L, "sa", "hdr foo bar uniq one aaa"),
      (2L, "sa", "hdr foo bar uniq two bbb"),
      (3L, "sa", "hdr foo bar uniq three ccc"),
      (4L, "sa", "zzz yyy xxx www vvv uuu"),
      (5L, "sb", "hdr foo bar other content here"),
      (6L, "sb", "mmm nnn ooo ppp qqq rrr"),
      (7L, "sb", "sss ttt uu1 vv1 ww1 xx1")).toDF("doc_id", "source", "text")
    val got = TextAnalysis.removeBoilerplate(docs)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("uniq one aaa", 1L, 1L)), s"got ${got(1L)}")
    assert(got(2L) == (("uniq two bbb", 1L, 1L)))
    assert(got(3L) == (("uniq three ccc", 1L, 1L)))
    // untouched docs keep everything, order preserved
    assert(got(4L) == (("zzz yyy xxx www vvv uuu", 2L, 0L)))
    // the SAME line is content in sb — per-source, not corpus-global
    assert(got(5L) == (("hdr foo bar other content here", 2L, 0L)))
    assert(got(6L)._3 == 0L && got(7L)._3 == 0L)
  }

  test("removeBoilerplate: a fully-boilerplate document reduces to the empty string") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "tpl one two"),
      (2L, "s", "tpl one two"),
      (3L, "s", "tpl one two stay here now")).toDF("doc_id", "source", "text")
    val got = TextAnalysis.removeBoilerplate(docs)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("", 0L, 1L)))
    assert(got(3L) == (("stay here now", 1L, 1L)))
  }

  test("sourceOverlap: exact counts on a hand fixture; absent pairs emit no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sa", "a b c d"), // grams: "a b c", "b c d"
      (2L, "sb", "a b c x"), // grams: "a b c", "b c x"
      (3L, "sc", "p q r s")).toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceOverlap(docs, n = 3).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set(("sa", "sb")), "sc shares nothing -> no row")
    assert(got(("sa", "sb")) == ((2L, 2L, 1L, 500000L, 500000L)))
  }

  test("sourceOverlap: containment bounds hold on the real corpus (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val rows = TextAnalysis.sourceOverlap(docs, n = 3).collect()
    assert(rows.nonEmpty, "the fixture corpus shares grams across sources")
    rows.foreach { r =>
      val (na, nb, shared) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getString(0) < r.getString(1), "pairs are emitted once, ordered")
      assert(shared >= 1 && shared <= math.min(na, nb))
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L)
    }
  }
}
