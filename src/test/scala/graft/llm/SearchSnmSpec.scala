package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Phrase search (positional index) and sorted-neighborhood dedup. */
class SearchSnmSpec extends SparkSpec {
  import spark.implicits._

  test("phraseSearch equals the direct array-scan definition (sf0.001, 2- and 3-token phrases)") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    for (phrase <- Seq(Seq("key", "scan"), Seq("the", "key", "scan"))) {
      // independent definition: slide over the token array itself
      val n = phrase.length
      val direct = docs
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= n)
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(1), size(col("ts")) - (n - 1)),
            i => concat_ws(" ", slice(col("ts"), i, lit(n))))))
        .filter(col("col") === phrase.mkString(" "))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val viaIndex = TextAnalysis.phraseSearch(docs, phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaIndex == direct, s"phrase $phrase: index path must equal array scan")
    }
  }

  test("phraseSearch: absent phrase yields empty, single-term phrase counts occurrences") {
    val docs = Seq((1L, "a b c a b"), (2L, "c c c")).toDF("doc_id", "text")
    assert(TextAnalysis.phraseSearch(docs, Seq("zebra")).count() == 0)
    val single = TextAnalysis.phraseSearch(docs, Seq("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single == Map(1L -> 1L, 2L -> 3L))
    val multi = TextAnalysis.phraseSearch(docs, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(multi == Set((1L, 2L, 0)))
    intercept[IllegalArgumentException](
      TextAnalysis.phraseSearch(docs, Seq.empty))
  }

  test("SNM finds adjacent planted near-dups and respects the rank window") {
    // five docs: 0 and 1 near-identical (sort adjacent), 4 identical to 0
    // but with a different leading token (different block — documented miss)
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon eta"),
      (2L, "omicron pi rho sigma tau upsilon"),
      (3L, "omicron pi rho sigma tau phi"),
      (4L, "zzz beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhoodPairs(docs, window = 4,
      blockChars = 4, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "adjacent near-dup pair must be found")
    assert(pairs.contains((2L, 3L)), "second block's pair must be found")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "cross-block near-dup is the documented miss")
    // jaccard values are exact: 5 shared of 7 distinct-union = 5/7
    val j = Dedup.sortedNeighborhoodPairs(docs, 4, 4, 0.5)
      .filter(col("d1") === 0L && col("d2") === 1L)
      .head().getAs[Double]("jaccard")
    assert(j == 5.0 / 7.0)
  }

  test("SNM plan: per-block window (no single-partition global sort), one self-join") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val df = Dedup.sortedNeighborhoodPairs(docs, window = 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"ranking must be a window:\n$plan")
    assert(plan.contains("partitionBy" ) || plan.contains("__block"),
      s"window must partition by the block key, not run globally:\n$plan")
    // no global Exchange SinglePartition feeding a Window
    val lines = plan.linesIterator.toVector
    val singleIdx = lines.indexWhere(_.contains("Exchange SinglePartition"))
    assert(singleIdx == -1 ||
      !lines.take(singleIdx).reverse.headOption.exists(_.contains("Window")),
      s"no single-partition window allowed:\n$plan")
  }

  test("typoPairs: finds exactly the ed<=1 pairs — substitution, " +
       "insertion/deletion, NOT transposition; minLen and df honored") {
    val docs = Seq(
      "color colour colxr",  // colour: insertion; colxr: substitution
      "color claor",         // claor: ed-2 transposition of 'color' vars
      "abc abd",             // below minLen=4: never paired
      "color"                // df(color) = 3
    ).map(Tuple1(_)).toDF("text")
    val got = Dedup.typoPairs(docs, col("text"), minLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    // independent in-memory quadratic oracle over the >=4-char vocab
    val vocab = Map("color" -> 3L, "colour" -> 1L, "colxr" -> 1L, "claor" -> 1L)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val oracle = (for {
      (a, da) <- vocab; (b, db) <- vocab
      if a < b && lev(a, b) <= 1
    } yield (a, b, da, db)).toSet
    assert(got == oracle, s"got $got\noracle $oracle")
    // hand expectations: color~colour (insertion), color~colxr
    // (substitution) pair; colour~colxr is ed 2 despite both being
    // neighbors of color — neighborhood intersection alone would admit
    // it via shared variants only if one existed, the lev check decides
    assert(got.contains(("color", "colour", 3L, 1L)), s"got $got")
    assert(got.contains(("color", "colxr", 3L, 1L)), s"got $got")
    assert(!got.exists(p => p._1 == "claor" || p._2 == "claor"),
      "transposition is ed 2 — must be verified away")
    assert(!got.exists(p => p._1.length < 4 || p._2.length < 4))
  }

  test("typoPairs plan contract: variant equi-join, no cartesian/NLJ, " +
       "corpus collapses to vocabulary before any fan-out") {
    val plan = Dedup.typoPairs(graft.Tables.documents(spark, sf("sf0.001")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidates must ride the variant equi-join:\n$plan")
  }

  test("typoPairs property: equals the quadratic levenshtein oracle on " +
       "random small-alphabet vocabularies (the collision-heavy regime)") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // alphabet {a,b}: dense deletion-variant collisions
      val vocab = (1 to 40).map(_ =>
        (1 to (4 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(2)).toChar)
          .mkString).distinct
      val docs = Seq(Tuple1(vocab.mkString(" "))).toDF("text")
      val got = Dedup.typoPairs(docs, col("text"), minLen = 4)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val want = (for {
        a <- vocab; b <- vocab
        if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      assert(got == want, s"trial $trial: got ${got.size} want ${want.size}\n" +
        s"missing ${want -- got}\nextra ${got -- want}")
    }
  }

  test("typoPairs minLen boundary: a pair straddling the boundary is " +
       "dropped even when the edit is real — the documented contract") {
    // minLen=4: "abcd"~"abc" IS ed 1 but "abc" never enters the vocab,
    // so the pair must NOT appear; "abcd"~"abcde" (both >= 4) must.
    // Exactly-at-boundary tokens participate (>= is inclusive).
    val docs = Seq(Tuple1("abcd abc abcde wxyz")).toDF("text")
    val got = Dedup.typoPairs(docs, col("text"), minLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("abcd", "abcde")), s"got $got")
    // at minLen=3 the straddling pair appears — boundary, not bug
    val got3 = Dedup.typoPairs(docs, col("text"), minLen = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got3 == Set(("abc", "abcd"), ("abcd", "abcde")), s"got $got3")
  }

  test("deletion-variant arithmetic is CODE-POINT based and agrees with " +
       "levenshtein on surrogate pairs and combining marks") {
    // typoPairs' variant expr uses substring/length and verifies with
    // levenshtein. If their unit of 'one character' ever diverged
    // (UTF-16 units vs code points), a deletion on a supplementary-
    // plane char (one code point = TWO UTF-16 units = four UTF-8
    // bytes) would produce a variant levenshtein counts as distance 2,
    // silently breaking the ed<=1 recall guarantee for any future
    // non-ascii tokenizer. Pin the shared basis directly on the
    // expression: every deletion variant of w must be at levenshtein
    // distance exactly 1 from w (or 0 never — all inputs distinct).
    val words = Seq(
      "café",          // BMP accent, 1 code point
      "café",         // combining acute: 'e' + mark, 2 code points
      "a𝕏b",     // U+1D54F double-struck X: surrogate pair
      "😀xy",     // emoji + ascii
      "𝕏𝕐") // two supplementary chars only
    val df = words.map(Tuple1(_)).toDF("tok")
    val vars = df.select(col("tok"),
      explode(expr("transform(sequence(1, length(tok)), i -> " +
        "concat(substring(tok, 1, i - 1), " +
        "substring(tok, i + 1, length(tok))))")).as("v"))
      .withColumn("lev", levenshtein(col("tok"), col("v")))
      .collect()
    vars.foreach { r =>
      val (tok, v, lev) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(lev == 1,
        s"variant '$v' of '$tok' at levenshtein $lev — substring/length " +
          "and levenshtein disagree on the character unit")
      // the deleted unit is one CODE POINT: variant is exactly one
      // code point shorter, never a torn surrogate half
      assert(tok.codePointCount(0, tok.length) -
        v.codePointCount(0, v.length) == 1, s"'$tok' -> '$v'")
      // no torn surrogate halves: a UTF-8 round-trip is lossless only
      // for well-formed UTF-16 (a lone half becomes U+FFFD)
      assert(new String(v.getBytes("UTF-8"), "UTF-8") == v,
        s"torn surrogate in variant '$v' of '$tok'")
    }
    // and each word yields exactly codePointCount variants
    val byTok = vars.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    words.foreach { w =>
      assert(byTok(w) == w.codePointCount(0, w.length), s"'$w': ${byTok(w)}")
    }
  }
}
