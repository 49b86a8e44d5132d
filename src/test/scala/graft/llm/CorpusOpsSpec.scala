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

  test("vocabCoverage: hand-computed Zipf summary with deterministic " +
       "tie-break and k beyond the vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "a d")).toDF("doc_id", "text")
    // counts: a=4 b=2 c=1 d=1; total=8 vocab=4 hapax=2
    val got = TextAnalysis.vocabCoverage(docs, ks = Seq(1, 2, 10))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) == ((1L, 4L, 500000L, 8L, 4L, 2L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 6L, 750000L, 8L, 4L, 2L)), s"got ${got(2L)}")
    // k past the vocabulary: everything covered, n_types = vocab_size
    assert(got(10L) == ((4L, 8L, 1000000L, 8L, 4L, 2L)), s"got ${got(10L)}")
  }

  test("dedupLinesInDoc: first occurrence wins, order preserved, and " +
       "the plan is shuffle-free") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("x", "y", "x", "z", "y")),
      (2L, Seq("same", "same", "same")),
      (3L, Seq[String]())
    ).toDF("doc_id", "lines")
    val op = Dedup.dedupLinesInDoc(docs, "doc_id", col("lines"))
    val got = op.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("x\ny\nz", 3L, 2L)), s"got ${got(1L)}")
    assert(got(2L) == (("same", 1L, 2L)), s"got ${got(2L)}")
    assert(got(3L) == (("", 0L, 0L)), s"got ${got(3L)}")
    // document-local by construction: no Exchange anywhere in the plan
    val plan = op.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("keep-longest canonicalization: every cluster keeps exactly its " +
       "longest member (doc_id tie-break) at sf0.001") {
    val rows = graft.queries.LlmOps.xDedupKeepLongest(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val all = graft.Tables.documents(spark, sf("sf0.001")).count()
    assert(rows.length == all, "one verdict per corpus document")
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val kept = members.filter(_._4 == 1)
      assert(kept.length == 1, s"cluster $cid kept ${kept.length} members")
      val winner = members.minBy(m => (-m._3, m._1))
      assert(kept.head._1 == winner._1,
        s"cluster $cid kept ${kept.head} over the longest $winner")
    }
  }

  test("htmlToText: script/style content dropped, tags stripped, core " +
       "entities decoded once (no double-decode), whitespace collapsed") {
    import spark.implicits._
    val cases = Seq(
      ("<p>hello <b>world</b></p>", "hello world"),
      ("<script>var a = 1 < 2;</script>after", "after"),
      ("<STYLE type=x>p{}</style>ok", "ok"),
      // open/close tags must MATCH: a '</style>' inside script content
      // does not terminate the script element (round-11 ADVICE fix)
      ("<script>a.innerHTML='</style>'; leak();</script>clean", "clean"),
      ("a<!-- hidden -->b", "a b"),
      ("x &amp; y &lt;z&gt;", "x & y <z>"),
      // &amp;lt; is the LITERAL string "&lt;" -- amp decodes LAST
      ("&amp;lt;", "&lt;"),
      ("&quot;q&quot;&nbsp;end", "\"q\" end"),
      // numeric references pass through by contract
      ("&#65;&#x42;", "&#65;&#x42;"),
      ("  spaced\t\tout\n\n<br/>fine  ", "spaced out fine"))
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.htmlToText(org.apache.spark.sql.functions.col("h")))
      .collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"'$in' -> '$g' (want '$want')")
    }
  }

  test("urlCanonical + registrableDomain: lowering, www/port stripping, " +
       "query filter+sort, fragment drop, non-URL null, PSL heuristic") {
    import spark.implicits._
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443/Path/?b=2&utm_source=t&a=1#frag",
       "example.com/Path?a=1&b=2"),
      ("http://site.co.uk:80/x//", "site.co.uk/x"),
      ("http://site.co.uk:8080/x", "site.co.uk:8080/x"), // non-default port kept
      ("https://a.b.org", "a.b.org"),
      ("ftp://Files.Example.net/pub/", "files.example.net/pub"),
      ("not a url at all", null),
      ("relative/path?x=1", null),
      // a '?' INSIDE the fragment is NOT a query (SPA routes)
      ("http://example.com/app#/search?q=1", "example.com/app"),
      ("http://example.com/app?real=1#/x?fake=2", "example.com/app?real=1"))
    val got = cases.map(_._1).toDF("u")
      .select(TextAnalysis.urlCanonical(org.apache.spark.sql.functions.col("u")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"'$in' -> '$g' (want '$want')")
    }
    val domains = Seq(
      ("news.bbc.co.uk", "bbc.co.uk"),
      ("example.com", "example.com"),
      ("a.b.example.org", "example.org"), // org is in the SLD set: b.example? no -
      ("deep.sub.site.net:8080", "site.net"),
      ("localhost", null))
    val gotD = domains.map(_._1).toDF("h")
      .select(TextAnalysis.registrableDomain(org.apache.spark.sql.functions.col("h")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    domains.zip(gotD).foreach { case ((in, want), g) =>
      assert(g == want, s"'$in' -> '$g' (want '$want')")
    }
  }

  test("subtitleCues: SRT and WebVTT parse through one chain — CRLF, " +
       "3-digit hours, cue settings, NOTE/garbage drop, cue-id drop, " +
       "multi-line join, digit text lines preserved") {
    import spark.implicits._
    val srt = "1\r\n00:00:01,000 --> 00:00:04,500\r\nHello world\r\n" +
      "second line\r\n\r\n2\r\n100:59:59,999 --> 101:00:01,000\r\nlong movie"
    val vtt = "WEBVTT - with meta\nKind: captions\n\n" +
      "NOTE a comment\nspanning lines\n\n" +
      "intro-cue\n00:01:02.003 --> 00:01:03.004 align:start line:0\nStyled text\n\n" +
      "garbage block without timing\n\n" +
      "00:02:00.000 --> 00:02:01.000\n42\nafter a digit line"
    val df = Seq((1L, srt), (2L, vtt)).toDF("doc_id", "subs")
    val got = TextAnalysis.subtitleCues(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toList.sorted
    assert(got == List(
      (1L, 0L, 1000L, 4500L, "Hello world second line"),
      (1L, 1L, 100L * 3600000 + 59 * 60000 + 59000 + 999,
        101L * 3600000 + 1000, "long movie"),
      // VTT: blocks after header are NOTE(0), cue(1), garbage(2), cue(3);
      // the cue IDENTIFIER line precedes the timing line and drops
      (2L, 1L, 62003L, 63004L, "Styled text"),
      // text = everything AFTER the timing line: a bare number stays
      (2L, 3L, 120000L, 121000L, "42 after a digit line")), got.toString)
  }

  test("robotsAllowed: group selection, longest-match, allow-wins-tie, " +
       "metachar patterns, empty disallow, no-rules domains") {
    import spark.implicits._
    val robotsA = // CRLF + comments + case-odd directives
      "# note\r\nUSER-AGENT: *\r\ndisallow: /a+b(c)\r\n" +
        "Allow: /dir/page\r\nDisallow: /dir/page\r\n" + // tie: allow wins
        "Disallow:\r\n" // empty = allow-all weight 0, matches everything
    val robotsB =
      "User-agent: otherbot\nUser-agent: graftbot\nDisallow: /x*z$\n\n" +
        "User-agent: *\nDisallow: /\n"
    val rules = TextAnalysis.parseRobots(
      Seq(("a.com", robotsA), ("b.com", robotsB)).toDF("domain", "robots"),
      col("robots"))
    val pages = Seq(
      (1L, "a.com", "/a+b(c)/d"),   // metachars must match literally
      (2L, "a.com", "/aab"),        // '+' is NOT a regex quantifier
      (3L, "a.com", "/dir/page"),   // tie -> allow
      (4L, "a.com", "/other"),      // only the empty disallow matches -> allowed
      (5L, "b.com", "/xyz"),        // graftbot group (shared UA lines), $ anchor
      (6L, "b.com", "/xyzq"),       // anchored pattern must NOT match
      (7L, "b.com", "/q"),          // specific group preempts '*' Disallow /
      (8L, "c.com", "/anything"))   // no rules at all -> allowed
      .toDF("doc_id", "domain", "path")
    val got = TextAnalysis.robotsAllowed(pages, rules, "graftbot/2.1")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> true, 7L -> true, 8L -> true), got.toString)
  }

  test("extractLinks: RFC 3986 resolution edges — root clamp on excess " +
       "../, pathless base, query preserved, pseudo-links and " +
       "fragment-only drop, bare href") {
    import spark.implicits._
    def links(url: String, html: String): List[(Long, String, String)] =
      TextAnalysis.extractLinks(Seq((1L, url, html)).toDF("doc_id", "url", "html"))
        .orderBy("link_idx")
        .select($"link_idx", $"href", $"url")
        .as[(Long, String, String)].collect().toList
    // excess ../ clamps at the root instead of escaping the authority
    val clamp = links("https://a.example/d/p.html",
      "<a href=\"../../../x\">deep</a>")
    assert(clamp == List((0L, "../../../x", "https://a.example/x")),
      clamp.toString)
    // base with NO path: relative links resolve against '/'
    val nopath = links("https://a.example",
      "<a href=\"rel\">r</a><a href=\"q?k=1&z=2\">q</a>")
    assert(nopath == List(
      (0L, "rel", "https://a.example/rel"),
      (1L, "q?k=1&z=2", "https://a.example/q?k=1&z=2")), nopath.toString)
    // fragments strip from otherwise-real links; pseudo-links drop
    val mixed = links("https://a.example/d/",
      "<a href=\"p#sec\">frag</a><a href=\"MAILTO:x@y\">m</a>" +
        "<a href=\"#only\">f</a><a href=tel:123>t</a><a href=\"\">e</a>")
    assert(mixed == List((0L, "p#sec", "https://a.example/d/p")),
      mixed.toString)
    // a trailing-directory base keeps the directory; ./ collapses at end
    val dot = links("https://a.example/d/e/",
      "<a href=\"./\">here</a><a href=\"..\">up</a>")
    assert(dot == List(
      (0L, "./", "https://a.example/d/e/"),
      (1L, "..", "https://a.example/d/")), dot.toString)
    // MIXED bare and quoted forms keep DOCUMENT order (the single
    // alternation pass — concat-of-two-extracts would misorder), and
    // data-href look-alikes never match (the [\s"'] boundary)
    val order = links("https://a.example/d/",
      "<a href=/bare1>b</a>" +
        "<a class=\"x\" href=\"https://q.example/q2\">q</a>" +
        "<a data-href=\"https://no.example/skip\">decoy</a>" +
        "<a href='//p.example/p3'>p</a>")
    assert(order == List(
      (0L, "/bare1", "https://a.example/bare1"),
      (1L, "https://q.example/q2", "https://q.example/q2"),
      (2L, "//p.example/p3", "https://p.example/p3")), order.toString)
    // mismatched quote types never smear across values: '…" is read as
    // a bare token, terminated by whitespace/quote/>
    val mm = links("https://a.example/",
      "<a href=x'y>odd</a><a href=\"ok\">k</a>")
    assert(mm.map(t => (t._1, t._2)) == List((0L, "x"), (1L, "ok")),
      mm.toString)
    // `href=` INSIDE another attribute's quoted value is not an
    // attribute: the real href must win, not the decoy (quoted values
    // consume atomically in the prefix)
    val poison = links("https://a.example/",
      "<a title=\"see href=https://evil.example for info\" " +
        "href=\"https://good.example/x\">g</a>" +
        "<a alt='href=https://evil2.example' href=/real>r</a>")
    assert(poison.map(_._3) ==
      List("https://good.example/x", "https://a.example/real"),
      poison.toString)
    // no-space attribute runs (title="x"href="y") still extract: the
    // boundary is a lookbehind, so the closing quote both terminates
    // the prior value and satisfies the boundary
    val tight = links("https://a.example/",
      "<a title=\"x\"href=\"/tight\">t</a>")
    assert(tight.map(_._3) == List("https://a.example/tight"),
      tight.toString)
  }

  test("htmlTables: attribute-laden tags, th+td mix, markup inside " +
       "cells stripped, script tables ignored, empty page -> no rows") {
    import spark.implicits._
    def cells(html: String): Seq[(Long, Long, Long, String)] =
      TextAnalysis.htmlTables(Seq((1L, html)).toDF("doc_id", "html"))
        .orderBy("table_idx", "row_idx", "col_idx")
        .select($"table_idx", $"row_idx", $"col_idx", $"cell")
        .as[(Long, Long, Long, String)].collect().toSeq
    val page =
      "<table class=\"data\" id=t1>" +
        "<tr><th scope=\"col\">Name</th><th>Score</th></tr>" +
        "<tr class=\"odd\"><td><a href=\"/u/7\">Ann</a></td>" +
        "<td align=right> 93 </td></tr></table>" +
        "<script>renderTable('<table><tr><td>fake</td></tr></table>')" +
        "</script>" +
        "<TABLE><TR><TD>upper&nbsp;case</TD></TR></TABLE>"
    assert(cells(page) == Seq(
      (0L, 0L, 0L, "Name"), (0L, 0L, 1L, "Score"),
      (0L, 1L, 0L, "Ann"), (0L, 1L, 1L, "93"),
      (1L, 0L, 0L, "upper&nbsp;case")))
    assert(cells("<p>no tables at all</p>").isEmpty)
  }

  test("sentenceSplit: abbreviations, decimals, initials, quotes and " +
       "parens at boundaries, terminator runs, no empty sentences") {
    import spark.implicits._
    def sents(t: String): Seq[String] =
      Seq(Tuple1(t)).toDF("t")
        .select(TextAnalysis.sentenceSplit($"t").as("s"))
        .as[Seq[String]].head()
    assert(sents("Dr. Smith met Prof. Jones. They talked.") ==
      Seq("Dr. Smith met Prof. Jones.", "They talked."))
    assert(sents("Pi is 3.14159 exactly. Almost.") ==
      Seq("Pi is 3.14159 exactly.", "Almost."))
    assert(sents("J. R. R. Tolkien wrote it. I read it.") ==
      Seq("J. R. R. Tolkien wrote it.", "I read it."))
    assert(sents("He said \"stop.\" Then left. (Really.) Yes!") ==
      Seq("He said \"stop.\"", "Then left.", "(Really.)", "Yes!"))
    assert(sents("What?! No way... Sure.") ==
      Seq("What?!", "No way...", "Sure."))
    assert(sents("One.   Two.\n\nThree.") == Seq("One.", "Two.", "Three."))
    assert(sents("no terminator at all") == Seq("no terminator at all"))
    assert(sents("") == Seq.empty)
    // e.g./i.e. interior dots survive inside a sentence
    assert(sents("Use tools, e.g. hammers, daily. Done.") ==
      Seq("Use tools, e.g. hammers, daily.", "Done."))
  }

  test("markdownToText: code drops (fenced + indented), structure " +
       "unwraps, reference links and defs, rules, html residue") {
    import spark.implicits._
    def strip(md: String): String =
      Seq(Tuple1(md)).toDF("md")
        .select(TextAnalysis.markdownToText($"md").as("t"))
        .as[String].head()
    assert(strip("## Head\n\nbody **bold** _em_ ~~gone~~ text\n") ==
      "Head\n\nbody bold em gone text")
    assert(strip("pre\n\n```scala\nval x = 1\n```\n\npost\n") ==
      "pre\n\npost")
    assert(strip("pre\n\n    indented_code()\n    more()\n\npost") ==
      "pre\n\npost")
    assert(strip("See [the docs][1] and [inline](http://x) now.\n\n" +
      "[1]: http://ref.example\n") == "See the docs and inline now.")
    assert(strip("![logo alt](http://img) stays\n\n---\n\nafter rule") ==
      "logo alt stays\n\nafter rule")
    assert(strip("1. first\n2. second\n\n> quote\n>> deep\n") ==
      "first\nsecond\n\nquote\ndeep")
    assert(strip("a <span class=\"x\">tagged</span> word") ==
      "a tagged word")
    assert(strip("`inline code` kept as text") == "inline code kept as text")
  }

  test("contentBlocks + mainContent: link-density keeps prose and drops " +
       "nav/footer/link-stubs; br splits; inline tags and entities stay " +
       "in-block; title never surfaces") {
    import spark.implicits._
    val html =
      "<html><head><title>My Portal</title></head><body>" +
        "<nav><a href='/'>Home</a> <a href='/l'>Login now please</a></nav>" +
        "<p>This <b>bold</b> paragraph has &amp; keeps enough characters." +
        "<br>Second half after the break also has plenty of characters.</p>" +
        "<p>Click <a>here for more of everything on sale</a> now!</p>" +
        "<footer><a>About</a></footer></body></html>"
    val got = TextAnalysis.contentBlocks(Seq((1L, html)).toDF("doc_id", "html"))
      .orderBy("block_idx")
      .select($"text", $"n_chars", $"n_anchor_chars", $"kept")
      .as[(String, Long, Long, Boolean)].collect().toList
    assert(got == List(
      // nav: 21 text chars, all anchors -> dropped (density)
      ("Home Login now please", 21L, 21L, false),
      // first half of the split paragraph: inline <b> stays in-block,
      // entity decodes, no anchors -> kept
      ("This bold paragraph has & keeps enough characters.", 50L, 0L, true),
      // second half (after <br>) long enough, clean -> kept
      ("Second half after the break also has plenty of characters.",
        58L, 0L, true),
      // mixed: 35 anchor chars of 46 -> 76% > 40% -> dropped
      ("Click here for more of everything on sale now!", 46L, 35L, false),
      ("About", 5L, 5L, false)), got.toString)
    // document-local by construction: no Exchange anywhere in the plan
    // (block_idx is the explode position, not a windowed rank)
    val plan = TextAnalysis.contentBlocks(Seq((1L, html)).toDF("doc_id", "html"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val main = TextAnalysis.mainContent(Seq((1L, html)).toDF("doc_id", "html"))
      .select($"main_text").as[String].head()
    assert(main == "This bold paragraph has & keeps enough characters. " +
      "Second half after the break also has plenty of characters.", main)
    // a document with no kept block vanishes from mainContent
    assert(TextAnalysis.mainContent(
      Seq((2L, "<p><a>only links</a></p>")).toDF("doc_id", "html")).count() == 0)
  }

  test("crawlDelaySeconds + frontierSchedule: group selection, min of " +
       "repeated lines, non-numeric ignored, default for undeclared, " +
       "offsets sequence per domain") {
    import spark.implicits._
    val rules = TextAnalysis.parseRobots(Seq(
      // specific group preempts the '*' delay; repeated line -> min
      ("a.com", "User-agent: graftbot\nCrawl-delay: 3\nCrawl-delay: 2\n" +
        "Disallow: /x\n\nUser-agent: *\nCrawl-delay: 9\n"),
      // only a '*' group applies
      ("b.com", "User-agent: *\nCrawl-delay: 0.5\nDisallow: /deny\n"),
      // non-numeric delay ignored -> domain absent from the delay table
      ("c.com", "User-agent: *\nCrawl-delay: soon\nDisallow:\n"))
      .toDF("domain", "robots"), col("robots"))
    val delays = TextAnalysis.crawlDelaySeconds(rules, "graftbot/2.1")
      .as[(String, Double)].collect().toMap
    assert(delays == Map("a.com" -> 2.0, "b.com" -> 0.5), delays.toString)
    val pages = Seq(
      (1L, "a.com", "/p1", 0.9), (2L, "a.com", "/p2", 0.1),
      (3L, "a.com", "/p0", 0.9),  // priority tie -> path order
      (4L, "b.com", "/deny", 0.9), // disallowed: out of the plan
      (5L, "b.com", "/ok", 0.5),
      (6L, "d.com", "/solo", 0.0)) // no rules at all -> default delay
      .toDF("doc_id", "domain", "path", "priority")
    val got = TextAnalysis.frontierSchedule(pages, rules, "graftbot/2.1",
      defaultDelayMs = 250)
      .select($"doc_id", $"delay_ms", $"fetch_seq", $"fetch_offset_ms")
      .as[(Long, Long, Long, Long)].collect().toList.sortBy(_._1)
    assert(got == List(
      (1L, 2000L, 2L, 2000L),  // a.com: /p0 (tie, path-first) then /p1
      (2L, 2000L, 3L, 4000L),  // lowest priority last
      (3L, 2000L, 1L, 0L),
      (5L, 500L, 1L, 0L),      // /deny dropped; survivor leads
      (6L, 250L, 1L, 0L)),     // undeclared -> caller default
      got.toString)
    // robotsAllowed is unaffected by crawl-delay rows (no phantom rules)
    val ra = TextAnalysis.robotsAllowed(
      pages.filter($"domain" === "a.com"), rules, "graftbot/2.1")
      .select($"doc_id", $"allowed").as[(Long, Boolean)].collect().toMap
    assert(ra == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("robotsAllowedWithStatus: 4xx robots allows all, 5xx denies all " +
       "('unreachable'), 200 and unknown-status domains take the " +
       "parsed-rules path") {
    import spark.implicits._
    val rules = TextAnalysis.parseRobots(
      Seq(("ok.com", "User-agent: *\nDisallow: /x\n")).toDF("domain", "robots"),
      col("robots"))
    val statuses = Seq(("ok.com", 200), ("gone.com", 404), ("down.com", 503))
      .toDF("domain", "robots_status")
    val pages = Seq(
      (1L, "ok.com", "/x"), (2L, "ok.com", "/y"),
      (3L, "gone.com", "/x"),   // 4xx: MAY access anything
      (4L, "down.com", "/y"),   // 5xx: MUST assume full disallow
      (5L, "nostatus.com", "/z")) // absent status: normal path (no rules)
      .toDF("doc_id", "domain", "path")
    val got = TextAnalysis.robotsAllowedWithStatus(
        pages, rules, statuses, "graftbot/2.1")
      .select($"doc_id", $"allowed", $"matched_rule")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2))).toList.sortBy(_._1)
    assert(got == List(
      (1L, false, "disallow"), (2L, true, null),
      (3L, true, null), (4L, false, "unreachable"), (5L, true, null)),
      got.toString)
  }

  test("robotsSitemaps: multiple/absent Sitemap lines, any position, " +
       "case-insensitive directive, comment strip, duplicate rows " +
       "preserved") {
    import spark.implicits._
    val withTwo = // directives before AND after groups, mixed case
      "Sitemap: https://a.com/sm1.xml\n" +
        "User-agent: *\nDisallow: /x\n\n" +
        "  SITEMAP:   https://a.com/sm2.xml   # the news one\n"
    val withDup =
      "sitemap: https://b.com/sm.xml\r\nsitemap: https://b.com/sm.xml\r\n"
    val without = "User-agent: *\nDisallow: /\n"
    val decoy = "User-agent: *\n# Sitemap: https://c.com/commented.xml\n" +
      "Disallow: sitemap: not-a-directive\n"
    val got = TextAnalysis.robotsSitemaps(
      Seq(("a.com", withTwo), ("b.com", withDup), ("c.com", without),
        ("d.com", decoy)).toDF("domain", "robots"))
      .select("domain", "sitemap_url").as[(String, String)]
      .collect().toList.sorted
    assert(got == List(
      ("a.com", "https://a.com/sm1.xml"), ("a.com", "https://a.com/sm2.xml"),
      ("b.com", "https://b.com/sm.xml"), ("b.com", "https://b.com/sm.xml")),
      got.toString)
  }

  test("sitemapEntries: urlset fields, CDATA loc, comment decoy skip, " +
       "whitespace trim, sitemapindex, container tags never match, " +
       "bad priority null, empty/no-entry docs vanish") {
    import spark.implicits._
    val urlset =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<!-- <url><loc>https://decoy.example/skip</loc></url> -->
        |<url>
        |  <loc>  https://a.example/p1  </loc>
        |  <lastmod>2026-03-15</lastmod>
        |  <changefreq>daily</changefreq>
        |  <priority>0.8</priority>
        |</url>
        |<url><loc><![CDATA[https://a.example/p2?x=1&y=2]]></loc>
        |  <priority>high</priority></url>
        |<url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val index =
      "<sitemapindex><sitemap><loc>https://b.example/s1.xml</loc>" +
        "<lastmod>2026-02-02</lastmod></sitemap>\n" +
        "<sitemap><loc>https://b.example/s2.xml</loc></sitemap>" +
        "</sitemapindex>"
    val df = Seq((1L, urlset), (2L, index), (3L, "not xml at all"),
      (4L, "<urlset></urlset>")).toDF("doc_id", "xml")
    val got = TextAnalysis.sitemapEntries(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5),
        if (r.isNullAt(6)) null else r.getDouble(6).toString))
      .toList.sortBy(t => (t._1, t._2))
    assert(got == List(
      (1L, 0L, "url", "https://a.example/p1", "2026-03-15", "daily", "0.8"),
      // CDATA unwraps; non-numeric priority -> null double
      (1L, 1L, "url", "https://a.example/p2?x=1&y=2", null, null, null),
      // loc-less entry still surfaces (an auditable protocol violation)
      (1L, 2L, "url", null, "2026-01-01", null, null),
      (2L, 0L, "sitemap", "https://b.example/s1.xml", "2026-02-02",
        null, null),
      (2L, 1L, "sitemap", "https://b.example/s2.xml", null, null, null)),
      got.toString)
  }

  test("registrableDomainPsl: longest-rule match, wildcard and " +
       "exception rules, implicit-* default, suffix-only hosts null, " +
       "rules broadcast-joined") {
    import spark.implicits._
    // a 20-rule PSL subset in the PUBLIC list format
    val rules = Seq(
      "com", "org", "net", "io", "uk", "co.uk", "org.uk", "ac.uk",
      "jp", "ac.jp", "co.jp", "github.io", "ck", "*.ck", "!www.ck",
      "au", "com.au", "*.kobe.jp", "!city.kobe.jp", "blogspot.com"
    ).toDF("rule")
    val cases = Seq(
      ("example.com", "example.com"),
      ("a.example.com", "example.com"),
      ("example.co.uk", "example.co.uk"),      // co.uk beats uk
      ("deep.a.example.co.uk", "example.co.uk"),
      ("co.uk", null),                          // host IS a public suffix
      ("foo.github.io", "foo.github.io"),       // the github.io grouping
      ("a.b.foo.github.io", "foo.github.io"),
      ("github.io", null),
      ("x.blogspot.com", "x.blogspot.com"),     // private-section rule
      ("foo.bar.ck", "foo.bar.ck"),             // *.ck: bar.ck is a suffix
      ("bar.ck", null),
      ("www.ck", "www.ck"),                     // !www.ck beats *.ck
      ("sub.www.ck", "www.ck"),
      ("a.b.kobe.jp", "a.b.kobe.jp"),           // *.kobe.jp
      ("city.kobe.jp", "city.kobe.jp"),         // !city.kobe.jp
      ("x.city.kobe.jp", "city.kobe.jp"),
      ("example.xyz", "example.xyz"),           // implicit * default
      ("a.example.xyz", "example.xyz"),
      ("xyz", null),
      ("example.com:8080", "example.com"),      // port stripped
      (null, null))
    val df = cases.zipWithIndex
      .map { case ((h, _), i) => (i.toLong, h) }.toDF("id", "h")
    val got = TextAnalysis.registrableDomainPsl(df, "h", rules)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getString(2))).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"'$in' -> '${got(i.toLong)}' (want '$want')")
    }
    // repeated hosts resolve identically (the distinct-host path)
    val rep = Seq((1L, "a.example.com"), (2L, "a.example.com")).toDF("id", "h")
    val gotRep = TextAnalysis.registrableDomainPsl(rep, "h", rules)
      .collect().map(_.getString(2)).toSeq
    assert(gotRep == Seq("example.com", "example.com"))
    // the rules side is broadcast (never a shuffled join on the PSL)
    val plan = TextAnalysis.registrableDomainPsl(df, "h", rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"PSL rules must broadcast:\n$plan")
  }
}
