package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization/counting, quality scoring, language ID, canonical
  * fingerprinting. All are pure column expressions (whole-stage codegen,
  * no UDFs) — they scale linearly with a parquet scan and never shuffle.
  */
object TextAnalysis {

  /** ASCII word tokenizer: lowercase, split on any non-alphanumeric run.
    * (Same eval signature as the reference's IK-analyzer UDTF,
    * SplitFunction.java:9-18; CJK handling in graft.functions.Tokenize.) */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Deterministic, tiny, broadcast as literals into codegen. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "une", "dans", "que"),
    "es" -> Seq("el", "los", "las", "y", "que", "es", "una", "con", "para"),
    "zh" -> Seq("de5", "le5", "shi4", "zai4", "you3")) // romanized placeholders

  val stopwords: Seq[String] = langMarkers.flatMap(_._2).distinct

  /** Token counting: regex word tokens, whitespace tokens, and a BPE-ish
    * piece count (letter runs, single digits, single punctuation marks —
    * an upper-bound proxy for subword vocab pieces). */
  /** HTML → text extraction — the first step of every web-corpus
    * pipeline: drop script/style element CONTENT (their text is code,
    * not prose), drop comments, replace every remaining tag with a
    * space (so adjacent words don't fuse), decode the six core named
    * entities, collapse whitespace runs and trim. Deliberately
    * expressed as a chain of codegen'd `regexp_replace`/`replace`
    * calls over patterns BOTH Java regex and RE2 accept ((?is) flags,
    * non-greedy, no backreferences) — the exact same chain runs as the
    * DuckDB oracle, so the semantics are pinned cross-engine rather
    * than borrowed from any parser library. Contract bounds: numeric
    * character references (&#65;) pass through unchanged (decoding
    * them needs computation inside a replacement, which neither
    * engine's regexp_replace can express — a real deployment adds a
    * custom Expression for it), and the tag stripper is the standard
    * non-parsing approximation: a literal '<' in prose text would need
    * entity-escaping upstream, as real HTML requires anyway. */
  def htmlToText(html: Column): Column =
    stripAndDecode(removeNonContent(html))

  /** HTML table extraction — the structured-data face of page
    * parsing (tables carry the facts corpus pipelines want as rows,
    * not prose). One row per CELL: `(table_idx, row_idx, col_idx,
    * cell)`, cell text tag-stripped and whitespace-squeezed, `<th>`
    * and `<td>` both cells (header-ness is `row_idx == 0` in the
    * common case, a caller decision). Nested-array Column transforms
    * over `regexp_extract_all` — map-side, codegen'd, no UDF; nested
    * TABLES inside cells are out of scope (documented: the inner
    * table's cells surface under the OUTER cell's coordinates). */
  def htmlTables(df: DataFrame, html: Column = col("html"),
                 idCol: String = "doc_id"): DataFrame = {
    val clean = removeNonContent(html)
    val tables = regexp_extract_all(clean,
      lit("(?is)<table\\b[^>]*>(.*?)</table\\s*>"), lit(1))
    val out = df.select(col(idCol),
      posexplode(tables).as(Seq("table_idx", "__t")))
      .select(col(idCol), col("table_idx").cast("long").as("table_idx"),
        posexplode(regexp_extract_all(col("__t"),
          lit("(?is)<tr\\b[^>]*>(.*?)</tr\\s*>"), lit(1)))
          .as(Seq("row_idx", "__r")))
      .select(col(idCol), col("table_idx"),
        col("row_idx").cast("long").as("row_idx"),
        posexplode(regexp_extract_all(col("__r"),
          lit("(?is)<t[dh]\\b[^>]*>(.*?)</t[dh]\\s*>"), lit(1)))
          .as(Seq("col_idx", "__c")))
    out.select(col(idCol), col("table_idx"), col("row_idx"),
      col("col_idx").cast("long").as("col_idx"),
      trim(regexp_replace(regexp_replace(col("__c"),
        "(?s)<[^>]*>", " "), "\\s+", " ")).as("cell"))
  }

  /** Rule-based sentence segmentation — the boundary every
    * chunk/dedup/quality stage wants but naive `split('.')` gets
    * wrong. Protect-then-split, all codegen'd Column ops: common
    * abbreviations (Dr., e.g., No., U.S., a.m., …), decimal points
    * (3.14), and single-letter initials (J. R. R.) have their dots
    * masked with a sentinel; the text then splits at [.!?]+ followed
    * by whitespace and an upper/digit/quote/paren opener; sentinels
    * restore inside each sentence. Deliberately rule-based and
    * documented (the CCNet/corpus-pipeline convention) — no model, no
    * locale claim beyond English-ish punctuation. Returns
    * array<string> of trimmed non-empty sentences. */
  def sentenceSplit(text: Column): Column = {
    val S = "\u0001" // sentinel: never in real text (control char)
    val abbr = "(?i)\\b(dr|mr|mrs|ms|prof|rev|gen|sen|rep|st|jr|sr|" +
      "vs|etc|approx|dept|est|fig|inc|ltd|co|corp|no|vol|pp|" +
      "e\\.g|i\\.e|a\\.m|p\\.m|u\\.s|u\\.k)\\."
    val prot1 = regexp_replace(text, abbr, "$1" + S)
    // e.g / i.e / a.m style masked above still hold an interior dot —
    // mask any dot immediately followed by the sentinel'd tail too
    val prot2 = regexp_replace(prot1, "(\\w)\\.(\\w)", "$1" + S + "$2")
    // lookahead, not capture: "J. R. R." masks every initial — a
    // consumed trailing capital would make the runs alternate
    val prot3 = regexp_replace(prot2, "\\b([A-Z])\\.(?=\\s+[A-Z])", "$1" + S)
    // closers stay with the LEFT sentence: split() consumes its
    // delimiter, so they ride in a bounded lookbehind instead
    val parts = split(prot3,
      "(?<=[.!?][\"')\\]]{0,3})\\s+(?=[\"'(\\[]?[A-Z0-9])")
    filter(
      transform(parts, p =>
        trim(regexp_replace(p, S, "."))),
      p => length(p) > 0)
  }

  /** Markdown → plain text for quality scoring / dedup shingling —
    * the prose without the markup (and without CODE: fenced and
    * indented blocks drop entirely, the convention of corpus quality
    * pipelines, where code inflates length and deflates stopword
    * ratios). Ordered single-purpose passes, each a codegen'd
    * regexp_replace:
    * fences ``` … ``` (content dropped) → 4-space-indented code lines
    * dropped → ATX `#` headings unwrapped → blockquote `>` markers
    * stripped → list markers (`-*+`, `1.`) stripped → images `![alt]
    * (url)` → alt → links `[text](url)` / reference `[text][ref]` →
    * text → inline code backticks unwrapped → emphasis `**_~~`
    * unwrapped → reference-definition lines and horizontal rules
    * dropped → residual HTML tags stripped → whitespace squeezed.
    * Pure Column chain; the page never leaves its partition. */
  def markdownToText(md: Column): Column = {
    val noFence = regexp_replace(md, "(?s)```.*?```", " ")
    val noIndent = regexp_replace(noFence, "(?m)^(?:    |\\t)[^\\n]*$", "")
    val noHead = regexp_replace(noIndent, "(?m)^#{1,6}[ \\t]+", "")
    val noQuote = regexp_replace(noHead, "(?m)^[ \\t]*(?:>[ \\t]?)+", "")
    val noList = regexp_replace(noQuote,
      "(?m)^[ \\t]*(?:[-*+]|\\d{1,3}\\.)[ \\t]+", "")
    val img = regexp_replace(noList,
      "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val link = regexp_replace(img,
      "\\[([^\\]]+)\\]\\((?:[^)]*)\\)", "$1")
    val refLink = regexp_replace(link,
      "\\[([^\\]]+)\\]\\[[^\\]]*\\]", "$1")
    val noRefDef = regexp_replace(refLink,
      "(?m)^[ \\t]*\\[[^\\]]+\\]:[^\\n]*$", "")
    val noCode = regexp_replace(noRefDef, "`([^`\\n]*)`", "$1")
    val noEmph = regexp_replace(noCode,
      "(\\*\\*|__|\\*|_|~~)(\\S(?:[^\\n]*?\\S)?)\\1", "$2")
    val noRule = regexp_replace(noEmph,
      "(?m)^[ \\t]*(?:-{3,}|\\*{3,}|_{3,})[ \\t]*$", "")
    val noTags = regexp_replace(noRule, "<[^>\\n]+>", " ")
    val oneSpace = regexp_replace(noTags, "[ \\t]+", " ")
    val tightLines = regexp_replace(oneSpace, "[ \\t]*\\n[ \\t]*", "\n")
    // NOT trim(): Spark's trim strips spaces only, not newlines
    regexp_replace(
      regexp_replace(tightLines, "\\n{3,}", "\n\n"),
      "^\\s+|\\s+$", "")
  }

  /** The element-content passes shared by [[htmlToText]] and
    * [[contentBlocks]]: script, style, comments out (two SEPARATE
    * passes so the close tag must match the open tag — a single
    * alternation pattern would let '<script>…</style>…' terminate the
    * script element at the foreign close tag and leak trailing script
    * code into the extracted text). */
  private def removeNonContent(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Tag strip + entity decode + whitespace collapse — the terminal
    * text pass, applied per document ([[htmlToText]]) or per block
    * ([[contentBlocks]]). */
  private def stripAndDecode(c: Column): Column = {
    val noTags = regexp_replace(c, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&" // amp LAST: no double-decode
    ).foldLeft(noTags) { case (cc, (e, v)) => replace(cc, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** LINK-DENSITY block segmentation — the jusText/Boilerpipe signal,
    * the complement of the df-based site-chrome cut
    * ([[removeBoilerplate]] needs many pages per site; this one works
    * on a SINGLE page): the document splits at block-level tag
    * boundaries (p/div/h1–6/li/ul/ol/table/tr/td/th/section/article/
    * aside/header/footer/nav/blockquote/br/hr + html/head/body;
    * `<title>` content drops entirely — it is metadata, not body
    * text), each block measures its text length and its ANCHOR text
    * length (the characters inside `<a>…</a>`), and a block is kept
    * when it is long enough AND link-sparse enough
    * (`n_chars >= minChars` and `n_anchor_chars·100 <=
    * maxLinkDensityPct·n_chars` — integer arithmetic, no float
    * threshold ambiguity). Navigation bars, footers, and link lists
    * are exactly the high-density short blocks this drops. Output: one
    * row per non-empty block with `(block_idx, text, n_chars,
    * n_anchor_chars, kept)`; `block_idx` is 0-based document order —
    * empty segments filter INSIDE the split array, so the index is
    * simply the explode position. Fully map-side regexp chains; no
    * per-document window anywhere. */
  def contentBlocks(df: DataFrame, html: Column = col("html"),
                    idCol: String = "doc_id", minChars: Int = 25,
                    maxLinkDensityPct: Int = 40): DataFrame = {
    val noTitle = regexp_replace(removeNonContent(html),
      "(?is)<title\\b[^>]*>.*?</title\\s*>", " ")
    val marked = regexp_replace(noTitle,
      "(?i)</?(p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|" +
        "aside|header|footer|nav|blockquote|br|hr|html|head|body)\\b[^>]*>",
      "")
    // text + anchor text compute INSIDE the split array and empty
    // segments filter there too, so block_idx is simply the explode
    // position — no per-document window, the operator stays entirely
    // map-side (the 30x probe flagged the window shuffle this replaced)
    val blocks = filter(
      transform(split(marked, ""), seg => struct(
        stripAndDecode(seg).as("text"),
        stripAndDecode(array_join(
          regexp_extract_all(seg, lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"),
            lit(1)), " ")).as("atext"))),
      b => b.getField("text") =!= "")
    df.select(col(idCol), posexplode(blocks).as(Seq("block_idx", "__b")))
      .select(col(idCol), col("block_idx").cast("long").as("block_idx"),
        col("__b.text").as("text"),
        length(col("__b.text")).cast("long").as("n_chars"),
        length(col("__b.atext")).cast("long").as("n_anchor_chars"))
      .withColumn("kept",
        col("n_chars") >= minChars &&
          col("n_anchor_chars") * 100 <= col("n_chars") * maxLinkDensityPct)
  }

  /** Single-page main-content extraction: the kept blocks of
    * [[contentBlocks]] joined back into one text per document. */
  def mainContent(df: DataFrame, html: Column = col("html"),
                  idCol: String = "doc_id", minChars: Int = 25,
                  maxLinkDensityPct: Int = 40): DataFrame =
    contentBlocks(df, html, idCol, minChars, maxLinkDensityPct)
      .filter(col("kept"))
      .groupBy(col(idCol))
      .agg(array_join(
        array_sort(collect_list(struct(col("block_idx"), col("text"))))
          .getField("text"), " ").as("main_text"))

  /** OUTLINK extraction with RFC 3986 relative resolution — the
    * WAT/link-graph tier of a crawl (outlinks feed the frontier and
    * the host graph PageRank ranks): `href` values pull from `<a>`
    * tags (quoted or bare), fragments strip, `javascript:`/`mailto:`/
    * `tel:`/`data:` pseudo-links and empties drop, and each survivor
    * resolves against the page URL per §5.2: absolute passes through,
    * `//host/…` takes the base scheme, `/path` takes scheme://host,
    * anything else merges with the base path's directory; `./` and
    * `x/../` dot segments normalize (§5.2.4) with a DOCUMENTED unroll
    * bound of 8 levels — deeper chains keep their residue rather than
    * looping (real pages sit far below it). Output: one row per
    * extracted link `(link_idx, href, url)` in document order — quoted
    * and bare hrefs extract in ONE alternation pass, so a page mixing
    * both forms keeps its true order; the `[\s"']` boundary before
    * `href` stops `data-href=` look-alikes from matching. Map-side
    * regexp chains only. */
  def extractLinks(df: DataFrame, html: Column = col("html"),
                   baseUrl: Column = col("url"),
                   idCol: String = "doc_id"): DataFrame = {
    val clean = removeNonContent(html)
    // one pass, group 1 = the raw value token ("…" | '…' | bare) —
    // quotes strip below; a single scan is what keeps document order.
    // The prefix consumes other attributes' QUOTED VALUES ATOMICALLY
    // ("[^"]*"|'[^']*' — a bare [^>]*? would let `href=` inside e.g. a
    // title="… href=decoy …" value match, extracting the decoy and
    // skipping the tag's real href); the lookbehind keeps the
    // data-href= look-alike rejection without eating a boundary char.
    val rawVals = regexp_extract_all(clean,
      lit("(?is)<a\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*?" +
        "(?<=[\\s\"'])href\\s*=\\s*" +
        "(\"[^\"]*\"|'[^']*'|[^\"'\\s>]+)"), lit(1))
    val hrefs = transform(rawVals, v =>
      regexp_replace(v, "^[\"']|[\"']$", ""))
    val scheme = regexp_extract(baseUrl, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    val hostPort = regexp_extract(baseUrl,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val baseDir0 = regexp_replace(
      regexp_extract(baseUrl, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/[^/]*$", "/")
    val baseDir = when(baseDir0 === "", lit("/")).otherwise(baseDir0)
    val link0 = regexp_replace(col("href"), "#.*$", "") // fragment drops
    val resolved0 =
      when(link0.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), link0)
        .when(link0.startsWith("//"), concat(col("__sch"), lit(":"), link0))
        .when(link0.startsWith("/"),
          concat(col("__sch"), lit("://"), col("__hp"), link0))
        .otherwise(concat(col("__sch"), lit("://"), col("__hp"),
          col("__bd"), link0))
    // §5.2.4 dot-segment removal, unrolled (8 levels), applied to the
    // PATH only — the authority splits off first so "/seg/../" folding
    // can never consume the host; a leading "/../" clamps at root.
    val auth = regexp_extract(resolved0,
      "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val rest0 = regexp_replace(resolved0,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    val noDot = (1 to 3).foldLeft(rest0)((c, _) =>
      regexp_replace(c, "/\\.(/|$)", "/"))
    val folded = (1 to 8).foldLeft(noDot)((c, _) =>
      regexp_replace(c, "/(?!\\.\\./)[^/]+/\\.\\.(/|$)", "/"))
    val clampedPath = (1 to 8).foldLeft(folded)((c, _) =>
      regexp_replace(c, "^/\\.\\.(/|$)", "/"))
    val clamped = concat(auth, clampedPath)
    df.select(col(idCol), scheme.as("__sch"), hostPort.as("__hp"),
        baseDir.as("__bd"),
        posexplode(hrefs).as(Seq("link_idx", "href")))
      .filter(col("href") =!= "" &&
        !col("href").rlike("(?i)^(javascript|mailto|tel|data):") &&
        !regexp_replace(col("href"), "#.*$", "").equalTo(""))
      .select(col(idCol), col("link_idx").cast("long").as("link_idx"),
        col("href"), clamped.as("url"))
  }

  /** URL canonicalization — the web-corpus dedup key: lower-cased
    * host, `www.` and default ports stripped (`:80` for http, `:443`
    * for https), trailing path slashes removed, query parameters
    * FILTERED (empty and `utm_*` tracking params dropped) then SORTED
    * and rejoined, fragment dropped. Non-URLs (no `scheme://host`)
    * canonicalize to null. Like [[htmlToText]], every step is a
    * regexp/array-function chain with identical semantics in Java
    * regex and RE2 + DuckDB list functions, so the oracle runs the
    * SAME chain — the key's equality semantics are engine-pinned.
    * The SCHEME is deliberately dropped from the key: http://,
    * https:// (and any other scheme, e.g. ftp://) serving the same
    * host+path+query collapse to ONE dedup key — the web-corpus
    * convention (the same page crawled over http and https is the
    * same page). Callers that must keep schemes distinct prefix the
    * key themselves. Bounds: percent-encoding is NOT normalized
    * (%2F vs / stay distinct — decoding is content-dependent) and IDN
    * hosts pass through un-punycoded; all documented, all
    * deterministic. */
  def urlCanonical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rawHost = lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    // query = after the FIRST '?' that precedes any '#': [^#?]* walks
    // to that '?' without crossing a fragment, so a '?' INSIDE the
    // fragment (SPA routes like /app#/search?q=1) is never parsed as a
    // query — the documented fragment-dropped contract
    val query = array_join(array_sort(filter(
      split(regexp_extract(url, "^[^#?]*\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_"))), "&")
    when(host =!= "",
      concat(host, path, when(query =!= "", concat(lit("?"), query))
        .otherwise(lit(""))))
  }

  /** Registrable-domain HEURISTIC from a canonical host: the last two
    * labels, or the last three when the second-to-last is a common
    * second-level label (co/com/net/org/gov/ac/edu — e.g.
    * `bbc.co.uk`). A deliberate, documented approximation of the
    * Mozilla Public Suffix List (shipping the full PSL is a data
    * dependency, not an algorithm — a real deployment swaps the label
    * set; the grouping semantics stay). Ports are stripped first. */
  def registrableDomain(host: Column): Column = {
    val labels = split(regexp_replace(host, ":[0-9]+$", ""), "\\.")
    val n = size(labels)
    val sld = element_at(labels, -2)
    when(n >= 3 && sld.isin("co", "com", "net", "org", "gov", "ac", "edu"),
      concat_ws(".", element_at(labels, -3), sld, element_at(labels, -1)))
      .when(n >= 2, concat_ws(".", sld, element_at(labels, -1)))
  }

  /** PSL-BACKED registrable domain — the data-driven upgrade of
    * [[registrableDomain]] for deployments that ship the Mozilla
    * Public Suffix List (the heuristic stays the data-free default).
    * `rules` is one PSL rule per row in a `rule` column, the public
    * format: `com`, `co.uk` (normal), `*.ck` (wildcard — any single
    * label under ck is a public suffix), `!www.ck` (exception — www.ck
    * is NOT a public suffix despite the wildcard). Algorithm per the
    * published PSL spec: among matching rules the exception wins (its
    * suffix is the rule minus the leftmost label), else the LONGEST
    * match, else the implicit `*` default (rightmost label);
    * registrable domain = public suffix + one more label, null when
    * the host IS a public suffix.
    *
    * Scale shape: the RULES table broadcasts (the full PSL is ~10k
    * rows — model state, never data-sized); hosts are matched on
    * their DISTINCT values (one row per distinct host, label-suffix
    * candidates exploded ≤ label-count-bounded), and the result joins
    * back on the host value — no row-identity column needed, and
    * repeated hosts (the web-corpus norm) pay the suffix walk once. */
  def registrableDomainPsl(df: DataFrame, hostCol: String, rules: DataFrame,
                           out: String = "domain"): DataFrame = {
    val norm = rules.select(
      when(col("rule").startsWith("!"), lit("exc"))
        .when(col("rule").startsWith("*."), lit("wild"))
        .otherwise(lit("norm")).as("__rtype"),
      when(col("rule").startsWith("!"), expr("substring(rule, 2)"))
        .when(col("rule").startsWith("*."), expr("substring(rule, 3)"))
        .otherwise(col("rule")).as("__rkey"))
    val hosts = df.select(col(hostCol).as("__host")).filter(col("__host").isNotNull)
      .distinct()
      .withColumn("__labels",
        split(regexp_replace(col("__host"), ":[0-9]+$", ""), "\\."))
      .withColumn("__n", size(col("__labels")))
    // candidate suffix i = last i labels; its parent (i-1 labels) is the
    // wildcard join key: '*.ck' stored as key 'ck' matches any 2-label
    // candidate whose tail is 'ck'
    val cand = hosts.select(col("__host"), col("__labels"), col("__n"),
      explode(sequence(lit(1), col("__n"))).as("__i"))
      .withColumn("__suffix",
        concat_ws(".", slice(col("__labels"), col("__n") - col("__i") + 1, col("__i"))))
      .withColumn("__parent",
        when(col("__i") >= 2, concat_ws(".",
          slice(col("__labels"), col("__n") - col("__i") + 2, col("__i") - 1))))
    val exact = cand.join(broadcast(norm.filter(col("__rtype") =!= "wild")),
        col("__suffix") === col("__rkey"))
      .select(col("__host"),
        when(col("__rtype") === "exc", col("__i") - 1).otherwise(col("__i"))
          .as("__ps"),
        (col("__rtype") === "exc").as("__isExc"))
    val wild = cand.filter(col("__parent").isNotNull)
      .join(broadcast(norm.filter(col("__rtype") === "wild")),
        col("__parent") === col("__rkey"))
      .select(col("__host"), col("__i").as("__ps"), lit(false).as("__isExc"))
    val psLen = exact.unionByName(wild)
      .groupBy(col("__host"))
      .agg(max(when(col("__isExc"), col("__ps"))).as("__exc"),
        max(when(!col("__isExc"), col("__ps"))).as("__oth"))
      .select(col("__host"), coalesce(col("__exc"), col("__oth")).as("__psLen"))
    val resolved = hosts.join(psLen, Seq("__host"), "left")
      .withColumn("__ps", coalesce(col("__psLen"), lit(1))) // implicit '*'
      .select(col("__host"),
        when(col("__n") > col("__ps"),
          concat_ws(".", slice(col("__labels"),
            col("__n") - col("__ps"), col("__ps") + 1))).as(out))
    df.join(resolved, df(hostCol) === resolved("__host"), "left").drop("__host")
  }

  /** SRT / WebVTT subtitle cue extraction — how transcripts align to
    * audio/video in a multimodal corpus: one row per cue with integer
    * start/end milliseconds and the joined text. Cue blocks split on
    * blank lines (CRLF normalized); WebVTT inputs (leading `WEBVTT`
    * block, `.`-millisecond timestamps, cue settings after the arrow,
    * NOTE/STYLE blocks) and SRT inputs (index lines, `,`-millisecond
    * timestamps) both parse through ONE engine-portable regexp chain,
    * so the DuckDB oracle runs the SAME chain. Cue text = everything
    * AFTER the timing line (newlines joined with spaces) — SRT index
    * lines and VTT cue identifiers, which precede it, drop out
    * positionally. Contract bounds: blocks without a
    * `HH:MM:SS?mmm --> …` timing line drop out (VTT NOTE/STYLE blocks,
    * garbage); `cue_idx` is the block position after the VTT header
    * (dropped blocks leave gaps — position, not rank). Hour field is
    * 2+ digits (SRT allows longer movies). */
  def subtitleCues(df: DataFrame, subs: Column = col("subs"),
                   idCol: String = "doc_id"): DataFrame = {
    val norm = regexp_replace(subs, "\r\n?", "\n")
    val blocks0 = split(norm, "\n\n+")
    // the VTT signature is the WHOLE first token: "WEBVTT" then end,
    // whitespace or the spec's optional header text — "WEBVTTX" is not
    // a VTT header and must parse as (malformed) SRT, not lose a block
    val vtt = regexp_extract(norm, "^WEBVTT([ \t\n]|$)", 0) =!= ""
    val blocks = when(vtt,
      slice(blocks0, lit(2), greatest(size(blocks0) - 1, lit(0))))
      .otherwise(blocks0)
    val timing = "(\\d{2,}):(\\d{2}):(\\d{2})[,.](\\d{3})\\s*-->\\s*" +
      "(\\d{2,}):(\\d{2}):(\\d{2})[,.](\\d{3})"
    val exploded = df
      .select(col(idCol), posexplode(blocks).as(Seq("cue_idx", "__blk")))
    def grp(n: Int) = regexp_extract(col("__blk"), timing, n).cast("long")
    exploded
      .filter(regexp_extract(col("__blk"), timing, 0) =!= "")
      .select(col(idCol), col("cue_idx").cast("long").as("cue_idx"),
        (grp(1) * 3600000L + grp(2) * 60000L + grp(3) * 1000L + grp(4))
          .as("start_ms"),
        (grp(5) * 3600000L + grp(6) * 60000L + grp(7) * 1000L + grp(8))
          .as("end_ms"),
        trim(regexp_replace(
          regexp_extract(col("__blk"), "(?s)" + timing + "[^\n]*\n?(.*)", 9),
          "\n", " ")).as("text"))
  }

  /** Parse robots.txt content (RFC 9309) into a rule table: one row
    * per (group agent × rule) with the group structure preserved —
    * consecutive `User-agent` lines share the rule block that follows
    * (the spec's group semantics), directives are case-insensitive,
    * `#` comments strip, blank/foreign lines ignore. Rules are
    * `allow` / `disallow` (pattern = path expression) and, since
    * round 12, `crawl-delay` (pattern = the seconds value — the
    * de-facto group directive polite crawlers honor; [[robotsAllowed]]
    * ignores it, [[crawlDelaySeconds]] reads it). The sequential
    * group numbering is a per-DOMAIN window (robots files are KB-sized
    * — the window partition is one small file, never the corpus). */
  def parseRobots(df: DataFrame, robots: Column,
                  domainCol: String = "domain"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = split(regexp_replace(robots, "\r\n?", "\n"), "\n")
    val e = df.select(col(domainCol), posexplode(lines).as(Seq("__ln", "__line")))
      .withColumn("__dir", lower(regexp_extract(col("__line"),
        "(?i)^\\s*(user-agent|allow|disallow|crawl-delay)\\s*:", 1)))
      .withColumn("__val", trim(regexp_extract(col("__line"),
        "(?i)^\\s*(?:user-agent|allow|disallow|crawl-delay)\\s*:\\s*([^#]*)",
        1)))
      .filter(col("__dir") =!= "")
    val w = Window.partitionBy(col(domainCol)).orderBy(col("__ln"))
    val g = e
      .withColumn("__isUA", col("__dir") === "user-agent")
      .withColumn("__prevUA",
        coalesce(lag(col("__isUA"), 1).over(w), lit(false)))
      .withColumn("group_id",
        sum(when(col("__isUA") && !col("__prevUA"), 1L).otherwise(0L)).over(w))
    val agents = g.filter(col("__isUA"))
      .select(col(domainCol), col("group_id"), lower(col("__val")).as("agent"))
    val rules = g.filter(!col("__isUA"))
      .select(col(domainCol), col("group_id"), col("__dir").as("rule"),
        col("__val").as("pattern"))
    agents.join(rules, Seq(domainCol, "group_id"))
  }

  /** `Sitemap:` directive discovery from robots.txt — RFC 9309 §2.3 /
    * sitemaps.org: robots files ADVERTISE their sitemap URLs as
    * non-group lines (valid anywhere in the file, independent of
    * user-agent groups, case-insensitive directive, absolute URL
    * value). One output row per directive with the input columns plus
    * `sitemap_url` (trimmed, `#` comments stripped); rows whose robots
    * carry no Sitemap line disappear (explode of an empty match list)
    * — discovery yields nothing, which is the contract a crawl
    * frontier wants. Deliberately SEPARATE from [[parseRobots]]: that
    * one feeds [[robotsAllowed]] group/rule rows and sitemap lines
    * belong to no group. Map-side only (one regexp pass per robots
    * blob). */
  def robotsSitemaps(df: DataFrame, robots: Column = col("robots")): DataFrame =
    df.withColumn("sitemap_url",
        explode(regexp_extract_all(robots,
          lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*([^#\\r\\n]*)"), lit(1))))
      .withColumn("sitemap_url", trim(col("sitemap_url")))
      .filter(col("sitemap_url") =!= "")

  /** Crawl-compliance decision per page — the politeness filter every
    * crawl-derived corpus applies before curation: RFC 9309 group
    * selection (a specific group whose agent substring-matches the
    * product token wins; only the `*` groups apply otherwise),
    * longest-PATTERN-match precedence with Allow winning ties, `*`
    * wildcards and the terminal `$` anchor honored, no matching rule →
    * allowed. Patterns compile to anchored regexes through a single
    * metachar-escaping regexp_replace (the identical chain runs as the
    * DuckDB oracle). Output: the pages plus `allowed` and the decisive
    * `matched_pattern`/`matched_rule` (null when no rule matched).
    * Scale shape: one equi-join on the domain key (rules are
    * robots-file-sized per domain); the per-(page,rule) regex match is
    * map-side after the join. */
  /** RFC 9309 group selection shared by [[robotsAllowed]] and
    * [[crawlDelaySeconds]]: a domain with any specific group whose
    * agent token substring-matches the product token uses ONLY its
    * specific groups; otherwise the `*` groups apply. */
  private def applicableRules(rules: DataFrame, uaLc: String,
                              domainCol: String): DataFrame = {
    val hasSpec = rules
      .withColumn("__spec",
        col("agent") =!= "*" && expr(s"instr('$uaLc', agent) > 0"))
      .groupBy(col(domainCol))
      .agg(max(col("__spec")).as("__hasSpec"))
    rules
      .join(hasSpec, Seq(domainCol))
      .filter(
        (col("__hasSpec") && col("agent") =!= "*" &&
          expr(s"instr('$uaLc', agent) > 0")) ||
        (!col("__hasSpec") && col("agent") === "*"))
  }

  def robotsAllowed(pages: DataFrame, rules: DataFrame, userAgent: String,
                    domainCol: String = "domain",
                    pathCol: String = "path"): DataFrame = {
    val uaLc = userAgent.toLowerCase(java.util.Locale.ROOT).replace("'", "")
    val applicable = applicableRules(rules, uaLc, domainCol)
    // robots pattern → anchored regex: strip a TERMINAL '$' (elsewhere
    // it is literal), escape every metachar except '*', then '*' → '.*'
    val anchored = col("pattern").endsWith("$")
    val base = when(anchored,
      expr("substring(pattern, 1, length(pattern) - 1)"))
      .otherwise(col("pattern"))
    val rx = concat(lit("^"),
      regexp_replace(
        regexp_replace(base, "([\\\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|])", "\\\\$1"),
        "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
    // an EMPTY pattern is a no-op rule by the robots convention
    // ("Disallow:" = nothing is disallowed), not an everything-matcher
    // of weight zero — drop it before compiling. Only path rules
    // compile: crawl-delay rows carry a seconds value, not a pattern.
    val compiled = applicable
      .filter(col("rule").isin("allow", "disallow") && col("pattern") =!= "")
      .select(col(domainCol), col("rule"),
        col("pattern"), length(col("pattern")).as("__plen"), rx.as("__rx"))
    // LEFT join + null ordering for non-hits: a page whose rules all
    // miss (or that has no rules) must survive as allowed, so rows are
    // never filtered away — max_by ignores null-ordered rows and
    // returns null when none hit. The regroup after the rule fan-out
    // keys on a generated row id, NOT the page column tuple, so two
    // identical input rows stay two output rows (row count preserved)
    val paged = pages.withColumn("__rid", monotonically_increasing_id())
    val matched = paged.join(compiled, Seq(domainCol), "left")
      .withColumn("__hit",
        col("__rx").isNotNull && expr(s"$pathCol rlike __rx"))
      .groupBy((col("__rid") +: pages.columns.map(col)): _*)
      .agg(max_by(
        struct(col("pattern"), col("rule")),
        when(col("__hit"),
          struct(col("__plen"),
            when(col("rule") === "allow", 1).otherwise(0)))).as("__best"))
    matched.select(pages.columns.map(col) :+
      coalesce(col("__best.rule") === "allow", lit(true)).as("allowed") :+
      col("__best.pattern").as("matched_pattern") :+
      col("__best.rule").as("matched_rule"): _*)
  }

  /** [[robotsAllowed]] + the FETCH-STATUS policy of RFC 9309 §2.3.1:
    * a domain whose robots.txt fetch returned 4xx ("unavailable") is
    * fully crawlable — MAY access any resources; one that returned
    * 5xx ("unreachable") MUST be assumed completely disallowed
    * (matched_rule = 'unreachable'). `statuses` is one row per domain
    * with `robots_status`; absent/other statuses take the normal
    * parsed-rules path. The status table is domain-bounded — AQE
    * broadcasts it when it fits. */
  def robotsAllowedWithStatus(pages: DataFrame, rules: DataFrame,
                              statuses: DataFrame, userAgent: String,
                              domainCol: String = "domain",
                              pathCol: String = "path"): DataFrame = {
    val is4xx = col("robots_status").between(400, 499)
    val is5xx = col("robots_status").between(500, 599)
    robotsAllowed(pages, rules, userAgent, domainCol, pathCol)
      .join(statuses, Seq(domainCol), "left")
      .withColumn("allowed",
        when(is5xx, lit(false)).when(is4xx, lit(true))
          .otherwise(col("allowed")))
      .withColumn("matched_pattern",
        when(is5xx || is4xx, lit(null).cast("string"))
          .otherwise(col("matched_pattern")))
      .withColumn("matched_rule",
        when(is5xx, lit("unreachable"))
          .when(is4xx, lit(null).cast("string"))
          .otherwise(col("matched_rule")))
      .drop("robots_status")
  }

  /** Per-domain crawl delay from the APPLICABLE robots group (the
    * de-facto `Crawl-delay:` directive honored by polite crawlers;
    * group selection identical to [[robotsAllowed]]): one row per
    * domain that declares one, `crawl_delay_s` = the MINIMUM declared
    * value (the conservative read when a group repeats the line);
    * non-numeric / negative values ignore. Domains with no applicable
    * delay are absent — callers coalesce their own default. */
  def crawlDelaySeconds(rules: DataFrame, userAgent: String,
                        domainCol: String = "domain"): DataFrame = {
    val uaLc = userAgent.toLowerCase(java.util.Locale.ROOT).replace("'", "")
    applicableRules(rules, uaLc, domainCol)
      .filter(col("rule") === "crawl-delay")
      // try_cast: a malformed seconds value is an ignored line, not an
      // ANSI cast error killing the query over one bad robots file
      .withColumn("__d", expr("try_cast(pattern AS double)"))
      .filter(col("__d").isNotNull && col("__d") >= 0)
      .groupBy(col(domainCol))
      .agg(min(col("__d")).as("crawl_delay_s"))
  }

  /** Politeness SCHEDULE for a crawl frontier: the allowed pages of
    * each domain are sequenced (highest sitemap priority first, then
    * path, then `tieCol` for determinism) and each gets a fetch
    * offset `fetch_offset_ms = (fetch_seq − 1) · delay_ms`, with
    * `delay_ms` from the domain's applicable `Crawl-delay` (default
    * when undeclared). This is the piece that turns a frontier LIST
    * into a frontier PLAN — a fetcher fleet can partition by domain
    * and honor offsets locally. Scale shape: the politeness decision
    * is [[robotsAllowed]]'s bounded join; the sequencing window
    * partitions by domain — per-domain fan-in is the POINT (a polite
    * crawl is sequential within a domain by definition), and domains
    * themselves are unbounded parallelism. */
  def frontierSchedule(pages: DataFrame, rules: DataFrame, userAgent: String,
                       defaultDelayMs: Long = 1000,
                       domainCol: String = "domain",
                       pathCol: String = "path",
                       priorityCol: String = "priority",
                       tieCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val allowed = robotsAllowed(pages, rules, userAgent, domainCol, pathCol)
      .filter(col("allowed"))
      .drop("allowed", "matched_pattern", "matched_rule")
    val delays = crawlDelaySeconds(rules, userAgent, domainCol)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(priorityCol).desc_nulls_last, col(pathCol), col(tieCol))
    allowed.join(delays, Seq(domainCol), "left")
      .withColumn("delay_ms",
        coalesce((col("crawl_delay_s") * 1000).cast("long"),
          lit(defaultDelayMs)))
      .drop("crawl_delay_s")
      .withColumn("fetch_seq", row_number().over(w).cast("long"))
      .withColumn("fetch_offset_ms",
        (col("fetch_seq") - 1) * col("delay_ms"))
  }

  /** Sitemap XML entry extraction (sitemaps.org protocol) — the
    * crawl-frontier companion to [[robotsAllowed]]: one row per
    * `<url>` entry of a urlset (`loc`/`lastmod`/`changefreq`/
    * `priority`) and per `<sitemap>` entry of a sitemapindex
    * (`loc`/`lastmod`), tagged `entry_type` 'url' | 'sitemap' with a
    * 0-based per-document `seq`. XML is handled by a deliberately
    * narrow regexp chain (full parsers are out of scope for sitemap
    * files, which are machine-generated and flat): XML comments strip
    * first — a commented-out entry never surfaces — `<loc>` honors a
    * CDATA wrapper, tag-internal whitespace trims, absent optional
    * fields yield null, and `priority` parses to double (null when
    * non-numeric). `<urlset>`/`<sitemapindex>` container tags and
    * their namespace attributes never collide with the entry match:
    * `<url\b` cannot match `<urlset` and `</sitemap\s*>` cannot match
    * `</sitemapindex>`. Scale shape: the whole chain is map-side
    * (per-doc regexp matches + one posexplode) — no shuffle, linear
    * in corpus bytes; a 50k-entry sitemap (the protocol cap) stays a
    * single row's array. */
  def sitemapEntries(df: DataFrame, xml: Column = col("xml"),
                     idCol: String = "doc_id"): DataFrame = {
    val clean = regexp_replace(xml, "<!--[\\s\\S]*?-->", "")
    def blocks(tag: String) =
      regexp_extract_all(clean, lit(s"(?s)<$tag\\b[^>]*>(.*?)</$tag\\s*>"),
        lit(1))
    val both = concat(
      transform(blocks("url"),
        b => struct(lit("url").as("t"), b.as("b"))),
      transform(blocks("sitemap"),
        b => struct(lit("sitemap").as("t"), b.as("b"))))
    def field(name: String) = {
      val raw = regexp_extract(col("__e.b"),
        s"(?s)<$name\\s*>(.*?)</$name\\s*>", 1)
      val un = regexp_replace(raw,
        "(?s)^\\s*<!\\[CDATA\\[(.*)\\]\\]>\\s*$", "$1")
      when(trim(un) === "", lit(null).cast("string")).otherwise(trim(un))
    }
    val isUrl = col("__e.t") === "url"
    df.select(col(idCol), posexplode(both).as(Seq("seq", "__e")))
      .select(col(idCol), col("seq").cast("long").as("seq"),
        col("__e.t").as("entry_type"),
        field("loc").as("loc"),
        field("lastmod").as("lastmod"),
        when(isUrl, field("changefreq")).as("changefreq"),
        // ANSI-safe numeric parse: a malformed <priority> is null, not
        // a query-killing cast error on one bad sitemap in the corpus
        when(when(isUrl, field("priority"))
          .rlike("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$"),
          field("priority").cast("double")).as("priority"))
  }

  def withTokenCounts(df: DataFrame, text: Column = col("text")): DataFrame =
    df.withColumn("n_tokens", size(tokens(text)).cast("long"))
      .withColumn("n_ws_tokens",
        size(filter(split(text, "\\s+"), t => t =!= "")).cast("long"))
      .withColumn("n_bpe_pieces",
        regexp_count(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]")).cast("long"))

  /** Quality scoring: length, alpha ratio, stopword ratio, mean token
    * length, and a composite score in [0,1]. One pass, no shuffle.
    *
    * The token array is materialized as a projection step (`__toks`)
    * rather than repeated inside each derived expression: the regex
    * split is the expensive part, and an alias referenced more than once
    * is a CollapseProject barrier, so codegen evaluates it once per row
    * instead of once per consumer. */
  def withQuality(df: DataFrame, text: Column = col("text")): DataFrame = {
    val withToks = df.withColumn("__toks", tokens(text))
    val toks = col("__toks")
    val nTokens = size(toks).cast("long")
    val alpha = length(regexp_replace(lower(text), "[^a-z]", "")).cast("long")
    val stops = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    // zero-token / zero-char guards: every ratio is PINNED to 0.0 on the
    // degenerate inputs instead of dividing by zero — Spark and DuckDB
    // disagree on 0/0 (NULL vs NaN, and NaN poisons DuckDB casts and
    // comparisons), so an unguarded ratio would break every downstream
    // gate the moment a testdata regeneration introduces an empty or
    // token-free document (the round-8 events-encoding lesson)
    withToks.withColumn("n_chars", length(text).cast("long"))
      .withColumn("n_tokens", nTokens)
      .withColumn("alpha_ratio",
        when(length(text) > 0, alpha.cast("double") / length(text)).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nTokens > 0, stops.cast("double") / nTokens).otherwise(0.0))
      .withColumn("mean_token_len",
        when(nTokens > 0,
          length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast("double") / nTokens)
          .otherwise(0.0))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens") / 100.0) * 0.4 +
          col("alpha_ratio") * 0.3 + col("stopword_ratio") * 0.3)
      .drop("__toks")
  }

  /** Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1,
    * the Dolma/RedPajama-style rendering): each document is tested
    * against an explicit rule set and gets a per-rule bitmask plus the
    * final keep verdict — the auditable form a curation pipeline needs
    * (aggregate the bitmask to see WHICH rule is dropping your corpus).
    * Thresholds are the Gopher paper's where the signal exists here,
    * scaled to the fixture corpus's short docs where noted. Bits:
    *   1  too few tokens         (< minTokens)
    *   2  mean token length out of [3, 10]
    *   4  alpha ratio too low    (< 0.6 of chars a-z)
    *   8  stopword ratio too low (< 0.02)
    *  16  duplicate-3-gram ratio too high (> 0.3)
    *  32  top-token share too high (> 0.2)
    * keep = (violations == 0). Pure map-side over the quality +
    * repetition projections; whole-stage codegen. */
  def withQualityRules(df: DataFrame, minTokens: Int = 20,
                       text: Column = col("text")): DataFrame = {
    val scored = withRepetition(withQuality(df, text), text)
    scored.withColumn("violations",
        when(col("n_tokens") < minTokens, 1L).otherwise(0L) +
        when(col("mean_token_len") < 3.0 || col("mean_token_len") > 10.0, 2L).otherwise(0L) +
        when(col("alpha_ratio") < 0.6, 4L).otherwise(0L) +
        when(col("stopword_ratio") < 0.02, 8L).otherwise(0L) +
        when(col("dup_gram_ratio") > 0.3, 16L).otherwise(0L) +
        when(col("top_token_ratio") > 0.2, 32L).otherwise(0L))
      .withColumn("keep", when(col("violations") === 0L, 1L).otherwise(0L))
  }

  /** Compression-ratio redundancy signal (native codegen'd
    * `CompressionRatio` — deflate bytes / raw bytes): template spam and
    * boilerplate compress far below prose, making this the classic
    * cheap complement to the token-ratio features in `withQuality`.
    * Engine-internal (zlib output is not a cross-engine constant), so
    * its contract is spec-bound rather than oracle-bound. Pure map-side
    * scan. */
  def withCompressionRatio(df: DataFrame, text: Column = col("text")): DataFrame =
    df.withColumn("compression_ratio",
      graft.functions.TextExpressions.compressionRatio(text))

  /** Language ID: argmax of distinct-marker-token hits per language;
    * ties broken by the fixed langMarkers order. `unknown` when no marker
    * hits at all.
    *
    * The per-language hit counts are materialized once (`__s_*`
    * projection barrier) and the argmax is one `greatest` over
    * (score, -index, lang) structs. The previous when/otherwise fold
    * nested the accumulator into both branches at every step — the
    * expression tree (each leaf a fresh tokenize + intersect) doubled
    * per language, and the corpus-pipeline filter paid it per row. */
  def withLangId(df: DataFrame, text: Column = col("text")): DataFrame = {
    val scoreCol = (lang: String) => s"__s_$lang"
    val withScores = langMarkers.foldLeft(
      df.withColumn("__dtoks", array_distinct(tokens(text)))) {
      case (acc, (lang, markers)) => acc.withColumn(scoreCol(lang),
        size(array_intersect(col("__dtoks"), array(markers.map(lit): _*))))
    }
    val best = greatest(langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      struct(col(scoreCol(lang)).as("score"), lit(-i).as("neg"), lit(lang).as("lang"))
    }: _*)
    withScores
      .withColumn("lang_pred",
        when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unknown")))
      .withColumn("lang_score", best.getField("score").cast("long"))
      .drop("__dtoks" +: langMarkers.map(m => scoreCol(m._1)): _*)
  }

  /** Canonical fingerprint (OpenRefine-style key collision dedup): md5 of
    * the sorted distinct token set. Identical wording/permutations of the
    * same vocabulary collide. */
  def withFingerprint(df: DataFrame, text: Column = col("text")): DataFrame =
    df.withColumn("fingerprint",
      md5(concat_ws(" ", array_sort(array_distinct(tokens(text))))))

  /** Within-document repetition metrics (the Gopher-style repetition
    * quality signals): the duplicate fraction of word 3-grams and the
    * share of the single most frequent token. High values flag
    * low-quality templated/looping text for the corpus filter. Pure
    * array expressions over the token projection — per-row map work, no
    * shuffle, whole-stage codegen:
    *
    *  - `dup_gram_ratio`  = 1 - distinct(3-grams)/total(3-grams)
    *    (0.0 when the doc has fewer than 3 tokens);
    *  - `top_token_ratio` = max token frequency / n_tokens — computed
    *    with a per-row fold over the DISTINCT tokens (aggregate +
    *    size(filter)), so cost is n_distinct x n_tokens per row, bounded
    *    and local; 0.0 for empty docs. */
  def withRepetition(df: DataFrame, text: Column = col("text")): DataFrame = {
    val withToks = df.withColumn("__toks", tokens(text))
    val toks = col("__toks")
    val n = size(toks)
    val grams = expr(
      "transform(sequence(0, size(__toks) - 3), i -> " +
        "concat_ws(' ', __toks[i], __toks[i+1], __toks[i+2]))")
    val withGrams = withToks.withColumn("__grams",
      when(n >= 3, grams).otherwise(array().cast("array<string>")))
    val total = size(col("__grams"))
    val topCount = aggregate(array_distinct(toks), lit(0),
      (acc, t) => greatest(acc, size(filter(toks, x => x === t))))
    withGrams
      .withColumn("n_tokens", n.cast("long"))
      .withColumn("dup_gram_ratio",
        when(total > 0,
          lit(1.0) - size(array_distinct(col("__grams"))).cast("double") / total)
          .otherwise(lit(0.0)))
      .withColumn("top_token_ratio",
        when(n > 0, topCount.cast("double") / n).otherwise(lit(0.0)))
      .drop("__toks", "__grams")
  }

  /** Distinctive-term extraction — TF-IDF-shaped keyword scoring with a
    * RATIONAL score `tf × N / df` instead of `tf × ln(N/df)`: the
    * ranking it induces per document is identical (ln is monotone in
    * N/df and tf ≥ 1 scales it positively per term), while staying in
    * exact integer products and one double division — `ln` is not
    * guaranteed correctly rounded across libm implementations, so the
    * log form could not carry a bit-exact cross-engine oracle.
    *
    * Plan shape: token explode → (doc, token) count → token df join
    * (shuffle keyed on token — the natural key; df table is
    * vocabulary-sized) → per-doc top-k window (group top-n,
    * WindowGroupLimit). `n` is the corpus row count, one scalar. */
  def topTerms(docs: DataFrame, k: Int = 3,
               text: Column = col("text")): DataFrame = {
    val n = docs.count()
    val tf = docs.select(col("doc_id"), explode(tokens(text)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    tf.join(df, Seq("tok"))
      .withColumn("score", col("tf").cast("double") * lit(n) / col("df"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "tok", "score", "rank")
  }

  /** PII redaction: emails, North-American-style segmented phone
    * numbers, and dotted-quad IPs replaced by typed placeholders. The
    * patterns avoid lookaround and stay inside the regex subset Java and
    * RE2 share, so the op is bit-reproducible in the SQL oracle (and
    * portable to any engine). Applied innermost-first: emails before
    * phones/IPs so a phone-like or IP-like substring inside a redacted
    * email is not double-replaced. One codegen'd expression, no UDF. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val ipPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "[EMAIL]"),
        phonePattern, "[PHONE]"),
      ipPattern, "[IP]")

  /** DOCUMENT CHUNKING — the RAG/embedding prep step: fixed-size
    * character windows with overlap. Chunk i of a document covers
    * [i·stride, i·stride + size) with stride = size − overlap;
    * n = max(1, ceil((len − overlap)/stride)) chunks, so every
    * character is covered and consecutive chunks share `overlap`
    * characters. Pure integer arithmetic + substring — codegen'd
    * explode, no UDF, no shuffle (chunks stay on their document's
    * partition). */
  def chunkDocuments(docs: DataFrame, idCol: String, size: Int, overlap: Int,
                     text: Column = col("text")): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"chunkDocuments: need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    // ceil((len-overlap)/stride) in exact integer arithmetic
    val n = greatest(lit(1L),
      (length(text).cast("long") - overlap + (stride - 1)) / stride).cast("long")
    docs.withColumn("chunk_id", explode(sequence(lit(0L), n - 1)))
      .withColumn("char_off", col("chunk_id") * stride)
      .withColumn("chunk", substring(text, (col("chunk_id") * stride + 1).cast("int"), lit(size)))
  }

  /** Adjacent-token CO-OCCURRENCE with a rational PMI score — phrase
    * mining / tokenizer-merge statistics. For each ordered bigram (a,b):
    * count c(a,b), unigram counts c(a), c(b), and
    * score = c(a,b)·N / (c(a)·c(b)) — the PMI's rational argument
    * (ln is monotone, so the induced ranking is identical and the score
    * stays bit-exact cross-engine; both integer products are exact in
    * doubles at any realistic count).
    *
    * Plan: one tokenize pass → explode bigrams → hash-agg; unigram
    * table joined twice with NO broadcast hint — the vocabulary is
    * unbounded at corpus scale (noise/typos make it grow with the data),
    * so the join strategy is left to AQE: broadcast while the measured
    * size is small, shuffled hash join beyond (a forced hint would be
    * honored at ANY size — driver-OOM territory at 100 TB). Only N, a
    * one-row scalar, is hint-broadcast. Min-count threshold prunes the
    * tail BEFORE the joins. */
  def cooccurrence(docs: DataFrame, minCount: Long = 2L,
                   text: Column = col("text")): DataFrame = {
    val toks = docs.select(tokens(text).as("toks"))
    val grams = toks.select(explode(
        zip_with(slice(col("toks"), lit(1), greatest(lit(0), size(col("toks")) - 1)),
          slice(col("toks"), lit(2), greatest(lit(0), size(col("toks")) - 1)),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n"))
    grams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        ((col("c12") * col("n")).cast("double") /
          (col("c1") * col("c2")).cast("double")).as("pmi_ratio"))
  }

  /** INVERTED INDEX build — term → document-frequency + the first
    * `cap` posting doc-ids (sorted): the artifact behind full-text
    * retrieval over the corpus. One tokenize pass, per-document
    * distinct terms (array_distinct map-side — no (term,doc) dedup
    * shuffle), one hash-agg per term. The posting CAP is enforced by
    * the bounded `TopKAgg` buffer (map-side combine, O(cap) state per
    * term — a collect_list+slice would buffer a stop-word's full
    * posting list, which at 100 TB is the corpus itself); df stays
    * exact. Smallest-`cap` ids = TopKAgg under a CONSTANT value, whose
    * tie-break is id ASC — the ordering stays in int64 end to end (a
    * negated-id-as-double key would collapse ids above 2^53 to equal
    * keys and silently degrade the smallest-cap contract). */
  def invertedIndex(docs: DataFrame, idCol: String, cap: Int = 32,
                    text: Column = col("text")): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(array_distinct(tokens(text))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",", transform(
          graft.functions.TopKAgg.topK(lit(0.0), col("doc_id"), cap),
          x => x.getField("id").cast("string"))).as("postings"))

  /** Positional postings (term, doc_id, pos) — the index face that
    * serves PHRASE queries, which the doc-level `invertedIndex` cannot
    * (it proves co-occurrence, not adjacency). One tokenize +
    * posexplode pass, no shuffle; at corpus scale this is the
    * materialized table a search tier builds once and every phrase
    * query reads term-pruned. */
  def positionalIndex(docs: DataFrame, idCol: String = "doc_id",
                      text: Column = col("text")): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(text)).as(Seq("pos", "term")))

  /** Exact phrase search over the positional index: a document matches
    * at start position p iff term_i sits at p+i for every i. Classic
    * IR positional-intersection plan, Spark-first:
    *   - postings are pruned to the phrase's terms FIRST (one tokenize
    *     scan; `isin` pushes into the generate), then eagerly
    *     checkpointed so the k-way self-intersection reads the small
    *     pruned table k times instead of re-tokenizing the corpus;
    *   - each conjunct is an equi-join on (doc_id, pos−i) — offset
    *     normalization turns adjacency into plain key equality, so
    *     every join is a hash join on the same key pair and AQE can
    *     chain them without a sort;
    *   - at 100 TB the pruned postings of rare terms broadcast; the
    *     stop-word-leading phrase is the documented adversary (its t0
    *     posting list is corpus-sized) — production orders conjuncts
    *     rarest-first, which this plan permits since offset
    *     normalization makes the joins commutative.
    * Returns (doc_id, n_hits, first_pos) per matching document. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val pruned = positionalIndex(docs, idCol)
      .filter(col("term").isin(phrase.distinct: _*))
      .localCheckpoint(true)
    val t0 = pruned.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(t0) { case (acc, (t, i)) =>
      acc.join(
        pruned.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
        Seq("doc_id", "pos"))
    }
    aligned.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
  }

  /** Text canonicalization for dedup/hashing: Unicode NFC composition
    * (via the native `NfcNormalize` codegen expression — decomposed
    * "e"+U+0301 and composed "é" become byte-identical), lowercasing,
    * whitespace runs collapsed to single spaces, ends trimmed. Pure
    * map-side scan; the regex stays in the Java∩RE2 subset. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      graft.functions.TextExpressions.nfcNormalize(lower(c)), "\\s+", " "))

  /** BM25 relevance of a fixed term set against every document — the
    * ranking face of full-text search over the corpus. The formula is
    * Robertson's, with the idf's `ln((N-df+0.5)/(df+0.5))` replaced by
    * its RATIONAL argument `(N-df+0.5)/(df+0.5)`: per term the induced
    * document ranking is identical (ln is monotone and the tf factor is
    * positive), and like `topTerms` only the rational form keeps every
    * operation correctly rounded, so scores carry a bit-exact
    * cross-engine oracle. (Cross-term score SUMS would not be
    * order-preserved under the substitution — this op returns per-term
    * scores and leaves any multi-term blend to the caller.)
    *
    * Plan shape: ONE corpus scan; per-term tf is a map-side
    * `size(filter(toks))` (the term set is a literal — no corpus
    * explode, no join against a vocabulary), the (N, avgdl) scalars and
    * the per-term df table are broadcast-sized aggregates. At 100 TB:
    * one scan + two tiny broadcasts, nothing else. */
  def bm25Scores(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75, text: Column = col("text")): DataFrame = {
    require(terms.nonEmpty, "bm25Scores: empty term set")
    val base = docs.select(col("doc_id"), tokens(text).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("tot"))
      .select(col("n_docs"), (col("tot") / col("n_docs")).as("avgdl"))
    val stacked = terms.zipWithIndex.foldLeft(base) { case (d, (t, i)) =>
        d.withColumn(s"__tf_$i",
          size(filter(col("toks"), x => x === t)).cast("long"))
      }
      .select(col("doc_id"), col("dl"),
        explode(array(terms.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("term"), col(s"__tf_$i").as("tf"))
        }: _*)).as("x"))
      .select(col("doc_id"), col("dl"), col("x.term").as("term"),
        col("x.tf").as("tf"))
      .filter(col("tf") > 0)
    val dfs = stacked.groupBy("term").agg(count(lit(1)).as("df"))
    stacked.join(broadcast(dfs), Seq("term")).crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"),
        (((col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl"))))) *
          ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
          .as("score"))
  }

  /** Multi-term BM25 RETRIEVAL — the missing blend over `bm25Scores`:
    * the summed Robertson tf-saturation with the LUCENE-standard idf
    * `ln(1 + (N-df+0.5)/(df+0.5))` and the global top-k documents. (A
    * rational idf substitution is not order-preserving across a SUM, so
    * here a real log runs. The `1 +` inside is Lucene's floor: the raw
    * Robertson idf goes NEGATIVE for any term in more than half the
    * corpus, which would rank a doc CONTAINING a majority query term
    * below one containing none — with the floor every matching term
    * contributes positively and no-term docs sit at exactly 0.)
    *
    * Determinism contract: every non-log operation (+,-,×,÷) is IEEE
    * correctly rounded, hence bit-identical on any engine given the same
    * association order — which is pinned: the per-term contributions are
    * SEPARATE COLUMNS (terms are literals, no row-wise SUM whose order
    * the engine picks) folded left-to-right. Only `ln` may differ by an
    * ulp across libm implementations, so the gate compares doc RANKING
    * (score desc, doc_id tie-break), not the float score; ulp noise can
    * flip a rank only between docs whose true scores are ulp-close
    * without being structurally identical (identical tf vector + dl ⇒
    * bit-equal in both engines ⇒ same tie-break).
    *
    * Plan shape: one corpus scan (per-term tf = map-side
    * `size(filter(toks))` — no explode, no vocabulary join), ONE
    * broadcast row carrying (n_docs, avgdl, every df), map-side score,
    * and a distributed TakeOrderedAndProject top-k (per-partition heaps,
    * driver merges k rows). At 100 TB: one scan + one scalar broadcast +
    * O(k) driver state. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               text: Column = col("text")): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: empty term set")
    require(k > 0, "bm25TopK: k must be positive")
    val base = terms.indices.foldLeft(
        docs.select(col("doc_id"), tokens(text).as("__toks"))
          .withColumn("dl", size(col("__toks")).cast("long"))) { (d, i) =>
        d.withColumn(s"__tf_$i",
          size(filter(col("__toks"), x => x === terms(i))).cast("long"))
      }.drop("__toks")
    val statsAggs =
      Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot")) ++
        terms.indices.map(i => count(when(col(s"__tf_$i") > 0, 1)).as(s"__df_$i"))
    val stats = base.agg(statsAggs.head, statsAggs.tail: _*)
      .withColumn("avgdl", col("tot") / col("n_docs"))
    val score = terms.indices.map { i =>
      val tf = col(s"__tf_$i")
      val df = col(s"__df_$i")
      ((tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl"))))) *
        log(lit(1.0) + (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    base.crossJoin(broadcast(stats))
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      // rank window runs on the k surviving rows only — not a scale risk
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("rank"), col("score"))
  }

  /** HASHED BIGRAM-LM TYPICALITY — the model-based quality signal of
    * the CCNet pipeline family (score each document by a language model
    * trained on the corpus itself; outliers are boilerplate, menus,
    * non-language noise), in this engine's rational-arithmetic house
    * style: each bigram's add-1-smoothed conditional probability
    * P(cur|prev) = (C2+1)/(C1+buckets) rides as integer ppm, a
    * document's score is the SUM of its bigram ppms and `typ_ppm` the
    * integer mean — likelihood mass, order-equivalent to average
    * per-bigram probability. The classic log-perplexity (geometric
    * mean) is the documented FLOAT swap: replace the ppm sum with
    * sum(ln P) — transcendental, so not cross-engine hash-exact, which
    * is why the gate pins this rational face.
    *
    * Plan: ONE tokenize pass builds the bigram table (tokens-array
    * transform — no positional self-join); the C2 model is a hash
    * aggregate on (b_prev, b_cur) whose size is data-bounded by
    * min(corpus bigrams, buckets²) — join strategy LEFT TO AQE (same
    * rule as cooccurrence: never force a possibly-large broadcast);
    * the C1 model is ≤`buckets` rows — broadcast-sized BY CONSTRUCTION.
    * Doc score is one doc_id aggregate. Row-preserving: documents with
    * <2 tokens come back with n_bigrams=0, score 0. Int64 bounds:
    * score ≤ n_bigrams × 10⁶, safe past 9·10¹² bigrams per document. */
  def lmTypicality(docs: DataFrame, idCol: String = "doc_id",
                   buckets: Int = 512, scale: Long = 1000000L,
                   text: Column = col("text")): DataFrame = {
    require(buckets >= 2, "lmTypicality: need >= 2 hash buckets")
    // materialize the token array ONCE per doc before the per-element
    // lambda: an expression referenced INSIDE a higher-order function's
    // lambda is re-evaluated per element, so inlining `tokens(text)`
    // there re-runs the regex split ~2×n_tokens times per document
    // (measured 20× on the whole composition)
    val tk = col("__toks")
    // hash each TOKEN once into a bucket array, then zip consecutive
    // entries: bigram i shares its `cur` with bigram i+1's `prev`, so
    // hashing per bigram side would md5 every interior token twice —
    // per token halves the dominant per-pass cost (this runs in BOTH
    // corpus traversals, model build and scoring)
    val hs = col("__hb")
    val bigrams = docs
      .select(col(idCol), tokens(text).as("__toks"))
      // <2 tokens: sequence(1, 0) would generate DESCENDING (the
      // dedupSubstrings/sampleFrames trap) — filter, don't clamp; the
      // left join below keeps those documents in the output
      .filter(size(tk) >= 2)
      .select(col(idCol),
        transform(tk, t => pmod(Dedup.h60(t), lit(buckets.toLong)))
          .as("__hb"))
      .select(col(idCol), explode(
        transform(sequence(lit(1), size(hs) - 1),
          i => struct(
            element_at(hs, i).as("__bp"),
            element_at(hs, i + 1).as("__bc")))).as("bg"))
      .select(col(idCol), col("bg.__bp").as("__bp"),
        col("bg.__bc").as("__bc"))
    // c2 is bounded by buckets² rows (≤262k at the default 512) — always
    // broadcast-able; c1 is derived from it by summation (identical counts
    // to grouping the bigram table by __bp) so the corpus is traversed
    // exactly twice (c2 build + scoring), with no shuffle of the bigram
    // table itself: both count joins are map-side broadcasts
    val c2 = bigrams.groupBy(col("__bp"), col("__bc"))
      .agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("__bp")).agg(sum(col("__c2")).as("__c1"))
    val scored = bigrams
      .join(broadcast(c2), Seq("__bp", "__bc"))
      .join(broadcast(c1), Seq("__bp"))
      .select(col(idCol),
        expr(s"(__c2 + 1L) * ${scale}L div (__c1 + $buckets)").as("__ppm"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__ppm")).as("lm_score"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0L)).as("lm_score"),
        coalesce(expr("lm_score div n_bigrams"), lit(0L)).as("typ_ppm"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    * the MOSS selection scheme): hash every token k-gram, then in each
    * sliding window of `w` consecutive hashes select the minimum
    * (rightmost on ties) — any shared substring of length >= w+k-1
    * tokens is GUARANTEED to share a selected fingerprint, while only
    * ~2/(w+1) of grams are kept. The standard copy-detection upgrade
    * over whole-doc hashing: local, deterministic, and position-aware.
    * Pure per-doc work: one window-min over a rows-following frame plus
    * a bounded (<= w-fold) positional self-join to resolve the
    * rightmost-min position; both shuffle only on doc_id. Returns
    * DISTINCT (doc_id, fp_pos, fp_hash) rows. */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4,
                         idCol: String = "doc_id",
                         text: Column = col("text")): DataFrame = {
    require(k >= 1 && w >= 1, "winnowFingerprints: k/w >= 1")
    val grams = docs
      .select(col(idCol), tokens(text).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
          i => concat_ws(" ", slice(col("__toks"), i, lit(k)))))
        .as(Seq("__p0", "gram")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("pos"),
        Dedup.h32(col("gram")).as("h"))
    // per window start s: the whole w-gram frame rides the ONE window
    // pass as a collected struct array (w is a small constant), and the
    // robust-winnowing selection — rightmost position of the window
    // min — is a map-side array expression over it. The old rendering
    // re-joined the gram table against the window starts on
    // (doc, h = wmin) + a positional range, i.e. a second shuffle of
    // the gram table and a groupBy, for the same answer (§2.4).
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("__frame",
        collect_list(struct(col("h"), col("pos"))).over(byPos))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col(idCol))))
      .filter(col("pos") <= col("__n") - (w - 1)) // full windows only
      .withColumn("__wmin",
        array_min(transform(col("__frame"), e => e.getField("h"))))
      .select(col(idCol),
        array_max(transform(
          filter(col("__frame"), e => e.getField("h") === col("__wmin")),
          e => e.getField("pos"))).as("fp_pos"),
        col("__wmin").as("fp_hash"))
      .distinct()
  }

  /** Sliding-window chunking with overlap — the context-window
    * construction step of training prep: each document becomes token
    * windows of `window` tokens starting every `stride` tokens
    * (overlap = window − stride), the final window truncated at the
    * document end. Pure map-side (tokenize once per doc — the array is
    * materialized BEFORE the per-window ops, see the lmTypicality
    * lambda note — then one posexplode); chunk_idx is the 0-based
    * window ordinal, so (doc_id, chunk_idx) is a stable chunk key. */
  def chunkOverlap(docs: DataFrame, window: Int = 64, stride: Int = 48,
                   idCol: String = "doc_id",
                   text: Column = col("text")): DataFrame = {
    require(window >= 1 && stride >= 1, "chunkOverlap: window/stride >= 1")
    docs
      .select(col(idCol), tokens(text).as("__toks"))
      .filter(size(col("__toks")) >= 1)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(1), size(col("__toks")), lit(stride)))
          .as(Seq("__pos", "__s")))
      .select(col(idCol),
        col("__pos").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("__s"), lit(window))).as("chunk_text"),
        least(lit(window), size(col("__toks")) - col("__s") + 1)
          .cast("long").as("n_tokens"))
  }

  /** Content-defined chunking (the Rabin/Gear-CDC family, rolling-hash
    * boundaries instead of fixed offsets — the storage-dedup convention
    * LBFS/restic/borg use, here over TOKENS so corpus chunk-dedup
    * survives insertions): a chunk boundary falls after token `i+g-1`
    * whenever the hash of the g-token gram starting at `i` is ≡ 0
    * (mod `modulus`), so boundary positions depend only on LOCAL
    * content. Insert or delete a run of tokens and every chunk past the
    * next surviving boundary is byte-identical again — fixed-window
    * chunking (`chunkOverlap`) loses alignment at the edit and every
    * downstream chunk changes. Expected chunk length ≈ `modulus`
    * tokens; the final chunk always closes at the document end.
    *
    * Plan, sized for 100 TB: pure map-side array expressions — one
    * tokenize per doc, gram hashes + boundary selection + chunk
    * slicing all inside `transform`/`filter` on the token array, one
    * posexplode; NO window, NO shuffle (spec-pinned Exchange-free).
    * The 32-bit md5-prefix gram hash (`Dedup.h32`) is the repo's
    * cross-engine hash, so boundaries — and therefore every chunk
    * hash — are exactly SQL-oracle-able. (doc_id, chunk_idx) is a
    * stable chunk key; `chunk_hash` is the content key a corpus-level
    * chunk-dedup joins on. */
  def chunkCdc(docs: DataFrame, grams: Int = 3, modulus: Int = 8,
               idCol: String = "doc_id",
               text: Column = col("text")): DataFrame = {
    require(grams >= 1 && modulus >= 1, "chunkCdc: grams/modulus >= 1")
    val toks = col("__toks")
    val n = size(toks)
    // chunk-end positions: every gram-start i (1-based, i ≤ n-g+1) with
    // h32(gram) ≡ 0 (mod modulus) closes a chunk at i+g-1; the document
    // end closes the last chunk. h32 is non-negative, so % is safe.
    val innerEnds = transform(
      filter(
        transform(sequence(lit(1), n - lit(grams - 1)),
          i => struct(
            (Dedup.h32(concat_ws(" ", slice(toks, i, lit(grams)))) % modulus === 0).as("b"),
            (i + lit(grams - 1)).cast("long").as("e"))),
        s => s.getField("b")),
      s => s.getField("e"))
    val guarded = when(n >= grams, innerEnds)
      .otherwise(array().cast("array<long>"))
    docs
      .select(col(idCol), tokens(text).as("__toks"))
      .filter(n >= 1)
      .withColumn("__ends",
        when(try_element_at(guarded, lit(-1)) === n.cast("long"), guarded)
          .otherwise(concat(guarded, array(n.cast("long")))))
      .select(col(idCol), toks, posexplode(
        transform(col("__ends"), (e, j) => struct(
          j.cast("long").as("chunk_idx"),
          when(j === 0, lit(1L))
            .otherwise(element_at(col("__ends"), j) + 1L).as("start_pos"),
          e.as("end_pos")))).as(Seq("__p", "__c")))
      .select(col(idCol),
        col("__c.chunk_idx"),
        col("__c.start_pos"),
        (col("__c.end_pos") - col("__c.start_pos") + 1L).as("n_tokens"),
        concat_ws(" ", slice(toks,
          col("__c.start_pos").cast("int"),
          (col("__c.end_pos") - col("__c.start_pos") + 1L).cast("int")))
          .as("chunk_text"))
      .withColumn("chunk_hash", Dedup.h32(col("chunk_text")))
      .drop("__toks")
  }

  /** Corpus-frequency boilerplate removal — the CCNet / RefinedWeb
    * "most common paragraphs" filter: a line that appears in at least
    * `thresholdPpm` (parts-per-million, integer-exact) of its SOURCE's
    * documents is template chrome (header, footer, cookie banner), not
    * content, and is stripped from every document while the remaining
    * lines keep their order. Distinct from `Dedup.dedupLines` (which
    * keeps the FIRST occurrence corpus-wide): boilerplate removal drops
    * every occurrence, and the frequency test is per-source because
    * chrome is per-site. "Lines" here are the repo's derived-line
    * convention for the newline-free corpus — consecutive `lineTokens`-
    * token blocks (`x_dedup_indoc` precedent); real corpora pass their
    * own `split(text, '\n')` upstream.
    *
    * Plan, sized for 100 TB: line extraction is map-side; the document
    * frequency is ONE (source, line)-keyed hash aggregate; the
    * boilerplate set is by definition tiny (a line needs df ≥
    * threshold·n_docs, so the set holds at most lines-per-doc /
    * threshold entries per source) and BROADCASTS back; the rebuild is
    * one doc-keyed aggregate. No corpus-wide sort, no self-join. */
  def removeBoilerplate(docs: DataFrame, thresholdPpm: Long = 500000L,
                        lineTokens: Int = 3, idCol: String = "doc_id",
                        srcCol: String = "source",
                        text: Column = col("text")): DataFrame = {
    require(thresholdPpm >= 1 && lineTokens >= 1, "removeBoilerplate: args >= 1")
    val toks = col("__toks")
    val lines = docs
      .select(col(idCol), col(srcCol), tokens(text).as("__toks"))
      .filter(size(toks) >= 1)
      .select(col(idCol), col(srcCol), posexplode(
        transform(
          sequence(lit(0), ceil(size(toks) / lit(lineTokens.toDouble)).cast("int") - 1),
          j => concat_ws(" ", slice(toks, j * lineTokens + 1, lit(lineTokens)))))
        .as(Seq("__pi", "__line")))
    val nDocs = docs.groupBy(col(srcCol))
      .agg(countDistinct(col(idCol)).as("__nd"))
    val bp = lines
      .groupBy(col(srcCol), col("__line"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .join(broadcast(nDocs), srcCol)
      .filter(col("__df") * 1000000L >= lit(thresholdPpm) * col("__nd"))
      .select(col(srcCol).as("__bs"), col("__line").as("__bl"))
    lines
      .join(broadcast(bp),
        col(srcCol) === col("__bs") && col("__line") === col("__bl"), "left")
      .withColumn("__keep", col("__bl").isNull)
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("__keep"), struct(col("__pi").as("pi"), col("__line").as("line"))))),
          s => s.getField("line"))).as("kept_text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("kept_ct"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("removed_ct"))
  }

  /** Cross-source overlap matrix — the corpus-release report that answers
    * "how much of source A's content also lives in source B" (the scaled
    * cousin of benchmark decontamination: same n-gram machinery, source↔
    * source instead of corpus↔eval-set). For every source pair that
    * shares at least one distinct token `n`-gram: the shared distinct-
    * gram count and both directed containments in integer ppm
    * (shared/|grams(A)|, shared/|grams(B)|).
    *
    * Plan, sized for 100 TB: ONE gram-keyed distinct over (source, gram)
    * — map-side combined, shuffle is vocabulary-sized; the pair
    * expansion runs per gram over its sorted source set entirely
    * map-side (bounded by |sources|² per gram, and |sources| is tens,
    * not millions); the final aggregate's key space is |sources|² —
    * driver-safe by construction. The corpus is never self-joined on
    * doc granularity. */
  def sourceOverlap(docs: DataFrame, n: Int = 3, srcCol: String = "source",
                    text: Column = col("text")): DataFrame = {
    require(n >= 1, "sourceOverlap: n >= 1")
    val toks = col("__toks")
    val grams = docs
      .select(col(srcCol).as("__src"), tokens(text).as("__toks"))
      .filter(size(toks) >= n)
      .select(col("__src"), explode(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))).as("__gram"))
      .distinct()
    val perSrc = grams.groupBy(col("__src"))
      .agg(count(lit(1)).as("__n"))
    val pairs = grams
      .groupBy(col("__gram"))
      .agg(array_sort(collect_set(col("__src"))).as("__ss"))
      .select(explode(flatten(transform(col("__ss"), (a, i) =>
        transform(slice(col("__ss"), i + lit(2), size(col("__ss"))),
          b => struct(a.as("a"), b.as("b")))))).as("__p"))
      .groupBy(col("__p.a").as("src_a"), col("__p.b").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(perSrc.select(col("__src").as("__sa"), col("__n").as("n_a"))),
        col("src_a") === col("__sa"))
      .join(broadcast(perSrc.select(col("__src").as("__sb"), col("__n").as("n_b"))),
        col("src_b") === col("__sb"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("shared"),
        expr("shared * 1000000L div n_a").as("contain_a_ppm"),
        expr("shared * 1000000L div n_b").as("contain_b_ppm"))
  }

  /** Vocabulary coverage audit — the Zipf curve summary every corpus /
    * tokenizer report prints: for each budget k, how much of the
    * running text the k most frequent word types cover (Zipf's law says
    * ~half the tokens come from a few hundred types; the long tail is
    * where vocabulary size is spent). Corpus-level global stats ride on
    * every row: total token count, vocabulary size, and the hapax count
    * (types seen exactly once — the classic data-sparsity signal).
    *
    * Plan, sized for 100 TB: the type-frequency table is ONE hash
    * aggregate over the exploded tokens (map-side combine; shuffle is
    * vocabulary-sized, not corpus-sized); the global stats are a second
    * aggregate of that table; the top-max(ks) types come back via
    * TakeOrdered (orderBy+limit — never a global window over the full
    * vocabulary); only the ≤max(ks)-row head table sees a
    * single-partition rank window — bounded by the parameter, by
    * design. Integer end to end (coverage as truncating ppm). */
  def vocabCoverage(docs: DataFrame,
                    ks: Seq[Int] = Seq(1, 10, 100, 1000),
                    text: Column = col("text")): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "vocabCoverage: ks must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs.select(explode(tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    val stats = tf.agg(
      sum(col("ct")).as("total_tokens"),
      count(lit(1)).as("vocab_size"),
      sum((col("ct") === 1).cast("long")).as("hapax_types"))
    val head = tf.orderBy(col("ct").desc, col("tok")).limit(ks.max)
    val wr = Window.orderBy(col("ct").desc, col("tok"))
    val ranked = head.withColumn("rank", row_number().over(wr))
    val ksDf = ks.map(_.toLong).toDF("k")
    ksDf.join(ranked, col("rank") <= col("k"))
      .groupBy(col("k"))
      .agg(sum(col("ct")).as("covered_tokens"),
        count(lit(1)).as("n_types"))
      .crossJoin(broadcast(stats))
      .select(col("k"), col("n_types"), col("covered_tokens"),
        expr("covered_tokens * 1000000L div total_tokens").as("coverage_ppm"),
        col("total_tokens"), col("vocab_size"), col("hapax_types"))
  }
}
