package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints JSON.
  *
  * Regression-diagnosable by construction:
  *   - the shared build-once artifacts (LSH pair set, IVF index) are
  *     built FIRST, each timed as its own `artifacts` line item — so no
  *     query's number silently includes a neighbor's build (the round-2
  *     phantom-regression source: cache attribution shifted between
  *     rounds with zero code change);
  *   - every query then runs twice: `queries` holds the first (cold)
  *     execution, the warm repeat rides along. A real plan regression
  *     moves BOTH numbers; JIT/page-cache/box noise mostly moves the
  *     cold one. `value` (total) = artifact builds + cold times, so the
  *     headline stays comparable with earlier rounds where the builds
  *     were attributed to consumer queries;
  *   - if an artifact build FAILS, its consumer queries are listed in
  *     `tainted`: their cold numbers silently include the in-query
  *     rebuild and must not be compared against a healthy round.
  *
  * Emission contract — the runner captures only the LAST ~2000 chars of
  * stdout and parses the JSON line found there (round 3 lost its
  * numbers by exceeding that window). So the LAST printed line is a
  * COMPACT form: values rounded to 3 decimals and the warm repeats as a
  * positional `warm` array aligned with the (name-sorted) `queries`
  * keys. The full-precision verbose form (warm as an object) is printed
  * earlier and written to bench_out.json.
  *
  * A warm-up action runs first so JVM/codegen/session start-up cost is
  * not attributed to whichever query happens to run first.
  */
object Bench {
  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def r3(v: Double): Double = math.rint(v * 1000) / 1000
  private def r2(v: Double): Double = math.rint(v * 100) / 100

  private def jsonMap(m: Seq[(String, Double)]): String =
    m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  private def jsonArr(s: Seq[String]): String =
    s.map("\"" + _ + "\"").mkString("[", ",", "]")

  /** Parse a named `{"q":sec,…}` map out of a prior bench_out.json
    * verbose line (our own emission format — flat maps, no nesting).
    * Tolerant: any shape mismatch returns empty, never throws — a
    * missing/corrupt baseline must not take the bench down. */
  def parseQueryMap(json: String, field: String): Map[String, Double] = {
    val start = json.indexOf("\"" + field + "\":{")
    if (start < 0) return Map.empty
    val open = json.indexOf('{', start)
    val close = json.indexOf('}', open)
    if (close < 0) return Map.empty
    "\"([A-Za-z0-9_]+)\":([0-9.eE+-]+)".r
      .findAllMatchIn(json.substring(open + 1, close))
      .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble).toOption)
      .toMap
  }

  private def median(xs: Iterable[Double]): Double = {
    val s = xs.toArray.sorted
    if (s.isEmpty) 1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
  }

  /** The in-round regression gate, BOX-NORMALIZED: a different machine
    * or a loaded box moves EVERY query by a common factor, so raw
    * per-query ratios flood with false flags exactly when the baseline
    * came from another run environment (measured: a uniformly ~1.6×
    * slower session flagged 10 untouched queries). Instead, each
    * query's cold/warm ratios are compared against the MEDIAN ratio
    * across all queries — the fleet-wide drift cancels, and only a
    * plan that regressed RELATIVE to its peers stands out. A query is
    * flagged when both its cold and warm ratios exceed `ratio`× the
    * respective medians (a real plan regression moves both; JIT/page-
    * cache noise mostly moves cold) and its cold time clears an
    * absolute floor that keeps 20 ms → 40 ms jitter out. Queries new
    * this round (no baseline) are skipped. Returns sorted names.
    *
    * `confirm` (round-10): the remaining false-positive class is IN-RUN
    * interference — transient box pressure inflating BOTH numbers of a
    * contiguous alphabetical span (round 9 flagged two such clusters;
    * isolation re-runs showed all six 1.5-3× faster than their in-bench
    * numbers, one with warm 7.5 s > cold 4.4 s, impossible for a healthy
    * repeat of an identical plan). A real plan regression reproduces on
    * EVERY execution; interference does not — so when `confirm` is
    * given, each candidate flag is re-executed once (typically minutes
    * after the inflated measurement) and kept only if the fresh run
    * still exceeds the warm threshold. Cost: one extra execution per
    * candidate, i.e. ~zero on a healthy run. */
  def regressions(baseCold: Map[String, Double], baseWarm: Map[String, Double],
                  results: Seq[(String, Double, Double)],
                  ratio: Double = 1.5, floorSec: Double = 0.5,
                  confirm: Option[String => Double] = None): Seq[String] = {
    val coldR = results.flatMap { case (n, c, _) =>
      baseCold.get(n).filter(_ > 0).map(b => n -> c / b) }.toMap
    if (coldR.isEmpty) return Nil
    val warmR = results.flatMap { case (n, _, w) =>
      baseWarm.get(n).filter(_ > 0).map(b => n -> w / b) }.toMap
    val medC = median(coldR.values)
    val medW = median(warmR.values)
    // the cold-only fallback applies solely to a LEGACY baseline with no
    // warm map whatsoever — gated on the baseline itself, not on this
    // run's overlap with it: a baseline that HAS warm numbers but shares
    // none with this run's result set means every flag is unconfirmable,
    // and unconfirmable must read as "no flag", not "flag on cold alone"
    // (round-11 ADVICE fix)
    val coldOnly = baseWarm.isEmpty
    results.collect {
      case (name, cold, warm)
        if cold > floorSec &&
           coldR.get(name).exists(_ > ratio * medC) &&
           // warm confirmation is REQUIRED whenever the baseline carries
           // warm numbers at all: a query absent from the warm map then
           // means "cannot confirm", not "confirmed" — flagging it on the
           // cold ratio alone would reintroduce the cold-only JIT/page-
           // cache false-positive class this gate exists to suppress.
           (coldOnly || warmR.get(name).exists(_ > ratio * medW)) =>
        name
    }.sorted match {
      case flagged =>
        confirm match {
          case Some(rerun) if warmR.nonEmpty =>
            flagged.filter { n =>
              baseWarm.get(n).filter(_ > 0)
                .forall(bw => rerun(n) / bw > ratio * medW)
            }
          case _ => flagged
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    // warm-up: touch every table + force a shuffle and codegen. Guarded so
    // one broken loader degrades to per-query failures instead of aborting
    // Bench before the JSON line is emitted.
    try {
      Seq("lineitem", "orders", "documents", "embeddings")
        .foreach(t => Tables.table(spark, sfDir, t).count())
      Tables.events(spark, sfDir).count() // ns-timestamp loader
      SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up FAILED (continuing): ${e.getMessage}")
    }
    // build-once artifacts: paid here, each its own line item, in the
    // declared DEPENDENCY order (cc_clusters consumes lsh_pairs — an
    // alphabetical sort would charge the pair build to the cluster item)
    graft.queries.LlmOps.resetArtifactCaches()
    val artifacts = graft.queries.LlmOps.artifactBuilders.map {
      case (name, build) =>
        name -> time {
          try build(spark, sfDir)
          catch { case e: Throwable =>
            failures += s"artifact:$name"
            System.err.println(s"[bench] artifact $name FAILED: ${e.getMessage}")
          }
        }
    }
    // each query twice: cold (first execution of the plan) + warm
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = time {
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          failures += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
      }
      val cold = once()
      val warm = once()
      (name, cold, warm)
    }
    val total = artifacts.map(_._2).sum + results.map(_._2).sum
    // regression gate vs the PREVIOUS round's committed bench_out.json
    // (read before this run overwrites it): catches the next w19-style
    // breakage or perf drift in-round instead of at the judge
    val baselinePath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "bench_out.json"))
    val regressed: Seq[String] =
      if (!java.nio.file.Files.exists(baselinePath)) Nil
      else {
        val prior = new String(java.nio.file.Files.readAllBytes(baselinePath),
          java.nio.charset.StandardCharsets.UTF_8)
        val flags = regressions(parseQueryMap(prior, "queries"),
          parseQueryMap(prior, "queries_warm"), results,
          confirm = Some { n =>
            // a failing re-run CONFIRMS the flag (Double.MaxValue beats
            // any threshold): a regression that manifests as a crash, or
            // a box so pressured the query dies, must never be reported
            // as confirmed-clean
            val t = try time(SparkEntry.queries(n)(spark, sfDir).count())
              catch { case e: Throwable =>
                System.err.println(s"[bench] confirm re-run of $n FAILED: " +
                  s"${e.getMessage} — keeping the flag")
                Double.MaxValue
              }
            System.err.println(f"[bench] confirming $n: re-run $t%.2f s")
            t
          })
        flags.foreach(n => System.err.println(
          s"[bench] REGRESSION: $n >1.5x slower (cold AND warm) than " +
            "baseline, CONFIRMED by an isolated re-run"))
        flags
      }
    // consumers of a failed artifact build re-pay the build inside their
    // own cold timing — flag them so those numbers are never read as a
    // plan regression against a healthy round
    val failedArtifacts = failures.distinct
      .filter(_.startsWith("artifact:")).map(_.stripPrefix("artifact:"))
    val tainted = failedArtifacts
      .flatMap(a => graft.queries.LlmOps.artifactConsumers.getOrElse(a, Nil))
      .distinct.sorted.toSeq
    def render(fmt: Double => Double, warm: Int): String = {
      val warmPart = warm match {
        case 0 => ""
        case 1 => s""","warm":${results.map(r => fmt(r._3)).mkString("[", ",", "]")}"""
        case _ => s""","queries_warm":${jsonMap(results.map(r => r._1 -> fmt(r._3)))}"""
      }
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"""" +
        s""","queries":${jsonMap(results.map(r => r._1 -> fmt(r._2)))}""" +
        warmPart +
        s""","artifacts":${jsonMap(artifacts.map(a => a._1 -> fmt(a._2)))}""" +
        s""","tainted":${jsonArr(tainted)}""" +
        s""","failures":${jsonArr(failures.distinct.toSeq)}""" +
        s""","regressions":${jsonArr(regressed)}""" +
        s""","sf":"$sfDir"}"""
    }
    val verbose = render(identity, warm = 2)
    // fallback ladder keeps the line inside the window as the query count
    // grows: millis → centis (box noise is ±10%; 10ms resolution loses
    // nothing) → finally drop the warm array (still in the verbose line
    // and bench_out.json). 1750 leaves room for the runner's own trailing
    // log lines inside its ~2000-char stdout tail.
    // final rung: when even the no-warm full map cannot fit (the query
    // count grew past what ~25 chars/name allows), drop the per-query
    // map from the LAST line entirely — the verbose line above and
    // bench_out.json (committed in-repo) still carry every number, and
    // a complete slim line beats a tail-truncated full one, which would
    // zero the whole round's bench capture
    val slim =
      s"""{"metric":"total","value":${r2(total)},"unit":"sec"""" +
        s""","queries_file":"bench_out.json"""" +
        s""","n_queries":${results.length}""" +
        s""","artifacts":${jsonMap(artifacts.map(a => a._1 -> r2(a._2)))}""" +
        s""","tainted":${jsonArr(tainted)}""" +
        s""","failures":${jsonArr(failures.distinct.take(10).toSeq)}""" +
        s""","regressions":${jsonArr(regressed.take(10))}""" +
        s""","sf":"$sfDir"}"""
    val candidates = Seq(render(r3, warm = 1), render(r2, warm = 1),
      render(r2, warm = 0), slim)
    val compact = candidates.find(_.length <= 1750).getOrElse(candidates.last)
    // land the verbose line in a dedicated file so a log-prefixing runner
    // (sbt wraps forked stdout unless outputStrategy passes it through)
    // can never corrupt it, and print it BEFORE the compact line
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    java.nio.file.Files.write(outFile,
      (verbose + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(verbose)
    if (compact.length > 1750)
      System.err.println(s"[bench] WARNING: compact line ${compact.length} chars " +
        "— approaching the runner's 2000-char stdout tail window")
    // the runner parses the JSON found in the last ~2000 chars of stdout:
    // this compact line must be printed LAST and stay well under that
    println(compact)
    spark.stop()
  }
}
