package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis.tokens

/** Byte-pair-encoding merge learning — the corpus-scale half of
  * training a tokenizer (Sennrich et al.'s algorithm over word
  * frequencies).
  *
  * The 100 TB shape: the corpus is touched EXACTLY ONCE (the word-count
  * aggregate); every merge round after that runs on the WORD-FREQUENCY
  * table — |distinct words| rows, millions not billions — so learning
  * 30k merges costs 30k small vocab-table jobs, none of which rescan
  * text. Each round is: adjacent-pair counts weighted by word frequency
  * (one small shuffle), a 1-row argmax collected to the driver
  * (deterministic tie-break: count DESC, pair ASC), and a map-side fold
  * applying the merge left-to-right non-overlapping. `localCheckpoint`
  * truncates the per-round plan growth exactly like
  * `Dedup.connectedComponents`.
  */
object Bpe {

  /** Initial symbol sequence of a word: its characters plus the `</w>`
    * end-of-word marker. */
  private def charSymbols(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1))),
      array(lit("</w>")))

  /** Adjacent-pair counts over the current symbol table, weighted by
    * word frequency. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(
            element_at(col("syms"), i + 1).as("left_sym"),
            element_at(col("syms"), i + 2).as("right_sym")))).as("p"))
      .groupBy(col("p.left_sym").as("left_sym"), col("p.right_sym").as("right_sym"))
      .agg(sum(col("wc")).as("pair_count"))

  /** One-pass word-frequency table with initial char symbols. */
  def initialVocab(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.select(explode(tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("wc"), charSymbols(col("word")).as("syms"))

  /** The round-1 pair statistics — the gate-facing face (cross-engine
    * oracle-able, unlike the iterative loop). */
  def firstRoundPairs(docs: DataFrame, text: Column = col("text")): DataFrame =
    pairCounts(initialVocab(docs, text))

  /** Greedy BPE ENCODE of one word against a rank table — lowest-rank
    * eligible pair merges first, repeat to fixpoint (the standard
    * inference rule matching how the merges were learned). Static so
    * the codegen'd expression below calls it directly. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = {
      val b = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
      word.foreach(c => b += c.toString)
      b += "</w>"
      b
    }
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
        syms.remove(bestAt + 1)
      }
    }
    syms.toArray
  }

  /** Rank lookup for `encodeWord` from `learnMerges` output. */
  def rankTable(merges: Seq[(Int, String, String, Long)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.foreach { case (rank, l, r, _) => m.put(l + "\u0000" + r, rank) }
    m
  }

  /** Token count + encoded subwords per document under a learned merge
    * table — map-side only (the rank table rides the closure as a
    * broadcast-sized reference; no shuffle, no UDF registry). */
  def encodeDocuments(docs: DataFrame, merges: Seq[(Int, String, String, Long)],
                      idCol: String = "doc_id", text: Column = col("text")): DataFrame = {
    // bare split (codegen'd) instead of tokens(): the empty-token filter
    // lambda would drop the projection out of WholeStageCodegen; the
    // encoder skips empties itself
    val expr = graft.functions.BpeExpressions.bpeEncode(
      split(lower(text), "[^a-z0-9]+"), merges)
    docs.select(col(idCol).as("doc_id"), expr.as("subwords"))
      .withColumn("n_subwords", size(col("subwords")).cast("long"))
  }

  /** Left-to-right non-overlapping apply of a batch of SYMBOL-DISJOINT
    * merges in one fold pass — a one-symbol lookbehind where the merged
    * token does NOT re-pair with a following right inside the same
    * round ("aaa" under (a,a) becomes ["aa","a"], never ["aaa"]).
    * Because the batch's pairs share no symbols, their occurrences
    * cannot overlap, so one scan applying all of them equals applying
    * each merge in its own pass (in any order). */
  private def applyMerges(syms: Column, pairs: Seq[(String, String)]): Column = {
    def mergeHit(pend: Column, s: Column): Column =
      pairs.map { case (l, r) => (pend === lit(l) && s === lit(r), lit(l + r)) }
        .foldLeft(lit(null).cast("string")) { case (acc, (cond, tok)) =>
          when(cond, tok).otherwise(acc)
        }
    aggregate(
      syms,
      struct(array().cast("array<string>").as("acc"),
        lit(null).cast("string").as("pend")),
      (st, s) => {
        val acc = st.getField("acc")
        val pend = st.getField("pend")
        val hit = mergeHit(pend, s)
        when(pend.isNull, struct(acc.as("acc"), s.as("pend")))
          .when(hit.isNotNull,
            struct(concat(acc, array(hit)).as("acc"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(acc, array(pend)).as("acc"), s.as("pend")))
      },
      st => when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
  }

  /** Learn `numMerges` merges; returns (rank, left_sym, right_sym,
    * pair_count) in learn order. Merged-in symbols concatenate, so a
    * later round can pick ("th", "e</w>") and so on.
    *
    * `mergesPerRound` > 1 batches the learning the way production
    * trainers do: one pair-count job selects up to k mutually
    * SYMBOL-DISJOINT top pairs (rank order: count DESC, pair ASC; a
    * candidate sharing a left or right symbol with an already-selected
    * pair is skipped — its count may change once that pair merges), and
    * one fold pass applies them all. That turns 30k serial 1-row-argmax
    * jobs into 30k/k — the wall-clock fix for real vocabulary sizes.
    * k=1 is exact greedy BPE; k>1 is the standard batched approximation
    * (identical whenever the top-k pairs genuinely don't interact,
    * which BpeSpec verifies on a separated corpus). */
  def learnMerges(docs: DataFrame, numMerges: Int,
                  text: Column = col("text"),
                  mergesPerRound: Int = 1): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(mergesPerRound >= 1, "mergesPerRound must be >= 1")
    var vocab = initialVocab(docs, text).localCheckpoint(true)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    // a batch-mate's merge can recreate occurrences of an ALREADY-emitted
    // pair (merging (a,b) mints new "ab" tokens that re-arm an earlier
    // (x,"ab") merge); the merge list stays a set — residuals are merged
    // away without re-emitting, matching how encodeWord treats the table
    val emitted = scala.collection.mutable.HashSet.empty[(String, String)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val k = math.min(mergesPerRound, numMerges - rank)
      // over-fetch candidates: overlap filtering may reject some; a
      // short round is fine (the next count job sees fresh counts)
      val top = pairCounts(vocab)
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(4 * k + 4).collect()
        .map(t => (t.getString(0), t.getString(1), t.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val batch = top.iterator
          .filter { case (l, r, _) => !emitted.contains((l, r)) }
          .filter { case (l, r, _) =>
            if (used.contains(l) || used.contains(r)) false
            else { used += l; used += r; true }
          }
          .take(k).toSeq
        batch.foreach { case (l, r, pc) =>
          rank += 1; out += ((rank, l, r, pc)); emitted += ((l, r))
        }
        // all visible candidates already emitted (pure residuals): merge
        // the top residual without emitting so counts strictly shrink —
        // otherwise the round would spin on an unchanged vocab
        val applyPairs =
          if (batch.nonEmpty) batch.map { case (l, r, _) => (l, r) }
          else Seq((top.head._1, top.head._2))
        vocab = vocab.select(col("wc"),
          applyMerges(col("syms"), applyPairs).as("syms"))
          .localCheckpoint(true)
      }
    }
    out.result()
  }
}
