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

  /** Learn `numMerges` merges; returns (rank, left_sym, right_sym,
    * pair_count) in learn order. Merged-in symbols concatenate, so a
    * later round can pick ("th", "e</w>") and so on. */
  def learnMerges(docs: DataFrame, numMerges: Int,
                  text: Column = col("text")): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var vocab = initialVocab(docs, text).localCheckpoint(true)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((rank + 1, l, r, pc))
        // left-to-right non-overlapping merge apply: fold with a
        // one-symbol lookbehind — the merged token does NOT re-pair
        // with a following right inside the same round ("aaa" under
        // (a,a) becomes ["aa","a"], never ["aaa"])
        val merged = aggregate(
          col("syms"),
          struct(array().cast("array<string>").as("acc"),
            lit(null).cast("string").as("pend")),
          (st, s) => {
            val acc = st.getField("acc")
            val pend = st.getField("pend")
            when(pend.isNull, struct(acc.as("acc"), s.as("pend")))
              .when(pend === lit(l) && s === lit(r),
                struct(concat(acc, array(lit(l + r))).as("acc"),
                  lit(null).cast("string").as("pend")))
              .otherwise(struct(concat(acc, array(pend)).as("acc"), s.as("pend")))
          },
          st => when(st.getField("pend").isNull, st.getField("acc"))
            .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
        vocab = vocab.select(col("wc"), merged.as("syms")).localCheckpoint(true)
        rank += 1
      }
    }
    out.result()
  }
}
