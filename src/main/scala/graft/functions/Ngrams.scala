package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared word-n-gram column builder — the one shingle definition the
  * dedup, decontamination, fingerprint, and bigram surfaces all agree
  * on (space-joined token windows; fewer than n tokens → empty array).
  */
object Ngrams {

  /** Word n-grams from a BOUND token-array attribute.
    * The argument must be a materialized column reference, never the
    * tokenizing expression itself: a computed array captured inside the
    * per-index lambda would re-tokenize the text for every shingle —
    * O(len²) per document.
    */
  def shingleOfN(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
}
