package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Context-window preparation for LLM training corpora: sliding-window
  * document chunking and concatenate-and-chop sequence packing.
  * Beyond-reference surface (the reference has no string processing,
  * SURVEY §1.4) — these are the steps between a deduped corpus and a
  * token-budgeted training set.
  *
  * Scale shape:
  *  - [[chunkByTokens]] is a pure scan-stage explode — per-row array
  *    arithmetic with no shuffle at all; 100 TB chunks in one pass.
  *  - [[packAssignments]] needs one global exclusive prefix sum over
  *    document token counts, which reuses [[Series.cumsum]]'s
  *    two-level distributed scan (range partition + local rescan +
  *    O(partitions) driver exchange) — never a single-partition
  *    window. Everything after the scan is per-row arithmetic.
  */
object Chunking {

  /** Split each document into token windows of `size` starting every
    * `stride` tokens (stride < size ⇒ overlapping windows; stride ==
    * size ⇒ disjoint). The final window of a document may be shorter.
    * Documents with no tokens produce no rows. Output:
    * (id, chunk_idx, tok_start, n_tokens, chunk_text).
    */
  def chunkByTokens(docs: DataFrame, id: String, text: String,
                    size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val toks = docs.select(col(id), Text.tokens(col(text)).as("__toks"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      .filter(col("__n") > 0)
    toks
      .select(col(id), col("__toks"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "tok_start")))
      .select(col(id), col("chunk_idx"), col("tok_start"),
        slice(col("__toks"), col("tok_start") + 1, lit(size)).as("__c"))
      .select(col(id), col("chunk_idx"), col("tok_start"),
        org.apache.spark.sql.functions.size(col("__c")).as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  /** Concatenate-and-chop packing: documents are laid end-to-end in
    * the global order of `order` and cut every `contextLen` tokens
    * (the GPT-style packing that lets no pad token survive). Returns
    * one row per document: its token span `[tok_start, tok_end)` in
    * the packed stream and the first/last context bin it lands in
    * (`bin_first == bin_last` ⇔ the document is not split across a
    * boundary). Documents with no tokens are dropped.
    */
  def packAssignments(docs: DataFrame, id: String, text: String,
                      contextLen: Int): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val counted = docs
      .select(col(id), Text.tokenCount(col(text)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    // The scan result stays cached (see Series.cumsum's lifecycle
    // note); everything below is per-row arithmetic over it.
    Series.cumsum(counted, col(id), col("n_tokens"), "__cum")
      .withColumn("tok_end", col("__cum").cast("long"))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .select(col(id), col("n_tokens"), col("tok_start"), col("tok_end"),
        floor(col("tok_start") / contextLen).as("bin_first"),
        floor((col("tok_end") - 1) / contextLen).as("bin_last"))
      .withColumn("n_bins", col("bin_last") - col("bin_first") + 1)
  }
}
