package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training pipelines: concatenate documents in a
  * deterministic order and cut the token stream into fixed-length context
  * windows ("concat then chunk" — documents may straddle a boundary). The
  * whole assignment is ONE prefix-sum window per group: no sequential
  * driver loop, no state.
  *
  * Scale design (100 TB): packing is per GROUP (shard / source / bucket) —
  * groups pack independently and in parallel, which is how a real corpus is
  * packed (per input shard, so shard outputs stay reproducible under
  * re-execution). The window sorts within a group only; there is no global
  * sort. Group sizing is the parallelism dial: hash-bucket the corpus first
  * ([[Sampling.hashBucket]]) if natural shards are too coarse.
  */
object Packing {

  /** Per-document chunk-span accounting: each row gets the half-open token
    * span [tok_start, tok_end) it occupies in its group's concatenated
    * stream, and the first/last chunk (window of `contextLen` tokens) it
    * lands in. A document with `n` tokens spanning a boundary appears in
    * `n_chunks` > 1 consecutive chunks — the crossing-rate accounting a
    * pipeline uses to size `contextLen` against its document-length
    * distribution.
    *
    * Rows with a non-positive token count occupy no span and are excluded
    * (a zero-width document has no chunk).
    *
    * Ordering contract: `idCol` must be unique within a group — it defines
    * the concatenation order, and a tie would make the packing ambiguous.
    */
  def packChunks(df: DataFrame, idCol: String, nTokensCol: String,
                 groupCol: String, contextLen: Int): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(nTokensCol) > 0)
      .withColumn("tok_end", sum(col(nTokensCol).cast(LongType)).over(w))
      .withColumn("tok_start", col("tok_end") - col(nTokensCol))
      .withColumn("first_chunk", expr(s"tok_start div $contextLen"))
      .withColumn("last_chunk", expr(s"(tok_end - 1) div $contextLen"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }
}
