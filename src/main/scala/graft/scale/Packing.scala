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

  /** Next-fit bin packing WITHOUT document splitting: walk each group's
    * documents in `idCol` order, appending to the current bin until the
    * next document would overflow `capacity`, then close it and start a
    * new one. A document larger than `capacity` occupies a bin alone
    * (oversized bin — callers filter or truncate upstream if that is
    * unacceptable). This is the packing a pipeline uses when examples must
    * stay whole (instruction tuning, contrastive pairs), complementing
    * [[packChunks]]'s concat-then-chunk for plain LM pretraining.
    *
    * The running "current fill" resets on overflow, which is sequential
    * state no window frame expresses — the one operator family in this
    * package where `mapPartitions` is genuinely the right tool (design
    * preference (d), documented trade-off): groups are hash-partitioned and
    * sorted within partitions, then a single O(1)-state pass assigns bins.
    * Determinism under retries: partitioning is a hash of the group,
    * the sort order (`groupCol, idCol`) is total, and the fold reads only
    * that order — re-executed tasks reproduce identical bins. Parallelism
    * = number of groups, the same dial as [[packChunks]]; a group's rows
    * stream through the fold (sorted by the shuffle's external sort), so
    * group size is unbounded.
    *
    * Output: groupCol, idCol, nTokensCol, bin_id (0-based per group),
    * bin_fill (running fill AFTER placing the row — the last row of a bin
    * carries its final fill).
    */
  def nextFitPack(df: DataFrame, idCol: String, nTokensCol: String,
                  groupCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val pruned = df
      .select(col(groupCol).cast(StringType).as(groupCol), col(idCol),
        col(nTokensCol).cast(LongType).as(nTokensCol))
      .filter(col(nTokensCol) > 0)
    val outSchema = StructType(pruned.schema.fields ++ Seq(
      StructField("bin_id", LongType, nullable = false),
      StructField("bin_fill", LongType, nullable = false)))
    pruned
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
      .mapPartitions { it =>
        var group: String = null
        var bin = 0L
        var fill = 0L
        it.map { r =>
          val g = r.getString(0)
          val n = r.getLong(2)
          if (g != group) { group = g; bin = 0L; fill = 0L }
          if (fill > 0 && fill + n > capacity) { bin += 1; fill = n }
          else fill += n
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(bin, fill))
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
