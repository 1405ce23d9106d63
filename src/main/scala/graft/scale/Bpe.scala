package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding vocabulary induction (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) — the
  * training half of the tokenizer story ([[TextOps]]'s `q_bpe_tokens` is
  * the pre-tokenization/counting half).
  *
  * Scale shape: BPE trains on the WORD-COUNT table, not the corpus — one
  * corpus-sized shuffle builds (word, cnt), and every merge iteration
  * after that runs on the distinct-word table, which is sublinear in the
  * corpus (Heaps' law) and independent of it thereafter. Each iteration
  * is one weighted pair-count aggregation + a 1-row argmax collect + one
  * narrow array rewrite, localCheckpoint-fenced like the other iterative
  * operators ([[NearDup.clusterPairsLargeGraph]]). At real vocabulary
  * sizes (10⁵–10⁶ words) the iteration data fits one executor — the
  * distributed loop still wins over a driver loop only by keeping the
  * plumbing uniform; the corpus-sized win is already banked in the
  * word-count shuffle.
  *
  * Determinism: the argmax tiebreak is (count DESC, left ASC, right ASC)
  * — a total order, so the learned merge sequence is a pure function of
  * the word-count table (spec-pinned under repartitioning).
  */
object Bpe {

  /** End-of-word sentinel symbol (its own symbol, never merged with a
    * marker-free prefix of the next word — the Sennrich convention that
    * lets a subword know it ends a word).
    */
  val EndOfWord = "</w>"

  /** (word, cnt) over whitespace tokens — the one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial segmentation: characters + [[EndOfWord]]. */
  private def charSyms(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** One greedy left-to-right merge of adjacent (a, b) → a+b inside a
    * symbol array, as a pure fold expression (codegen'd, no UDF). The
    * merged symbol lands at the accumulator tail, so an overlapping
    * occurrence ("aaa" under (a,a)) merges leftmost-first — the standard
    * BPE application order.
    */
  def mergeOnce(syms: Column, a: String, b: String): Column = {
    val merged = a + b
    aggregate(
      syms,
      array().cast(ArrayType(StringType, containsNull = false)),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x))))
  }

  /** Apply a learned merge list in training order. Builds one chained
    * fold expression per merge — right for the ≤ a-few-dozen merges a
    * demo trains; a production encoder with a 30k-merge vocab applies
    * greedy longest-match over the final vocab in a `mapPartitions`
    * trie pass instead (same output by BPE's prefix-closure property).
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSyms(word)) { case (syms, (a, b)) => mergeOnce(syms, a, b) }

  /** Learn `numMerges` merges from a (word, cnt) table. Stops early when
    * no adjacent pair occurs at least `minCount` times (weighted).
    * Returns the merge table: (step, left, right, merged, pair_count) in
    * training order.
    *
    * BATCHED trainer: each Spark job learns up to `maxBatch` merges, so a
    * 30k-merge vocabulary needs ~thousands of jobs instead of 30k — the
    * round-5 scale caveat. The batch is chosen so the learned sequence is
    * PROVABLY IDENTICAL to the one-merge-per-job sequential trainer (the
    * BpeBatchSpec property), not merely close:
    *
    * accept a maximal PREFIX p1..pm of the (count DESC, l ASC, r ASC)
    * pair ranking such that
    *   (1) batch pairs are pairwise symbol-disjoint,
    *   (2) each merged string l+r is FRESH — not in the running symbol
    *       inventory (initial characters + </w> + all previously merged
    *       symbols, tracked driver-side) — and batch-distinct,
    *   (3) count(pm) is STRICTLY greater than the first excluded pair's
    *       count (ties at the boundary fall back to the next iteration).
    *
    * Why this equals sequential: applying p_i cannot change p_j's count
    * for j>i — neither symbol of p_j is consumed (1), and no created
    * occurrence of the merged symbol can spell a batch pair (2). Every
    * OTHER pair stays strictly below the batch: old excluded pairs only
    * lose occurrences and already sat at count <= the boundary (3); a
    * NEW pair (x, a·b) or (a·b, y) occurs at most count(x,a) resp.
    * count(b,y) times, and those pairs share a symbol with p_i, hence
    * were excluded, hence sat strictly below every batch count (3). So
    * the sequential argmax after k batch applications is exactly
    * p_{k+1}, by induction. A batch always admits >= 1 pair (a single
    * pair satisfies all three vacuously except (3), and a boundary TIE
    * with the runner-up is resolved by the lexicographic tiebreak, which
    * ranking position 1 wins by construction).
    */
  def learnMerges(wordCounts: DataFrame, numMerges: Int,
                  minCount: Long = 2L, maxBatch: Int = 16): DataFrame = {
    require(numMerges >= 1 && numMerges <= 4096, s"numMerges out of range: $numMerges")
    require(maxBatch >= 1 && maxBatch <= 256, s"maxBatch out of range: $maxBatch")
    val spark = wordCounts.sparkSession
    import spark.implicits._

    var vocab = wordCounts
      .select(charSyms(col("word")).as("syms"), col("cnt").cast(LongType).as("cnt"))
      .localCheckpoint(true)
    var prev: DataFrame = null
    // running symbol inventory for freshness check (2): one vocab-sized
    // distinct-chars job up front, then pure driver-side bookkeeping.
    var inventory = wordCounts
      .select(explode(split(col("word"), "")).as("s")).distinct()
      .as[String].collect().toSet + EndOfWord
    val learned = Vector.newBuilder[(Int, String, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      // weighted adjacent-pair counts over the vocab (every position,
      // overlaps included — the standard trainer's statistic); top
      // maxBatch+1 rows: the +1 row is the strict-drop boundary (3).
      // Fully-merged single-symbol words contribute no pairs and must be
      // excluded BEFORE the explode: sequence(1, 0) is DESCENDING in
      // Spark, so a 1-element array would probe element_at(syms, 2).
      val want = math.min(maxBatch, numMerges - step)
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(want + 1)
        .as[(String, String, Long)]
        .collect()

      if (top.isEmpty || top.head._3 < minCount) exhausted = true
      else {
        // index 0 is the sequential argmax — accepted unconditionally (a
        // singleton batch IS the sequential step). Freshness of index 0
        // still gates EXTENDING the batch: a non-fresh p1 can re-feed
        // excluded pairs, so the batch stays singleton in that case.
        // From index 1 on, stop at the first pair violating (1) or (2).
        val batch = Vector.newBuilder[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        val mergedSeen = scala.collection.mutable.Set.empty[String]
        var i = 0
        var stopped = false
        while (i < math.min(want, top.length) && !stopped) {
          val (a, b, n) = top(i)
          val fresh = !inventory.contains(a + b) && !mergedSeen.contains(a + b)
          val disjoint = !used.contains(a) && !used.contains(b)
          if (i == 0 || (n >= minCount && fresh && disjoint)) {
            batch += ((a, b, n)); used += a; used += b; mergedSeen += a + b
            i += 1
            if (i == 1 && !fresh) stopped = true
          } else stopped = true
        }
        var accepted = batch.result()
        // boundary rule (3): last accepted must strictly beat the first
        // excluded pair's count; shrink until it does. Position 1 never
        // shrinks away — a boundary tie there is won by the tiebreak.
        if (i < top.length) {
          val nextN = top(i)._3
          while (accepted.length > 1 && accepted.last._3 <= nextN)
            accepted = accepted.init
        }
        accepted.foreach { case (a, b, n) =>
          learned += ((step, a, b, a + b, n))
          inventory += a + b
          step += 1
        }
        val next = vocab
          .select(accepted.foldLeft(col("syms")) { case (s, (a, b, _)) =>
            mergeOnce(s, a, b)
          }.as("syms"), col("cnt"))
          .localCheckpoint(true) // constant-size plan across iterations
        if (prev != null) prev.unpersist() // drop the superseded checkpoint
        prev = vocab
        vocab = next
        // if the first pair NOT taken (post-shrink the accepted set is a
        // prefix of `top`) is already below minCount, everything left is
        // too: old pairs sit at/below that boundary, new pairs are
        // bounded by excluded old pairs containing a batch symbol — done.
        if (accepted.length < top.length && top(accepted.length)._3 < minCount)
          exhausted = true
      }
    }
    if (prev != null) prev.unpersist()
    learned.result()
      .toDF("step", "left", "right", "merged", "pair_count")
  }

  /** Segment every document with a learned merge list: subword tokens +
    * count per document (narrow projection — the corpus is touched once).
    *
    * Implementation is the STRING form of the merge fold, not
    * [[applyMerges]]: the document becomes one U+001F-delimited symbol
    * string — DOUBLED delimiters at every symbol boundary (see the
    * in-body comment for why single delimiters are subtly wrong), words
    * separated by four delimiters no merge pattern can span — and each
    * merge is a codegen'd `replace`, value-equal to the fold (BpeSpec
    * hand cases + the ScalePropertiesSpec random-words property). A/B at
    * sf0.1: the nested-aggregate fold ran 7.7 s (interpreted HOFs,
    * O(|word|²) array copies); this form is pure string ops inside
    * whole-stage codegen. Constraint: input tokens must not contain
    * U+001F (same contract as the CMS separator).
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    val D = "\u001F"
    val DD = D + D
    // Symbol boundaries are DOUBLED delimiters, and each merge pattern
    // takes exactly one delimiter from each side (D a DD b D -> D ab D):
    // a match leaves one delimiter behind at both edges, so a back-to-
    // back second occurrence ("abab", "aaaa") still has its leading
    // delimiter and merges in the same pass -- exactly the fold's greedy
    // leftmost-restart semantics. A SINGLE-delimiter scheme is subtly
    // wrong: the match consumes the shared delimiter and the scan (which
    // never rescans replaced output) misses the adjacent occurrence --
    // caught by the ScalePropertiesSpec equivalence property ("abab"
    // under (a,b) gave [ab, a, b] instead of the fold's [ab, ab]).
    val words = filter(TextOps.tokens(col(textCol)), w => length(w) > 0)
    val seg0 = array_join(transform(words, w =>
      concat(lit(DD), array_join(split(w, ""), DD), lit(DD + EndOfWord + DD))), "")
    val applied = merges.foldLeft(seg0) { case (s, (a, b)) =>
      replace(s, lit(D + a + DD + b + D), lit(D + a + b + D))
    }
    docs.select(col(idCol),
      filter(split(applied, D), x => length(x) > 0).as("subwords"))
      .withColumn("n_subwords", size(col("subwords")))
  }
}
