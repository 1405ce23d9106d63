package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines — the
  * north-star surface beyond the reference's own operators (BASELINE.json
  * `north_star`; SURVEY.md §7.1 step 7). Everything is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs): tokenization via `split`,
  * higher-order array functions for per-row scoring, `explode` + hash agg for
  * corpus-level stats. All operators are embarrassingly parallel per row or
  * single-shuffle aggregations — the 100 TB plan is the same plan.
  */
object TextOps {

  /** Lexicographic (a, b) order packed into one Decimal(38,0), so arg-min /
    * arg-max reductions over it HASH-aggregate: a `min(struct(a, b))` (or
    * `min_by(v, struct(a, b))`) buffer holds a struct, which is not
    * UnsafeRow-mutable, and the whole aggregation falls back to
    * Sort + SortAggregate — a full sort of the corpus-sized input (the
    * assignBucketsScored rule; see Similarity). A decimal buffer IS
    * mutable. Order-isomorphic for ANY long `a` (lifted by 2⁶³ into
    * [0, 2⁶⁴), computed in decimal so nothing overflows) and int `b` in
    * [0, 2³¹) — the posexplode/sequence position columns these call sites
    * order by. Injective, so min_by(a, packed) + min_by(b, packed) under
    * ties return the same (a, b) pair min(struct(a, b)) would.
    *
    * PRECONDITION — `a` must be a NON-NULL INTEGRAL column. A string id
    * would order numerically (or throw under ANSI cast) where the struct
    * order was lexicographic, and a NULL id makes the packed key NULL,
    * which `min_by` skips where `min(struct)` ranked it first. Public
    * entry points guard with [[integralIdType]] and fall back to the
    * struct order for anything else, so the packing is never applied to a
    * column it could mis-order (the checkedCodeId rule: enforce the
    * contract, don't assume it).
    */
  private[scale] def packedLexLongInt(a: Column, b: Column): Column =
    (lit(BigDecimal(2).pow(63)).cast(DecimalType(38, 0)) + a) *
      lit(BigDecimal(2).pow(31)).cast(DecimalType(38, 0)) + b

  /** True iff `dt` is an integral type [[packedLexLongInt]] orders
    * correctly (byte/short/int/long). Fractional, decimal, string, and
    * everything else keep the legacy `min(struct(...))` winner election:
    * value-identical ordering at the cost of the SortAggregate fallback.
    */
  private[scale] def integralIdType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

  /** Whitespace tokens. The synthetic corpus is single-space separated;
    * for real corpora swap in a regex (`split(col, "\\s+")`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-document stats: char/token counts, distinct-token count, mean token
    * length. One narrow projection — no shuffle.
    */
  def textStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col("*"),
      length(col(textCol)).as("n_chars_calc"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      (length(regexp_replace(col(textCol), " ", "")).cast(DoubleType) / size(toks))
        .as("avg_token_len"))
  }

  /** Function words used by the language-ID / quality heuristics. */
  val EnglishMarkers: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Language-ID heuristic: fraction of tokens that are English function
    * words; `predicted` = 'en' above the threshold, else 'und'. A real system
    * swaps the marker list for per-language n-gram tables — the dataflow
    * (per-row scoring, no shuffle) is identical.
    */
  def languageId(df: DataFrame, textCol: String, threshold: Double = 0.08): DataFrame = {
    val toks = tokens(col(textCol))
    val markers = array(EnglishMarkers.map(lit): _*)
    val score = size(filter(toks, t => array_contains(markers, t))).cast(DoubleType) / size(toks)
    df.select(col("*"), score.as("en_ratio"),
      when(score >= threshold, "en").otherwise("und").as("predicted"))
  }

  /** Quality score in [0,1]: mix of token diversity, function-word presence,
    * and length saturation. Weights are illustrative; the shape (pure per-row
    * arithmetic over array aggregates) is what matters at scale.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val markers = array(EnglishMarkers.map(lit): _*)
    val nTok = size(toks).cast(DoubleType)
    val uniqRatio = size(array_distinct(toks)).cast(DoubleType) / nTok
    val stopRatio = size(filter(toks, t => array_contains(markers, t))).cast(DoubleType) / nTok
    val lenScore = least(length(col(textCol)).cast(DoubleType) / lit(500.0), lit(1.0))
    df.select(col("*"),
      uniqRatio.as("uniq_ratio"), stopRatio.as("stop_ratio"), lenScore.as("len_score"),
      (uniqRatio * 0.4 + stopRatio * 0.3 + lenScore * 0.3).as("quality"))
  }

  /** Text cleaning/normalization — the first pass of every training-data
    * pipeline: lowercase, replace non-[a-z0-9 ] runs with a space, collapse
    * space runs, trim. One narrow projection (three codegen'd regex passes);
    * patterns avoid anchors/lookarounds/escapes whose semantics differ
    * between regex dialects, so any engine (Java, RE2/DuckDB) cleans
    * identically. Idempotent: clean(clean(x)) == clean(x).
    */
  def cleanText(df: DataFrame, textCol: String, out: String = "clean"): DataFrame =
    df.withColumn(out,
        trim(regexp_replace(
          regexp_replace(lower(col(textCol)), "[^a-z0-9 ]+", " "),
          " +", " ")))
      .withColumn("removed_chars", length(col(textCol)) - length(col(out)))

  /** Document fingerprint: md5 of the normalized text (lowercase, collapsed
    * whitespace). Content-addressed identity for exact dedup — 128-bit, so
    * collisions are negligible at any corpus size.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact near-zero-cost dedup: group by fingerprint, canonical = min id.
    * Map-side combine bounds shuffle volume by |distinct fingerprints|; at
    * 100 TB this is the standard first pass before any fuzzy method.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withFp = df.withColumn("fingerprint", fingerprint(col(textCol)))
    val canon = withFp.groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("group_size"))
    withFp.join(canon, Seq("fingerprint"))
      .withColumn("is_dup", col(idCol) =!= col("canonical_id"))
  }

  /** Corpus token frequency: explode + hash agg (map-side partial combine →
    * shuffle bounded by vocabulary size, not corpus size).
    */
  def tokenFrequency(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** BPE-style pre-tokenization (the GPT-2 pretokenizer's class structure,
    * simplified to regex-engine-portable classes): letter runs, digit runs,
    * and non-alphanumeric runs each become one pre-token — the unit a BPE
    * merge table would then subdivide. `regexp_extract_all` is codegen'd;
    * the pattern avoids lookarounds so any RE dialect (Java, RE2, PCRE)
    * tokenizes identically.
    */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Per-document BPE-pretoken counts: total plus per-class breakdown —
    * the token-budget accounting a training pipeline runs per document.
    * Narrow projection, no shuffle.
    */
  def bpeTokenStats(df: DataFrame, textCol: String): DataFrame =
    df.select(col("*"),
      size(bpeTokens(col(textCol))).as("n_bpe"),
      size(regexp_extract_all(col(textCol), lit("[a-zA-Z]+"), lit(0))).as("n_alpha"),
      size(regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0))).as("n_num"),
      size(regexp_extract_all(col(textCol), lit("[^a-zA-Z0-9\\s]+"), lit(0))).as("n_punct"))

  /** Gopher-style repetition filters: fraction of the document covered by its
    * single most frequent token, and duplicate n-gram fractions (1 − distinct
    * n-grams / total n-grams). High values signal boilerplate/spam that
    * quality-filtering drops before training.
    *
    * The n-gram fractions are per-row array arithmetic (no shuffle). The
    * top-token fraction goes through explode + two hash aggs — per-(doc,
    * token) counts then per-doc max — because a per-row HOF formulation
    * (`aggregate` over distinct tokens, counting occurrences of each) is
    * quadratic in document length; shuffle volume is bounded by Σ distinct
    * tokens per doc, far below corpus bytes.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      topTokenMax: Double = 0.20, dup2gramMax: Double = 0.20): DataFrame = {
    val toks = tokens(col(textCol))
    def dupFrac(k: Int) = {
      val grams = NearDup.shinglesFromTokens(col("_toks"), k)
      when(size(col("_toks")) >= k,
        lit(1.0) - size(grams).cast(DoubleType) / (size(col("_toks")) - (k - 1)))
        .otherwise(lit(0.0))
    }
    val perRow = df
      .withColumn("_toks", toks)
      .select(col(idCol), col("_toks"),
        size(col("_toks")).as("n_tokens"),
        dupFrac(2).as("dup_2gram_frac"),
        dupFrac(3).as("dup_3gram_frac"))
    val topTok = perRow
      .select(col(idCol), explode(col("_toks")).as("_t"))
      .groupBy(idCol, "_t").agg(count(lit(1)).as("_c"))
      .groupBy(idCol).agg(max("_c").as("_top"))
    // LEFT join: a doc with NULL or empty text produces no exploded token
    // rows and hence no topTok row — it must still appear in the output
    // (with top_token_frac 0, unflagged), not vanish from the quality gate.
    perRow.drop("_toks")
      .join(topTok, Seq(idCol), "left")
      .withColumn("top_token_frac",
        when(col("n_tokens") > 0,
          coalesce(col("_top"), lit(0L)).cast(DoubleType) / col("n_tokens"))
          .otherwise(lit(0.0)))
      .drop("_top")
      .withColumn("flagged",
        col("top_token_frac") > topTokenMax || col("dup_2gram_frac") > dup2gramMax)
  }

  /** PII redaction: emails, North-American phone numbers, and IPv4 addresses
    * replaced by typed placeholders, with per-document match counts (the
    * audit trail a compliance pass needs). Pure per-row regex projection —
    * no shuffle; patterns use only character classes and counted repetition,
    * which Java and RE2-family engines interpret identically.
    */
  val EmailPattern = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z0-9]"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def redactPii(df: DataFrame, textCol: String, out: String = "redacted"): DataFrame =
    df.select(col("*"),
        regexp_count(col(textCol), lit(EmailPattern)).as("n_emails"),
        regexp_count(col(textCol), lit(PhonePattern)).as("n_phones"),
        regexp_count(col(textCol), lit(Ipv4Pattern)).as("n_ips"))
      // order matters: IPv4 before phone would not — the patterns are
      // disjoint (dots vs dashes) — but email first keeps a digit-bearing
      // local part from being half-eaten by the number patterns.
      .withColumn(out,
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
            Ipv4Pattern, "<IP>"),
          PhonePattern, "<PHONE>"))

  /** TF-IDF top terms per document: tf = in-doc count, idf = ln(N / df),
    * score rounded to 4 decimals (ln is the one non-rational step — both
    * engines compute IEEE doubles, and a 1-ulp difference cannot move a
    * 4-decimal rounding except on a measure-zero boundary). Two hash aggs
    * (doc×token, then token) + one broadcast of the document-frequency
    * table; the window's partition key is the doc id, so ranking reuses the
    * tf agg's clustering.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 4))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("token"))))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash every
    * k-char gram, then keep the MINIMUM hash of each w-gram window — any
    * shared substring of length ≥ k+w-1 between two documents is guaranteed
    * to surface as a shared fingerprint, at ~2/(w+1) the density of full
    * k-gram sets. The gram hash is the md5-derived 60-bit value any engine
    * reproduces bit-for-bit (the point of a content fingerprint).
    *
    * Fewer grams than a window (len(text) < k+w-1) degrades to one
    * fingerprint (the global minimum); text shorter than k has none.
    *
    * Staged projections (grams → minima → distinct) on purpose: HOFs are
    * interpreted, and nesting `size(grams)` inside the window lambda would
    * re-evaluate the gram pipeline per window (quadratic).
    */
  def winnowFingerprints(df: DataFrame, textCol: String, k: Int = 7, w: Int = 4,
                         out: String = "fingerprints"): DataFrame = {
    val text = col(textCol)
    df.withColumn("_gh",
        when(length(text) >= k,
          transform(sequence(lit(1), length(text) - (k - 1)),
            i => Hashing.md5Long60(text.substr(i, lit(k)))))
          .otherwise(array().cast(ArrayType(LongType))))
      .withColumn(out,
        when(size(col("_gh")) >= w,
          array_sort(array_distinct(transform(
            sequence(lit(1), size(col("_gh")) - (w - 1)),
            j => array_min(slice(col("_gh"), j, lit(w)))))))
          .when(size(col("_gh")) > 0, array(array_min(col("_gh"))))
          .otherwise(array().cast(ArrayType(LongType))))
      .drop("_gh")
  }

  /** Pairwise source-overlap matrix: for every ORDERED source pair (a, b),
    * the n-gram containment |grams(a) ∩ grams(b)| / |grams(a)| — the
    * corpus-audit answer to "how much of source a is inside source b"
    * (asymmetric on purpose: a small source fully contained in a big one
    * reads 1.0 one way and near-0 the other). Sub-k-token docs carry no
    * grams on either engine, as everywhere else in this module.
    *
    * Scale shape: ONE hash-agg over (source, gram) builds the distinct
    * gram sets — the only corpus-sized shuffle; the intersection join is
    * keyed on the gram and fans out at most |sources|² rows per gram.
    * The matrix is a dashboard artifact — |sources| is dozens-to-hundreds
    * by contract; for thousands of sources replace the exact join with
    * per-source [[graft.functions.KmvAgg]] sketches and estimate
    * intersections by inclusion-exclusion (the sketches are mergeable, so
    * the same one-pass agg builds them).
    *
    * Output: (src_a, src_b, grams_a, grams_b, shared, containment) for
    * every a ≠ b, zero-filled pairs included (absence of overlap is the
    * finding a contamination audit is after).
    */
  /** C4-style GLOBAL line deduplication (Raffel et al. 2020 §2.2 "we
    * discarded all but one of any three-sentence span occurring more than
    * once"; CCNet's per-shard line dedup): every distinct line keeps only
    * its globally FIRST occurrence — smallest (id, position) — and every
    * later occurrence is removed from its document. The classic
    * boilerplate-stripper: navigation chrome, cookie banners, share
    * buttons repeat across millions of pages and survive document-level
    * dedup untouched.
    *
    * Scale shape — deliberately NOT a window partitioned by line: the hot
    * boilerplate line appears in a large fraction of ALL documents, and a
    * `Window.partitionBy(line)` would move every copy into one partition
    * (the textbook skew trap). Instead the winner per line is a groupBy
    * `min(struct(id, pos))` — partial aggregation collapses each hot line
    * to ONE row per map task before the shuffle — and survivors are
    * selected by an equi-join on the UNIQUE composite key (line, id, pos),
    * which cannot skew because each key occurs exactly once per side.
    * Reassembly is a per-document sort of surviving positions. Three
    * shuffles total, all skew-proof.
    *
    * Empty lines are lines: repeated blank separators dedup like any
    * other content (filter them upstream if they are formatting). A
    * document whose every line lost keeps its row with empty text —
    * dropping it silently would corrupt downstream joins on id.
    *
    * Output: (id, text — surviving lines joined by `sep`, n_lines,
    * n_removed).
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "sep must be non-empty (an empty separator would split every character)")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // round-robin fanout (single-input-split corpora) — order-independent
    // downstream, so determinism is unaffected. cache(): lines feed the
    // winner agg AND the survivor join.
    val lines = df.repartition(n)
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .cache()
    // packed arg-min (one HashAggregate, no sort of the exploded lines —
    // min(struct(id, pos)) fell back to SortAggregate; see packedLexLongInt).
    // Non-integral ids (string keys, decimals) keep the struct order: the
    // packing would elect a NUMERICALLY smallest winner where the old
    // contract was the type's own ordering.
    val winners =
      if (integralIdType(df.schema(idCol).dataType)) {
        val lk = packedLexLongInt(col("id"), col("pos"))
        lines.groupBy("line")
          .agg(min_by(col("id"), lk).as("id"), min_by(col("pos"), lk).as("pos"))
      } else
        lines.groupBy("line")
          .agg(min(struct(col("id"), col("pos"))).as("_w"))
          .select(col("line"), col("_w.id").as("id"), col("_w.pos").as("pos"))
    val kept = lines.join(winners, Seq("line", "id", "pos"))
    val rebuilt = kept.groupBy("id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), sep).as("_text"),
        count(lit(1)).as("n_lines"))
    df.select(col(idCol).as("id"),
        size(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("_orig"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("_text"), lit("")).as(textCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        (col("_orig") - coalesce(col("n_lines"), lit(0L))).as("n_removed"))
  }

  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
                    shingleK: Int = 3): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // round-robin fanout: the gram pipeline is CPU-dense and the corpus may
    // arrive as one input split; order-independence downstream (distinct,
    // counts) keeps the result deterministic. cache(): feeds sizes + both
    // join sides.
    val grams = df.repartition(n)
      .select(col(srcCol).as("src"),
        explode(NearDup.shinglesFromTokens(tokens(col(textCol)), shingleK)).as("gram"))
      .distinct()
      .cache()
    val sizes = grams.groupBy("src").agg(count(lit(1)).as("n_grams"))
    val shared = grams.select(col("src").as("src_a"), col("gram"))
      .join(grams.select(col("src").as("src_b"), col("gram")), Seq("gram"))
      .filter(col("src_a") =!= col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
    sizes.select(col("src").as("src_a"), col("n_grams").as("grams_a"))
      .join(sizes.select(col("src").as("src_b"), col("n_grams").as("grams_b")),
        col("src_a") =!= col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .withColumn("shared", coalesce(col("shared"), lit(0L)))
      .withColumn("containment",
        round(col("shared").cast(DoubleType) / col("grams_a"), 6))
      .select("src_a", "src_b", "grams_a", "grams_b", "shared", "containment")
  }

  /** Gopher-style rule gate (Rae et al. 2021, "Scaling Language Models",
    * table A1's heuristic family): hard per-document bounds that cut the
    * pathological tail BEFORE any model-based scoring spends compute on it.
    * Rules kept are the ones computable from token statistics alone —
    * token-count bounds, mean-token-length bounds, minimum distinct
    * stopword count, and a repetition bound on the most frequent token's
    * share (the single-token proxy for Gopher's duplicated-n-gram caps;
    * n-gram-level repetition lives in [[repetitionStats]]).
    *
    * Every metric derives from the (doc, token, tf) postings — one explode
    * + hash-agg shuffle bounded by per-document vocabulary, then a per-doc
    * rollup — so the gate costs the same as [[tokenFrequency]] at any
    * corpus size; no join back to the raw text is needed. `avg_token_len`
    * and `top_frac` are exact integer ratios (deterministic across
    * engines), rounded to 4 decimals for stable comparison.
    *
    * Output: (doc_id, n_tokens, avg_token_len, top_frac, n_stopwords,
    * ok_count, ok_len, ok_stop, ok_rep, pass).
    */
  def gopherGate(df: DataFrame, idCol: String, textCol: String,
                 minTokens: Long = 20, maxTokens: Long = 100000,
                 minAvgLen: Double = 3.0, maxAvgLen: Double = 10.0,
                 minStopwords: Int = 2, maxTopFrac: Double = 0.2): DataFrame = {
    require(minTokens <= maxTokens && minAvgLen <= maxAvgLen,
      "gate bounds must be ordered (min <= max)")
    val markers = EnglishMarkers
    val post = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val gate = post.groupBy("doc_id").agg(
      sum("tf").as("n_tokens"),
      max("tf").as("_top"),
      round(sum(length(col("token")) * col("tf")).cast(DoubleType) / sum("tf"), 4)
        .as("avg_token_len"),
      sum(when(col("token").isInCollection(markers), 1L).otherwise(0L))
        .as("n_stopwords"))
    gate
      .withColumn("top_frac",
        round(col("_top").cast(DoubleType) / col("n_tokens"), 4))
      .withColumn("ok_count",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("ok_len",
        col("avg_token_len") >= minAvgLen && col("avg_token_len") <= maxAvgLen)
      .withColumn("ok_stop", col("n_stopwords") >= minStopwords)
      .withColumn("ok_rep", col("top_frac") <= maxTopFrac)
      .withColumn("pass",
        col("ok_count") && col("ok_len") && col("ok_stop") && col("ok_rep"))
      .select("doc_id", "n_tokens", "avg_token_len", "top_frac", "n_stopwords",
        "ok_count", "ok_len", "ok_stop", "ok_rep", "pass")
  }
}
