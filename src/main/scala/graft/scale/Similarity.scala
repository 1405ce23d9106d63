package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`):
  *
  *  - `bruteForceTopK` — exact cosine top-k: query set × corpus with a
  *    per-query rank window. The correctness baseline; cost |Q|·|C|, so the
  *    query side must be small (or use the IVF path).
  *  - `ivfTopK` — IVF-flat: a small centroid set partitions the corpus into
  *    buckets (broadcast join, |C|·|centroids| comparisons done ONCE and
  *    reusable); queries probe only their own bucket. At 100 TB: centroids
  *    broadcast to every executor, bucket assignment is a narrow map, and the
  *    probe is an equi-join on bucket id — no all-pairs anywhere.
  *
  * All arithmetic is double (`zip_with` product + sequential `aggregate`
  * fold), rounded to 6 decimals before ranking so results are reproducible
  * across engines (ties broken by id, never by float noise).
  */
object Similarity {

  /** Dot product in double precision: the native codegen'd expression
    * ([[graft.functions.VecDot]]) — same sequential fold order as the HOF
    * form (`aggregate(zip_with(...))`) and the DuckDB oracle, but it stays
    * inside whole-stage codegen instead of the interpreted HOF path (this is
    * the innermost loop of every similarity join: |pairs| × dims).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** Cosine similarity, computed as dot / (‖a‖·‖b‖) — the PRODUCT of the
    * two square-rooted norms, never sqrt(n²a·n²b): the two float
    * expressions differ by up to 1 ulp, and this repo's rounded-to-6
    * oracle parity ([[pairCos]], the DuckDB `cosSql` fragment) is pinned
    * to the product-of-sqrts association. TOTAL: a zero-norm operand has
    * no direction, so the result is the below-range sentinel
    * [[UndefinedCos]], same rule as the internal ranking paths. Without
    * the guard, Spark 4's default ANSI mode throws DIVIDE_BY_ZERO on the
    * first garbage embedding, killing the job. Unlike [[pairCos]] this
    * public helper does not round — callers own their precision
    * (round(…, 6) matches the oracle convention).
    */
  def cosine(a: Column, b: Column): Column = {
    val n = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(n > 0, dot(a, b) / n).otherwise(lit(UndefinedCos))
  }

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** The value an undefined cosine (a zero-norm operand) takes: strictly
    * BELOW the attainable range [−1, 1], so a garbage zero vector sorts
    * under every real neighbor — including antipodal ones at cosine −1
    * (mapping to 0.0, the previous rule, ranked garbage ABOVE genuinely
    * negative neighbors). Rankings need no filter; thresholded consumers
    * (`>= threshold` for any real threshold) reject it for free.
    */
  val UndefinedCos: Double = -2.0

  /** Per-pair cosine from PRE-COMPUTED norms: higher-order-function dots are
    * interpreted, so norms must be per-vector columns (computed once), never
    * re-derived per candidate pair (3× the dot work across |Q|·|C| pairs).
    *
    * Total by construction: a zero-norm vector has no direction, so its
    * cosine with anything is [[UndefinedCos]] — it assigns
    * deterministically (all-ties → smallest centroid id) and sinks
    * strictly below every defined cosine in every ranking. Without the
    * guard ANSI mode (Spark 4 default) throws DIVIDE_BY_ZERO, and one
    * garbage embedding would kill an entire maintenance batch.
    */
  private[scale] def pairCos(aVec: Column, bVec: Column, aNorm: Column, bNorm: Column): Column =
    when(aNorm * bNorm > 0, round(dot(aVec, bVec) / (aNorm * bNorm), 6))
      .otherwise(lit(UndefinedCos))

  private def normed(df: DataFrame, idCol: String, vecCol: String,
                     prefix: String): DataFrame = {
    val v = asDouble(col(vecCol))
    df.select(col(idCol).as(s"${prefix}_id"), v.as(s"${prefix}_vec"),
      sqrt(dot(v, v)).as(s"${prefix}_norm"))
  }

  /** Exact top-k neighbors for each query vector. Output: q_id, neighbor_id,
    * cos (rounded, 6 dp), ranked per query by (cos desc, neighbor_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // repartition the streamed (query) side: the non-equi join plans as a
    // broadcast nested-loop whose parallelism is the streamed side's
    // partition count — a single input split would serialize all the math.
    // Explicit count: AQE would coalesce a bare repartition(col) to 1 on
    // MB-sized inputs, and the cost here is CPU, not bytes.
    val n = queries.sparkSession.sessionState.conf.numShufflePartitions
    val q = normed(queries, idCol, vecCol, "q").repartition(n, col("q_id"))
    val c = normed(corpus, idCol, vecCol, "c")
      .withColumnRenamed("c_id", "neighbor_id")
    val scored = q.join(c, col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "cos", "rank")
  }

  /** Assign every vector to its nearest centroid (max rounded cosine, ties →
    * smallest centroid id). Centroids are broadcast; assignment is one
    * narrow pass over the corpus.
    */
  def assignBuckets(corpus: DataFrame, centroids: DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignBucketsScored(corpus, centroids, idCol, vecCol).drop("acos")

  /** [[assignBuckets]] keeping the winning rounded cosine as `acos` — the
    * per-vector assignment-QUALITY signal. Its batch mean is what a
    * drift-triggered index refresh watches
    * ([[graft.streaming.StreamingAnnIndex.maybeRefreshOnDrift]]): a corpus
    * drifting away from frozen centroids shows up as the arriving
    * vectors' mean assignment cosine sagging below the freeze-time
    * baseline, long before recall visibly collapses. Same cost as
    * [[assignBuckets]] — the max cosine is already computed for the
    * argmax; this just keeps it.
    */
  def assignBucketsScored(corpus: DataFrame, centroids: DataFrame,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val c = normed(corpus, idCol, vecCol, "v").repartition(n, col("v_id"))
    val cent = normed(centroids, idCol, vecCol, "cent")
      .withColumnRenamed("cent_id", "centroid_id")
    // The arg-max reduction hash-aggregates: a `max_by(id, struct(ccos,
    // -id))` buffer holds a struct, which is not UnsafeRow-mutable, so the
    // whole corpus×K expansion fell back to Sort + SortAggregate — sorting
    // |corpus|·K rows that each CARRIED the vector payload (first(vec) in
    // the same buffer was a second, independent SortAggregate trigger).
    // Packing the (ccos, -centroid_id) lexicographic order into ONE
    // Decimal(38,0) is order-isomorphic — ccos is 6dp-rounded (or the −2.0
    // sentinel), so ccos·1e6 is an exact integer in [−2e6, 1e6], and
    // 2⁶³ − id ∈ (0, 2⁶⁴] reverses the id tiebreak for ANY long id — and a
    // decimal buffer is mutable, so the pass is one HashAggregate with no
    // sort. vec/norm rejoin from the same repartition exchange (reused, not
    // recomputed): ids are unique by the index contract, so the join-back
    // returns exactly the group's own vector.
    // nanvl: a NaN cosine (NaN input elements — garbage, like the zero-norm
    // vectors pairCos sentinels) sorted ABOVE every real value in the old
    // struct order (Spark ranks NaN greatest); +2.0 is above the whole
    // [−2, 1] range so the packed order agrees — and without it the ANSI
    // NaN→decimal cast would kill the batch on one garbage embedding, the
    // failure mode the −2.0 sentinel exists to prevent.
    val two63 = lit(BigDecimal(2).pow(63)).cast(DecimalType(38, 0))
    val two64 = lit(BigDecimal(2).pow(64)).cast(DecimalType(38, 0))
    val packed = (greatest(least(nanvl(col("ccos"), lit(2.0)), lit(2.0)), lit(-3.0))
      * 1e6).cast(DecimalType(23, 0)) * two64 + (two63 - col("centroid_id"))
    val best = c.join(broadcast(cent))
      .withColumn("ccos",
        pairCos(col("v_vec"), col("cent_vec"), col("v_norm"), col("cent_norm")))
      .groupBy(col("v_id"))
      .agg(max_by(col("centroid_id"), packed).as("bucket"),
        max(col("ccos")).as("acos"))
    // SHUFFLE_HASH, build = the narrow agg side: both sides already carry
    // hashpartitioning(v_id) from the ONE repartition exchange (reused),
    // so the join adds no exchange and — unlike sort-merge — no sort; and
    // unlike the planner's default it can never BROADCAST `best`, which is
    // corpus-sized (small enough only at toy scale — the PlanShapeSpec
    // "corpus is never broadcast" invariant).
    c.join(best.hint("shuffle_hash"), Seq("v_id"))
      .select(col("v_id").as("vec_id"), col("bucket"),
        col("v_vec").as("vec"), col("v_norm").as("norm"), col("acos"))
  }

  /** Deterministic pseudo-random hyperplane weights (xorshift over a fixed
    * seed mix). The planes only need to be FIXED and roughly isotropic —
    * recall comes from the geometry, not the randomness source, and a fixed
    * generator keeps the operator reproducible across runs and engines.
    */
  private def planeWeights(plane: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { d =>
      var x = plane * 1000003 + d * 7919 + 12345
      x ^= x << 13; x ^= x >>> 17; x ^= x << 5
      (x % 1001).toDouble // in [-1000, 1000]
    }

  /** Embedding-cosine near-duplicate join: random-hyperplane (sign-bit) LSH
    * banding → bucket self-join → EXACT cosine verification.
    *
    * Never all-pairs: a pair is a candidate only if one of `bands` bands of
    * `rowsPerBand` sign bits matches exactly (equi-join on the packed band
    * key), and false positives die in the exact verify. Direction-identical
    * duplicates (the same content embedded with different normalization)
    * have IDENTICAL sign signatures — positive scaling preserves every
    * dot-product sign — so recall for them is exactly 1 regardless of
    * banding. For angle-perturbed near-dups at angle θ, a band matches with
    * (1-θ/π)^rowsPerBand; size bands/rowsPerBand to the corpus margin.
    *
    * At 100 TB: signatures are a narrow per-row projection, the bucket join
    * shuffles on (band, band_key), and verification touches only candidate
    * pairs — the same scale discipline as [[graft.scale.NearDup]].
    */
  def cosineLshDedup(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.99, bands: Int = 4, rowsPerBand: Int = 16,
                     dims: Int = 64): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // cache(): fence + single evaluation of vec/norm (join constraint
    // propagation would re-evaluate the projection below the shuffle)
    val base = normed(df, idCol, vecCol, "v")
      .filter(col("v_norm") > 0)
      .repartition(n, col("v_id"))
      .cache()

    def bandKey(b: Int): Column =
      (0 until rowsPerBand).map { j =>
        val w = array(planeWeights(b * rowsPerBand + j, dims).toIndexedSeq.map(lit): _*)
        when(dot(col("v_vec"), w) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)

    val banded = base.select(col("v_id"),
      posexplode(array((0 until bands).map(bandKey): _*)).as(Seq("band", "band_key")))

    val candidates = banded.select(col("band"), col("band_key"), col("v_id").as("a_id"))
      .join(banded.select(col("band"), col("band_key"), col("v_id").as("b_id")),
        Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    val a = base.select(col("v_id").as("a_id"), col("v_vec").as("a_vec"), col("v_norm").as("a_norm"))
    val b = base.select(col("v_id").as("b_id"), col("v_vec").as("b_vec"), col("v_norm").as("b_norm"))
    candidates
      .repartition(n, col("a_id")) // keep verify math parallel
      .join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("cos", pairCos(col("a_vec"), col("b_vec"), col("a_norm"), col("b_norm")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /** IVF-flat probe with nprobe > 1: each query scans its `nprobe` nearest
    * centroids' buckets instead of only its own — the standard IVF recall
    * dial (a query near a Voronoi boundary finds neighbors that fell just
    * across it). Corpus buckets stay nearest-1 (disjoint), so probing N
    * buckets never produces duplicate (query, neighbor) pairs and needs no
    * dedup. Cost: nprobe × the per-bucket scan; the probe-ranking window
    * runs only over |queries| × |centroids| rows (queries are the small
    * side by contract — the corpus assignment stays the map-side-combined
    * max_by). `nprobe = 1` reduces exactly to [[ivfTopK]].
    */
  def ivfTopKProbe(corpus: DataFrame, centroids: DataFrame, queryIds: DataFrame,
                   k: Int, nprobe: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // cache(): the assignment table feeds both the probe and corpus sides
    val assigned = assignBuckets(corpus, centroids, idCol, vecCol).cache()
    val qvecs = assigned.join(queryIds.select(col(idCol).as("vec_id")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
    val cent = normed(centroids, idCol, vecCol, "cent")
      .withColumnRenamed("cent_id", "centroid_id")
    val pw = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("centroid_id"))
    val probes = qvecs.join(broadcast(cent))
      .withColumn("ccos",
        pairCos(col("q_vec"), col("cent_vec"), col("q_norm"), col("cent_norm")))
      .withColumn("crank", row_number().over(pw))
      .filter(col("crank") <= nprobe)
      .select(col("q_id"), col("centroid_id").as("bucket"), col("q_vec"), col("q_norm"))
    val bucketed = assigned
      .select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("vec").as("c_vec"), col("norm").as("c_norm"))
    val scored = probes.join(bucketed, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "cos", "rank")
  }

  /** IVF probe against a PREBUILT [[assignBuckets]] artifact — the shape a
    * 100 TB deployment runs: the corpus assignment (vec_id, bucket, vec,
    * norm) is built once per corpus snapshot (one broadcast-centroid
    * pass), persisted partitioned by bucket, and probed by EXTERNAL query
    * vectors (rows of (`idCol`, `vecCol`) — need not be indexed
    * themselves). Each query routes to its `nprobe` nearest centroids
    * (one |queries|×K broadcast pass) and scans only those buckets'
    * index rows; the probe side is small by contract, so the bucket join
    * never shuffles the index. Same rounding/tie rules as [[ivfTopKProbe]].
    */
  def ivfTopKIndexed(index: DataFrame, centroids: DataFrame, queries: DataFrame,
                     k: Int, nprobe: Int = 1,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeSelf: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val qvecs = normed(queries, idCol, vecCol, "q")
    val cent = normed(centroids, idCol, vecCol, "cent")
      .withColumnRenamed("cent_id", "centroid_id")
    val pw = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("centroid_id"))
    val probes = qvecs.join(broadcast(cent))
      .withColumn("ccos",
        pairCos(col("q_vec"), col("cent_vec"), col("q_norm"), col("cent_norm")))
      .withColumn("crank", row_number().over(pw))
      .filter(col("crank") <= nprobe)
      .select(col("q_id"), col("centroid_id").as("bucket"), col("q_vec"), col("q_norm"))
    // excludeSelf assumes queries and index rows share ONE id space (the
    // probe-with-indexed-vectors shape). Turn it OFF when they don't — a
    // chunk-keyed index probed by document-id queries would otherwise
    // silently drop the passage whose chunk key happens to equal a q_id
    val scored0 = probes
      .join(index.select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("vec").as("c_vec"), col("norm").as("c_norm")), Seq("bucket"))
    val scored = (if (excludeSelf) scored0.filter(col("q_id") =!= col("neighbor_id"))
                  else scored0)
      .withColumn("cos", pairCos(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "cos", "rank")
  }

  /** IVF-flat probe: top-k within the query's own bucket (nprobe = 1).
    * Approximate by construction — the recall/cost trade-off is the bucket
    * count; exactness is what `bruteForceTopK` is for.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queryIds: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // cache(): the assignment table feeds both the query and corpus sides
    val assigned = assignBuckets(corpus, centroids, idCol, vecCol).cache()
    val queries = assigned.join(queryIds.select(col(idCol).as("vec_id")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("bucket"),
        col("vec").as("q_vec"), col("norm").as("q_norm"))
    val bucketed = assigned
      .select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("vec").as("c_vec"), col("norm").as("c_norm"))
    val scored = queries.join(bucketed, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "cos", "rank")
  }

  /** Full Lloyd's loop for the IVF index build ([[assignBuckets]] is one
    * step of it): alternate nearest-centroid assignment (rounded cosine,
    * id tie-breaks — deterministic) and per-bucket elementwise means until
    * no centroid moves more than `tol` in L2, or `maxIters`. Means are
    * rounded to 6 dp so the fixpoint itself is engine-reproducible, and a
    * bucket that loses all members keeps its previous centroid (the
    * standard empty-cluster rule that preserves K).
    *
    * Scale shape per iteration: one broadcast-assignment pass over the
    * corpus (narrow), one (bucket, dim)-keyed mean shuffle bounded by
    * K·dims groups, and a K-row movement aggregate — no all-pairs, no
    * driver-side data. Each round ends in an eager `localCheckpoint` (the
    * iterative-lineage fence, as in NearDup.clusterPairs) with the
    * superseded round unpersisted.
    *
    * Returns (centroid_id, embedding ARRAY<DOUBLE>, iters, moved) — the
    * trained centroids plus the stopping diagnostics on every row.
    */
  def kmeansIterate(corpus: DataFrame, initial: DataFrame, maxIters: Int = 20,
                    tol: Double = 1e-4, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    // `ckpt` is always THE checkpointed artifact of the newest round — the
    // handle unpersisted once the following round's checkpoint has
    // materialized (the lifecycle the round-5 advisory asked of the BPE
    // trainer); `cents` is a narrow projection over it.
    var ckpt = initial
      .select(col(idCol).cast(LongType).as("centroid_id"),
        asDouble(col(vecCol)).as("cvec"))
      .localCheckpoint(true)
    var cents = ckpt
    var iters = 0
    var moved = Double.MaxValue
    while (iters < maxIters && moved > tol) {
      val assigned = assignBuckets(corpus,
        cents.select(col("centroid_id").as(idCol), col("cvec").as(vecCol)),
        idCol, vecCol)
      val means = assigned
        .select(col("bucket").as("centroid_id"),
          posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(round(avg("x"), 6).as("mx"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mx")))),
          s => s.getField("mx")).as("mvec"))
      val next = cents
        .join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("mvec"), col("cvec")).as("cvec"),
          col("cvec").as("_old"))
        .localCheckpoint(true) // eager: materialized before the old round frees
      val diff = zip_with(col("cvec"), col("_old"), (a, b) => a - b)
      moved = next.agg(max(sqrt(dot(diff, diff)))).collect()(0).getDouble(0)
      ckpt.unpersist()
      ckpt = next
      cents = next.select("centroid_id", "cvec")
      iters += 1
    }
    cents
      .withColumn("iters", lit(iters))
      .withColumn("moved", lit(moved))
      .withColumnRenamed("cvec", vecCol)
  }

  /** Hard-negative mining for contrastive training: per query, the k most
    * SIMILAR vectors carrying a DIFFERENT label — the negatives that
    * actually teach a metric model (random negatives are trivially far).
    * The label-mismatch predicate rides the similarity join BEFORE
    * ranking, so every returned row is a usable negative and rank k is
    * dense. Exact form over the brute-force join (the labeled baseline,
    * like [[bruteForceTopK]]); at corpus scale the same predicate rides
    * [[ivfTopK]]'s bucket join unchanged.
    * Output: q_id, q_label, neighbor_id, n_label (≠ q_label), cos, rank.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val n = queries.sparkSession.sessionState.conf.numShufflePartitions
    val q = normed(queries, idCol, vecCol, "q").repartition(n, col("q_id"))
      .join(queries.select(col(idCol).as("q_id"), col(labelCol).as("q_label")),
        Seq("q_id"))
    val c = normed(corpus, idCol, vecCol, "c")
      .withColumnRenamed("c_id", "neighbor_id")
      .join(corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("n_label")),
        Seq("neighbor_id"))
    val scored = q.join(c,
      col("q_id") =!= col("neighbor_id") && col("q_label") =!= col("n_label"))
      .withColumn("cos", pairCos(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "q_label", "neighbor_id", "n_label", "cos", "rank")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * by k-means clustering + within-cluster cosine pruning. Every vector is
    * assigned to its nearest centroid ([[assignBuckets]] — one broadcast
    * pass); within each cluster a vector is a duplicate iff some
    * SMALLER-ID cluster member sits at cosine ≥ `threshold`. The keep-rule
    * (smallest id survives) is the paper's "keep one representative per
    * semantic group" made deterministic and engine-reproducible.
    *
    * Scale shape: the pair work is quadratic only WITHIN a cluster — the
    * centroid count is the selectivity dial (the paper runs ~100k clusters
    * at LAION scale; size K so the expected bucket is 100s-1000s of
    * vectors, and train it with [[kmeansIterate]]). One shuffle on the
    * bucket key for the self-join; centroids ride broadcast. Never
    * all-pairs: a 100 TB corpus meets itself only inside buckets.
    *
    * Output: one row per input vector — (vec_id, bucket, is_dup,
    * dup_of, cos): `dup_of` = the smallest qualifying smaller-id member
    * (NULL when the vector survives), `cos` = its rounded cosine.
    */
  def semDedup(corpus: DataFrame, centroids: DataFrame, threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = corpus.sparkSession.sessionState.conf.numShufflePartitions
    // cache(): the assignment feeds both self-join sides; the fence keeps
    // the broadcast assignment pass single-evaluation (see cosineLshDedup).
    val assigned = assignBuckets(corpus, centroids, idCol, vecCol)
      .repartition(n, col("bucket"))
      .cache()
    val a = assigned.select(col("bucket"), col("vec_id").as("a_id"),
      col("vec").as("a_vec"), col("norm").as("a_norm"))
    val b = assigned.select(col("bucket"), col("vec_id").as("b_id"),
      col("vec").as("b_vec"), col("norm").as("b_norm"))
    val dups = a.join(b, Seq("bucket"))
      .filter(col("b_id") < col("a_id"))
      .withColumn("pcos", pairCos(col("a_vec"), col("b_vec"), col("a_norm"), col("b_norm")))
      .filter(col("pcos") >= threshold)
      .groupBy(col("a_id").as("vec_id"))
      .agg(min(col("b_id")).as("dup_of"), min_by(col("pcos"), col("b_id")).as("cos"))
    assigned.select(col("vec_id"), col("bucket"))
      .join(dups, Seq("vec_id"), "left")
      .withColumn("is_dup", col("dup_of").isNotNull)
      .select("vec_id", "bucket", "is_dup", "dup_of", "cos")
  }
}
