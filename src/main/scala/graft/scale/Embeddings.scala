package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.vecDot

/** Embedding-column preparation for training/retrieval pipelines: L2
  * normalization (so cosine becomes a plain dot product downstream) and
  * symmetric int8 quantization (4× storage/bandwidth cut for ANN shards).
  *
  * Both are narrow per-row projections — no shuffle, the 100 TB plan is the
  * same plan. Norms and scales are STAGED as their own projected columns
  * before the per-element lambdas consume them: higher-order functions are
  * interpreted and inline captured expressions into the lambda body, so an
  * unstaged norm would be recomputed once per ELEMENT (dims× per row — see
  * the lambda-inlining notes in NearDup).
  */
object Embeddings {

  /** L2 norm via the codegen'd dot product ([[graft.functions.VecDot]]):
    * sequential fold in element order, so an external system (or the DuckDB
    * oracle) reproduces it bit-for-bit.
    */
  def l2Norm(df: DataFrame, vecCol: String, out: String = "norm"): DataFrame =
    df.withColumn(out, sqrt(vecDot(col(vecCol), col(vecCol))))

  /** Unit-normalized copy of `vecCol` (elements cast to double). The
    * all-zero vector has no direction — its normalized form stays all-zero
    * rather than NaN. Keeps the norm column (`normOut`) alongside.
    */
  def withL2Normalized(df: DataFrame, vecCol: String, out: String = "unit",
                       normOut: String = "norm"): DataFrame =
    l2Norm(df, vecCol, normOut)
      .withColumn(out,
        when(col(normOut) > 0,
          transform(col(vecCol).cast(ArrayType(DoubleType)), x => x / col(normOut)))
          .otherwise(col(vecCol).cast(ArrayType(DoubleType))))

  /** Symmetric per-vector int8 quantization: q_i = round-half-up of
    * x_i · 127 / max|x|, reconstructed as q_i · scale with
    * scale = max|x| / 127. Spelled `floor(v + 0.5)` because round-half-up
    * over doubles is the same primitive in every engine, while native
    * `round` functions disagree on halves (banker's vs away-from-zero).
    * The all-zero vector quantizes to zeros with scale 0.
    */
  def withInt8Quantized(df: DataFrame, vecCol: String, qOut: String = "q",
                        scaleOut: String = "scale"): DataFrame = {
    val maxAbs = "_maxabs"
    df.withColumn(maxAbs,
        array_max(transform(col(vecCol).cast(ArrayType(DoubleType)), x => abs(x))))
      .withColumn(qOut,
        when(col(maxAbs) > 0,
          transform(col(vecCol).cast(ArrayType(DoubleType)),
            x => floor(x * lit(127.0) / col(maxAbs) + lit(0.5)).cast(IntegerType)))
          .otherwise(transform(col(vecCol).cast(ArrayType(DoubleType)),
            _ => lit(0))))
      .withColumn(scaleOut, col(maxAbs) / lit(127.0))
      .drop(maxAbs)
  }

  // --------------------------------------------------------------------
  // Product quantization (Jégou et al., "Product Quantization for Nearest
  // Neighbor Search", TPAMI 2011): split each vector into M subvectors,
  // quantize each against its own K-codeword codebook → M small codes per
  // vector (64 dims → 4 bytes at M=4/K≤256, a 64× cut vs float32), with
  // reconstruction error = sum of per-subspace quantization errors.
  // Scale shape: the codebook is M·K rows — broadcast; encoding is one
  // narrow pass over the corpus (M·K distance evaluations per row, no
  // shuffle beyond the final per-vector regroup).
  // --------------------------------------------------------------------

  /** Codebook from a deterministic seed set: seed vectors' m-th subvector
    * becomes subspace m's codeword, with code_id = the seed's rank by id
    * (0-based) — the sampled-codebook initialization; refine with
    * per-subspace Lloyd steps ([[Similarity.assignBuckets]]-style) when
    * quantization error matters more than determinism.
    * Output: (m, code_id, sub: ARRAY<DOUBLE>). The unpartitioned rank
    * window is safe by construction: the seed set IS the codebook
    * (K ≤ 256 rows), never the corpus.
    */
  def pqCodebookFromSeeds(seeds: DataFrame, mSubspaces: Int, idCol: String,
                          vecCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    val dims = org.apache.spark.sql.functions.size(col(vecCol))
    seeds
      .withColumn("code_id",
        checkedCodeId(row_number().over(w) - 1))
      .select(col("code_id"), col(vecCol).cast(ArrayType(DoubleType)).as("_v"),
        checkedSubdim(dims, mSubspaces).as("_sd"))
      .select(col("code_id"), col("_v"), col("_sd"),
        explode(sequence(lit(0), lit(mSubspaces - 1))).as("m"))
      .select(col("m"), col("code_id"),
        slice(col("_v"), col("m") * col("_sd") + 1, col("_sd")).as("sub"))
  }

  /** Subvector width with the divisibility guard: a vector length that is
    * not a multiple of M would silently drop the trailing `dims mod M`
    * dimensions from encoding and ADC search, so it raises instead.
    * Checked per row because the column can mix lengths.
    */
  private def checkedSubdim(dims: Column, mSubspaces: Int): Column =
    when(dims % mSubspaces === 0, (dims / mSubspaces).cast(IntegerType))
      .otherwise(raise_error(concat(
        lit("pq: vector length "), dims.cast(StringType),
        lit(s" is not divisible by mSubspaces=$mSubspaces"))))

  /** PQ codes are byte-sized by contract (the 64× storage story): more
    * than 256 seed rows would overflow the documented K<=256 codebook, so
    * the rank expression raises past it.
    */
  private def checkedCodeId(codeId: Column): Column =
    when(codeId < 256, codeId)
      .otherwise(raise_error(
        lit("pq: more than 256 seed rows; codebook is capped at K=256")))

  /** Train the per-subspace codebooks with Lloyd's — the real IVFADC build
    * step (Jégou et al. §III train k-means PER SUBSPACE; sampled codebooks
    * are only the initialization). All M subspaces train in ONE loop: the
    * state is the (m, code_id, sub) table itself, assignment is one
    * broadcast join of every subvector against its subspace's codewords,
    * and new codewords are per-(m, code_id, dim) means — so an iteration
    * costs one narrow corpus pass plus an M·K·subdim-bounded shuffle
    * regardless of M. Deterministic like [[Similarity.kmeansIterate]]
    * (rounded means, id tie-breaks, empty codes keep their codeword), with
    * the same eager-checkpoint-per-round lineage fence and unpersist
    * lifecycle. Output schema = [[pqCodebookFromSeeds]] (drop-in for
    * [[pqEncode]]/[[pqTopK]]/[[ivfPqTopK]]).
    */
  def pqCodebookTrained(corpus: DataFrame, seeds: DataFrame, mSubspaces: Int,
                        maxIters: Int = 10, tol: Double = 1e-4,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    var ckpt = pqCodebookFromSeeds(seeds, mSubspaces, idCol, vecCol)
      .localCheckpoint(true)
    var cb = ckpt
    // the corpus subvector table feeds every iteration: cache it once
    val subs = subvectors(corpus, mSubspaces, idCol, vecCol).cache()
    var iters = 0
    var moved = Double.MaxValue
    while (iters < maxIters && moved > tol) {
      // narrow hash-agg (packed arg-min, no vsub in the buffer — a
      // first(array) buffer is a second SortAggregate trigger); the
      // subvector rejoins from the CACHED subs table on (id, m)
      val assigned = subs.join(broadcast(cb), Seq("m"))
        .withColumn("_d", subDist(col("vsub"), col("sub")))
        .groupBy(col(idCol), col("m"))
        .agg(min_by(col("code_id"), packedDistCode(col("_d"), col("code_id"))).as("code"))
        // SHUFFLE_HASH, build = the narrow code side: corpus-sized, so it
        // must never broadcast (the assignBucketsScored rule), and the
        // hash join streams the cached subvectors without sorting them
        .hint("shuffle_hash")
        .join(subs, Seq(idCol, "m"))
      val means = assigned
        .select(col("m"), col("code").as("code_id"),
          posexplode(col("vsub")).as(Seq("dim", "x")))
        .groupBy("m", "code_id", "dim")
        .agg(round(avg("x"), 6).as("mx"))
        .groupBy("m", "code_id")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mx")))),
          s => s.getField("mx")).as("msub"))
      val next = cb
        .join(means, Seq("m", "code_id"), "left")
        .select(col("m"), col("code_id"),
          coalesce(col("msub"), col("sub")).as("sub"),
          col("sub").as("_old"))
        .localCheckpoint(true)
      val diff = zip_with(col("sub"), col("_old"), (a, b) => a - b)
      moved = next
        .agg(max(sqrt(vecDot(diff, diff)))).collect()(0).getDouble(0)
      ckpt.unpersist()
      ckpt = next
      cb = next.select("m", "code_id", "sub")
      iters += 1
    }
    subs.unpersist()
    cb
  }

  /** (idCol, m, vsub): every vector sliced into its M subvectors. */
  private def subvectors(df: DataFrame, mSubspaces: Int, idCol: String,
                         vecCol: String): DataFrame = {
    val dims = org.apache.spark.sql.functions.size(col(vecCol))
    df.select(col(idCol), col(vecCol).cast(ArrayType(DoubleType)).as("_v"),
        checkedSubdim(dims, mSubspaces).as("_sd"))
      .select(col(idCol), col("_v"), col("_sd"),
        explode(sequence(lit(0), lit(mSubspaces - 1))).as("m"))
      .select(col(idCol), col("m"),
        slice(col("_v"), col("m") * col("_sd") + 1, col("_sd")).as("vsub"))
  }

  /** Rounded L2² between a subvector and a codeword (the fold the DuckDB
    * oracle mirrors with list ops).
    */
  private def subDist(vsub: Column, sub: Column): Column =
    round(aggregate(
      zip_with(vsub, sub, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v), 6)

  /** The lexicographic (dist, code_id) arg-min order packed into ONE
    * Decimal(38,0): `min_by(code, struct(dist, code))` keeps a struct in
    * its aggregation buffer, which is not UnsafeRow-mutable, so every PQ
    * assignment pass fell back to Sort + SortAggregate over the corpus×K
    * expansion. dist is 6dp-rounded and non-negative, so dist·1e6 is an
    * exact integer; code_id < 256 by the codebook contract — the packing
    * is order-isomorphic and the buffer becomes a mutable decimal, so the
    * pass is one HashAggregate with no sort (the assignBucketsScored
    * rule).
    */
  private def packedDistCode(dist: Column, codeId: Column): Column =
    // NaN/∞ distances (garbage input elements) ranked ABOVE every real
    // value in the old struct order; they saturate at 1e26 here — above
    // any representable embedding's L2² — instead of killing the batch on
    // an ANSI NaN→decimal cast. Distances at or past 1e26 tie (argmin then
    // breaks by code_id); finite real-world distances are orders of
    // magnitude below. DIVERGENCE from the pre-r13 struct order on that
    // degenerate class ONLY: the struct order still distinguished finite
    // distances ≥ 1e26 by value and ranked NaN above +∞, so when EVERY
    // codeword distance is degenerate the elected code can differ from
    // pre-r13 behavior (then: argmin among the garbage; now: smallest
    // code_id). No representable real embedding reaches the class, and
    // pre-r13 such rows threw under ANSI instead of encoding at all.
    (least(nanvl(dist, lit(Double.PositiveInfinity)), lit(1e26)) * 1e6)
      .cast(DecimalType(33, 0)) * 256 + codeId

  /** Encode every vector: per subspace the code with the minimum rounded
    * L2² distance (ties → smallest code_id). Output: idCol, codes
    * (ARRAY<INT> in subspace order), err (DECIMAL-exact sum of the M
    * rounded per-subspace distances — aggregation-order independent, so
    * engine-reproducible like the LangModel NLL sum).
    */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, mSubspaces: Int,
               idCol: String, vecCol: String): DataFrame = {
    val subs = subvectors(corpus, mSubspaces, idCol, vecCol)
    subs.join(broadcast(codebook), Seq("m"))
      .withColumn("_dist", subDist(col("vsub"), col("sub")))
      .groupBy(col(idCol), col("m"))
      .agg(min_by(col("code_id"), packedDistCode(col("_dist"), col("code_id"))).as("code"),
        min(col("_dist")).as("dist"))
      .groupBy(idCol)
      .agg(
        transform(array_sort(collect_list(struct(col("m"), col("code")))),
          s => s.getField("code")).as("codes"),
        round(sum(col("dist").cast(DecimalType(18, 6))).cast(DoubleType), 6)
          .as("err"))
  }

  /** PQ search by asymmetric distance computation (ADC): queries stay
    * exact, the corpus is its codes. Per query a distance TABLE (M·K
    * rounded subspace distances) is computed once against the codebook;
    * scanning the corpus is then M table lookups + an exact DECIMAL sum
    * per vector — no vector arithmetic touches the corpus at all, which
    * is the point of PQ at 100 TB: the scan reads M small ints per row
    * and the Q·M·K table rides a broadcast.
    *
    * Input `codes` = [[pqEncode]] output; `queries` = (idCol, vecCol)
    * rows. Self-matches (same id) are excluded before ranking. Output:
    * q_id, neighbor_id, adist (approximate L2², smaller = closer), rank.
    */
  def pqTopK(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
             k: Int, mSubspaces: Int, idCol: String, vecCol: String): DataFrame = {
    val dtab = subvectors(queries, mSubspaces, idCol, vecCol)
      .withColumnRenamed(idCol, "q_id")
      .join(broadcast(codebook), Seq("m"))
      .select(col("q_id"), col("m"), col("code_id"),
        subDist(col("vsub"), col("sub")).as("d"))
    val cx = codes.select(col(idCol).as("neighbor_id"),
      posexplode(col("codes")).as(Seq("m", "code")))
    val scored = cx
      .join(broadcast(dtab), cx("m") === dtab("m") && cx("code") === dtab("code_id"))
      .groupBy("q_id", "neighbor_id")
      .agg(round(sum(col("d").cast(DecimalType(18, 6))).cast(DoubleType), 6)
        .as("adist"))
      .filter(col("q_id") =!= col("neighbor_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "adist", "rank")
  }

  /** IVF + PQ — the composition a 100 TB ANN index actually runs (the
    * "IVFADC" layout of Jégou et al. §IV): the IVF stage prunes the SEARCH
    * SPACE (each query visits only its `nprobe` nearest centroids' bucket
    * lists), and PQ prunes the BYTES (within a visited bucket, candidates
    * are scored by ADC table lookups over M small codes — no float vector
    * is ever read for the corpus). Both dials compose: cost per query ≈
    * (nprobe/|centroids|) · |C| rows × M lookups.
    *
    * Queries are taken EXACT from the corpus by id ([[Similarity.ivfTopK]]'s
    * convention); distance tables (Q·M·K rows) and the centroid set ride
    * broadcasts; the bucket probe is an equi-join on bucket id. Output:
    * q_id, neighbor_id, adist (approximate L2², smaller = closer), rank.
    */
  def ivfPqTopK(corpus: DataFrame, centroids: DataFrame, codebook: DataFrame,
                queryIds: DataFrame, k: Int, nprobe: Int, mSubspaces: Int,
                idCol: String, vecCol: String): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // cache(): feeds the probe side and the bucket lists
    val assigned = Similarity.assignBuckets(corpus, centroids, idCol, vecCol).cache()

    // query → nprobe nearest centroids (rounded cosine, id tie-break)
    val qvecs = assigned.join(queryIds.select(col(idCol).as("vec_id")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
    val cent = centroids.select(col(idCol).as("centroid_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("cent_vec"))
      .withColumn("cent_norm", sqrt(vecDot(col("cent_vec"), col("cent_vec"))))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("ccos").desc, col("centroid_id"))
    val probes = qvecs.join(broadcast(cent))
      // zero-norm guard (ANSI throws DIVIDE_BY_ZERO): THE pairCos rule —
      // an undefined routing cosine sorts below range, all-ties win by id
      .withColumn("ccos", Similarity.pairCos(col("q_vec"), col("cent_vec"),
        col("q_norm"), col("cent_norm")))
      .withColumn("crank", row_number().over(pw))
      .filter(col("crank") <= nprobe)
      .select(col("q_id"), col("centroid_id").as("bucket"))

    // ADC: per-query distance table (exact query subvectors vs codebook)
    val queries = corpus.join(queryIds.select(col(idCol)), Seq(idCol))
    val dtab = subvectors(queries, mSubspaces, idCol, vecCol)
      .withColumnRenamed(idCol, "q_id")
      .join(broadcast(codebook), Seq("m"))
      .select(col("q_id"), col("m"), col("code_id"),
        subDist(col("vsub"), col("sub")).as("d"))

    // bucket lists carry CODES, not vectors
    val codes = pqEncode(corpus, codebook, mSubspaces, idCol, vecCol)
    val bucketCodes = codes
      .join(assigned.select(col("vec_id").as(idCol), col("bucket")), Seq(idCol))
      .select(col(idCol).as("neighbor_id"), col("bucket"), col("codes"))

    val scored = probes.join(bucketCodes, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(dtab.withColumnRenamed("code_id", "code")),
        Seq("q_id", "m", "code"))
      .groupBy("q_id", "neighbor_id")
      .agg(round(sum(col("d").cast(DecimalType(18, 6))).cast(DoubleType), 6)
        .as("adist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "adist", "rank")
  }
}
