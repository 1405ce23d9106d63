package graft.scale

import org.apache.spark.sql.DataFrame
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
}
