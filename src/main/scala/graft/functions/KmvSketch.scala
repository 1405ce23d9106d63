package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch: the k smallest DISTINCT
  * hash values seen, as a sorted ascending ARRAY<LONG>.
  *
  * This is the sketch family's scale contract made native: the aggregation
  * buffer is a bounded sorted set of at most k longs — O(k) state per
  * group regardless of input size — updated map-side and merged
  * associatively across partials (partial KMV union = take the k smallest
  * of the union), so a distinct-count over 100 TB shuffles k longs per
  * group instead of the group's distinct values. Unlike HLL++
  * (`approx_count_distinct`), the result is a pure function of the input
  * SET: deterministic, engine-reproducible (feed it
  * [[graft.scale.Hashing.md5Long60]] hashes and DuckDB computes the
  * identical sketch with a `row_number() <= k` window), and mergeable
  * across batches/streams by re-aggregating sketch elements.
  *
  * The estimator (see [[graft.scale.Sketches.kmvEstimate]]) is the
  * standard (k-1)·M / h_k with M = 2^60 the hash-space size; when fewer
  * than k distinct hashes exist the sketch IS the distinct set and the
  * count is exact.
  *
  * Input must already be a hash value (LongType) — hashing stays outside
  * in Catalyst's codegen'd pipeline, same split as [[SimHashVote]], so the
  * engine-reproducible hash scheme is defined in exactly one place. NULL
  * inputs are skipped; no inputs → empty array (exact count 0).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"kmv k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv requires a LONG hash input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      // TreeSet.add dedups, so only shed the max when v actually entered
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending — already sorted
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvSketch {
  /** Column API: KMV sketch aggregate over a LONG hash column. */
  def kmv(hash: Column, k: Int): Column =
    ColumnBridge.column(KmvAgg(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** SQL registration — `SELECT grp, kmv(hv, 64) FROM t GROUP BY grp` in
    * `spark.sql`. k must be a literal; the analyzer wraps the returned
    * AggregateFunction itself.
    */
  val register: org.apache.spark.sql.SparkSessionExtensions => Unit = { ext =>
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("kmv"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[KmvAgg].getName, "kmv"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"kmv(hash BIGINT, k INT) takes 2 arguments, got ${children.size}")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"kmv k must be an integer literal, got ${other.sql}")
        }
        KmvAgg(children.head, k)
      }))
  }
}
