package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over a shingle array: `numHashes` minima in ONE
  * pass over the elements.
  *
  * The declarative form — one `array_min(transform(sh, s => hash(i, s)))`
  * per hash function — is the hot loop of the MinHash-LSH dedup and is
  * interpreted (higher-order functions don't codegen): 96 signature slots
  * mean 96 traversals of every document's shingle array, each boxing
  * through lambda-variable holders. This expression hashes each element
  * once (XXH64 over the UTF8 bytes) and derives the hash family by a
  * splitmix64 finalizer over (base ⊕ slot-constant) — the standard
  * one-strong-hash + universal-family construction — updating all minima
  * in a single traversal.
  *
  * The hash family differs from the HOF form's murmur3 ON PURPOSE: MinHash
  * signatures are internal candidate-generation state (banding keys), and
  * every consumer verifies candidates with exact Jaccard, so outputs are
  * hash-agnostic; only recall depends on the family, and both families are
  * uniform 64-bit.
  *
  * NULL array → NULL; empty array → NULL (no minima exist — callers
  * exclude shingle-less docs anyway); null ELEMENTS are skipped.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 4096, s"numHashes out of range: $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input has no minima
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val base = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < numHashes) {
          var v = base ^ (0x9E3779B97F4A7C15L * (j + 1))
          v = (v ^ (v >>> 30)) * 0xBF58476D1CE4E5B9L
          v = (v ^ (v >>> 27)) * 0x94D049BB133111EBL
          v ^= v >>> 31
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val el = ctx.freshName("el")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $any = true;
         |    long $base = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = $base ^ (0x9E3779B97F4A7C15L * ($j + 1));
         |      $v = ($v ^ ($v >>> 30)) * 0xBF58476D1CE4E5B9L;
         |      $v = ($v ^ ($v >>> 27)) * 0x94D049BB133111EBL;
         |      $v ^= $v >>> 31;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash majority vote over pre-computed 60-bit element hashes: bit j of
  * the output is set when more than half the elements have bit j set. The
  * hashes stay in Catalyst's codegen'd md5/conv pipeline (they must remain
  * engine-reproducible — [[graft.scale.Hashing.md5Long60]]); this expression
  * only replaces the interpreted vote — an `aggregate` whose accumulator
  * `zip_with`s a 60-slot count array PER ELEMENT — with one fused loop.
  * Value-identical to the HOF formulation: same hashes, same majority rule,
  * empty input → 0 (no bit has a majority), NULL input → NULL; null
  * elements are skipped (the upstream transform never produces them).
  */
case class SimHashVote(child: Expression) extends UnaryExpression {

  private val Bits = 60

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_vote requires ARRAY<LONG> input, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_vote"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](Bits)
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        total += 1
        val h = arr.getLong(i)
        var j = 0
        while (j < Bits) {
          counts(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (2 * counts(j) > total) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val counts = ctx.freshName("counts")
      val total = ctx.freshName("total")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[$Bits];
         |int $total = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $total++;
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < $Bits; $j++) {
         |      $counts[$j] += (int) (($h >>> $j) & 1L);
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $Bits; $j++) {
         |  if (2 * $counts[$j] > $total) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashFunctions {
  /** Column API: one-pass MinHash signature (ARRAY<LONG> of length n). */
  def minHashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))

  /** Column API: one-pass SimHash majority vote over 60-bit element hashes. */
  def simHashVote(hashes: Column): Column =
    ColumnBridge.column(SimHashVote(ColumnBridge.expression(hashes)))
}
