package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the first pass of
  * any web-text cleaning pipeline (crawled text mixes precomposed and
  * combining-mark encodings of the same glyphs; un-normalized corpora
  * split token statistics, dedup fingerprints, and shingle hashes across
  * byte-distinct spellings of identical text).
  *
  * Spark has no built-in for this; rather than a UDF (opaque to codegen,
  * Row boxing) it is a [[StaticInvoke]] of [[TextNormalize.nfc]] — the
  * same mechanism Spark's own JDK-backed string functions use, staying
  * inside whole-stage codegen with null handling generated around the
  * call. NFC output is defined by the Unicode standard, so any conforming
  * engine reproduces it byte-for-byte — the DuckDB oracle's
  * `nfc_normalize` (utf8proc) must equal the JDK [[Normalizer]] here,
  * which is exactly what `q_nfc_normalize` hash-checks.
  */
object TextNormalize {

  /** JDK NFC; null in → null out (StaticInvoke also short-circuits via
    * propagateNull, this keeps the method total for direct callers).
    */
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  private def expr(child: Expression): Expression =
    StaticInvoke(
      TextNormalize.getClass,
      StringType,
      "nfc",
      Seq(Cast(child, StringType)),
      propagateNull = true,
      returnNullable = true)

  /** Column API: NFC-normalize a string column. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(expr(ColumnBridge.expression(c)))

  /** SQL registration — `SELECT nfc_normalize(text) FROM t`. */
  val register: SparkSessionExtensions => Unit = { ext =>
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(TextNormalize.getClass.getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"nfc_normalize(str) takes 1 argument, got ${children.size}")
        expr(children.head)
      }))
  }
}
