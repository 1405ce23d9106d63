package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** THE portable hash of this repo: an md5-derived 60-bit non-negative long.
  * Any engine reproduces it bit-for-bit — DuckDB:
  * `('0x' || substr(md5(x), 1, 15))::BIGINT` — which is what makes SimHash
  * signatures, winnowing fingerprints, and hash-split assignments
  * oracle-checkable and portable across systems. One definition so the
  * scheme can never drift between its users.
  */
object Hashing {
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
}
