package graft

import org.apache.spark.sql.SparkSession

/** Single place where SparkSessions are configured, so table accessors and
  * operators stay pure (no `spark.conf.set` side effects at query time).
  *
  * Local harness sizing: `local[cpus]` with `shuffle.partitions == cpus` —
  * on a real cluster the same code runs with executor-count-scaled shuffle
  * partitions; nothing here hard-codes local mode semantics.
  */
object Sessions {
  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .appName(appName)
      // SQL-surface registration of the native vector expressions
      .withExtensions(graft.functions.VectorFunctions.register)
      // ... and the KMV sketch aggregate: SELECT kmv(hv, 64) ... GROUP BY
      .withExtensions(graft.functions.KmvSketch.register)
      // ... and Unicode NFC: SELECT nfc_normalize(text)
      .withExtensions(graft.functions.TextNormalize.register)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS); see Tables.eventsRaw
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
