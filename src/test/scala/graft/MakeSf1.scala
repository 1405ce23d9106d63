package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Synthesize an sf1-scale dataset (10× sf0.1) for the scaling spot-bench:
  * `sbt "Test/runMain graft.MakeSf1 [srcDir] [outDir]"`.
  *
  * Each table is 10 key-shifted replicas of sf0.1, transformed so the
  * WORKLOAD SHAPE scales linearly instead of degenerately:
  *  - documents: every word is prefixed with the replica tag (replica 0
  *    stays verbatim), so vocabularies are disjoint across replicas —
  *    near-dup/shingle structure within a replica is identical to sf0.1
  *    and NO cross-replica candidate pairs appear (a naive text copy would
  *    make every doc a 10-way exact duplicate and grow pair counts
  *    quadratically, measuring a different problem);
  *  - embeddings: vectors are circularly rotated by the replica index —
  *    norms and within-replica pairwise geometry are preserved;
  *  - orders/lineitem/events: plain key shifts (tx ids derive from order
  *    keys, so the transaction count scales with the data).
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("make-sf1")
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/sf1")
    val reps = 10

    def replicate(name: String, f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val scaled = (0 until reps).map(i => f(base, i)).reduce(_ unionByName _)
      scaled.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"MAKESF1 $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val keyShift = 100000000L
    replicate("orders", (df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * keyShift))
      .withColumn("o_custkey", col("o_custkey") + lit(i * keyShift)))
    replicate("lineitem", (df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * keyShift))
      .withColumn("l_partkey", col("l_partkey") + lit(i * keyShift))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * keyShift)))
    replicate("documents", (df, i) => {
      val txt = if (i == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(lit(s"r$i"), w)), " ")
      df.withColumn("doc_id", col("doc_id") + lit(i * keyShift))
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt))
    })
    replicate("embeddings", (df, i) => df
      .withColumn("vec_id", col("vec_id") + lit(i * keyShift))
      .withColumn("embedding",
        concat(slice(col("embedding"), i + 1, 64 - i),
          slice(col("embedding"), 1, i))))
    replicate("events", (df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * keyShift))
      .withColumn("user_id", col("user_id") + lit(i * keyShift)))
    // dimension tables stay single-copy (they are dimensions)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    spark.stop()
  }
}
