package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.scale.Retrieval

/** Streaming maintenance of the BM25 postings index — the retrieval-family
  * analogue of [[StreamingNearDup]]'s online candidate state, with the
  * same LSM lifecycle as [[TxReplayStream]]'s bucket segments: documents
  * arrive as a stream of UPSERTS and DELETES, each micro-batch appends one
  * delta-sized postings segment ([[Retrieval.buildBm25Index]] over just
  * the batch), and when the live segment count reaches a threshold the
  * whole set is compacted into one segment with dead rows (superseded
  * document versions, deleted documents) physically dropped. Per-batch
  * write cost is the batch's own vocabulary; segment count — and with it
  * partition-discovery and per-probe overhead — is bounded by the
  * compaction threshold, not by the stream's lifetime.
  *
  * Update/delete semantics (the reference's upsert-kafka contract —
  * `debezium-kafka-flink-sql-ingest/.../KafkaUpsertJob.java:23-38`:
  * latest value per key wins, tombstone = delete): re-sending a `doc_id`
  * replaces its previous version, an `op = "d"` row removes it. Both are
  * visible to the NEXT probe, not only after compaction: every postings
  * row carries the batch that wrote it, probes resolve
  * latest-version-wins from per-doc batch maxima, and explicit deletes
  * ride a small side table of (doc_id, batch) markers anti-filtered at
  * probe time — the Lucene live-docs pattern. Compaction merely reclaims
  * the space; it never changes an answer (StreamingRetrievalSpec pins
  * probe equality across a compaction boundary).
  *
  * Scale shape: the delete-marker table holds only EXPLICIT deletes and
  * superseded-version resolution touches only documents with >1 live
  * version — both churn-sized, not corpus-sized, and joined without
  * forced broadcasts (AQE decides; the no-data-dependent-broadcast
  * lesson). A probe pays the same two corpus passes as
  * [[Retrieval.bm25TopKIndexed]]: the broadcast-reduced candidate
  * semi-join and the column-pruned (doc_id, dl, batch) stats pass.
  *
  * Exactly-once: segment and delete-marker dirs are named by micro-batch
  * id and written with Overwrite, and the manifest records the last
  * committed batch — a redelivered batch is skipped outright, so a crash
  * between the segment write and the manifest commit replays cleanly
  * (the [[TxReplayStream]] idempotence rule). The manifest itself is a
  * tmp-write + atomic-move; files it no longer references are pruned on
  * the next commit.
  *
  * On-disk layout (underscore names are invisible to parquet discovery,
  * so `spark.read.parquet(indexDir)` keeps working for append-only
  * streams — with updates or deletes, probe through [[bm25TopKLive]]):
  * {{{
  *   indexDir/seg=a<batchId>/   appended postings (token, doc_id, dl, tf, batch)
  *   indexDir/seg=c<batchId>/   compacted postings (same schema)
  *   indexDir/_dels/b<batchId>/ delete markers (doc_id, batch)
  *   indexDir/_manifest         "<lastBatch>\n<live segs>\n<live dels>"
  * }}}
  */
object StreamingRetrieval {

  private[streaming] case class Manifest(lastBatch: Long, segs: Seq[String], dels: Seq[String])

  private def manifestPath(indexDir: String): Path = Paths.get(indexDir, "_manifest")

  private[streaming] def readManifest(indexDir: String): Manifest = {
    val p = manifestPath(indexDir)
    if (!Files.exists(p)) return Manifest(-1L, Nil, Nil)
    val lines = Files.readAllLines(p)
    def names(i: Int): Seq[String] =
      if (lines.size <= i || lines.get(i).isEmpty) Nil
      else lines.get(i).split(",").toSeq
    Manifest(lines.get(0).trim.toLong, names(1), names(2))
  }

  private def writeManifest(indexDir: String, m: Manifest): Unit = {
    val tmp = Paths.get(indexDir, "_manifest.tmp")
    Files.createDirectories(Paths.get(indexDir))
    Files.writeString(tmp, s"${m.lastBatch}\n${m.segs.mkString(",")}\n${m.dels.mkString(",")}")
    Files.move(tmp, manifestPath(indexDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }

  /** Drop dirs the committed manifest no longer references (compacted-away
    * segments, cleared delete markers, leftovers of a crashed attempt).
    */
  private def prune(indexDir: String, m: Manifest): Unit = {
    val keepSegs = m.segs.toSet
    val keepDels = m.dels.toSet
    val base = Paths.get(indexDir)
    val ls = Files.list(base)
    try ls.forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("seg=") && !keepSegs.contains(n)) deleteRecursively(p)
    } finally ls.close()
    val delBase = base.resolve("_dels")
    if (Files.exists(delBase)) {
      val dls = Files.list(delBase)
      try dls.forEach { p =>
        if (!keepDels.contains(p.getFileName.toString)) deleteRecursively(p)
      } finally dls.close()
    }
  }

  private val delSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("batch", LongType)))
  private val segSchema = StructType(Seq(
    StructField("token", StringType), StructField("doc_id", LongType),
    StructField("dl", DoubleType), StructField("tf", LongType),
    StructField("batch", LongType)))

  /** Live postings under the committed manifest, batch column included —
    * schema (token, doc_id, dl, tf, batch). Pass to [[liveRows]] /
    * [[bm25TopKLive]] together with [[readDels]].
    */
  def readSegments(spark: SparkSession, indexDir: String): DataFrame = {
    val m = readManifest(indexDir)
    if (m.segs.isEmpty) spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](), segSchema)
    else spark.read.parquet(m.segs.map(s => s"$indexDir/$s"): _*)
  }

  /** Live delete markers — schema (doc_id, batch). */
  def readDels(spark: SparkSession, indexDir: String): DataFrame = {
    val m = readManifest(indexDir)
    if (m.dels.isEmpty) spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](), delSchema)
    else spark.read.parquet(m.dels.map(d => s"$indexDir/_dels/$d"): _*)
  }

  /** The two liveness predicates, as joins against churn-sized side
    * tables derived from the per-doc version list `versions`
    * ((doc_id, batch), distinct): a row is live iff it belongs to its
    * document's LATEST version (latest-wins upsert) and no delete marker
    * is newer than it (delete-then-reinsert resurrects). No broadcast
    * hints — churn is usually small and AQE broadcasts it, but its size
    * is data-dependent.
    */
  private def liveFilter(rows: DataFrame, versions: DataFrame, dels: DataFrame): DataFrame = {
    val multi = versions.groupBy("doc_id")
      .agg(max("batch").as("live_b"), count(lit(1)).as("nv"))
      .filter(col("nv") > 1).select("doc_id", "live_b")
    val delMax = dels.groupBy("doc_id").agg(max("batch").as("del_b"))
    rows.join(multi, Seq("doc_id"), "left")
      .filter(col("live_b").isNull || col("batch") === col("live_b"))
      .join(delMax, Seq("doc_id"), "left")
      .filter(col("del_b").isNull || col("del_b") <= col("batch"))
      .drop("live_b", "del_b")
  }

  /** Resolve segment rows to the live document set: one postings row per
    * (latest-version doc, token), batch column retained. This is the
    * compaction input/output shape; probes use [[bm25TopKLive]] instead,
    * which reduces by the query tokens BEFORE paying the liveness joins.
    */
  def liveRows(segs: DataFrame, dels: DataFrame): DataFrame =
    liveFilter(segs, segs.select("doc_id", "batch").distinct(), dels)

  /** [[Retrieval.bm25TopKIndexed]] over the live view of an upsert/delete
    * index: same scoring arithmetic and the same linear no-cache plan,
    * with the liveness joins applied AFTER the broadcast token reduction
    * on the candidate side (churn joins ride candidate-sized rows) and on
    * the column-pruned doc-level pass for N/avgdl/df. Equals a batch
    * [[Retrieval.bm25TopK]] over the surviving latest-version corpus
    * (StreamingRetrievalSpec pins it through updates, deletes, and a
    * compaction boundary).
    */
  def bm25TopKLive(segs: DataFrame, dels: DataFrame, queries: DataFrame,
                   qIdCol: String, termCol: String,
                   k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
                   maxDfFrac: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    val qterms = queries
      .select(col(qIdCol).as("q_id"), col(termCol).as("token")).distinct()
    val qtokens = qterms.select("token").distinct()

    // ONE column-pruned doc-level pass feeds versions, stats, and (via
    // liveFilter) df — the indexed probe's stats scan, liveness-aware
    val docLevel = segs.select("doc_id", "dl", "batch").distinct()
    val versions = docLevel.select("doc_id", "batch")
    val liveDocs = liveFilter(docLevel, versions, dels)
    val stats = liveDocs
      .agg(count(lit(1)).cast(DoubleType).as("n_docs"), avg("dl").as("avgdl"))

    // candidate pass: broadcast token reduction FIRST, liveness after —
    // the joins against churn-sized multi/delMax touch only candidates
    val cand1 = liveFilter(segs.join(broadcast(qtokens), Seq("token")), versions, dels)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
    val scored = cand1.crossJoin(broadcast(stats))
      .filter(col("df") <= lit(maxDfFrac) * col("n_docs"))
      .join(broadcast(qterms), Seq("token"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("tfn",
        col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("idf") * col("tfn")), 4).as("score"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[bm25TopKLive]] reading a maintained index directory. */
  def bm25TopKLive(spark: SparkSession, indexDir: String, queries: DataFrame,
                   qIdCol: String, termCol: String, k: Int): DataFrame =
    bm25TopKLive(readSegments(spark, indexDir), readDels(spark, indexDir),
      queries, qIdCol, termCol, k)

  /** Apply one micro-batch of document changes to the index at `indexDir`.
    * `docs` columns: `idCol`, `textCol`, and optionally `opCol` — rows
    * with op `"d"` are deletes (text ignored), all others upserts; at most
    * one row per doc_id per batch (the upsert-kafka granularity). Batches
    * at or below the manifest's committed id are skipped (redelivery).
    * Exposed for deterministic batch-at-a-time testing; streams attach via
    * [[attachIndexMaintenance]].
    */
  def processBatch(docs: DataFrame, batchId: Long, indexDir: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   opCol: Option[String] = None,
                   compactSegments: Int = 8): Unit = {
    require(compactSegments >= 2, s"compactSegments must be >= 2, got $compactSegments")
    val spark = docs.sparkSession
    val m = readManifest(indexDir)
    if (batchId <= m.lastBatch) return // redelivered, already committed

    val batch = docs.cache()
    try {
      val upserts = opCol.fold(batch)(c => batch.filter(col(c) =!= "d"))
      val deletes = opCol.fold(batch.limit(0))(c => batch.filter(col(c) === "d"))

      var segs = m.segs
      var dels = m.dels
      if (upserts.limit(1).count() > 0) {
        val name = s"seg=a$batchId"
        Retrieval.buildBm25Index(upserts, idCol, textCol)
          .withColumn("batch", lit(batchId))
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/$name")
        segs :+= name
      }
      if (deletes.limit(1).count() > 0) {
        val name = s"b$batchId"
        deletes.select(col(idCol).as("doc_id"), lit(batchId).as("batch"))
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/_dels/$name")
        dels :+= name
      }

      val next =
        if (segs.size < compactSegments) Manifest(batchId, segs, dels)
        else {
          // threshold compaction: resolve liveness over the whole segment
          // set once, write ONE segment, clear the delete markers (their
          // dead rows are physically gone). Named by batch id — same
          // Overwrite idempotence as appends.
          val name = s"seg=c$batchId"
          val all = spark.read.parquet(segs.map(s => s"$indexDir/$s"): _*)
          val delRows =
            if (dels.isEmpty) spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](), delSchema)
            else spark.read.parquet(dels.map(d => s"$indexDir/_dels/$d"): _*)
          liveRows(all, delRows)
            .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/$name")
          // everything deleted → a file-less dir that cannot be reread;
          // commit an empty segment list instead (prune removes the dir)
          val hasFiles = {
            val ls = Files.list(Paths.get(indexDir, name))
            try ls.anyMatch(p => p.getFileName.toString.endsWith(".parquet"))
            finally ls.close()
          }
          Manifest(batchId, if (hasFiles) Seq(name) else Nil, Nil)
        }
      writeManifest(indexDir, next)
      prune(indexDir, next)
    } finally batch.unpersist()
  }

  /** Attach index maintenance to a document-change stream. Returns the
    * started query; probe at any batch boundary with [[bm25TopKLive]] (or
    * plain `spark.read.parquet(indexDir)` + [[Retrieval.bm25TopKIndexed]]
    * for an append-only stream). Probes hold nothing in Spark's
    * plan-keyed cache, so re-probing the same query set after new
    * segments land always reads the current committed manifest
    * (StreamingRetrievalSpec pins this).
    */
  def attachIndexMaintenance(docs: DataFrame, indexDir: String, checkpoint: String,
                             idCol: String = "doc_id",
                             textCol: String = "text",
                             opCol: Option[String] = None,
                             compactSegments: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexDir, idCol, textCol, opCol, compactSegments)
      }
      .start()
}
