package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming curation: continuous document ingest with cross-batch exact
  * dedup — the streaming twin of [[graft.pipeline.Dedup.incrementalExact]]
  * (the reference has no streaming at all; SURVEY §2.10 extension).
  */
object CurationStreams {

  /** Continuous deduped ingest: every micro-batch is dedup'd in-batch and
    * against the persisted fingerprint index at `indexDir`, survivors go
    * to `sink`, and their fingerprints are appended to the index — so a
    * document's content is delivered to the sink at most once across the
    * stream's lifetime.
    *
    * Restart/retry safety (foreachBatch is at-least-once): the index is
    * partitioned by the micro-batch epoch, a replayed epoch N probes only
    * fingerprints from epochs < N and dynamically OVERWRITES partition
    * epoch=N — both the sink rows and the index rows of a replay are
    * bit-identical to the first attempt, so a sink that is itself
    * idempotent by (epoch, id) yields exactly-once content delivery.
    *
    * Scale shape per micro-batch: one md5 groupBy of the batch (16-byte
    * keys), one anti-join probe whose index side streams from parquet —
    * corpus text is never rescanned. For very large indexes compose with
    * [[Dedup.incrementalExactBloom]]'s sketch instead (same contract).
    *
    * Returns the writer — caller picks trigger/checkpoint and `.start()`s.
    */
  def dedupedIngest(docs: DataFrame, textCol: String, idCol: String,
                    indexDir: String, sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(docs.isStreaming, "dedupedIngest expects a streaming frame; " +
      "use Dedup.incrementalExact for batch ingest")
    docs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val spark = batch.sparkSession
      val index =
        if (indexExists(spark, indexDir))
          spark.read.parquet(indexDir)
            .filter(col("epoch") < epoch) // replay: ignore our own partial rows
            .select("fingerprint")
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("fingerprint",
              org.apache.spark.sql.types.StringType))))
      val survivors = Dedup.incrementalExact(batch, index, textCol, idCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        sink(batch.join(survivors.select(col("keep_id").as(idCol)), Seq(idCol), "left_semi"),
          epoch)
        survivors.select(col("fingerprint")).withColumn("epoch", lit(epoch))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("epoch")
          .parquet(indexDir)
      } finally survivors.unpersist(blocking = false)
    }
  }

  /** Continuous canonical-URL-deduped crawl ingest (r15): the streaming
    * twin of [[graft.pipeline.UrlCuration.incrementalUrlDedup]] — every
    * micro-batch canonicalizes its URLs per-row, drops non-URL rows
    * (quarantine material), dedups in-batch and against the persisted
    * canonical-fingerprint index, delivers first-seen resources to
    * `sink`, and appends their fingerprints for the next batch. Distinct
    * raw spellings of one resource (tracking params, case, default
    * ports, fragments) collapse BEFORE the index probe, so a crawler
    * re-fetching the same page under utm-decorated links delivers it
    * once.
    *
    * Same replay discipline as [[dedupedIngest]]: the index is
    * epoch-partitioned, a replayed epoch probes only epochs < N and
    * dynamically overwrites its own partition — replays are
    * bit-identical, so an (epoch, id)-idempotent sink gets exactly-once
    * content delivery.
    */
  def urlDedupIngest(docs: DataFrame, urlCol: String, idCol: String,
                     indexDir: String, sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(docs.isStreaming, "urlDedupIngest expects a streaming frame; " +
      "use UrlCuration.incrementalUrlDedup for batch ingest")
    docs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      canonicalKeyedBatch(batch, batch, urlCol, idCol, indexDir, epoch, sink)
    }
  }

  /** Continuous raw-HTML ingest (r16) — the crawl pipeline's front door
    * as a stream: every micro-batch of (id, fetched url, raw markup)
    *
    *  - derives each page's CANONICAL-AWARE dedup key — the declared
    *    `rel=canonical` target resolved against the fetched URL
    *    ([[graft.pipeline.HtmlExtract.canonicalizedUrl]]), falling back
    *    to the fetched URL — then normalizes it, so session/tracking/
    *    mobile-variant spellings of one page collapse BEFORE the index
    *    probe;
    *  - dedups in-batch and against the epoch-partitioned canonical
    *    fingerprint index (the [[urlDedupIngest]] discipline: replays
    *    probe only epochs < N and overwrite their own partition —
    *    exactly-once content delivery to an (epoch, id)-idempotent
    *    sink);
    *  - delivers survivors to `sink` as (id, url, text) with the
    *    visible text extracted by
    *    [[graft.pipeline.HtmlExtract.htmlToTextCol]] — extraction runs
    *    ONLY on first-seen pages, after the dedup filter.
    *
    * Scale shape per micro-batch: key derivation and text extraction
    * are per-row expression chains inside the batch scan; the only
    * shuffles are the 16-byte-fingerprint groupBy and the anti-join
    * probe. Raw markup never enters the index and is never rescanned.
    */
  def htmlIngest(docs: DataFrame, htmlCol: String, urlCol: String,
                 idCol: String, indexDir: String,
                 sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(docs.isStreaming, "htmlIngest expects a streaming frame; " +
      "compose HtmlExtract.canonicalizedUrl + UrlCuration.incrementalUrlDedup for batch ingest")
    docs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val keyed = batch.withColumn("__curl",
        graft.pipeline.HtmlExtract.canonicalizedUrl(col(urlCol), col(htmlCol)))
      val out = batch.select(col(idCol), col(urlCol),
        graft.pipeline.HtmlExtract.htmlToTextCol(col(htmlCol)).as("text"))
      canonicalKeyedBatch(keyed, out, "__curl", idCol, indexDir, epoch, sink)
    }
  }

  /** Continuous WARC-file ingest (r17): the crawl-archive front door as
    * a stream — each micro-batch of raw WARC files splits into records
    * ([[graft.pipeline.Warc.htmlResponses]]), keeps the 200 text/html
    * responses, dedups them on the NORMALIZED response URL against the
    * epoch-partitioned fingerprint index (the [[htmlIngest]]
    * discipline: replays probe only epochs < N and overwrite their own
    * partition — exactly-once delivery to an (epoch, id)-idempotent
    * sink), and delivers survivors as (id, rec_no, url, text) with the
    * visible text extracted after the dedup filter. In-batch record
    * identity is `id#rec_no` (a crawl may revisit a URL within one
    * file); the min-key winner per fingerprint is deterministic
    * (lexicographic — an ordering, not a ranking).
    *
    * Scale shape per micro-batch: record split, status/content-type
    * cut, and extraction are per-row expression chains in the batch
    * scan; only 16-byte fingerprints and short keys shuffle; raw
    * archive bytes never enter the index and are never rescanned.
    */
  def warcIngest(files: DataFrame, fileCol: String, idCol: String,
                 indexDir: String,
                 sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(files.isStreaming, "warcIngest expects a streaming frame; " +
      "compose Warc.htmlResponses + UrlCuration.incrementalUrlDedup for batch ingest")
    files.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val resp = graft.pipeline.Warc.htmlResponses(batch, fileCol, idCol)
        .filter(col("status") === 200)
        .withColumn("__rid", concat(col(idCol).cast("string"), lit("#"),
          col("rec_no").cast("string")))
      val keyed = resp.select(col("__rid"), col("url"))
      val out = resp.select(col("__rid"), col(idCol), col("rec_no"),
        col("url"),
        graft.pipeline.HtmlExtract.htmlToTextCol(col("html")).as("text"))
      canonicalKeyedBatch(keyed, out, "url", "__rid", indexDir, epoch,
        (df, e) => sink(df.drop("__rid"), e))
    }
  }

  /** One micro-batch of canonical-URL-keyed dedup ingest, shared by
    * [[urlDedupIngest]] and [[htmlIngest]]: probe the epoch-partitioned
    * fingerprint index with `keyed`'s `urlCol`, deliver the surviving
    * ids' rows of `payload` to `sink`, append the survivors'
    * fingerprints under this epoch.
    */
  private def canonicalKeyedBatch(keyed: DataFrame, payload: DataFrame,
                                  urlCol: String, idCol: String,
                                  indexDir: String, epoch: Long,
                                  sink: (DataFrame, Long) => Unit): Unit = {
    val spark = keyed.sparkSession
    val index =
      if (indexExists(spark, indexDir))
        spark.read.parquet(indexDir)
          .filter(col("epoch") < epoch)
          .select("fingerprint")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fingerprint",
            org.apache.spark.sql.types.StringType))))
    val survivors = graft.pipeline.UrlCuration
      .incrementalUrlDedup(keyed, index, urlCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sink(payload.join(survivors.select(col("keep_id").as(idCol)), Seq(idCol), "left_semi"),
        epoch)
      survivors.select(col("fingerprint")).withColumn("epoch", lit(epoch))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(indexDir)
    } finally survivors.unpersist(blocking = false)
  }

  /** Continuous NEAR-dup-deduped ingest: the streaming twin of
    * [[Dedup.incrementalMinhash]] — every micro-batch removes its
    * in-batch near-dups (full exact-Jaccard verify; the batch's text is
    * in hand) and probes the persisted BAND index at `indexDir` with one
    * (band, sig) semi-join (candidate-level across batches, the LSH
    * collision curve the caller tuned k/bands for). Survivors go to
    * `sink`; their band rows are appended for the next batch.
    *
    * Same replay discipline as [[dedupedIngest]]: the index is
    * epoch-partitioned, a replayed epoch probes only epochs < N and
    * dynamically overwrites its own partition — replays are
    * bit-identical, so an (epoch, id)-idempotent sink gets exactly-once
    * content delivery. Scale shape per micro-batch: the batch is
    * shingled ONCE; the index side streams (bands rows per corpus doc,
    * short keys) — corpus text is never rescanned or even stored.
    */
  def nearDupIngest(docs: DataFrame, textCol: String, idCol: String,
                    indexDir: String, sink: (DataFrame, Long) => Unit,
                    threshold: Double = 0.8, shingleN: Int = 3,
                    k: Int = 32, bands: Int = 8,
                    portable: Boolean = false): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(docs.isStreaming, "nearDupIngest expects a streaming frame; " +
      "use Dedup.incrementalMinhash for batch ingest")
    docs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val spark = batch.sparkSession
      val sigType =
        if (portable) org.apache.spark.sql.types.StringType
        else org.apache.spark.sql.types.LongType
      val index =
        if (indexExists(spark, indexDir))
          spark.read.parquet(indexDir)
            .filter(col("epoch") < epoch)
            .select("band", "sig")
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("band",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("sig", sigType))))
      val (kept, keptRows) = Dedup.incrementalMinhash(
        batch, index, textCol, idCol, threshold, shingleN, k, bands, portable)
      try {
        sink(kept, epoch)
        keptRows.select(col("id"), col("band"), col("sig"))
          .withColumn("epoch", lit(epoch))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("epoch")
          .parquet(indexDir)
      } finally {
        // incrementalMinhash hands back CHECKPOINTED frames; without an
        // explicit release every epoch pins a fresh block set until the
        // ContextCleaner notices — the Checkpoints.scala leak class, per
        // epoch, forever, on a long-running stream (r14 review)
        graft.core.Checkpoints.release(kept)
        graft.core.Checkpoints.release(keptRows)
      }
    }
  }

  /** Continuous perceptual-dedup IMAGE ingest: the multimodal twin of
    * [[nearDupIngest]]. Every micro-batch dHashes its images
    * ([[graft.pipeline.Multimodal.imageDHashes]] — per-partition decode,
    * 8 hash bytes per image), drops in-batch near-dups (an image loses
    * to ANY smaller-id batch image within `maxHamming` — the
    * dominated-by-smaller rule, deterministic and replay-stable), then
    * probes the persisted hash index of all earlier survivors with the
    * banded join ([[graft.pipeline.Multimodal.nearDupImagePairs]]'s
    * shape; complete for maxHamming < bands, guarded there). Survivors
    * go to `sink`; their 8-byte hashes (never pixels) append to the
    * index — so the index for a billion images is gigabytes, not the
    * corpus.
    *
    * Undecodable payloads pass straight through to the sink (they have
    * no hash to compare — the poison-row contract of the codec
    * operators; filter on the hash frame downstream if they should
    * quarantine instead). Same epoch-partitioned replay discipline as
    * [[dedupedIngest]]: a replayed epoch probes only epochs < N and
    * dynamically overwrites its own partition, so an (epoch, id)-
    * idempotent sink gets exactly-once content delivery.
    */
  def imageDedupIngest(imgs: DataFrame, idCol: String, payloadCol: String,
                       indexDir: String, sink: (DataFrame, Long) => Unit,
                       maxHamming: Int = 2,
                       bands: Int = 4): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(imgs.isStreaming, "imageDedupIngest expects a streaming frame; " +
      "compose Multimodal.imageDHashes + nearDupImagePairs for batch dedup")
    require(bands >= 1 && 64 % bands == 0 && maxHamming >= 0 && maxHamming < bands,
      s"imageDedupIngest: need 0 <= maxHamming < bands and bands | 64, " +
        s"got maxHamming=$maxHamming bands=$bands")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    imgs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val spark = batch.sparkSession
      val hashes = graft.pipeline.Multimodal
        .imageDHashes(batch, idCol, payloadCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val decoded = hashes.filter(col("decoded"))
        // in-batch: an image is dominated by ANY smaller-id near image
        val inBatchLosers = graft.pipeline.Multimodal
          .nearDupImagePairs(decoded, "id", maxHamming = maxHamming, bands = bands)
          .select(col("id2").as("id")).distinct()
        val index =
          if (indexExists(spark, indexDir))
            spark.read.parquet(indexDir)
              .filter(col("epoch") < epoch)
              .select(col("dhash").as("__ih"))
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("__ih",
                org.apache.spark.sql.types.LongType))))
        def sliced(df: DataFrame, h: String): DataFrame = df
          .select(col("*"), explode(sequence(lit(0), lit(bands - 1))).as("__b"))
          .withColumn("__bv", expr(s"shiftrightunsigned($h, __b * $bits) & ${mask}L"))
        val vsIndex = sliced(decoded.select("id", "dhash"), "dhash")
          .join(sliced(index, "__ih"), Seq("__b", "__bv"))
          .select(col("id"), col("dhash"), col("__ih")).distinct()
          .filter(expr(s"bit_count(dhash ^ __ih) <= $maxHamming"))
          .select("id").distinct()
        val surviving = decoded
          .join(inBatchLosers, Seq("id"), "left_anti")
          .join(vsIndex, Seq("id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val keepIds = surviving.select(col("id").as(idCol))
            .unionByName(hashes.filter(!col("decoded")).select(col("id").as(idCol)))
          sink(batch.join(keepIds, Seq(idCol), "left_semi"), epoch)
          surviving.select(col("dhash")).withColumn("epoch", lit(epoch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(indexDir)
        } finally surviving.unpersist(blocking = false)
      } finally hashes.unpersist(blocking = false)
    }
  }

  /** Continuous per-source QUOTA admission: the streaming twin of
    * [[graft.operators.Views.budgetSelectByGroup]] — every micro-batch
    * admits each source's rows in the caller's `order` priority while
    * the source's LIFETIME admitted `costCol` total stays within its
    * budget. A source's total admitted cost never exceeds its budget
    * across the whole stream: each batch runs the batch-local
    * budget selection against the budget MINUS what earlier epochs
    * already spent, read from the epoch-partitioned ledger at
    * `ledgerDir`. Within a batch the peer-inclusive RANGE-frame
    * semantics of budgetSelectByGroup apply unchanged (tied cohorts at
    * a cutoff admit or reject as a unit); across batches admission is
    * arrival-ordered — epoch-by-epoch prefix-greedy, the only order a
    * stream has.
    *
    * Same replay discipline as [[dedupedIngest]] (foreachBatch is
    * at-least-once): a replayed epoch N reads spends only from epochs
    * < N and dynamically overwrites ledger partition epoch=N, so its
    * admissions are bit-identical to the first attempt and an
    * (epoch, id)-idempotent sink gets exactly-once delivery.
    *
    * Scale shape per micro-batch: the ledger is config-sized (one row
    * per source per epoch, grouped to one per source on read — the
    * collect here is sources-cardinality, never data-scale), and the
    * admission itself is budgetSelectByGroup's slim-window + broadcast
    * cutoff join-back — the batch's full-width payload never rides a
    * window (see SCALE.md's q94 row for the decades). The ledger grows
    * one tiny partition per epoch; for a stream that lives through
    * millions of epochs, periodically compact epochs < the stream's
    * restart horizon into one partition (the read only needs the SUM
    * per source, so any prefix of epochs may be pre-aggregated).
    *
    * Rate limiting (a quota per source per TIME WINDOW rather than per
    * lifetime) is this operator with `groupCol` set to a derived
    * (source, window-bucket) column — each window-bucket is its own
    * ledger group and exhausts independently.
    */
  def quotaIngest(docs: DataFrame, groupCol: String,
                  order: Seq[org.apache.spark.sql.Column], costCol: String,
                  budgets: Map[Any, Long], defaultBudget: Long,
                  ledgerDir: String,
                  sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(docs.isStreaming, "quotaIngest expects a streaming frame; " +
      "use Views.budgetSelectByGroup for batch selection")
    docs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val spark = batch.sparkSession
      val spent: Map[Any, Long] =
        if (indexExists(spark, ledgerDir))
          spark.read.parquet(ledgerDir)
            .filter(col("epoch") < epoch) // replay: ignore our own partial rows
            .groupBy(col("grp")).agg(sum(col("spent")).as("s"))
            .collect().map(r => (r.get(0): Any) -> r.getLong(1)).toMap
        else Map.empty
      // remaining budget per source that has an explicit budget OR a
      // spend history; untouched default-budget sources fall through to
      // the (full) defaultBudget. spent can never exceed the budget —
      // the max(0, _) is defense in depth against a hand-edited ledger.
      val remaining: Map[Any, Long] = (budgets.keySet ++ spent.keySet).map { g =>
        g -> math.max(0L, budgets.getOrElse(g, defaultBudget) - spent.getOrElse(g, 0L))
      }.toMap
      // colossalThreshold = MaxValue: a micro-batch is never colossal,
      // and the default regime-detection aggregate would add a full
      // extra scan of the batch source EVERY epoch (r14 review)
      val admitted = graft.operators.Views.budgetSelectByGroup(
          batch, groupCol, order, costCol, remaining, defaultBudget,
          colossalThreshold = Long.MaxValue)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        sink(admitted, epoch)
        admitted.groupBy(col(groupCol).as("grp"))
          .agg(coalesce(sum(col(costCol).cast("long")), lit(0L)).as("spent"))
          .withColumn("epoch", lit(epoch))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("epoch")
          .parquet(ledgerDir)
      } finally admitted.unpersist(blocking = false)
    }
  }

  /** Continuous ANN-index ingest: the streaming twin of
    * [[graft.pipeline.IvfIndex.append]] — every micro-batch assigns ONLY
    * its own vectors to the FROZEN centroids (O(batch): no retrain, no
    * corpus rescan) and appends their int8-sidecar rows (id, cell, q8)
    * to the cell-partitioned index at `indexDir` — the stored search
    * artifact [[graft.pipeline.IvfIndex.topKQuantized]] scores, built
    * incrementally as vectors arrive.
    *
    * Replay safety comes cheaper than in [[dedupedIngest]]: assignment
    * and quantization are PURE functions of (vector, centroids) — no
    * cross-batch probe at all — so a replayed epoch recomputes
    * bit-identical rows, and the epoch partitioning + dynamic overwrite
    * make the retry idempotent on disk. Probe-side readers prune on the
    * cell partition directories; `epoch` rides along for audit and as
    * the overwrite unit. Centroid drift remains the caller's loop:
    * watch [[graft.pipeline.IvfIndex.cellStats]] over the stored index
    * and rebuild (new indexDir, new centroids) when occupancy skews.
    */
  def annIngest(vecs: DataFrame, vecCol: String, idCol: String,
                centroids: Array[Array[Double]],
                indexDir: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(vecs.isStreaming, "annIngest expects a streaming frame; " +
      "use IvfIndex.append for batch ingest")
    require(centroids.nonEmpty, "annIngest: need at least one centroid")
    vecs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val idx = graft.pipeline.IvfIndex.buildFromCentroids(batch, vecCol, idCol, centroids)
      graft.pipeline.IvfIndex.quantizedSidecar(idx)
        .withColumn("epoch", lit(epoch))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch", "cell")
        .parquet(indexDir)
    }
  }

  private def indexExists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // only VISIBLE entries count: a crash during the first write can
    // leave `_temporary`/`_SUCCESS` alone in the dir, and treating that
    // as an index makes spark.read.parquet throw UNABLE_TO_INFER_SCHEMA
    // on every replay — a permanent crash loop in the function that
    // promises restart safety
    fs.exists(path) && fs.listStatus(path).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Continuous rollup maintenance — the streaming IVM twin of
    * [[graft.operators.Aggregations.mergeAggregates]]: each micro-batch
    * aggregates ITSELF with `specs` (mergeable functions only: count /
    * sum / min / max — the [[graft.operators.Aggregations.mergeStacked]]
    * contract) and stores the O(groups)-row finished partial under its
    * epoch partition; [[readRollup]] folds the stored partials into the
    * current rollup whenever one is needed. Nothing ever re-aggregates
    * event history: per epoch the work is one map-side-combined partial
    * aggregate of the batch plus an O(groups) write — the nightly-rollup
    * loop at streaming cadence.
    *
    * Same replay discipline as [[dedupedIngest]]: a replayed epoch
    * dynamically OVERWRITES its own partition with bit-identical partials
    * (the aggregate of the same batch), so at-least-once foreachBatch
    * still yields an exactly-once rollup.
    */
  def aggMaintain(events: DataFrame, specs: String,
                  rollupDir: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(events.isStreaming, "aggMaintain expects a streaming frame; " +
      "use Aggregations.aggregate for batch rollups")
    // fail on unmergeable specs at WIRING time, not first epoch: run the
    // merge parser once against an empty frame of the partial's shape
    graft.operators.Aggregations.mergeStacked(
      graft.operators.Aggregations.aggregateDf(events.sparkSession
        .createDataFrame(events.sparkSession.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], events.schema), specs), specs)
    events.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      graft.operators.Aggregations.aggregateDf(batch, specs)
        .withColumn("epoch", lit(epoch))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(rollupDir)
    }
  }

  /** The current rollup of an [[aggMaintain]] store: one
    * [[graft.operators.Aggregations.mergeStacked]] fold over the
    * O(epochs × groups) partials — never the event history.
    */
  def readRollup(spark: org.apache.spark.sql.SparkSession, rollupDir: String,
                 specs: String): DataFrame =
    graft.operators.Aggregations.mergeStacked(
      spark.read.parquet(rollupDir).drop("epoch"), specs)
}
