package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}
import graft.rel.Checkpoint.PinOps

/** Incremental near-dup detection: documents arriving on a stream are
  * LSH-matched against a historical corpus index and exact-Jaccard
  * verified — the streaming face of the batch MinHash dedup
  * (Dedup.minhashPairs), sharing its expressions so batch and stream agree
  * bit-for-bit.
  *
  * Production shape (the standard Spark pattern for this): the index is
  * built ONCE from history (at 100 TB: persisted parquet, band index
  * bucketed by (band, bh) so each micro-batch's join co-locates without
  * reshuffling history), and each micro-batch runs [[matchAgainst]] inside
  * `foreachBatch` — a batch DataFrame function, so the per-pair dedup and
  * verify join stay stateless from streaming's point of view and state
  * never accumulates in the stream engine. Matched docs can then be
  * dropped, quarantined, or merged by the batch body.
  */
object DocStream {

  /** The two halves of the historical index: the banded signature index
    * (one row per (band, bh, id) — the join side) and the hashed-shingle
    * store (one row per id — joined once per verified candidate). Split so
    * the hot join side stays narrow; gram arrays travel only for
    * candidates that survive the signature estimate filter. */
  final case class NearDupIndex(bandIndex: DataFrame, grams: DataFrame,
                                numHashes: Int, bands: Int, shingleK: Int)

  /** Build the index from the historical corpus (batch, once). */
  def buildIndex(history: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", numHashes: Int = 64,
                 bands: Int = 16, shingleK: Int = 3): NearDupIndex = {
    val rows = numHashes / bands
    val grams = Dedup.widen(history)
      .select(col(idCol).as("id"),
        TextAnalysis.hashedShingles(col(textCol), shingleK).as("g"))
      .filter(size(col("g")) > 0)
      .pin()
    val sig = grams.select(col("id"),
      Dedup.minhashSignature(col("g"), numHashes).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * lit(rows) + 1, lit(rows)), b)))
        .as(Seq("band", "bh")))
      .select(col("band"), col("bh"), col("id"), col("sig"))
      .pin()
    NearDupIndex(banded, grams.select(col("id"), col("g")), numHashes, bands, shingleK)
  }

  /** Match a batch of NEW documents against the index: banded candidate
    * join on (band, bh) → signature estimate filter → exact-Jaccard verify
    * → (new_id, dup_id, jaccard) for pairs ≥ threshold. Asymmetric version
    * of Dedup.minhashPairs (new × history, never history × history) —
    * usable directly on a batch DataFrame or per micro-batch inside
    * `foreachBatch`. */
  def matchAgainst(newDocs: DataFrame, index: NearDupIndex,
                   threshold: Double = 0.5, idCol: String = "doc_id",
                   textCol: String = "text", margin: Double = 0.15): DataFrame = {
    val rows = index.numHashes / index.bands
    val g = newDocs
      .select(col(idCol).as("new_id"),
        TextAnalysis.hashedShingles(col(textCol), index.shingleK).as("g_new"))
      .filter(size(col("g_new")) > 0)
      .pin() // feeds the band join AND the verify join — compute once
    val nb = g.select(col("new_id"), col("g_new"),
        Dedup.minhashSignature(col("g_new"), index.numHashes).as("sig_new"))
      .select(col("new_id"), col("g_new"), col("sig_new"),
        posexplode(transform(sequence(lit(0), lit(index.bands - 1)),
          b => xxhash64(slice(col("sig_new"), b * lit(rows) + 1, lit(rows)), b)))
          .as(Seq("band", "bh")))
    val cands = nb.join(index.bandIndex.withColumnRenamed("id", "dup_id")
        .withColumnRenamed("sig", "sig_hist"), Seq("band", "bh"))
      .filter(col("new_id") =!= col("dup_id"))
      .filter((graft.functions.SigAgree(col("sig_new"), col("sig_hist"))
        .cast("double") / index.numHashes)
        >= threshold - margin)
      .select(col("new_id"), col("g_new"), col("dup_id"))
      .dropDuplicates("new_id", "dup_id")
    cands.join(index.grams.select(col("id").as("dup_id"), col("g").as("g_hist")), "dup_id")
      .select(col("new_id"), col("dup_id"),
        (size(array_intersect(col("g_new"), col("g_hist"))).cast("double") /
         size(array_union(col("g_new"), col("g_hist"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      // pair-level dedup AFTER the verify: a clean index makes this a
      // no-op (pairs are already unique), but an index holding duplicate
      // rows for an id — the [[appendIndexBatch]] crash window — then
      // yields identical results instead of duplicated output rows, which
      // is what makes replayed appends harmless
      .dropDuplicates("new_id", "dup_id")
  }

  /** Merge a processed micro-batch's signatures into the index so LATER
    * batches match against it — the maintenance half of incremental dedup.
    * The delta is built with the index's own parameters (bit-identical
    * banding), unioned, and pinned: the pin both materializes the merged
    * frames and TRUNCATES lineage, so repeated appends stay O(index), not
    * O(appends²) of stacked union plans — this is the in-memory compaction.
    * At 100 TB the same two frames live as parquet bucketed by (band, bh) /
    * id; append is then a partition write and compaction is a periodic
    * bucket rewrite — the shape here mirrors that exactly. */
  def append(index: NearDupIndex, newDocs: DataFrame,
             idCol: String = "doc_id", textCol: String = "text"): NearDupIndex = {
    import graft.rel.Checkpoint.PinOps
    val delta = buildIndex(newDocs, idCol, textCol,
      index.numHashes, index.bands, index.shingleK)
    val merged = NearDupIndex(
      index.bandIndex.unionByName(delta.bandIndex).pin(),
      index.grams.unionByName(delta.grams).pin(),
      index.numHashes, index.bands, index.shingleK)
    // the merged pins are EAGER — the delta's batch-sized pins are dead the
    // moment they exist (unpinAll: delta.grams is a projection OVER its pin)
    delta.bandIndex.unpinAll(); delta.grams.unpinAll()
    merged
  }

  /** Wire a document stream to the index via foreachBatch, delivering each
    * micro-batch's matches to `sink`. Returns the started query. */
  def start(stream: DataFrame, index: NearDupIndex, sink: DataFrame => Unit,
            threshold: Double = 0.5, idCol: String = "doc_id",
            textCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ledger-drain: matchAgainst pins the batch's gram frame behind its
        // lazy result; a long-running stream must not accumulate one such
        // pin per micro-batch. The ledger records only the pins THIS batch
        // body creates — the index's own pins predate the batch, and
        // concurrent work on the shared SparkContext (another query, a
        // gateway session) is never touched, where the previous
        // global-registry diff would have unpersisted its pins under it.
        val led = graft.rel.Checkpoint.openLedger()
        try sink(matchAgainst(batch, index, threshold, idCol, textCol))
        finally graft.rel.Checkpoint.drainLedger(led)
      }
      .start()

  /** Incremental variant: every micro-batch is matched against the index
    * AND then appended to it, so batch N+1 sees batch N's documents.
    * foreachBatch bodies run strictly sequentially per query, so the
    * evolving index reference needs no further synchronization. Documents
    * already matched as duplicates still enter the index (the reference
    * corpus keeps its first-seen copy; survivors-only is one filter in the
    * sink's hands before append — pass `appendFilter` to customize). */
  def startIncremental(stream: DataFrame, index0: NearDupIndex,
                       sink: DataFrame => Unit,
                       threshold: Double = 0.5, idCol: String = "doc_id",
                       textCol: String = "text",
                       appendFilter: (DataFrame, DataFrame) => DataFrame =
                         (batch, _) => batch): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.rel.Checkpoint.PinOps
    @volatile var idx = index0
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Pin-ledger discipline for an UNBOUNDED stream: without releases,
        // every micro-batch leaves (a) a full superseded INDEX COPY, and
        // (b) its batch/gram/match pins — memory growth linear in batches.
        // After append's eager merge, everything the batch pinned is dead
        // EXCEPT the new index generation: the thread-scoped ledger drains
        // exactly this body's pins, exempting those two — never touching
        // concurrent work's pins on the shared context. index0 stays
        // caller-owned and is never released.
        val led = graft.rel.Checkpoint.openLedger()
        try {
          val b = batch.pin() // feeds the match AND the append — compute once
          val matches = matchAgainst(b, idx, threshold, idCol, textCol).pin()
          sink(matches)
          val prev = idx
          idx = append(idx, appendFilter(b, matches), idCol, textCol)
          if (prev.bandIndex ne index0.bandIndex) {
            prev.bandIndex.unpin(); prev.grams.unpin()
          }
        } finally {
          val keep = Set(idx.bandIndex, idx.grams)
            .flatMap(graft.rel.Checkpoint.pinnedRddId)
          graft.rel.Checkpoint.drainLedger(led, keep)
        }
      }
      .start()
  }

  // ------------------------------------ chunk-level (CDC) incremental dedup

  /** Historical chunk-hash index for incremental CONTENT-level dedup: the
    * distinct content-defined chunk hashes of the corpus
    * ([[Dedup.cdcChunks]]) — one long per distinct chunk, the slimmest
    * possible probe side (at 100 TB: persisted parquet bucketed by hash so
    * each delta's join co-locates without reshuffling history). Chunk
    * granularity catches a NEW document quoting a historical paragraph —
    * invisible to the doc-level near-dup index above. */
  def buildChunkIndex(history: DataFrame, textCol: String = "text",
                      minLen: Int = 16, avgBits: Int = 5,
                      maxLen: Int = 128): DataFrame =
    history.select(explode(
        Dedup.cdcChunks(col(textCol), minLen, avgBits, maxLen)
          .getField("hash")).as("hash"))
      .distinct()

  /** Per-arriving-doc duplicated-content report: the fraction of each new
    * document's characters covered by chunks already in the historical
    * index. Work scales with the DELTA (history is never rechunked); the
    * probe is one equi-join of slim (hash, len) rows followed by one
    * map-side-combinable aggregation. Returns (idCol, n_chars, dup_frac).
    * Usable directly on a batch or per micro-batch inside foreachBatch. */
  def chunkDupFraction(newDocs: DataFrame, chunkIndex: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       minLen: Int = 16, avgBits: Int = 5,
                       maxLen: Int = 128): DataFrame = {
    val ch = newDocs.select(col(idCol),
        explode(Dedup.cdcChunks(col(textCol), minLen, avgBits, maxLen)).as("c"))
      .select(col(idCol), col("c.len").as("len"), col("c.hash").as("hash"))
    ch.join(chunkIndex.withColumn("__hit", lit(1)), Seq("hash"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("len")).as("n_chars"),
        round(sum(when(col("__hit") === 1, col("len")).otherwise(0))
          .cast("double") / sum(col("len")), 6).as("dup_frac"))
  }

  /** A chunk-hash index persisted under `dir` (bucketed by hash) WITH its
    * chunking parameters: a probe chunked with different parameters than
    * the index silently reports garbage, so the parameters travel with
    * the data and [[chunkDupFraction]] reads them from here. */
  final case class PersistedChunkIndex(hashes: DataFrame, minLen: Int,
                                       avgBits: Int, maxLen: Int)

  /** Persist a chunk-hash index: one bucketed table (by hash — a delta
    * probe's join then co-locates against stored history without
    * reshuffling it) + the chunking parameters in the meta. */
  def saveChunkIndex(index: DataFrame, dir: String, minLen: Int = 16,
                     avgBits: Int = 5, maxLen: Int = 128,
                     buckets: Int = 32): Unit =
    graft.sources.WriterLease.withLease(index.sparkSession, dir,
        "saveChunkIndex") {
      graft.sources.BucketedStore.write(index, s"$dir/hashes", Seq("hash"), buckets)
      graft.sources.BucketedStore.writeMeta(index.sparkSession, dir,
        "chunkindex.meta.json",
        s"""{"minLen":$minLen,"avgBits":$avgBits,"maxLen":$maxLen,""" +
        s""""buckets":$buckets,""" +
        s""""hashSchema":${graft.types.Json.str(index.schema.toDDL)}}""")
    }

  def loadChunkIndex(spark: org.apache.spark.sql.SparkSession,
                     dir: String): PersistedChunkIndex = {
    val node = graft.sources.BucketedStore.readMeta(spark, dir, "chunkindex.meta.json")
    PersistedChunkIndex(
      graft.sources.BucketedStore.attach(spark, s"$dir/hashes", Seq("hash"),
        node.get("buckets").asInt(), metaSchema(node, "hashSchema")),
      node.get("minLen").asInt(), node.get("avgBits").asInt(),
      node.get("maxLen").asInt())
  }

  /** [[chunkDupFraction]] against a persisted index, chunking the probe
    * with the INDEX's recorded parameters. */
  def chunkDupFraction(newDocs: DataFrame, index: PersistedChunkIndex,
                       idCol: String, textCol: String): DataFrame =
    chunkDupFraction(newDocs, index.hashes, idCol, textCol,
      index.minLen, index.avgBits, index.maxLen)

  /** Fold a delta's chunk hashes into a persisted index as a partition
    * write. The index's contract is DISTINCT hashes — a duplicate row
    * would double-count its chunk's length in every later probe — so the
    * delta anti-joins the stored table first (co-located on the bucketed
    * hash side: only the delta shuffles). */
  def appendChunkIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                       newDocs: DataFrame, textCol: String = "text"): Unit =
    graft.sources.WriterLease.withLease(spark, dir, "appendChunkIndex") {
      val idx = loadChunkIndex(spark, dir)
      val fresh = buildChunkIndex(newDocs, textCol, idx.minLen, idx.avgBits,
          idx.maxLen)
        .join(idx.hashes, Seq("hash"), "left_anti")
      val node = graft.sources.BucketedStore.readMeta(spark, dir,
        "chunkindex.meta.json")
      graft.sources.BucketedStore.append(spark, s"$dir/hashes", fresh,
        Seq("hash"), node.get("buckets").asInt(),
        metaSchema(node, "hashSchema"))
    }

  /** [[compactIndex]]/[[vacuumIndex]] counterparts for a persisted CDC
    * chunk index — same generation-swap safety and lease discipline. */
  def compactChunkIndex(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Unit =
    graft.sources.WriterLease.withLease(spark, dir, "compactChunkIndex") {
      val node = graft.sources.BucketedStore.readMeta(spark, dir,
        "chunkindex.meta.json")
      graft.sources.BucketedStore.compact(spark, s"$dir/hashes",
        Seq("hash"), node.get("buckets").asInt(),
        beforeFlip = () =>
          graft.sources.WriterLease.renew(spark, dir, "compactChunkIndex"))
    }

  def vacuumChunkIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                       keepPrior: Int = 1): Unit =
    graft.sources.WriterLease.withLease(spark, dir, "vacuumChunkIndex") {
      graft.sources.BucketedStore.vacuum(spark, s"$dir/hashes", keepPrior)
    }

  // ---------------------------- persisted (bucketed) index: the 100 TB shape
  // (layout machinery shared through graft.sources.BucketedStore)

  /** Persist the index under `dir` as two BUCKETED parquet table layouts —
    * the band side clustered by (band, bh), the gram side by id — plus a
    * meta file, everything through `dir`'s own Hadoop FileSystem
    * (hdfs://, s3a://, file:// alike). The bucketing shuffle is paid ONCE
    * here; [[loadIndex]] re-attaches the files as external bucketed
    * tables WITHOUT re-shuffling, and every later batch's candidate join
    * co-locates against the stored layout — the history side of the join
    * (the big side) never exchanges again. This is the at-scale
    * counterpart of the in-memory pinned index: history lives as bucketed
    * parquet, a delta append is a partition write, compaction is a
    * periodic bucket rewrite. Overwrites any index previously saved at
    * `dir` (coordinating with live readers of that dir is the caller's). */
  def saveIndex(index: NearDupIndex, dir: String, buckets: Int = 32): Unit = {
    val spark = index.bandIndex.sparkSession
    graft.sources.WriterLease.withLease(spark, dir, "saveIndex") {
    graft.sources.BucketedStore.write(index.bandIndex, s"$dir/band",
      Seq("band", "bh"), buckets)
    graft.sources.BucketedStore.write(index.grams, s"$dir/grams",
      Seq("id"), buckets)
    // fence before the meta write makes the index loadable: two corpus-
    // sized bucketed writes can outlive the lease TTL
    graft.sources.WriterLease.renew(spark, dir, "saveIndex")
    // schemas recorded at write time: an EMPTY index (the initial state of
    // a start-from-nothing stream) writes no parquet files, so loads and
    // appends cannot infer them from the directory
    def q(s: String) = graft.types.Json.str(s)
    graft.sources.BucketedStore.writeMeta(spark, dir, "index.meta.json",
      s"""{"numHashes":${index.numHashes},"bands":${index.bands},""" +
      s""""shingleK":${index.shingleK},"buckets":$buckets,""" +
      s""""bandSchema":${q(index.bandIndex.schema.toDDL)},""" +
      s""""gramSchema":${q(index.grams.schema.toDDL)}}""")
    }
  }

  /** Append a delta corpus to a persisted index IN PLACE — the at-scale
    * append promised by the in-memory [[append]]: the delta's band/gram
    * rows are INSERTed through the stored tables' bucket specs, so new
    * bucket files land BESIDE the existing ones (a partition write — the
    * history is never rewritten or reshuffled) and any subsequent
    * [[loadIndex]] sees the union. Readers attached BEFORE the append keep
    * their file listing (re-attach to pick up the delta). The delta's
    * build pins are released before returning. */
  def appendIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                  newDocs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): Unit =
    graft.sources.WriterLease.withLease(spark, dir, "appendIndex") {
      val node = graft.sources.BucketedStore.readMeta(spark, dir, "index.meta.json")
      val delta = buildIndex(newDocs, idCol, textCol,
        node.get("numHashes").asInt(), node.get("bands").asInt(),
        node.get("shingleK").asInt())
      val buckets = node.get("buckets").asInt()
      graft.sources.BucketedStore.append(spark, s"$dir/band", delta.bandIndex,
        Seq("band", "bh"), buckets, metaSchema(node, "bandSchema"))
      graft.sources.BucketedStore.append(spark, s"$dir/grams", delta.grams,
        Seq("id"), buckets, metaSchema(node, "gramSchema"))
      delta.bandIndex.unpinAll(); delta.grams.unpinAll()
    }

  /** Optional schema DDL recorded in a meta (absent in legacy metas —
    * those layouts were non-empty, so inference still works). */
  private def metaSchema(node: com.fasterxml.jackson.databind.JsonNode,
                         field: String): Option[String] =
    if (node.has(field)) Some(node.get(field).asText()) else None

  /** [[appendIndex]] with foreachBatch's at-least-once delivery made
    * EXACTLY-ONCE on the index: the highest appended batchId rides in the
    * meta, and a replayed batch (crash after the stream commit, before
    * ours — or redelivery) is a no-op. Ordering is insert-then-meta: a
    * crash INSIDE the window leaves duplicate index rows for one batch,
    * which [[matchAgainst]]'s post-verify pair dedup renders invisible in
    * results — so no replay, however timed, can corrupt what a reader
    * sees. Returns whether the append ran. */
  def appendIndexBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                       newDocs: DataFrame, batchId: Long,
                       idCol: String = "doc_id",
                       textCol: String = "text"): Boolean =
    // ONE lease across guard-check → appends → watermark advance: two
    // writers racing this sequence unleased could both pass the guard and
    // double-append one batch (re-entrancy covers the inner appendIndex)
    graft.sources.WriterLease.withLease(spark, dir, "appendIndexBatch") {
      val node = graft.sources.BucketedStore.readMeta(spark, dir, "index.meta.json")
      val last = if (node.has("lastBatch")) node.get("lastBatch").asLong() else -1L
      if (batchId <= last) false
      else {
        appendIndex(spark, dir, newDocs, idCol, textCol)
        // fence before committing visibility: if the append outlived the
        // lease TTL and a breaker claimed it, abort LOUD here — the
        // orphan delta rows are the pair-dedup-absorbed crash window,
        // a silently advanced watermark over a stolen lease is not
        graft.sources.WriterLease.renew(spark, dir, "appendIndexBatch")
        // advance the watermark, preserving every other meta field (schemas!)
        val obj = node.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        obj.put("lastBatch", batchId)
        graft.sources.BucketedStore.writeMeta(spark, dir, "index.meta.json",
          obj.toString)
        true
      }
    }

  /** [[startIncremental]] over a PERSISTED index: every micro-batch is
    * matched against the stored layout and then appended to it through
    * the [[appendIndexBatch]] batchId guard. Unlike the in-memory
    * variant, a RESTART loses nothing — the index is the directory, the
    * stream checkpoint replays the in-flight batch, the guard skips the
    * already-appended ones, and the pair dedup absorbs the one crash
    * window. Nothing stays pinned between batches (the ledger diff drains
    * every pin the batch created — the index lives on disk). */
  def startIncrementalPersisted(stream: DataFrame, dir: String,
                                sink: DataFrame => Unit,
                                threshold: Double = 0.5,
                                idCol: String = "doc_id",
                                textCol: String = "text",
                                appendFilter: (DataFrame, DataFrame) => DataFrame =
                                  (batch, _) => batch,
                                trigger: org.apache.spark.sql.streaming.Trigger =
                                  org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
                                maintainEvery: Int = 0,
                                maxFilesPerBucket: Int = 4):
      org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.rel.Checkpoint.PinOps
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // ledger drain, not a global-registry diff: everything this body
        // pins is dead once the batch commits (the index lives on disk),
        // and concurrent pinners on the shared context stay untouched
        val led = graft.rel.Checkpoint.openLedger()
        try {
          val b = batch.pin() // feeds the match AND the append — compute once
          val matches = matchAgainst(b, loadIndex(spark, dir), threshold,
            idCol, textCol).pin()
          sink(matches)
          appendIndexBatch(spark, dir, appendFilter(b, matches), batchId,
            idCol, textCol)
          // in-stream upkeep: every `maintainEvery` batches, fold layouts
          // whose per-bucket file count crossed the budget and vacuum with
          // the DEFAULT grace window (keepPrior=1 — the next batch's
          // loadIndex re-attaches the new generation; a reader still on
          // the just-superseded one keeps its files). Compaction during a
          // live stream is the gate StreamingSpec pins.
          if (maintainEvery > 0 && batchId > 0 &&
              batchId % maintainEvery == 0)
            maintainIndex(spark, dir, maxFilesPerBucket)
          () // foreachBatch wants Unit — the guard's Boolean is advisory
        } finally graft.rel.Checkpoint.drainLedger(led)
      }
      .start()
  }

  /** Periodic bucket rewrite of a persisted index: every
    * [[appendIndex]]/[[appendIndexBatch]] adds up to `buckets` files per
    * half, and after many deltas the file COUNT (not the data) slows the
    * probe scans — compaction folds each half back to one file per
    * bucket. SAFE UNDER CONCURRENT READERS: each half is rewritten into a
    * fresh generation directory and an atomic pointer flip switches new
    * resolvers over, while a serving [[loadIndex]] attachment, a live
    * [[startIncrementalPersisted]] stream mid-batch, or an attached
    * catalog relvar keeps reading its complete superseded generation
    * (see [[graft.sources.BucketedStore.compact]]). Run [[vacuumIndex]]
    * once pre-compaction readers are gone to reclaim the old
    * generation's storage. Takes the writer lease — a concurrent append
    * would land rows in the generation being folded and lose them at the
    * flip. The meta (including the exactly-once lastBatch watermark) is
    * untouched. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Unit =
    graft.sources.WriterLease.withLease(spark, dir, "compactIndex") {
      val node = graft.sources.BucketedStore.readMeta(spark, dir, "index.meta.json")
      val buckets = node.get("buckets").asInt()
      // each fold can outlive the lease TTL at scale: renew at the fencing
      // point (post-rewrite, pre-flip) so a TTL-broken lease aborts the
      // compaction BEFORE it flips a generation a new writer appends into
      val fence = () =>
        graft.sources.WriterLease.renew(spark, dir, "compactIndex")
      graft.sources.BucketedStore.compact(spark, s"$dir/band",
        Seq("band", "bh"), buckets, beforeFlip = fence)
      graft.sources.BucketedStore.compact(spark, s"$dir/grams",
        Seq("id"), buckets, beforeFlip = fence)
    }

  /** Reclaim the superseded generations [[compactIndex]] left for its
    * concurrent readers, keeping the current generation plus `keepPrior`
    * predecessors as the grace window (see
    * [[graft.sources.BucketedStore.vacuum]]). Call on the compaction
    * cadence, one cycle behind it. */
  def vacuumIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                  keepPrior: Int = 1): Unit =
    graft.sources.WriterLease.withLease(spark, dir, "vacuumIndex") {
      graft.sources.BucketedStore.vacuum(spark, s"$dir/band", keepPrior)
      graft.sources.BucketedStore.vacuum(spark, s"$dir/grams", keepPrior)
    }

  /** Fragmentation + storage health of a persisted index, per layout
    * ("band", "grams") — one file listing each, no data read. Feed the
    * ingest cadence: `maxFilesPerBucket` grows by up to 1 per
    * [[appendIndex]], and when it crosses the serving-latency budget,
    * [[maintainIndex]] folds it back to 1. */
  def indexStats(spark: org.apache.spark.sql.SparkSession, dir: String):
      Map[String, graft.sources.BucketedStore.LayoutStats] =
    Map("band" -> graft.sources.BucketedStore.stats(spark, s"$dir/band"),
        "grams" -> graft.sources.BucketedStore.stats(spark, s"$dir/grams"))

  /** Policy-driven upkeep under ONE writer lease: compact each layout
    * whose per-bucket file count exceeds `maxFilesPerBucket` (renew-
    * fenced at each pointer flip, like [[compactIndex]]), then vacuum
    * superseded generations past the `keepPrior` grace window. The
    * steady-state call for an ingest loop — cheap when healthy (two file
    * listings), a fold only when fragmentation crossed the budget.
    * Returns the layouts it compacted. */
  def maintainIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                    maxFilesPerBucket: Int = 4,
                    keepPrior: Int = 1): Seq[String] =
    graft.sources.WriterLease.withLease(spark, dir, "maintainIndex") {
      val node = graft.sources.BucketedStore.readMeta(spark, dir, "index.meta.json")
      val buckets = node.get("buckets").asInt()
      val fence = () =>
        graft.sources.WriterLease.renew(spark, dir, "maintainIndex")
      Seq("band" -> Seq("band", "bh"), "grams" -> Seq("id")).collect {
        case (layout, keys) if graft.sources.BucketedStore.maintain(
            spark, s"$dir/$layout", keys, buckets, maxFilesPerBucket,
            keepPrior, beforeFlip = fence) => layout
      }
    }

  /** [[maintainIndex]] for a persisted CDC chunk index. */
  def maintainChunkIndex(spark: org.apache.spark.sql.SparkSession,
                         dir: String, maxFilesPerBucket: Int = 4,
                         keepPrior: Int = 1): Boolean =
    graft.sources.WriterLease.withLease(spark, dir, "maintainChunkIndex") {
      val node = graft.sources.BucketedStore.readMeta(spark, dir,
        "chunkindex.meta.json")
      graft.sources.BucketedStore.maintain(spark, s"$dir/hashes",
        Seq("hash"), node.get("buckets").asInt(), maxFilesPerBucket,
        keepPrior, beforeFlip = () =>
          graft.sources.WriterLease.renew(spark, dir, "maintainChunkIndex"))
    }

  /** Re-attach an index persisted by [[saveIndex]]: registers the stored
    * files as EXTERNAL bucketed tables (schema read from the parquet
    * footers, bucket spec from the meta) — no data is moved and no
    * shuffle is paid; the scan reports the stored hash-partitioning and
    * [[matchAgainst]]'s (band, bh) join plans with NO Exchange on the
    * index side (StreamingSpec pins the plan). */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                dir: String): NearDupIndex = {
    val node = graft.sources.BucketedStore.readMeta(spark, dir, "index.meta.json")
    NearDupIndex(
      graft.sources.BucketedStore.attach(spark, s"$dir/band",
        Seq("band", "bh"), node.get("buckets").asInt(),
        metaSchema(node, "bandSchema")),
      graft.sources.BucketedStore.attach(spark, s"$dir/grams",
        Seq("id"), node.get("buckets").asInt(),
        metaSchema(node, "gramSchema")),
      node.get("numHashes").asInt(), node.get("bands").asInt(),
      node.get("shingleK").asInt())
  }
}
