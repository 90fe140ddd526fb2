package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence shaping: splitting long documents into context-window
  * chunks, and packing short documents into fixed token-budget training
  * sequences — the two ends of the "make every training row ~N tokens"
  * step that sits between corpus cleaning and the tokenizer.
  *
  * Chunking is a pure narrow map (split → slice per chunk index): no
  * shuffle at any scale, stays in whole-stage codegen.
  *
  * Packing is inherently sequential (pack membership depends on every
  * earlier document in the stream), so it is SHARDED: documents are
  * assigned to `buckets` deterministic shards (`doc_id % buckets`) and the
  * greedy first-fit walk runs independently per shard — one shuffle on the
  * shard key, then a single sorted pass per shard. At 100 TB you raise
  * `buckets` to ~10× the executor count: each shard's walk is a streaming
  * iterator (O(1) state — no shard ever materializes in memory), and
  * shards run fully parallel. Output is a pure function of (doc_id, token
  * count), independent of partitioning or cluster size.
  */
object Pack {

  /** Split each document into chunks of `chunkTokens` whitespace tokens
    * with `overlap` tokens carried between consecutive chunks (stride =
    * chunkTokens - overlap). A document of ≤ chunkTokens tokens yields one
    * chunk; empty/blank documents yield none. Chunk `i` covers tokens
    * [i·stride, i·stride + chunkTokens); the last chunk starts while more
    * than `overlap` tokens remain, so no chunk is a suffix of its
    * predecessor. */
  def chunkSplit(docs: DataFrame, chunkTokens: Int = 40, overlap: Int = 10,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0),
          greatest(
            ceil((size(col("__toks")) - overlap).cast("double") / stride).cast("int"),
            lit(1)) - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk"),
        size(slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
          .as("n_tokens"))
  }

  /** Greedy first-fit sequence packing: walk each shard's documents in
    * doc_id order, accumulating whitespace token counts; when adding a
    * document would exceed `budget`, start a new pack. Token counts are
    * capped at `budget` so every document fits in some pack. Returns
    * (doc_id, bucket, pack_id, n_tokens) with pack_id numbered from 0
    * within each bucket — deterministic for a given (budget, buckets)
    * regardless of partitioning. */
  def packGreedy(docs: DataFrame, budget: Int = 256, buckets: Int = 8,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0 && buckets > 0)
    val s = docs.sparkSession
    import s.implicits._
    // one row per doc BEFORE the shuffle: only (id, bucket, tok) rides it,
    // never the text column
    val slim = docs.select(
        col(idCol).cast("long").as("doc_id"),
        pmod(col(idCol).cast("long"), lit(buckets.toLong)).as("bucket"),
        least(TextAnalysis.tokenCount(col(textCol)), lit(budget)).cast("int")
          .as("n_tokens"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .as[(Long, Long, Int)]
    // a partition may hold several whole buckets (hash co-location); the
    // walk resets its accumulator at each bucket boundary, so results are
    // identical however buckets land on partitions
    slim.mapPartitions { it =>
      var curBucket = Long.MinValue
      var pack = 0L
      var acc = 0
      it.map { case (id, b, tok) =>
        if (b != curBucket) { curBucket = b; pack = 0L; acc = tok }
        else if (acc + tok > budget) { pack += 1; acc = tok }
        else acc += tok
        (id, b, pack, tok)
      }
    }.toDF("doc_id", "bucket", "pack_id", "n_tokens")
  }

  /** Per-pack summary of [[packGreedy]]'s output: documents per pack and
    * fill ratio vs the budget — the packing-efficiency report. */
  def packStats(packed: DataFrame, budget: Int): DataFrame =
    packed.groupBy("bucket", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .withColumn("fill_ratio",
        round(col("pack_tokens").cast("double") / budget, 6))

  /** Write packed training shards: one parquet directory per bucket
    * (`bucket=N/`), rows sorted by (pack_id, doc_id) WITHIN each file so
    * a shard reader streams whole packs in order without a sort. The
    * text column joins back only here — it never rode the packing
    * shuffle. partitionBy gives the standard hive layout a trainer's
    * data loader lists; one file per bucket (each bucket is one
    * partition after repartition), so file count = shard count, not
    * shard × task count. */
  def writeShards(packed: DataFrame, docs: DataFrame, path: String,
                  idCol: String = "doc_id", textCol: String = "text"): Unit =
    packed
      .join(docs.select(col(idCol).cast("long").as("doc_id"), col(textCol)), "doc_id")
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "pack_id", "doc_id")
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Same shard layout as [[writeShards]] but JSON-Lines files — the
    * interchange format tokenizer/training loaders consume directly. Row
    * order inside each shard file is identical to the parquet writer
    * (pack-contiguous, doc-ordered), so a sequential reader sees whole
    * packs in order; compression is the standard per-file gzip a JSONL
    * loader expects. Same one-file-per-bucket property: file count =
    * shard count at any corpus size. */
  def writeShardsJsonl(packed: DataFrame, docs: DataFrame, path: String,
                       idCol: String = "doc_id", textCol: String = "text"): Unit =
    packed
      .join(docs.select(col(idCol).cast("long").as("doc_id"), col(textCol)), "doc_id")
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "pack_id", "doc_id")
      .write.mode("overwrite").partitionBy("bucket")
      .option("compression", "gzip").json(path)
}
