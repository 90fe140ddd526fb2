package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus retrieval scoring — the "find the training docs most relevant to
  * this probe" primitive (eval-set attribution, targeted decontamination,
  * quality-by-retrievability audits all reduce to it). Okapi BM25 with the
  * conventional (k1+1) numerator:
  *
  *   score(q,d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *   idf(t)     = ln((N − df + 0.5)/(df + 0.5) + 1)
  *
  * Scale shape: the ONLY corpus-sized stages are the token explode and the
  * (doc, term) tf aggregation (map-side combinable). Query terms are a
  * BROADCAST — the tf stream is filtered map-side to terms that appear in
  * some query, so df counting, scoring, and ranking all run on the
  * matched-candidate subset, never the corpus×query cross product. Ranking
  * uses the same two-phase top-k as the ANN stack (local top-k per
  * (query, input partition), then a ≤ k·P merge) — a stopword-ish query
  * matching the whole corpus never concentrates on one reducer.
  *
  * Determinism: per-term contributions are 6dp-rounded and summed as
  * DECIMAL (the lmScore discipline, TextAnalysis.scala:344), so partition
  * order cannot move a score and a SQL oracle replays ranks bit-for-bit;
  * ties break by ascending doc id. */
object Retrieval {

  private def toks(c: Column): Column =
    filter(split(lower(trim(c)), "[^a-z0-9]+"), t => length(t) > 0)

  /** BM25 top-k docs per query. `queries`: (query_id, qtext). Output:
    * (query_id, doc_id, score, rank) with rank 1-based per query —
    * MATERIALIZED (≤ k rows per query) so every corpus-sized intermediate
    * pin (inverted index, doc lengths, candidate slice) is released
    * before returning; a deployment that reuses the index across many
    * query batches should lift the tf/dl build out and keep its own pin. */
  def bm25(docs: DataFrame, queries: DataFrame, k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text",
           qIdCol: String = "query_id", qTextCol: String = "qtext"): DataFrame = {
    import graft.rel.Checkpoint.PinOps
    val (lazyResult, pins) =
      bm25Lazy(docs, queries, k, k1, b, idCol, textCol, qIdCol, qTextCol)
    // the answer is BOUNDED (≤ k rows per query): pin it eagerly so the
    // corpus-sized intermediates can be released right now — without
    // this, cand and dl stayed in block storage for the life of the
    // returned (lazy) frame on every one-shot bm25 call
    val result = lazyResult.pin()
    pins.foreach(_.unpin())
    result
  }

  /** The scoring PLAN without the final materialization — what the plan
    * contract inspects; [[bm25]] is this plus pin-and-release. Returns the
    * lazy top-k frame and the intermediate pins its lineage reads. */
  private[graft] def bm25Lazy(docs: DataFrame, queries: DataFrame, k: Int,
           k1: Double, b: Double, idCol: String, textCol: String,
           qIdCol: String, qTextCol: String): (DataFrame, Seq[DataFrame]) = {
    val spark = docs.sparkSession
    import graft.rel.Checkpoint.PinOps

    // ONE tokenize pass + ONE (doc, term) aggregation, PINNED — this is
    // the inverted-index artifact a retrieval deployment persists anyway;
    // unpinned, the stats scalar, the df count, and the scoring join each
    // replayed the whole corpus explode (three tokenize passes measured)
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .pin()
    // doc length = Σ tf over the doc's terms — derived from the pinned
    // index, no re-tokenization (identical to counting the token array)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl")).pin()

    // corpus stats: two scalars (rows, Σdl) to the driver — same pattern
    // as tfidf's N
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).collect()(0)
    val nDocs = stats.getAs[Long]("n")
    require(nDocs > 0, "bm25: empty corpus")
    val avgdl = stats.getAs[Long]("s").toDouble / nDocs.toDouble

    // query terms, deduped per query; the broadcast that keeps everything
    // downstream candidate-sized
    val qTerms = queries.select(col(qIdCol).as("query_id"),
        explode(toks(col(qTextCol))).as("term"))
      .distinct()
    // candidate slice of the index (rows whose term some query mentions) —
    // pinned so df counting and scoring share one filter pass
    val cand = tf.join(broadcast(qTerms.select("term").distinct()), "term").pin()
    // tf is fully consumed: dl and cand (both eager pins) absorbed it —
    // release its blocks now instead of leaking them until GC
    tf.unpin()
    val dfreq = cand.groupBy("term").agg(count(lit(1)).as("df"))

    val contrib = cand.join(broadcast(qTerms), "term")
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"),
        round(
          log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * (k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl)))),
          6).cast(DecimalType(18, 6)).as("w"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(round(sum(col("w")).cast("double"), 6).as("score"))

    // two-phase top-k (Similarity.topK shape, score desc / doc_id asc)
    val packed = struct((-col("score")).as("ns"), col("doc_id").as("d"))
    val local = scored
      .groupBy(col("query_id"), spark_partition_id().as("__pid"))
      .agg(slice(sort_array(collect_list(packed)), 1, k).as("top"))
    val merged = local.select(col("query_id"), explode(col("top")).as("t"))
      .groupBy(col("query_id"))
      .agg(slice(sort_array(collect_list(col("t"))), 1, k).as("top"))
    val result = merged
      .select(col("query_id"), posexplode(col("top")).as(Seq("__i", "t")))
      .select(col("query_id"), col("t.d").as("doc_id"),
        (-col("t.ns")).as("score"), (col("__i") + 1).as("rank"))
    (result, Seq(cand, dl))
  }
}
