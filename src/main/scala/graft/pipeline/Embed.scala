package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hashed random-projection document embeddings — the
  * model-free text→vector bridge into the ANN/semantic-dedup stack
  * (Similarity.*, Dedup.semanticDedup): every unigram/bigram contributes a
  * content-hash ±1 to each of `dims` components (a signed random
  * projection of the hashed bag-of-n-grams — SimHash's real-valued
  * cousin; random projections preserve cosine structure by the
  * Johnson–Lindenstrauss lemma), then each doc's vector L2-normalizes.
  * Near-duplicate texts land at cosine ≈ 1, unrelated texts decorrelate —
  * enough for dedup blocking, clustering, and kNN recall stages without
  * any external model, and a drop-in `(id, Array[Float])` for the
  * embedding operators.
  *
  * Scale shape: each gram emits its ±1 sign VECTOR once (a single array
  * column — no dims× row explosion), and the per-doc elementwise sum is
  * `dims` map-side-combinable integer `sum` slots of ONE hash aggregate,
  * so the shuffle carries one `dims`-wide partial row per (doc,
  * partition) instead of grams×dims rows — at dims=64 that is a 64×
  * smaller shuffle than the exploded formulation. Components are exact
  * INTEGER sums, so the result is bit-deterministic under any
  * partitioning, and the md5-derived signs replay in SQL. */
object Embed {

  /** The gram's ±1 sign for one dimension: md5("<gram>|<dim>") first 4
    * hex chars' parity — content-addressed, engine-portable. Kept as the
    * differential oracle for [[graft.functions.SignedGramSums]], which
    * evaluates the identical md5 parity fused over the in-row gram array
    * (HashExprsSpec pins bit-equality against this formulation). */
  private[graft] def sign(g: Column, dim: Int): Column =
    (conv(substring(md5(concat_ws("|", g, lit(dim))), 1, 4), 16, 10)
      .cast("int") % 2 * 2 - 1).cast("long")

  /** Unigram+bigram OCCURRENCE array, in-row — the array form of
    * [[Selection.grams]]'s exploded stream (same tokenizer, same
    * concat_ws(" ") bigrams, same multiset of grams per doc). */
  private[graft] def gramArray(textCol: String): Column = {
    val ts = filter(split(lower(trim(col(textCol))), "[^a-z0-9]+"),
      t => length(t) > 0)
    concat(ts,
      zip_with(
        slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
        slice(ts, lit(2), greatest(size(ts) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)))
  }

  /** Long form: (doc_id, dim, v) with v = round(component/‖·‖₂, 6) —
    * the oracle-friendly shape. */
  def docEmbedLong(docs: DataFrame, dims: Int = 16,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dims >= 2 && dims <= 256, s"docEmbed: dims=$dims")
    // component sums fused IN-ROW over the gram array
    // ([[graft.functions.SignedGramSums]]): the previous shape exploded
    // every gram occurrence and hash-aggregated dims sum slots back to one
    // row per doc — a corpus-of-grams-sized aggregation (plus one md5 PER
    // (occurrence, dim)) for sums each row can compute locally. Now the
    // scan stays narrow (zero shuffle) and the md5 runs once per DISTINCT
    // gram per dim. Gram-less docs yield a zero vector, dropped by the
    // same n > 0 guard that dropped their absent rows before.
    val comp = docs.select(col(idCol).as("doc_id"),
      graft.functions.SignedGramSums(gramArray(textCol), dims).as("cs"))
    comp
      .select(col("doc_id"),
        sqrt(aggregate(col("cs"), lit(0L), (a, x) => a + x * x).cast("double"))
          .as("n"),
        posexplode(col("cs")).as(Seq("dim", "c")))
      .where(col("n") > 0.0)
      .select(col("doc_id"), col("dim").cast("int").as("dim"),
        round(col("c").cast("double") / col("n"), 6).as("v"))
  }

  /** Vector form for the ANN stack: (doc_id, embedding Array[Float]). */
  def docEmbed(docs: DataFrame, dims: Int = 16,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docEmbedLong(docs, dims, idCol, textCol)
      .groupBy("doc_id")
      .agg(transform(
        sort_array(collect_list(struct(col("dim"), col("v")))),
        x => x.getField("v").cast("float")).as("embedding"))
}
