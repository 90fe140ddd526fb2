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
    * hex chars' parity — content-addressed, engine-portable. */
  private def sign(g: Column, dim: Int): Column =
    (conv(substring(md5(concat_ws("|", g, lit(dim))), 1, 4), 16, 10)
      .cast("int") % 2 * 2 - 1).cast("long")

  /** Long form: (doc_id, dim, v) with v = round(component/‖·‖₂, 6) —
    * the oracle-friendly shape. */
  def docEmbedLong(docs: DataFrame, dims: Int = 16,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dims >= 2 && dims <= 256, s"docEmbed: dims=$dims")
    val g = Selection.grams(docs, idCol, textCol)
    // one ±1 per dimension as `dims` columns of the SAME row — the sum
    // aggregate below combines map-side, so no row ever multiplies
    val comp = g.groupBy("doc_id")
      .agg(sum(sign(col("g"), 0)).as("c0"),
        (1 until dims).map(d => sum(sign(col("g"), d)).as(s"c$d")): _*)
      .select(col("doc_id"),
        array((0 until dims).map(d => col(s"c$d")): _*).as("cs"))
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
