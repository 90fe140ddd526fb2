package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
  * Scale shape: one gram explode × dims (dims is small — 16/32/64), ONE
  * map-side-combinable (doc, dim) sum of ±1 ints, one doc-grouped
  * normalize. Components are exact INTEGER sums, so the result is
  * bit-deterministic under any partitioning, and the md5-derived signs
  * replay in SQL. */
object Embed {

  /** Long form: (doc_id, dim, v) with v = round(component/‖·‖₂, 6) —
    * the oracle-friendly shape. */
  def docEmbedLong(docs: DataFrame, dims: Int = 16,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dims >= 2 && dims <= 256, s"docEmbed: dims=$dims")
    val g = Selection.grams(docs, idCol, textCol)
    val comp = g.select(col("doc_id"),
        explode(sequence(lit(0), lit(dims - 1))).as("dim"),
        col("g"))
      .select(col("doc_id"), col("dim"),
        // content-hash sign: md5("<gram>|<dim>") parity → ±1
        (conv(substring(md5(concat_ws("|", col("g"), col("dim"))), 1, 4), 16, 10)
          .cast("int") % 2 * 2 - 1).as("s"))
      .groupBy("doc_id", "dim").agg(sum(col("s")).as("c"))
    val norms = comp.groupBy("doc_id")
      .agg(sqrt(sum(col("c") * col("c")).cast("double")).as("n"))
    comp.join(norms, "doc_id")
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
