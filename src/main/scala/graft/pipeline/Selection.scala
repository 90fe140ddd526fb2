package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StructField, StructType}

/** Data selection via importance resampling — DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): score every raw-corpus document by how much more
  * likely its hashed n-gram bag is under a TARGET distribution (the data
  * you wish you had more of — a curated corpus, an eval domain) than under
  * the RAW distribution, then keep the top of the ranking. The importance
  * log-weight of doc x is
  *
  *   log w(x) = Σ_{g ∈ grams(x)} [ ln p_target(h(g)) − ln p_raw(h(g)) ]
  *
  * with grams = unigrams + bigrams, h = a B-bucket feature hash (the
  * paper's hashed generative model), and each bucket model add-λ smoothed:
  * p(b) = (c_b + λ)/(C + λB).
  *
  * Scale shape: the ONLY corpus-sized work is the gram explode and one
  * (doc, bucket) count aggregation (map-side combinable). Both bucket
  * models are ≤ B rows — BROADCAST — so scoring is a narrow map-side join
  * over the doc-bucket counts; nothing doc×target ever forms. Selection is
  * a bounded TakeOrdered (top-n), not a global sort.
  *
  * Determinism: per-bucket log-ratios are 6dp-rounded and the per-doc sum
  * runs in DECIMAL (the lmScore discipline), so scores and ranks replay
  * bit-for-bit in a SQL oracle; the feature hash is the same md5 bucket
  * as [[Sampling.hashBucket]] — engine-portable, partitioning-invariant. */
object Selection {

  private def toks(c: Column): Column =
    filter(split(lower(trim(c)), "[^a-z0-9]+"), t => length(t) > 0)

  /** Unigram + bigram stream: one row per gram OCCURRENCE. */
  private[graft] def grams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts = toks(col(textCol))
    df.select(col(idCol).as("doc_id"), ts.as("__t"))
      .select(col("doc_id"), explode(concat(col("__t"),
        zip_with(
          slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
          slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b)))).as("g"))
  }

  /** Each corpus's raw-corpus-side artifact: the (doc_id, bucket, n)
    * count frame, one gram pass, map-side-combinable aggregation. Public
    * to the plan contract tests: this prepass is where the corpus-sized
    * work (and the partial aggregation) lives. */
  private[graft] def docBucketCounts(df: DataFrame, buckets: Int,
                                        idCol: String, textCol: String): DataFrame =
    grams(df, idCol, textCol)
      .select(col("doc_id"), Sampling.hashBucketMemo(col("g"), buckets).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))

  /** DSIR importance log-weights for every raw doc with ≥ 1 gram:
    * (doc_id, n_grams, dsir_logw).
    *
    * ONE gram pass per corpus: the raw corpus's (doc, bucket, n) counts
    * are pinned and BOTH reused — the raw bucket model is their per-bucket
    * roll-up (collected: ≤ B rows), and scoring joins the pinned counts
    * against the two broadcast model tables. The previous shape exploded
    * the raw gram stream twice (model pass + scoring pass) and ran two
    * extra total-count jobs. */
  def dsirWeights(raw: DataFrame, target: DataFrame, buckets: Int = 512,
                  lambda: Double = 1.0, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    // the returned LAZY plan reads the pinned (doc, bucket, n) counts —
    // the pin lives until the frame is unreferenced (ContextCleaner).
    // The materializing selectors below release it eagerly instead.
    dsirWeightsPinned(raw, target, buckets, lambda, idCol, textCol)._1

  private def dsirWeightsPinned(raw: DataFrame, target: DataFrame,
                  buckets: Int, lambda: Double, idCol: String,
                  textCol: String): (DataFrame, DataFrame) = {
    require(buckets > 0 && lambda > 0.0, s"dsir: buckets=$buckets lambda=$lambda")
    import graft.rel.Checkpoint.PinOps
    val spark = raw.sparkSession
    import spark.implicits._

    // target model: one gram pass, ≤ B rows collected; total in driver
    val tcRows = grams(target, idCol, textCol)
      .select(Sampling.hashBucketMemo(col("g"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val tTot = tcRows.map(_._2).sum
    // raw corpus: ONE gram pass into pinned (doc, bucket, n); the raw
    // model rolls up from it instead of re-exploding the corpus
    val docBuckets = docBucketCounts(raw, buckets, idCol, textCol).pin()
    val rcRows = docBuckets.groupBy("bucket").agg(sum(col("n")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val rTot = rcRows.map(_._2).sum
    val tDen = tTot.toDouble + lambda * buckets
    val rDen = rTot.toDouble + lambda * buckets
    val tc = tcRows.toSeq.toDF("bucket", "ct")
    val rc = rcRows.toSeq.toDF("bucket", "cr")

    val weights = docBuckets
      .join(broadcast(tc), Seq("bucket"), "left")
      .join(broadcast(rc), Seq("bucket"), "left")
      .select(col("doc_id"), col("n"),
        ((round(log((coalesce(col("ct"), lit(0L)) + lambda) / lit(tDen)), 6) -
          round(log((coalesce(col("cr"), lit(0L)) + lambda) / lit(rDen)), 6))
          .cast(DecimalType(18, 6)) * col("n")).as("w"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_grams"),
        round(sum(col("w")).cast("double"), 6).as("dsir_logw"))
    (weights, docBuckets)
  }

  /** Gumbel-max importance RESAMPLING — the paper's actual selection mode:
    * draw n docs WITHOUT replacement with probability ∝ exp(logw) by
    * taking the top n of logw + Gumbel(0,1) noise (the Gumbel-max trick).
    * The "noise" is content-hash derived (md5 of the doc id → uniform in
    * (0,1) → −ln(−ln u)), so the sample is DETERMINISTIC, partitioning-
    * invariant, and SQL-replayable — rerunning the pipeline reselects the
    * same docs, and growing the corpus only perturbs selection where
    * weights actually compete. Output (doc_id, n_grams, dsir_logw, key,
    * rank) ranked by the perturbed key. */
  /** Materialize a bounded TakeOrdered result with a dense 1-based rank
    * column, CARRYING the input id column's type (string URLs rank as
    * happily as bigint ids — no hardcoded LongType). The collect is a
    * driver-side top-n of ≤ n rows, not a corpus materialization. */
  private def withRank(ordered: DataFrame, n: Int): DataFrame = {
    val spark = ordered.sparkSession
    val top = ordered.limit(n).collect()
    val schema = StructType(ordered.schema.fields.map(_.copy(nullable = false)) :+
      StructField("rank", IntegerType, nullable = false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(top.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1))
      }.toSeq, 1), schema)
  }

  def dsirSample(raw: DataFrame, target: DataFrame, n: Int,
                 buckets: Int = 512, lambda: Double = 1.0,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // uniform in (0,1): 8 md5 hex chars → [0, 2^32), then (x+0.5)/2^32
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / lit(4294967296.0)
    val (w, pin) = dsirWeightsPinned(raw, target, buckets, lambda, idCol, textCol)
    val keyed = w.withColumn("key", round(col("dsir_logw") - log(-log(u)), 6))
    // withRank materializes the ≤ n winners — release the corpus pin now
    try withRank(keyed.orderBy(desc("key"), asc("doc_id")), n)
    finally { import graft.rel.Checkpoint.PinOps; pin.unpin() }
  }

  /** Top-`n` raw docs by importance weight (desc, doc_id asc tie-break),
    * with 1-based rank — the deterministic "take the most target-like
    * slice" selection; [[dsirSample]] is the proportional variant. */
  def dsirSelect(raw: DataFrame, target: DataFrame, n: Int,
                 buckets: Int = 512, lambda: Double = 1.0,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (w, pin) = dsirWeightsPinned(raw, target, buckets, lambda, idCol, textCol)
    try withRank(w.orderBy(desc("dsir_logw"), asc("doc_id")), n)  // TakeOrdered
    finally { import graft.rel.Checkpoint.PinOps; pin.unpin() }
  }
}
