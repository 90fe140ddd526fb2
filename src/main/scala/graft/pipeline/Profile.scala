package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus profiling: the diagnostics a pipeline runs over an unfamiliar
  * 100 TB table BEFORE planning joins and dedup passes — per-column
  * profiles (row/distinct counts, value range) and key-skew reports
  * (which keys are hot, and how hot, to decide broadcast vs salt vs
  * plain shuffle).
  *
  * Scale shape:
  *   - [[tableProfile]] is ONE scan: a single Aggregate carrying every
  *     per-column statistic (Spark plans multi-distinct aggregates with
  *     one Expand — no per-column rescans of the table), then a constant
  *     `stack` unpivot of the single result row.
  *   - [[skewReport]] is one hash shuffle on the key (map-side partial
  *     counts), a 1-row grand-total broadcast joined back onto the
  *     per-key aggregate (never onto the data), and a distributed
  *     TakeOrderedAndProject for the top-k — no global window, no
  *     driver-side sort of the key space.
  */
object Profile {

  /** Per-column profile of `cols`: row count, distinct count, min/max
    * (rendered as text so heterogeneous column types share one output
    * schema). One row per profiled column. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableProfile: no columns")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__n_$c`, `__d_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(col_name, n_rows, n_distinct, min_value, max_value)"))
  }

  /** The 100 TB profile path: same shape as [[tableProfile]] but distinct
    * counts come from HLL++ (`approx_count_distinct`, default rsd 2%).
    * Exact multi-column distinct counting makes Catalyst EXPAND the scan
    * (#cols+1 row copies through the aggregation — a 5-column profile
    * reads the corpus once but aggregates it six-fold); the sketch version
    * is a true single pass with one fixed-size buffer per column and no
    * Expand (PlanSpec asserts the contrast). Use exact for gated results,
    * approx for routine corpus health checks. */
  def tableProfileApprox(df: DataFrame, cols: Seq[String],
                         rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "tableProfileApprox: no columns")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        approx_count_distinct(col(c), rsd).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__n_$c`, `__d_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(col_name, n_rows, n_distinct, min_value, max_value)"))
  }

  /** Per-label embedding coherence: vector count and the norm of the
    * label's mean vector (→1 = tight cluster, →0 = isotropic noise) — the
    * stat that predicts whether IVF partitioning / SemDeDup cluster
    * pruning will bite on this corpus. The centroid is a posexplode +
    * per-(label, dim) mean — partial-aggregable, the standard distributed
    * mean-vector shape; per-element values and squared components are
    * quantized and decimal-summed so the parallel accumulation order
    * cannot move the 6-dp result (the repo's determinism policy). */
  def embeddingCoherence(emb: DataFrame, labelCol: String = "label",
                         vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(labelCol).as("label"),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
    val cen = e.groupBy("label", "pos").agg(
      (sum(round(col("v").cast("double"), 6).cast(DecimalType(18, 6)))
        .cast("double") / count(lit(1))).as("c"))
    val ss = cen.groupBy("label").agg(
      sum(round(col("c") * col("c"), 12).cast(DecimalType(18, 12)))
        .cast("double").as("__ss"))
    val n = emb.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    n.join(ss, "label")
      .select(col("label"), col("n_vecs"),
        round(sqrt(col("__ss")), 6).as("centroid_norm"))
  }

  /** EXACT type-1 discrete quantiles (qLo, qHi) of an integral metric via
    * the histogram route: one map-side-combinable `groupBy(value)` shuffle
    * whose result is bounded by the metric's DISTINCT-VALUE count — not
    * the row count — so the driver-side cumulative walk is O(distinct)
    * regardless of corpus size (document lengths, token counts, and other
    * pipeline metrics have ≲ 10^6 distinct values at any corpus scale; the
    * guard fails loud if that assumption breaks rather than OOM the
    * driver). Exact selection — unlike `approxQuantile` — so a band filter
    * built on the thresholds is reproducible bit-for-bit across runs and
    * cluster layouts. Returns the values at ranks ceil(q·n) in ascending
    * order (ties need no tie-break: the value at a global rank is
    * determined by the value ordering alone). */
  def quantileBand(df: DataFrame, valueCol: String, qLo: Double, qHi: Double,
                   maxDistinct: Int = 1 << 22): (Long, Long) = {
    // LIMIT maxDistinct+1 bounds what ever reaches the driver: a
    // high-cardinality metric trips the require on a truncated (bounded)
    // collect instead of materializing the full histogram first. When the
    // guard passes, the limit was a no-op and the histogram is complete.
    val hist = df.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .orderBy("v")
      .limit(maxDistinct + 1)
      .collect()
    require(hist.nonEmpty, s"quantileBand: $valueCol has no rows")
    require(hist.length <= maxDistinct,
      s"quantileBand: over $maxDistinct distinct values of $valueCol — " +
        s"exceeds the driver histogram bound; bucket the metric first")
    val n = hist.iterator.map(_.getLong(1)).sum
    def at(k: Long): Long = {
      var cum = 0L
      hist.iterator.map { r => cum += r.getLong(1); (r.getLong(0), cum) }
        .collectFirst { case (v, c) if c >= k => v }
        .getOrElse(hist.last.getLong(0))
    }
    (at(math.max(1L, math.ceil(qLo * n).toLong)),
      at(math.max(1L, math.ceil(qHi * n).toLong)))
  }

  /** Centered-norm report: per vector, ‖v − μ‖ where μ is the corpus mean
    * vector — the whitening diagnostic run before IVF/SemDeDup training
    * (embeddings clustered far off-origin make raw cosine discriminate
    * poorly; centering restores contrast). Same distributed shape as
    * [[embeddingCoherence]]: one per-dim partial-aggregable mean, the
    * (dims × 1) mean table broadcast back onto the exploded stream, one
    * per-vector rollup. Decimal-quantized accumulation both passes so the
    * result is partitioning-invariant at 6 dp. */
  def centeredNorms(emb: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).as("vec_id"),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
    val cen = e.groupBy("pos").agg(
      (sum(round(col("v").cast("double"), 6).cast(DecimalType(18, 6)))
        .cast("double") / count(lit(1))).as("c"))
    e.join(broadcast(cen), "pos")
      .withColumn("__d", col("v").cast("double") - col("c"))
      .groupBy("vec_id")
      .agg(round(sqrt(
        sum(round(col("__d") * col("__d"), 12).cast(DecimalType(20, 12)))
          .cast("double")), 6).as("centered_norm"))
  }

  /** Top-k hottest keys with their count and share of all rows — the
    * pre-join skew report. Deterministic under ties (count desc, key asc).
    * `key` must be a simple column or expression; the output names it
    * `key`. */
  /** Precision/recall curve of a score column against a boolean label at
    * fixed thresholds — the "where do I set the quality-filter cutoff"
    * report every classifier-gated pipeline needs before it throws data
    * away. ONE scan: every (threshold × {tp, fp, fn}) counter is an
    * expression in a single aggregate, and the one result row unpivots to
    * per-threshold rows inside the plan (explode of structs — the
    * [[piiProfile]] shape, zero driver hops). precision/recall are
    * 6dp-rounded; f1 is computed FROM the rounded p/r (so a SQL oracle
    * replays all three bit-for-bit). Thresholds apply as score ≥ t. */
  def prCurve(df: DataFrame, score: Column, label: Column,
              thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "prCurve: no thresholds")
    val aggs: Seq[Column] = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(score >= t && label, 1L).otherwise(0L)).as(s"tp_$i"),
        sum(when(score >= t && !label, 1L).otherwise(0L)).as(s"fp_$i"),
        sum(when(score < t && label, 1L).otherwise(0L)).as(s"fn_$i"))
    }
    def ratio(num: Column, den: Column): Column =
      when(den === 0L, lit(0.0))
        .otherwise(round(num.cast("double") / den, 6))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(thresholds.zipWithIndex.map { case (t, i) =>
        val (tp, fp, fn) = (col(s"tp_$i"), col(s"fp_$i"), col(s"fn_$i"))
        val p = ratio(tp, tp + fp)
        val r = ratio(tp, tp + fn)
        struct(lit(t).as("thr"), tp.as("tp"), fp.as("fp"), fn.as("fn"),
          p.as("precision"), r.as("recall"),
          when(p + r === 0.0, lit(0.0))
            .otherwise(round(lit(2.0) * p * r / (p + r), 6)).as("f1"))
      }: _*)).as("r"))
      .select(col("r.thr"), col("r.tp"), col("r.fp"), col("r.fn"),
        col("r.precision"), col("r.recall"), col("r.f1"))
  }

  def skewReport(df: DataFrame, key: Column, k: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("__tot"), 6).as("share"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(k)
  }

  /** PII column profile: which string columns of a table contain personal
    * data, and how much — the scan a privacy review runs before a corpus
    * ships. Per column: row count and the fraction of rows containing at
    * least one email / URL / IPv4 / phone match (the same RE2-compatible
    * patterns [[TextAnalysis.scrubAll]] masks, so profile-then-scrub is
    * consistent by construction). ONE aggregate over ONE scan for ALL
    * columns — every (column × detector) fraction is an expression in a
    * single `agg`, each detector a codegen'd `rlike`; the one result row
    * unpivots to the per-column report shape INSIDE the plan (an explode
    * of cols.length structs — no driver round trip, one job). */
  def piiProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "piiProfile: no columns")
    val detectors = Seq(
      "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "url" -> "https?://\\S+",
      "ip" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
      "phone" -> "\\+\\d{7,15}\\b|\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      detectors.map { case (name, re) =>
        round(sum(when(col(c).rlike(re), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as(s"${c}__$name")
      }
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column"), col("n_rows"),
          col(s"${c}__email").as("email_frac"),
          col(s"${c}__url").as("url_frac"),
          col(s"${c}__ip").as("ip_frac"),
          col(s"${c}__phone").as("phone_frac"))
      }: _*)).as("r"))
      .select(col("r.column"), col("r.n_rows"), col("r.email_frac"),
        col("r.url_frac"), col("r.ip_frac"), col("r.phone_frac"))
  }

  /** Distribution drift between two corpus versions: the population
    * stability index (PSI), per named bucket dimension — the "did the
    * refreshed crawl change what we're training on" monitor that runs
    * before anyone retrains on a new snapshot. PSI per bucket =
    * (p₂ − p₁)·ln((p₂+ε)/(p₁+ε)); conventional reading of the per-dim sum:
    * <0.1 stable, 0.1–0.25 drifting, >0.25 changed.
    *
    * Scale shape: per dimension ONE hash aggregate per version (bucket
    * cardinality, not rows), a full-outer bucket join, totals broadcast
    * back — the corpora are each scanned once per dimension and nothing
    * row-sized shuffles. Shares and PSI terms are 6dp-rounded so the
    * report replays bit-stably in SQL. */
  def driftReport(v1: DataFrame, v2: DataFrame,
                  dims: Seq[(String, Column)],
                  eps: Double = 1e-6): DataFrame = {
    require(dims.nonEmpty, "driftReport: need at least one dimension")
    dims.map { case (name, bucket) =>
      def side(df: DataFrame, n: String): DataFrame =
        df.select(bucket.cast("string").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as(n))
      val a = side(v1, "n1")
      val b = side(v2, "n2")
      val joined = a.join(b, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n1"), lit(0L)).as("n1"),
          coalesce(col("n2"), lit(0L)).as("n2"))
      val tot = joined.agg(sum(col("n1")).as("__t1"), sum(col("n2")).as("__t2"))
      joined.crossJoin(broadcast(tot))
        .select(lit(name).as("dim"), col("bucket"), col("n1"), col("n2"),
          round(col("n1") / col("__t1"), 6).as("share1"),
          round(col("n2") / col("__t2"), 6).as("share2"),
          round((col("n2") / col("__t2") - col("n1") / col("__t1")) *
            log((col("n2") / col("__t2") + eps) / (col("n1") / col("__t1") + eps)),
            6).as("psi"))
    }.reduce(_ unionByName _)
  }
}
