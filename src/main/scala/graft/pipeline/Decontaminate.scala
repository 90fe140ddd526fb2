package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find training documents that contain a
  * benchmark/eval snippet verbatim — the standard hygiene pass before an
  * LLM training run (eval answers leaking into the corpus inflate scores).
  *
  * Scale path (the whole point): the naive check is an O(docs × snippets)
  * `contains` cross-scan — dead at 100 TB × a few million eval snippets.
  * Instead this is a Rabin–Karp-shaped HASH EQUI-JOIN:
  *   1. every `width`-char window of every normalized document is hashed in
  *      one fused pass per row ([[graft.functions.CharNgramHashes]] — the
  *      same native expression the n-gram dedup uses, already
  *      differential-tested against `xxhash64(substr(...))`);
  *   2. each snippet hashes once (`xxhash64`, same seed/algorithm);
  *   3. candidates come from an equi-join on the 64-bit window hash — a
  *      plain shuffle (or broadcast, AQE's choice when the eval side is
  *      small), never a nested-loop scan;
  *   4. hash collisions are killed by an exact `contains` verify against
  *      the (rare) candidate pairs, so the result is EXACT — identical to
  *      the brute-force cross-scan.
  *
  * The candidate join carries only (doc_id, hash) — the document text joins
  * back in only for the verify step, so the wide column never rides the big
  * shuffle.
  */
object Decontaminate {

  /** Normalization both sides share: lowercase, whitespace collapsed to a
    * single space. Containment is checked over THIS form, so formatting
    * differences don't hide contamination. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** A deterministic eval set derived from the corpus itself (testing aid;
    * in production the snippets come from the real benchmark table): docs
    * with `doc_id % modulus == 0` contribute the `width`-char slice of
    * their normalized text starting at 1-based `off`. */
  def evalSnippets(docs: DataFrame, modulus: Int = 17, off: Int = 11,
                   width: Int = 40, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("eval_id"), normText(col(textCol)).as("__n"))
      .filter(col("eval_id") % modulus === 0 &&
        length(col("__n")) >= off + width - 1)
      .select(col("eval_id"), col("__n").substr(lit(off), lit(width)).as("snippet"))

  /** Exact (doc_id, eval_id) contamination pairs: documents whose
    * normalized text contains the snippet as a substring. `snippets` must
    * carry (eval_id, snippet) with every snippet exactly `width` chars
    * (others are ignored — a window hash can only equal a full-width
    * snippet hash).
    *
    * AUTO-REGIME: when the (width-filtered) snippet table's estimated size
    * exceeds `spark.sql.autoBroadcastJoinThreshold`, the hash equi-join
    * would stop broadcasting and shuffle EVERY document window hash — the
    * dominant cost at corpus scale. That regime routes through
    * [[contaminatedBloom]], which prunes the window stream map-side with a
    * Bloom probe first; both paths produce IDENTICAL output (Bloom has no
    * false negatives and survivors are exact-verified), so the same oracle
    * gates both. The regime probe is one count() over the (small by
    * construction relative to the corpus) snippet table. */
  def contaminated(docs: DataFrame, snippets: DataFrame, width: Int = 40,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nSnippets = snippets.filter(length(col("snippet")) === width).count()
    // per-row broadcast footprint: UTF-16 snippet chars + eval_id + hash +
    // row overhead — the same order Spark's own size estimator lands on
    val estBytes = nSnippets * (2L * width + 48L)
    val threshold = docs.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      .stripSuffix("b").stripSuffix("B") match {
        case s if s.endsWith("k") || s.endsWith("K") => s.dropRight(1).toLong << 10
        case s if s.endsWith("m") || s.endsWith("M") => s.dropRight(1).toLong << 20
        case s if s.endsWith("g") || s.endsWith("G") => s.dropRight(1).toLong << 30
        case s => s.toLong
      }
    if (threshold > 0 && estBytes > threshold)
      contaminatedBloom(docs, snippets, width, idCol = idCol, textCol = textCol)
    else contaminatedJoin(docs, snippets, width, idCol, textCol)
  }

  /** The broadcast-regime exact path: window-hash equi-join with no Bloom
    * prefilter (the snippet side is small enough that AQE broadcasts it —
    * a map-side join already, so a Bloom pass would only add work). */
  def contaminatedJoin(docs: DataFrame, snippets: DataFrame, width: Int = 40,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val norm = docs.select(col(idCol), normText(col(textCol)).as("__n"))
    // (doc_id, window-hash) only — the text stays out of the big shuffle
    val windows = norm.select(col(idCol),
      explode(graft.functions.CharNgramHashes(col("__n"), width)).as("__wh"))
    val sn = snippets
      .filter(length(col("snippet")) === width)
      .select(col("eval_id"), col("snippet"), xxhash64(col("snippet")).as("__sh"))
    val candidates = windows
      .join(sn, col("__wh") === col("__sh"))
      .select(col(idCol), col("eval_id"), col("snippet"))
      .distinct()
    candidates
      .join(norm, idCol)
      .filter(col("__n").contains(col("snippet")))
      .select(col(idCol), col("eval_id"))
      .distinct()
  }

  /** [[contaminated]] for the LARGE-eval-suite regime: when the snippet
    * table outgrows the broadcast-join threshold (a few million benchmark
    * rows), AQE falls back to shuffling EVERY document window hash — the
    * dominant cost at 100 TB. This variant builds a Bloom filter over the
    * snippet hashes (distributed build, KB–MB sized regardless of suite
    * size) and prunes the window stream MAP-SIDE with a zero-UDF
    * [[graft.functions.BloomContains]] probe before any join: only the
    * ≤ fpp false-positive trickle plus true candidates reach the shuffle.
    * Bloom filters have no false negatives and survivors are exact-verified
    * by the same `contains` step, so the output is IDENTICAL to
    * [[contaminated]] — same oracle gates both. */
  def contaminatedBloom(docs: DataFrame, snippets: DataFrame, width: Int = 40,
                        fpp: Double = 0.001, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val sn = snippets
      .filter(length(col("snippet")) === width)
      .select(col("eval_id"), col("snippet"), xxhash64(col("snippet")).as("__sh"))
    val bf = sn.stat.bloomFilter("__sh", math.max(sn.count(), 1L), fpp)
    val bloomBytes = graft.functions.BloomContains.serialize(bf)
    val norm = docs.select(col(idCol), normText(col(textCol)).as("__n"))
    val windows = norm.select(col(idCol),
        explode(graft.functions.CharNgramHashes(col("__n"), width)).as("__wh"))
      .filter(graft.functions.BloomContains(bloomBytes, col("__wh")))
    val candidates = windows
      .join(sn, col("__wh") === col("__sh"))
      .select(col(idCol), col("eval_id"), col("snippet"))
      .distinct()
    candidates
      .join(norm, idCol)
      .filter(col("__n").contains(col("snippet")))
      .select(col(idCol), col("eval_id"))
      .distinct()
  }

  /** FUZZY decontamination: q-gram containment. A training document is
    * flagged for an eval snippet when ≥ `frac` of the snippet's distinct
    * character `n`-grams appear in the document — the standard defence
    * against lightly-perturbed leakage (changed punctuation, one edited
    * word) that exact substring matching misses.
    *
    * Scale shape: the eval side is small by nature (benchmark suites), so
    * its exploded gram table BROADCASTS — the 100 TB document gram stream
    * is filtered map-side by the broadcast hash join and never shuffles;
    * the only shuffle is the per-(doc, eval) count of matching grams,
    * which carries ONLY survivors of the gram join. Gram sets are 64-bit
    * hashes ([[graft.functions.CharNgramHashes]], distinct per side), so
    * the containment fraction is exact modulo 64-bit collisions.
    *
    * Returns (idCol, eval_id, overlap) with overlap ≥ frac. */
  def fuzzyContaminated(docs: DataFrame, snippets: DataFrame, n: Int = 8,
                        frac: Double = 0.6, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val dg = docs.select(col(idCol),
      explode(graft.functions.CharNgramHashes(normText(col(textCol)), n)).as("__h"))
    val eg = snippets
      .select(col("eval_id"),
        graft.functions.CharNgramHashes(normText(col("snippet")), n).as("__gs"))
      .select(col("eval_id"), size(col("__gs")).as("__nev"),
        explode(col("__gs")).as("__h"))
    dg.join(broadcast(eg), "__h")
      .groupBy(col(idCol), col("eval_id"), col("__nev"))
      .agg(count(lit(1)).as("__shared"))
      .select(col(idCol), col("eval_id"),
        (col("__shared").cast("double") / col("__nev")).as("overlap"))
      .filter(col("overlap") >= frac)
  }
}
