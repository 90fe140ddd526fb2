package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rel.Checkpoint.PinOps

/** Distributed BPE-merge tokenizer training over a weighted vocabulary.
  *
  * The scale design is the one real subword trainers use on web-scale
  * corpora: ONE full-corpus pass collapses the text into a
  * (word, weight) vocabulary — weight = corpus occurrence count — and all
  * merge learning then runs over that vocabulary, which is orders of
  * magnitude smaller than the corpus (vocabulary grows ~ Heaps' law, not
  * linearly in bytes). Each merge round is:
  *
  *   1. explode adjacent symbol pairs per word (narrow),
  *   2. weight-sum per pair — a map-side-combinable hash aggregate,
  *   3. a ONE-ROW argmax collect (deterministic tie-break on the pair),
  *   4. apply the merge to every word's symbol array as a pure
  *      higher-order-function fold (narrow, no shuffle),
  *
  * so per round the only exchange is the pair aggregation over vocab-sized
  * data. The vocab is localCheckpointed each round to keep the plan flat.
  *
  * Greedy application order is the standard left-to-right non-overlapping
  * scan (a run "aaa" under merge (a,a) becomes ["aa","a"]).
  */
object Bpe {

  /** A learned merge: adjacent symbols `a`,`b` fuse into `a+b`; `weight` is
    * the (overlap-counted) adjacent-pair frequency at selection time. */
  final case class Merge(a: String, b: String, weight: Long)

  /** Lowercased alphabetic word extraction — the training token stream. */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Character symbols of a word. `w` must be non-empty (true for every
    * `[a-z]+` match) — `sequence(1, 0)` would count DOWN, not yield []. */
  private def chars(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** One corpus pass: (word, weight) vocabulary with symbol arrays
    * initialized to characters. */
  def wordVocab(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(words(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("weight"))
      .withColumn("syms", chars(col("word")))

  /** Typed empty string-array literal (slice of an existing array keeps the
    * element type without a cast). */
  private def emptyStrArray(like: Column): Column = slice(like, 1, 0)

  /** Adjacent-pair frequencies of a vocabulary: (a, b, cnt) weighted by
    * word weight; counts overlapping occurrences (ab in "aaa" counts 2). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("syms")) >= 2)
      .select(col("weight"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("weight")).as("cnt"))

  /** Left-to-right non-overlapping application of one merge to a symbol
    * array: a pure `aggregate` fold, codegen'd, no UDF. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, emptyStrArray(syms), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** One training round's audit record: the merge picked plus the
    * corpus-weighted total symbol count before/after applying it. The
    * delta is the number of (weighted, non-overlapping) merges performed,
    * which BPE bounds by `weight/2 ≤ delta ≤ weight` — a falsifiable
    * invariant the gated contract checks. */
  final case class Round(merge: Merge, symsBefore: Long, symsAfter: Long)

  /** Learn `nMerges` merges. Returns the per-round audit trail and the
    * final symbolized vocabulary (word, weight, syms). `vocab0` must come
    * from [[wordVocab]] (or have the same shape). Stops early if no
    * mergeable pair remains.
    *
    * Per round the cluster does exactly TWO jobs: one aggregation that
    * fuses the argmax pair with the total pair count (the symbol totals in
    * the audit trail come free via Σsyms = Σpairs + Σweights — every word
    * of length n has n−1 adjacent pairs), and one eager checkpoint of the
    * merged vocab that keeps the plan flat across rounds. */
  def train(vocab0: DataFrame, nMerges: Int): (Seq[Round], DataFrame) = {
    require(nMerges >= 1, "train: nMerges must be >= 1")
    var vocab = vocab0.localCheckpoint(true)
    val totalWeight = vocab.agg(sum(col("weight"))).collect().head.getLong(0)
    // (pair argmax, Σcnt) in ONE pass; min over (−cnt, a, b) = the
    // (cnt desc, a asc, b asc) deterministic tie-break
    def sweep(v: DataFrame): Option[(Merge, Long)] = {
      val r = pairCounts(v).agg(
        min(struct((-col("cnt")).as("nc"), col("a"), col("b"))).as("top"),
        sum(col("cnt")).as("pairs")).collect().head
      if (r.isNullAt(0)) None
      else {
        val t = r.getStruct(0)
        Some((Merge(t.getString(1), t.getString(2), -t.getLong(0)), r.getLong(1)))
      }
    }
    val rounds = Seq.newBuilder[Round]
    var pending: Option[(Merge, Long)] = sweep(vocab)
    var round = 0
    while (round < nMerges && pending.isDefined) {
      val (m, pairsBefore) = pending.get
      val prev = vocab
      vocab = vocab
        .withColumn("syms", applyMerge(col("syms"), m.a, m.b))
        .localCheckpoint(true)
      // eager checkpoint has materialized — drop the superseded round's
      // blocks instead of pinning nMerges vocab copies (unpin releases the
      // UNDERLYING checkpointed RDD; Dataset.unpersist would be a no-op)
      prev.unpin()
      round += 1
      pending = if (round < nMerges) sweep(vocab) else None
      // the NEXT sweep's Σcnt is this round's "after" total — no extra scan
      val pairsAfter = pending.map(_._2).getOrElse(
        pairCounts(vocab).agg(coalesce(sum(col("cnt")), lit(0L)))
          .collect().head.getLong(0))
      rounds += Round(m, pairsBefore + totalWeight, pairsAfter + totalWeight)
    }
    (rounds.result(), vocab)
  }

  /** Re-apply a merge list to one word from raw characters — independent
    * of the incremental syms the trainer carries, so comparing the two
    * totals is a real cross-check of merge application. */
  def encodeWord(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(chars(word))((s, m) => applyMerge(s, m.a, m.b))

  /** Encode raw text with a learned merge list: chars, then each merge as
    * one fold pass, nested into a single expression per word. Array HOFs
    * don't whole-stage-codegen, so this per-document path costs ~|text|
    * per merge — fine for spot validation and small slices; CORPUS-scale
    * token counting should run [[encodeWord]] over the distinct-word
    * vocabulary (Heaps'-law cardinality) and weight by occurrence count,
    * or join documents' words against an encoded vocab table. */
  def encodeWords(text: Column, merges: Seq[Merge]): Column =
    transform(words(text), w => encodeWord(w, merges))

  /** Subword token count of a document under the learned merges. */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    coalesce(aggregate(encodeWords(text, merges), lit(0L),
      (acc, w) => acc + size(w)), lit(0L))

  /** CORPUS-scale per-document token counting: explode each document's
    * words and join them against the trained vocabulary's symbol counts —
    * a hash join on the word key instead of re-running the merge folds per
    * occurrence. The vocab side is Heaps'-law small (broadcast when it
    * fits; AQE picks otherwise), the doc side never shuffles more than
    * (id, word) pairs, and out-of-vocabulary words fall back to their
    * character count (what an untrained BPE would emit). This is the path
    * to size a 100 TB corpus in tokens; the fold-chain [[tokenCount]] is
    * the spot-validation tool. */
  def tokenCountViaVocab(docs: DataFrame, textCol: Column, vocab: DataFrame,
                         idCol: String = "doc_id"): DataFrame = {
    val wordsOut = docs.select(col(idCol), explode(words(textCol)).as("word"))
    val sizes = vocab.select(col("word"), size(col("syms")).as("__ntok"))
    wordsOut.join(sizes, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("__ntok"), length(col("word"))).cast("long"))
        .as("n_tokens"))
  }
}
