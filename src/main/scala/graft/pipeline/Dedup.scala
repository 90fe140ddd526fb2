package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is shuffle-bounded by GROUP BY / JOIN on a
  * compact key (hash, band signature, bit-prefix bucket) — never an
  * all-pairs comparison. Candidate generation is blocked (LSH bands /
  * hamming prefixes / norm buckets) so the quadratic verify step only runs
  * within buckets, which stay small under any reasonable similarity
  * threshold. All expression work is `functions._` (codegen'd); the only
  * shuffles are the ones the algorithm inherently needs.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per normalized-text fingerprint.
    * One hash-shuffle; at 100 TB this is a plain groupBy on a 128-bit key. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Deterministic MinHash signature over PRE-HASHED shingles (array of
    * 64-bit longs): k permutations h_i(x) = (a_i*x + b_i) mod p (public
    * construction, Broder '97). Coefficients come from a fixed seed so
    * results are reproducible across runs and engines. */
  def minhashSignature(hashedShingles: Column, numHashes: Int = 64, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    // 2^31-1 (Mersenne prime): keeps h*a < 2^62, no ANSI long overflow
    val p = 2147483647L
    val coeffs = Seq.fill(numHashes)((math.abs(rnd.nextLong()) % (p - 1) + 1,
                                      math.abs(rnd.nextLong()) % p))
    val hashes = transform(hashedShingles, s => pmod(s.cast("long"), lit(p)))
    array(coeffs.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  /** Banded-LSH candidate pairs over BARE ids: explode the signature into
    * (band, bandHash) keys, self-join on the band key, and deduplicate the
    * candidate id pairs BEFORE any verification. Two scale properties the
    * naive version lacks: (a) only (long, long, long) rows ride the banded
    * shuffle — the payload arrays (shingles) never do; (b) a pair colliding
    * in b bands is verified once, not b times. */
  private def bandedCandidateIds(sig: DataFrame, bands: Int, rows: Int): DataFrame = {
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * lit(rows) + 1, lit(rows)), b))).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"))
    a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
  }

  /** Verify candidate id pairs with exact Jaccard: join the gram arrays back
    * once per side (shuffle on id — each array crosses the wire once). */
  private def verifyJaccard(cands: DataFrame, grams: DataFrame,
                            threshold: Double): DataFrame = {
    val ga = grams.select(col("id").as("id_a"), col("g").as("g_a"))
    val gb = grams.select(col("id").as("id_b"), col("g").as("g_b"))
    cands.join(ga, "id_a").join(gb, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
         size(array_union(col("g_a"), col("g_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash LSH near-dup pairs: band the signature, generate deduplicated
    * candidate id pairs, then verify each ONCE with the true shingle
    * Jaccard. `bands` × `rowsPerBand` = signature length;
    * P(candidate) = 1-(1-s^r)^b — 16 bands × 4 rows targets s ≈ 0.5+.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    */
  def minhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.5,
                   shingleK: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val grams = docs
      .select(col(idCol).as("id"), TextAnalysis.hashedShingles(col(textCol), shingleK).as("g"))
      .filter(size(col("g")) > 0)
    val sig = grams.select(col("id"), minhashSignature(col("g"), numHashes).as("sig"))
    verifyJaccard(bandedCandidateIds(sig, bands, rows), grams, threshold)
  }

  /** 64-bit SimHash (Charikar '02): sum signed bit contributions of token
    * hashes, take the sign vector. Pure column expressions. */
  def simhash(text: Column): Column = {
    val toks = split(lower(trim(text)), "[^a-z0-9]+")
    val hashes = transform(filter(toks, t => length(t) > 0), t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist. Blocking:
    * split the 64-bit hash into (maxDist+1) chunks — by pigeonhole, any
    * pair within maxDist agrees on at least one full chunk, so joining on
    * (chunk index, chunk value) finds all such pairs without all-pairs. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    val withHash = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val banded = withHash.select(col("id"), col("sh"),
      posexplode(array((0 until chunks).map { c =>
        shiftrightunsigned(col("sh"), c * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1))
      }: _*)).as(Seq("chunk", "cv")))
    val a = banded.select(col("chunk"), col("cv"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("chunk"), col("cv"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "cv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }

  /** n-gram Jaccard dedup: EXACT Jaccard over character n-grams, with
    * banded-minhash blocking (same machinery as [[minhashPairs]], run over
    * char n-gram hashes instead of word shingles). At threshold 0.7 the
    * 16×4 banding has recall 1-(1-0.7^4)^16 ≈ 0.99 — versus the single-
    * bucket array_min blocking this replaces, whose recall tops out near
    * the Jaccard value itself AND whose one-hot-bucket-per-common-n-gram
    * skew is quadratic at scale. Precision is exact (every emitted pair is
    * verified against the full gram sets). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 5,
                        threshold: Double = 0.7, numHashes: Int = 64,
                        bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val grams = docs.select(col(idCol).as("id"),
        TextAnalysis.hashedCharNgrams(col(textCol), n).as("g"))
      .filter(size(col("g")) > 0)
    val sig = grams.select(col("id"), minhashSignature(col("g"), numHashes).as("sig"))
    verifyJaccard(bandedCandidateIds(sig, bands, rows), grams, threshold)
  }

  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold, blocked by
    * random-hyperplane LSH signature (sign bits). One side multi-probes its
    * 1-bit-flipped neighbour buckets, so pairs within hamming distance 1 of
    * signature are found too — recall at moderate thresholds without
    * widening the shuffle by more than (planes+1)×. */
  def embeddingPairs(emb: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding", threshold: Double = 0.4,
                     planes: Int = 4, seed: Long = 7L): DataFrame = {
    val sig = Similarity.hyperplaneSig(col(vecCol), planes, seed)
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("bucket"))
    val probes = array((lit(0L) +: (0 until planes).map(p => shiftleft(lit(1L), p))): _*)
    val a = e.select(explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
