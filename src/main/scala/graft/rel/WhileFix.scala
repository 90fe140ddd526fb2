package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** `r .while(expr)` — generative/recursive fixpoint (Builtin.Recurse,
  * Andl.Runtime/Builtin.cs:511-517; local engine scans appended rows by
  * ordinal, DataTableLocal.cs:631-646; the SQL backends throw — this is the
  * one operator only the in-memory engine supports).
  *
  * Semantics: result = least fixpoint of T(R) = R ∪ step(R), i.e. keep
  * applying `step` to every tuple (including newly generated ones) until no
  * NEW tuple appears. Because `step` is a per-tuple map (it distributes over
  * union), semi-naive evaluation is exact: only the frontier (tuples new in
  * the previous round) needs stepping each round — the classic datalog
  * optimization the reference's append-scan performs implicitly.
  *
  * Scale design (SURVEY §7.4 hard part #3):
  *  - `localCheckpoint` each round truncates the lineage, otherwise the plan
  *    tree doubles per iteration and Catalyst analysis time explodes;
  *  - the per-round `except` (a shuffle) runs frontier-vs-acc, not
  *    acc-vs-acc;
  *  - `maxIter` and `maxRows` caps bound runaway recursion (the reference
  *    has no cap and loops forever on a bad query — we do better);
  *  - on a real cluster, `spark.cleaner` reclaims shuffle files between
  *    rounds; AQE re-plans each round with fresh sizes.
  */
object WhileFix {

  /** Checkpoint cadence: only the FRONTIER (the new tuples) is checkpointed
    * each round — it is the only thing recomputed next round. The
    * accumulator stays a lazy union of already-checkpointed frontiers and
    * is compacted (one materialization) every `compactEvery` rounds, so
    * total materialized bytes are O(result + result·rounds/compactEvery)
    * instead of the O(result·rounds) a per-round acc checkpoint costs. */
  def apply(seed: DataFrame, step: DataFrame => DataFrame,
            maxIter: Int = 10000, maxRows: Long = 2000000000L,
            compactEvery: Int = 10): DataFrame = {
    val cols = seed.columns.toSeq
    var acc = seed.dropDuplicates().localCheckpoint()
    var frontier = acc
    var total = acc.count()
    var iter = 0
    var sinceCompact = 0
    var done = false
    while (!done && iter < maxIter) {
      val stepped = step(frontier).select(cols.map(col): _*)
      // frontier-minus-acc: while acc is small enough to broadcast, an
      // explicit broadcast anti-join keeps each round to one shuffle-free
      // stage; past the broadcast threshold fall back to except (shuffled
      // anti-join — the only correct choice once acc is cluster-sized).
      // Lazy checkpoint + count = ONE job per round (an eager checkpoint
      // would run a separate materialization job before the count).
      val minus =
        if (total <= 4000000L)
          // small regime: coalesce(1) makes the dedup a narrow local hash
          // (no exchange at all) and acc broadcasts — each round is a
          // single shuffle-free stage plus a broadcast build
          stepped.coalesce(1).dropDuplicates().join(broadcast(acc), cols, "left_anti")
        else stepped.except(acc)
      val fresh = minus.localCheckpoint(eager = false)
      val n = fresh.count()
      if (n == 0) done = true
      else {
        acc = acc.union(fresh) // lazy: legs are all checkpointed
        frontier = fresh
        total += n
        sinceCompact += 1
        if (sinceCompact >= compactEvery) {
          acc = acc.localCheckpoint(eager = false) // materializes on next use
          sinceCompact = 0
        }
        require(total <= maxRows, s"while-fixpoint exceeded $maxRows rows")
      }
      iter += 1
    }
    require(done, s"while-fixpoint did not converge in $maxIter iterations")
    acc
  }

  /** Rel-level wrapper. Output of a fixpoint is distinct by construction. */
  def rel(seed: Rel, step: Rel => Rel, maxIter: Int = 10000): Rel =
    Rel.distinct(apply(seed.df, d => step(Rel.distinct(d)).bagDF, maxIter))
}
