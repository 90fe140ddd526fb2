package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic distributed top-k per group WITHOUT a window: the pattern
  * [[graft.pipeline.Similarity]] uses for kNN, generalized to any
  * (group, score) pair. A `row_number().over(partitionBy(group))` sends
  * EVERY row of a group to one reducer — the "fine at sf0.1, dead at
  * 100×" shape when one group dominates. Here phase 1 takes a local
  * top-k per (group, physical input partition) — bounded state k per
  * group per task, map-side — and phase 2 merges the ≤ k·P survivors.
  * Both phases are ordinary hash aggregations with partial aggregation.
  */
object TopK {

  /** Top `k` rows per `group` by `score` DESCENDING, ties broken by `tie`
    * ascending (must be unique within a group for determinism). Returns
    * (group, tie, score, rank), rank 1-based. */
  def perGroup(df: DataFrame, group: Column, score: Column, tie: Column,
               k: Int, groupName: String = "group", tieName: String = "id",
               scoreName: String = "score"): DataFrame = {
    val packed = struct((-score).as("ns"), tie.as("t"))
    val local = df
      .groupBy(group.as(groupName), spark_partition_id().as("__pid"))
      .agg(slice(sort_array(collect_list(packed)), 1, k).as("top"))
    val merged = local.select(col(groupName), explode(col("top")).as("p"))
      .groupBy(col(groupName))
      .agg(slice(sort_array(collect_list(col("p"))), 1, k).as("top"))
    merged.select(col(groupName), posexplode(col("top")).as(Seq("__i", "p")))
      .select(col(groupName), col("p.t").as(tieName),
        (-col("p.ns")).as(scoreName), (col("__i") + 1).as("rank"))
  }
}
