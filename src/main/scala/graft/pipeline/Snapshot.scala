package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the CDC primitive of an incremental training-data
  * refresh: given two versions of a corpus, classify every document as
  * added / removed / changed / unchanged, so downstream dedup, packing, and
  * index maintenance re-run only over the delta instead of the 100 TB
  * whole.
  *
  * Scale shape: each side collapses to (id, 128-bit content fingerprint) at
  * the scan — the full-outer join shuffles SLIM rows only (id + 32-hex),
  * never document text; it is a plain equi-join on the id (AQE-planned,
  * skew-safe), and the status classification is a narrow projection over
  * the join output. One shuffle per side at any scale.
  */
object Snapshot {

  /** One row per doc id present in either snapshot:
    * (doc_id, status ∈ added|removed|changed|unchanged). `added` = only in
    * v2, `removed` = only in v1, `changed` = in both with different
    * content fingerprints. */
  def diff(v1: DataFrame, v2: DataFrame, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    val a = v1.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__fp1"))
    val b = v2.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__fp2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__fp1").isNull, lit("added"))
          .when(col("__fp2").isNull, lit("removed"))
          .when(col("__fp1") =!= col("__fp2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
