package graft.rel

import org.apache.spark.sql.Row

/** Driver-side TUPLE operations. A tuple is a single named-value mapping
  * with order-insensitive heading equality (DataHeading.cs:48-56) — plain
  * `Map[String, Any]` carries exactly those semantics, and single-tuple
  * work belongs on the driver (no DataFrame machinery for one row; the
  * reference's tuple ops are row-local too).
  *
  * - transform: extend/rename/project a tuple (Builtin.TransTuple,
  *   Builtin.cs:520-528; DataRow.Transform, DataRow.cs:289-294)
  * - set ops: heading merge per MergeOps (DataHeading.Merge,
  *   DataColumn.Merge, DataColumn.cs:88-99) with LEFT value priority on
  *   common attributes (DataRow.Create(h, row1, row2), DataRow.cs:189-192)
  */
object TupleOps {
  type Tup = Map[String, Any]

  def fromRow(row: Row): Tup =
    row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap

  /** Tuple transform: each output attribute is computed from the input
    * tuple — covers project (identity picks), rename and extend in one
    * form, like the reference's expression list. */
  def transform(t: Tup, exprs: (String, Tup => Any)*): Tup =
    exprs.map { case (n, f) => n -> f(t) }.toMap

  def project(t: Tup, names: String*): Tup = t.view.filterKeys(names.contains).toMap

  def rename(t: Tup, pairs: (String, String)*): Tup = {
    val m = pairs.toMap
    t.map { case (k, v) => m.getOrElse(k, k) -> v }
  }

  def extend(t: Tup, newAttrs: (String, Tup => Any)*): Tup =
    t ++ newAttrs.map { case (n, f) => n -> f(t) }

  /** t1 union t2: merged heading, LEFT value wins on common attrs. */
  def union(t1: Tup, t2: Tup): Tup = t2 ++ t1

  /** t1 intersect t2: common attrs only, left values. */
  def intersect(t1: Tup, t2: Tup): Tup =
    t1.view.filterKeys(t2.contains).toMap

  /** t1 minus t2: left-only attrs. */
  def minus(t1: Tup, t2: Tup): Tup = t1 -- t2.keys

  /** t1 symdiff t2: attrs in exactly one tuple. */
  def symdiff(t1: Tup, t2: Tup): Tup =
    (t1 -- t2.keys) ++ (t2 -- t1.keys)
}
