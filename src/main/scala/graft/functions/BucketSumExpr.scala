package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd fixed-point dot products of one document's hashed
  * feature-bucket set against `k` dense weight vectors at once:
  *
  *   out[j] = Σ_i  weights(j)(bs[i])      (exact LONG adds, j = 0…k−1)
  *
  * The workhorse of [[graft.pipeline.Classifier]]'s trainer: weights are
  * ×10⁶-quantized micro-unit longs, the bucket array is each doc's sorted
  * distinct feature set, and one generated loop scores every line-search
  * candidate in a single traversal — no per-iteration join against an
  * exploded (doc, bucket) frame, no corpus-sized shuffle, and exact
  * integer sums keep the result partitioning/order-invariant.
  *
  * The weight matrix ships as a BROADCAST (k·B longs — one torrent
  * transfer per executor, not a per-task closure payload, so the
  * fasttext-standard 2M-bucket models are first-class): the generated
  * code pulls `bc.value()` into a lazily-initialized mutable slot on
  * first row. Buckets outside [0, B) are ignored (contribute 0) so a
  * sentinel can never read out of bounds. */
case class BucketDotSums(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Long]]],
    k: Int, b: Int)
    extends UnaryExpression {

  require(k >= 1, "bucket_dot_sums: need at least one weight vector")

  @transient private lazy val weights: Array[Array[Long]] = bc.value

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket_dot_sums needs array<int>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bucket_dot_sums"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Long](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val bk = arr.getInt(i)
      if (bk >= 0 && bk < b) {
        var j = 0
        while (j < k) { sums(j) += weights(j)(bk); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(sums)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bucketWeightsBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    // materialize the broadcast ONCE per task, not per row
    val wVar = ctx.addMutableState("long[][]", "bucketWeights",
      forceInline = true, useFreshName = true)
    nullSafeCodeGen(ctx, ev, arr => {
      val sums = ctx.freshName("sums")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bk = ctx.freshName("bk")
      val n = ctx.freshName("n")
      s"""
         |if ($wVar == null) $wVar = (long[][]) $bcRef.value();
         |long[] $sums = new long[$k];
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final int $bk = $arr.getInt($i);
         |  if ($bk >= 0 && $bk < $b) {
         |    for (int $j = 0; $j < $k; $j++) $sums[$j] += $wVar[$j][$bk];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sums);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BucketDotSums =
    copy(child = newChild)
}

object BucketDotSums {
  /** Broadcast `weights` (k dense micro-unit vectors of equal length) and
    * bind the kernel over `buckets`, returning the Broadcast handle
    * alongside the Column so a caller that MATERIALIZES the plan (collect
    * in the same call) can `destroy()` the broadcast immediately instead
    * of parking k·B longs in block storage until the ContextCleaner gets
    * to it — at the 2^21-bucket ceiling one line-search ladder is ~200 MB,
    * and a 20-iteration trainer issues two per iteration. */
  def tracked(spark: org.apache.spark.sql.SparkSession, buckets: Column,
              weights: Array[Array[Long]]):
      (Column, org.apache.spark.broadcast.Broadcast[Array[Array[Long]]]) = {
    require(weights.nonEmpty && weights.forall(_.length == weights.head.length),
      "bucket_dot_sums: candidate weight vectors differ in length")
    val bc = spark.sparkContext.broadcast(weights)
    (GraftExprBridge.column(
      BucketDotSums(GraftExprBridge.expression(buckets), bc,
        weights.length, weights.head.length)), bc)
  }

  /** [[tracked]] without the handle — for LAZY plans (predict sweeps)
    * whose broadcast must outlive this call; the ContextCleaner reclaims
    * it once the plan is unreferenced. */
  def apply(spark: org.apache.spark.sql.SparkSession, buckets: Column,
            weights: Array[Array[Long]]): Column =
    tracked(spark, buckets, weights)._1
}

/** The gradient-side dual of [[BucketDotSums]]: scatter-add each doc's
  * micro-unit error `e6` into every bucket of its feature array, reducing
  * a whole partition into ONE dense long[B+1] accumulator (slot B is the
  * bias — every row adds there, so zero-feature docs still drive the
  * bias gradient). Replaces the explode → groupBy(bucket) formulation,
  * whose shuffle input is Σ|bs| rows per iteration: here the only moving
  * data is numPartitions × (B+1) longs and the scan stays narrow. Exact
  * integer adds — associative, so partitioning/order-invariant like
  * every other sum in the trainer. */
case class BucketErrSumAgg(left: Expression, right: Expression, b: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(b > 0, "bucket_err_sum: bucket count must be positive")

  override def prettyName: String = "bucket_err_sum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bucket_err_sum needs (array<int>, bigint), got (${l.sql}, ${r.sql})")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](b + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val bsv = left.eval(input)
    val e6v = right.eval(input)
    if (e6v != null) {
      val e6 = e6v.asInstanceOf[Long]
      if (bsv != null) {
        val arr = bsv.asInstanceOf[ArrayData]
        val n = arr.numElements()
        var i = 0
        while (i < n) {
          val bk = arr.getInt(i)
          if (bk >= 0 && bk < b) buf(bk) += e6
          i += 1
        }
      }
      buf(b) += e6 // bias slot: every doc, features or not
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): BucketErrSumAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BucketErrSumAgg =
    copy(inputAggBufferOffset = off)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketErrSumAgg =
    copy(left = newLeft, right = newRight)
}

object BucketErrSumAgg {
  def apply(buckets: Column, e6: Column, b: Int): Column =
    GraftExprBridge.column(
      BucketErrSumAgg(GraftExprBridge.expression(buckets),
        GraftExprBridge.expression(e6), b).toAggregateExpression())
}
