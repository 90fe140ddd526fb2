package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd MinHash signature: all `numHashes` permutations
  * h_i(x) = (a_i·x + b_i) mod p folded over the input array in ONE pass,
  * inside whole-stage codegen (classic Broder '97 construction; p = 2^31-1
  * keeps h·a < 2^62, no overflow).
  *
  * This is the "(b) custom Catalyst Expression" tier: the Column-combinator
  * formulation (`array(coeffs.map(c => array_min(transform(...))))`) is
  * 64 separate higher-order-function evaluations per row — HOFs are
  * CodegenFallback, so each allocates an interpreted lambda pass plus an
  * intermediate array. Fused here: one generated Java loop, one long[64],
  * zero intermediates. Same coefficients (seeded), bit-identical output.
  *
  * Empty input arrays yield an all-p signature (p ≡ +∞ sentinel, outside
  * the mod-p value range) — callers filter empty shingle sets upstream.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private val p = 2147483647L // 2^31 - 1, Mersenne prime

  // identical coefficient stream to the pre-fusion implementation — keeps
  // every persisted signature and test expectation stable
  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val ab = Array.fill(numHashes)((math.abs(rnd.nextLong()) % (p - 1) + 1,
                                    math.abs(rnd.nextLong()) % p))
    (ab.map(_._1), ab.map(_._2))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (as, bs) = coeffs
    val mins = Array.fill(numHashes)(p)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      var h = arr.getLong(i) % p
      if (h < 0) h += p
      var j = 0
      while (j < numHashes) {
        val v = (h * as(j) + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coeffs._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffs._2, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, ${p}L);
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i) % ${p}L;
         |  if ($h < 0) $h += ${p}L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(hashedShingles: Column, numHashes: Int, seed: Long): Column =
    GraftExprBridge.column(
      MinHashSig(GraftExprBridge.expression(hashedShingles), numHashes, seed))
}
