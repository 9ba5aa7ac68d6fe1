package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 60-bit SimHash from pre-hashed tokens in one pass: per bit i, count
  * elements with bit i set; the signature sets bit i iff at least half
  * do (votes = 2·ones − n ≥ 0). Identical to the declarative form (60
  * conditional `aggregate` folds) but a single tight loop per row.
  * Empty input → 0; any null element → null.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    val ones = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var b = 0
      while (b < 60) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2 * ones(b) >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val ones = ctx.freshName("ones")
      val sig = ctx.freshName("sig")
      s"""
        |final int $n = $c.numElements();
        |if ($n == 0) {
        |  ${ev.value} = 0L;
        |} else {
        |  final int[] $ones = new int[60];
        |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
        |    if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    final long $h = $c.getLong($i);
        |    for (int $b = 0; $b < 60; $b++) {
        |      $ones[$b] += (int) (($h >>> $b) & 1L);
        |    }
        |  }
        |  if (!${ev.isNull}) {
        |    long $sig = 0L;
        |    for (int $b = 0; $b < 60; $b++) {
        |      if (2 * $ones[$b] >= $n) $sig |= (1L << $b);
        |    }
        |    ${ev.value} = $sig;
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
