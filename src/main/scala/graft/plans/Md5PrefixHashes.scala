package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `array<string>` → `array<long>` of md5-prefix hashes: element i is
  * the first `hexLen` hex chars of md5(element) parsed base-16 —
  * numerically identical to
  * `transform(arr, s -> conv(substring(md5(s), 1, hexLen), 16, 10))`
  * (and to DuckDB `('0x'||substr(md5(s),1,hexLen))::BIGINT`), but one
  * digest call per element instead of a 5-expression tree that
  * hex-encodes the full digest into a string first.
  *
  * hexLen ≤ 15 (fits a signed long). Null elements hash to null.
  * The sketch pipelines (MinHash base hashes at hexLen=8, SimHash
  * token hashes at hexLen=15) are the intended users.
  */
case class Md5PrefixHashes(child: Expression, hexLen: Int)
    extends UnaryExpression {

  require(hexLen > 0 && hexLen <= 15, "hexLen must be in [1, 15]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_md5_prefix_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) null
      else Md5PrefixHashes.hashPrefix(arr.getUTF8String(i), hexLen)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val cls = Md5PrefixHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
        |final int $n = $c.numElements();
        |Object[] $out = new Object[$n];
        |for (int $i = 0; $i < $n; $i++) {
        |  $out[$i] = $c.isNullAt($i) ? null :
        |    (Object) $cls.hashPrefix($c.getUTF8String($i), $hexLen);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixHashes =
    copy(child = newChild)
}

object Md5PrefixHashes {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Thread-local reusable digest (shared with [[CharShingleHashes]]). */
  def digest(): MessageDigest = md.get()

  /** Value of the first hexLen hex chars == big-endian prefix bytes,
    * dropping the low nibble when hexLen is odd. */
  def prefixValue(digestBytes: Array[Byte], hexLen: Int): Long = {
    val nBytes = (hexLen + 1) / 2
    var v = 0L
    var i = 0
    while (i < nBytes) { v = (v << 8) | (digestBytes(i) & 0xffL); i += 1 }
    if (hexLen % 2 == 1) v >>>= 4
    v
  }

  /** First `hexLen` hex chars of md5(utf8 bytes), base-16 → long. */
  def hashPrefix(s: UTF8String, hexLen: Int): Long = {
    val d = md.get()
    d.reset()
    prefixValue(d.digest(s.getBytes), hexLen)
  }
}
