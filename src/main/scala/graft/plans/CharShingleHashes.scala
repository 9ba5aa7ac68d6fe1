package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character k-gram shingle hashes straight from a string: element i
  * is the md5-prefix hash (see [[Md5PrefixHashes]]) of the k-char
  * substring starting at char i — numerically identical to
  * `transform(shinglesAll(text, k), s -> md5PrefixHash(s))` but
  * without materializing the shingle string array. For ASCII text the
  * digest reads the backing bytes in place (zero allocation per
  * shingle); multi-byte text falls back to char-correct slicing.
  *
  * Shingles are NOT de-duplicated — min-sketches don't care, and
  * consumers that do (Jaccard) apply array_distinct on the hashes.
  * Texts shorter than k yield an empty array.
  */
case class CharShingleHashes(child: Expression, k: Int, hexLen: Int)
    extends UnaryExpression {

  require(k > 0, "k must be positive")
  require(hexLen > 0 && hexLen <= 15, "hexLen must be in [1, 15]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    CharShingleHashes.eval(input.asInstanceOf[UTF8String], k, hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = CharShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) " +
        s"$cls.eval($c, $k, $hexLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

object CharShingleHashes {
  def eval(s: UTF8String, k: Int, hexLen: Int): GenericArrayData = {
    val nChars = s.numChars()
    if (nChars < k) return new GenericArrayData(Array.emptyLongArray)
    val n = nChars - k + 1
    val out = new Array[Long](n)
    val bytes = s.getBytes
    if (bytes.length == nChars) {
      // ASCII fast path: char i == byte i, hash byte slices in place
      val md = Md5PrefixHashes.digest()
      var i = 0
      while (i < n) {
        md.reset()
        md.update(bytes, i, k)
        out(i) = Md5PrefixHashes.prefixValue(md.digest(), hexLen)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        out(i) = Md5PrefixHashes.hashPrefix(s.substringSQL(i + 1, k), hexLen)
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
