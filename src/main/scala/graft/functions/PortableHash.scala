package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd portable hash: the first `hexLen` hex digits of md5(input),
 * parsed as a long — BIT-IDENTICAL to the composed
 * `conv(substring(md5(x), 1, hexLen), 16, 10)` it replaces
 * ([[graft.operators.Dedup.portableHash64]]/`portableHash56b`), and to the
 * DuckDB oracle's `('0x' || substr(md5(x), 1, hexLen))::BIGINT`
 * (PortableHashSpec pins the equivalence property).
 *
 * Why an Expression: the composed form is the engine's hottest scalar —
 * one call per shingle / winnow gram / KMV member — and it allocates four
 * intermediates per call (UTF8String→bytes, 32-char hex string, substring,
 * conv's base-16 parse). This computes the same 60/56-bit prefix straight
 * off the digest bytes (big-endian first 8 bytes, shifted) with a
 * thread-local reused MessageDigest, inside whole-stage codegen. Isolated
 * A/B at sf0.1 (min-of-3): the winnow gram-hash pass dropped 3.0→2.1 s
 * (~1.4×); every md5-family operator shares the gain.
 *
 * The hex-prefix-of-md5 family is the engine's cross-engine portability
 * contract (SURVEY §2.9): any md5-capable engine reproduces it, which is
 * what lets banded MinHash, winnowing, KMV sketches and split gates
 * oracle-check bit-for-bit.
 */
case class PortableHash(child: Expression, hexLen: Int)
    extends UnaryExpression {
  require(hexLen >= 1 && hexLen <= 15, s"hexLen must be in [1,15]: $hexLen")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_portable_hash expects a string input, got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_portable_hash"

  override def nullSafeEval(input: Any): Any =
    PortableHash.hash(input.asInstanceOf[UTF8String], hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash.hash($c, $hexLen)")

  override protected def withNewChildInternal(newChild: Expression): PortableHash =
    copy(child = newChild)
}

object PortableHash {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First `hexLen` hex digits of md5(s) as a long: the big-endian first
    * 8 digest bytes, right-shifted to keep 4·hexLen bits — exactly what
    * `parseLong(hexDigest.take(hexLen), 16)` yields, without ever
    * materializing the hex string. */
  def hash(s: UTF8String, hexLen: Int): Long = {
    val b = s.getBytes
    hashBytes(b, 0, b.length, hexLen)
  }

  /** [[hash]] over a byte range — lets gram-scanning expressions
    * ([[WinnowFps]]) hash m substrings with zero per-gram allocation. */
  private[functions] def hashBytes(b: Array[Byte], off: Int, len: Int,
      hexLen: Int): Long = {
    val d = digest.get()
    d.reset()
    d.update(b, off, len)
    val bytes = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> (64 - 4 * hexLen)
  }
}
