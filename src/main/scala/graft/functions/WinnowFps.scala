package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd winnowing selection (Schleimer et al. 2003) over a canonical
 * text: the distinct (window-min gram hash, rightmost position) pairs, in
 * ONE O(m) pass — gram hashes via [[PortableHash.hashBytes]] over byte
 * ranges (a char→byte offset index keeps CHARACTER substring semantics
 * for non-ASCII text, matching `substr`) and a monotonic deque for the
 * sliding minima, so neither the m-element gram-struct array nor any of
 * the m·w window slices ever materializes.
 *
 * BIT-IDENTICAL to the composed higher-order-function pipeline it
 * replaces (per-window `array_min(slice(...))` over (h, −pos) structs +
 * `array_distinct` — kept as
 * [[graft.operators.Winnow.fingerprintArrayComposed]] for WinnowSpec's
 * equivalence property): the deque orders by (h asc, pos desc) exactly
 * like the struct comparison, and consecutive-only dedup equals
 * array_distinct because a window range selecting one (h, pos) is
 * contiguous. Texts shorter than k grams yield an empty array (total,
 * never null-on-non-null).
 */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_winnow expects a string input, got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("fp", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFps.select($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  /** UTF-8 sequence length from its first byte (1-4; malformed bytes
    * count 1, the lenient walk `UTF8String.numChars` uses). */
  private def seqLen(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1

  def select(t: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = t.getBytes
    // char -> byte offset index (one walk): off(c) = byte start of char c
    val nBytes = bytes.length
    var n = 0
    var idx = 0
    while (idx < nBytes) { idx += seqLen(bytes(idx)); n += 1 }
    val m = n - k + 1
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](n + 1)
    idx = 0
    var c = 0
    while (idx < nBytes) { off(c) = idx; idx += seqLen(bytes(idx)); c += 1 }
    off(n) = nBytes
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      h(i) = PortableHash.hashBytes(bytes, off(i), off(i + k) - off(i), 15)
      i += 1
    }
    // monotonic deque of gram indices, key (h asc, pos desc): a later
    // index evicts earlier ones with >= hash (rightmost tie-break)
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    val out = new java.util.ArrayList[Any]()
    var lastSel = -1
    i = 0
    while (i < m) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      val j = i - w + 1 // start of the window ending at i
      if (j >= 0) {
        while (dq(head) < j) head += 1
        val sel = dq(head)
        if (sel != lastSel) {
          out.add(InternalRow(h(sel), (sel + 1).toLong))
          lastSel = sel
        }
      }
      i += 1
    }
    if (m < w) // single truncated window over all grams
      out.add(InternalRow(h(dq(head)), (dq(head) + 1).toLong))
    new GenericArrayData(out.toArray)
  }
}
