package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst replacements for the repo's three hottest interpreted
  * higher-order-function kernels (guide §1.2 step 2 / §4: once the job shape
  * is right, the per-task work must not run through CodegenFallback lambdas).
  * Spark's array HOFs (`transform`, `aggregate`) evaluate their lambda bodies
  * with the INTERPRETED expression evaluator per element — a per-token
  * `aggregate(sequence(1, length(tok)), ...)` allocates a boxed position
  * array and walks an expression tree per character. These expressions
  * generate one static call inside whole-stage codegen and match the
  * replaced Column trees bit-for-bit:
  *
  *  - [[PolyHash]]  == aggregate(sequence(1, length(s)), 0L,
  *                       (acc, i) => (acc*b + ascii(substr(s, i, 1))) % m)
  *    Spark's `ascii` is `toString.codePointAt(0)` of the 1-char substring
  *    (verified against the 4.1.2 bytecode), i.e. a CODE-POINT walk — the
  *    loop here decodes the same way, so zh/CJK tokens hash identically.
  *  - [[GramMd5s]]  == transform(sequence(1, size(toks)-k+1),
  *                       i => md5(array_join(slice(toks, i, k), " ")))
  *    md5 bytes == MD5 over the UTF-8 concatenation with single 0x20
  *    separators; null elements are skipped exactly like array_join.
  *  - [[Winnow]]    == the fingerprints pipeline's hash+window+distinct:
  *    array_distinct(transform(.., j => array_min(slice(hs, j, w)))) over
  *    hs = transform(.., i => Horner fold of k code points mod m), with
  *    array_distinct's first-occurrence order preserved.
  */
object TextHash {
  private val Hex = "0123456789abcdef".toCharArray

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Horner fold of the string's Unicode code points: acc*b + cp mod m.
    * Walks `toString` + codePointAt so malformed byte sequences degrade to
    * U+FFFD exactly like the `ascii(substr(...))` tree it replaces.
    */
  def polyHash(s: UTF8String, b: Long, m: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * b + cp) % m
      i += Character.charCount(cp)
    }
    acc
  }

  /** md5 hex (lowercase — DigestUtils.md5Hex parity) of every k-token
    * window of `toks` joined by a single space. Windows are 1-based
    * positions 1..n-k+1; n < k yields the empty array (callers guard, the
    * HOF form's sequence() would have produced a descending range there).
    */
  def gramMd5s(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val digest = mdLocal.get()
    val out = new Array[Any](n - k + 1)
    var w = 0
    while (w <= n - k) {
      digest.reset()
      var first = true
      var j = 0
      while (j < k) {
        val t = toks(w + j)
        if (t != null) { // array_join semantics: null elements are skipped
          if (!first) digest.update(0x20.toByte)
          digest.update(t)
          first = false
        }
        j += 1
      }
      out(w) = hex(digest.digest())
      w += 1
    }
    new GenericArrayData(out)
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val cs = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(2 * i) = Hex((d(i) >> 4) & 0xf).toByte
      cs(2 * i + 1) = Hex(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  /** Winnowing fingerprints of `s`: k-gram Horner hashes over code points
    * (positions are CHARACTER positions, matching substr), minimum of every
    * w-window, deduplicated in first-occurrence order (array_distinct
    * parity). Callers guard length >= k + w (the fingerprints filter).
    */
  def winnow(s: UTF8String, k: Int, w: Int, b: Long, m: Long): ArrayData = {
    val str = s.toString
    // decode once to a code-point array (char positions == code points)
    var cpCount = 0
    var ci = 0
    while (ci < str.length) { cpCount += 1; ci += Character.charCount(str.codePointAt(ci)) }
    val cps = new Array[Int](cpCount)
    ci = 0
    var p = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(p) = cp; p += 1
      ci += Character.charCount(cp)
    }
    val nH = cpCount - k + 1 // k-gram hash count (callers guard nH >= w)
    if (nH < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](nH)
    var i = 0
    while (i < nH) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * b + cps(i + j)) % m; j += 1 }
      hs(i) = acc
      i += 1
    }
    val nW = nH - w + 1
    if (nW < 1) return new GenericArrayData(Array.empty[Any])
    // sliding-window minimum via monotonic deque: O(n) instead of O(n*w);
    // array_min of equal values picks the value (position-independent), so
    // ties need no tie-break — the VALUE stream is what the transform built
    val deque = new Array[Int](nH)
    var head = 0
    var tail = 0 // [head, tail) indices into hs, increasing, hs values increasing
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nH) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hs(deque(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }
}

/** See [[TextHash.polyHash]]. */
case class PolyHash(child: Expression, b: Long, m: Long) extends UnaryExpression {
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_polyhash expects a string arg, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(input: Any): Any =
    TextHash.polyHash(input.asInstanceOf[UTF8String], b, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash$$.MODULE$$.polyHash($c, ${b}L, ${m}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[TextHash.gramMd5s]]. */
case class GramMd5s(child: Expression, k: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_gram_md5 expects array<string>, got $t")
  }

  // containsNull=true, matching the nullability the replaced transform()
  // tree declared — parquet field optionality (and so the driver's schema
  // compare) must not shift under a pure performance change
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_gram_md5"

  override def nullSafeEval(input: Any): Any =
    TextHash.gramMd5s(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash$$.MODULE$$.gramMd5s($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[TextHash.winnow]]. */
case class Winnow(child: Expression, k: Int, w: Int, b: Long, m: Long) extends UnaryExpression {
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_winnow expects a string arg, got $t")
  }

  // containsNull=true: nullability parity with the replaced HOF tree (see
  // GramMd5s)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    TextHash.winnow(input.asInstanceOf[UTF8String], k, w, b, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHash$$.MODULE$$.winnow($c, $k, $w, ${b}L, ${m}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
