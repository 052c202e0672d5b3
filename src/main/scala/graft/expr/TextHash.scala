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

object ShingleMinHash {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** Spark's xxhash64 default seed (XxHash64 expression). */
  final val Seed = 42L

  /** xxhash64(seed 42) of every 3-character shingle of `s` — byte-identical
    * to xxhash64(substr(s, i, 3)): XxHash64 over a string hashes its UTF-8
    * bytes, and the windows below are byte SLICES at code-point boundaries,
    * so no per-shingle UTF8String is ever allocated. len < 3 chars yields
    * the empty array (the callers' guard branch).
    */
  def shingleHashes(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    // byte offset of each character start, plus the end sentinel
    val offs = new Array[Int](s.numChars() + 1)
    var c = 0
    var i = 0
    while (i < nBytes) {
      offs(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
    }
    offs(c) = nBytes
    if (c < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](c - 2)
    i = 0
    while (i < c - 2) {
      val st = offs(i)
      out(i) = XXH64.hashUnsafeBytes(base, off + st, offs(i + 3) - st, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-permutation seeds: xxhash64(lit(i), h) hashes the int literal first
    * (hashInt(i, 42)) and feeds the result as the seed of hashLong(h, _).
    */
  private def seedsFor(p: Int): Array[Long] = Array.tabulate(p)(XXH64.hashInt(_, Seed))
  private val seeds64 = seedsFor(64)

  /** The `p` minhash signature values min_h xxhash64(i, h) over the
    * (possibly duplicated) shingle hashes — one native double loop instead
    * of p separate min-aggregate columns over exploded rows. Signed-long
    * min, matching the min() aggregate.
    */
  def minhash(hashes: ArrayData, p: Int): ArrayData = {
    val seeds = if (p == 64) seeds64 else seedsFor(p)
    val out = Array.fill[Long](p)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < p) {
        val v = XXH64.hashLong(h, seeds(i))
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out.map(x => x: Any))
  }

  /** Count of positions where the two equal-length signature arrays agree —
    * size(filter(zip_with(a, b, ==), identity)) without the interpreted
    * lambda walk.
    */
  def positionalEq(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** |a ∩ b| for two DISTINCT long arrays — size(array_intersect(a, b))
    * without the per-pair interpreted set build (sort the smaller side once,
    * binary-search the larger).
    */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val (s, l) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = s.numElements()
    val sorted = new Array[Long](ns)
    var i = 0
    while (i < ns) { sorted(i) = s.getLong(i); i += 1 }
    java.util.Arrays.sort(sorted)
    var c = 0
    val nl = l.numElements()
    i = 0
    while (i < nl) {
      if (java.util.Arrays.binarySearch(sorted, l.getLong(i)) >= 0) c += 1
      i += 1
    }
    c
  }
}

/** See [[ShingleMinHash.shingleHashes]]. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_shingles expects a string arg, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def nullSafeEval(input: Any): Any =
    ShingleMinHash.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleMinHash$$.MODULE$$.shingleHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[ShingleMinHash.minhash]]. */
case class MinHashSig(child: Expression, p: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullSafeEval(input: Any): Any =
    ShingleMinHash.minhash(input.asInstanceOf[ArrayData], p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleMinHash$$.MODULE$$.minhash($c, $p)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[ShingleMinHash.positionalEq]]. */
case class PositionalEqCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_sig_agree expects array<bigint> args, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sig_agree"
  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleMinHash.positionalEq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ShingleMinHash$$.MODULE$$.positionalEq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** See [[ShingleMinHash.intersectCount]]. */
case class IntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_intersect_n expects array<bigint> args, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_intersect_n"
  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleMinHash.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ShingleMinHash$$.MODULE$$.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
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
