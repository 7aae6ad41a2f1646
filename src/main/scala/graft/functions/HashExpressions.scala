package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-hashing hot loops.
  *
  * Semantics are EXACTLY the portable md5 arithmetic of
  * [[TextFunctions.hash32]]/[[TextFunctions.shingleHashes]] (md5's first —
  * or second — 4 bytes as an unsigned 32-bit big-endian value, optionally
  * mod [[TextFunctions.HashPrime]]), so DuckDB oracles and the Column-
  * program formulations agree bit-for-bit. The win is mechanical: one
  * `eval` per row with a tight byte-level loop replaces a per-element
  * interpreted higher-order-function chain (concat → md5-hex → substring →
  * base-16 parse) — measured ~6× on the shingle path at sf0.1.
  */
object HashSupport {
  private val digests = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  private val Space = ' '.toByte

  /** Unsigned 32-bit from 4 md5 bytes at `offset`. */
  def hashBytes(md: MessageDigest, bytes: Array[Byte], offset: Int): Long = {
    val d = md.digest(bytes)
    ((d(offset) & 0xffL) << 24) | ((d(offset + 1) & 0xffL) << 16) |
      ((d(offset + 2) & 0xffL) << 8) | (d(offset + 3) & 0xffL)
  }

  /** Hash every token: md5(token) bytes [byteOffset, byteOffset+4). */
  def tokenHashes(tokens: ArrayData, byteOffset: Int): ArrayData = {
    val md = digests.get()
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = hashBytes(md, tokens.getUTF8String(i).getBytes, byteOffset)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hash every k-gram (tokens joined by a single space), mod `mod`. */
  def shingleHashes(tokens: ArrayData, k: Int, mod: Long): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val md = digests.get()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Long](n - k + 1)
    var j = 0
    while (j <= n - k) {
      var len = k - 1
      var c = 0
      while (c < k) { len += toks(j + c).length; c += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      c = 0
      while (c < k) {
        if (c > 0) { buf(pos) = Space; pos += 1 }
        val t = toks(j + c)
        System.arraycopy(t, 0, buf, pos, t.length)
        pos += t.length
        c += 1
      }
      out(j) = hashBytes(md, buf, 0) % mod
      j += 1
    }
    new GenericArrayData(out)
  }

  /** UTF-8 byte count of the code point starting with `b` (manual decode —
    * keeps this support object free of any Spark-internal static).
    */
  private def cpBytes(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1 else if (u < 0xe0) 2 else if (u < 0xf0) 3 else 4
  }

  /** md5-derived 32-bit hash of every k-CHARACTER window of `text`
    * (positions 0..numChars−k) — the character-level analog of
    * [[shingleHashes]], bit-identical to `md5(substr(text, i+1, k))`
    * first-4-bytes in both engines. One tight loop per row: the
    * interpreted transform/substr/md5-hex/conv chain this replaces
    * measured ~5× slower at sf0.1. ASCII corpora take the byte==char fast
    * path; multi-byte text pays one offset-index pass.
    */
  def charGramHashes(text: UTF8String, k: Int): ArrayData = {
    val nChars = text.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Long])
    val md = digests.get()
    val bytes = text.getBytes
    val out = new Array[Long](nChars - k + 1)
    def hashRange(off: Int, len: Int): Long = {
      md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    if (bytes.length == nChars) {
      var i = 0
      while (i <= nChars - k) { out(i) = hashRange(i, k); i += 1 }
    } else {
      val offsets = new Array[Int](nChars + 1)
      var b = 0
      var c = 0
      while (c < nChars) { offsets(c) = b; b += cpBytes(bytes(b)); c += 1 }
      offsets(nChars) = bytes.length
      var i = 0
      while (i <= nChars - k) { out(i) = hashRange(offsets(i), offsets(i + k) - offsets(i)); i += 1 }
    }
    new GenericArrayData(out)
  }

  /** One 32-bit SimHash word over a token-hash array: bit j set when the
    * signed per-bit vote sum is positive.
    */
  def simhashWord(hs: ArrayData): Long = {
    val n = hs.numElements()
    val sums = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        sums(j) += (((h >> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var word = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) word |= 1L << j
      j += 1
    }
    word
  }
}

/** array<string> → array<long>: per-token md5-derived 32-bit hash.
  * `byteOffset` 0 = [[TextFunctions.hash32]], 4 = [[TextFunctions.hash32b]].
  *
  * Codegen-native: the generated code calls the same [[HashSupport]] loop
  * (via its static forwarder), so the expression participates in
  * whole-stage codegen without row boxing — eval and codegen share one
  * implementation and can never drift.
  */
case class TokenHash32(child: Expression, byteOffset: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"TokenHash32 expects array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSupport.tokenHashes(input.asInstanceOf[ArrayData], byteOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashSupport.tokenHashes($c, $byteOffset);")

  override protected def withNewChildInternal(newChild: Expression): TokenHash32 =
    copy(child = newChild)
}

/** array<string> tokens → array<long> of k-gram hashes mod `mod` — fused
  * shingle construction + hashing (positions 0..n−k, space-joined).
  */
case class ShingleHash32(child: Expression, k: Int, mod: Long) extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ShingleHash32 expects array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSupport.shingleHashes(input.asInstanceOf[ArrayData], k, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashSupport.shingleHashes($c, $k, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash32 =
    copy(child = newChild)
}

/** string → array<long>: md5-derived 32-bit hash per k-character window
  * (fused character-shingle hashing for exact-substring dedup).
  */
case class CharGramHash32(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "gram length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"CharGramHash32 expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSupport.charGramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashSupport.charGramHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHash32 =
    copy(child = newChild)
}

/** array<long> of 32-bit token hashes → one 32-bit SimHash word: bit j set
  * when Σ over tokens of ±1 (per hash bit j) is positive. Fused loop —
  * replaces 32 interpreted per-bit aggregate scans.
  */
case class SimHashWord(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"SimHashWord expects array<long>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSupport.simhashWord(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashSupport.simhashWord($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashWord =
    copy(child = newChild)
}

object HashExpressions {

  /** Fused tokens→k-gram-hash array (mod [[TextFunctions.HashPrime]]). */
  def shingleHash32(toks: Column, k: Int): Column =
    ColumnBridge.column(ShingleHash32(ColumnBridge.expression(toks), k, TextFunctions.HashPrime))

  /** Per-token 32-bit hash array; `second` selects md5 bytes 4..8. */
  def tokenHash32(toks: Column, second: Boolean = false): Column =
    ColumnBridge.column(TokenHash32(ColumnBridge.expression(toks), if (second) 4 else 0))

  /** Fused SimHash word over a token-hash array. */
  def simhashWord(hashes: Column): Column =
    ColumnBridge.column(SimHashWord(ColumnBridge.expression(hashes)))

  /** Fused per-k-character-window hash array (exact-substring dedup). */
  def charGramHash32(text: Column, k: Int): Column =
    ColumnBridge.column(CharGramHash32(ColumnBridge.expression(text), k))
}
