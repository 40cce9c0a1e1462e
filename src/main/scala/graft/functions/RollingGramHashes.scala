package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, Literal, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Rolling 128-bit window hashes: `rolling_gram_hashes(tokens, n)` returns
  * one struct(h1, h2) per n-token window in occurrence order — the O(L)
  * twin of hashing each [[WordGrams]] window string, which materializes
  * every n-token gram (O(L·n) bytes of concatenation per document). Each
  * token is xxhash64'd ONCE, and window hashes are two independent
  * Rabin–Karp polynomials over the token-hash sequence, rolled in O(1)
  * per step (mod 2⁶⁴, odd bases, so the removal multiply is exact — odd
  * constants are invertible mod 2⁶⁴).
  *
  * Measured honestly (SCALING.md round 11, SPANSUBSTRATE_AB*.json): the
  * asymptotic CPU edge does NOT show up on tested corpora — per-window
  * concat+md5 costs about what this path's per-window struct allocation
  * costs, both minor next to the dup-set aggregate and joins. What makes
  * this expression the right default for REMOVAL operators is its KEY
  * WIDTH: a 100 TB removal pass has ~10¹² windows, where 60-bit md5 keys
  * produce ~10⁶ birthday collisions — each a false duplicate pair that
  * cuts non-duplicated text — vs ~10⁻¹⁵ expected false pairs at 128 bits.
  *
  * Collision contract: two windows collide only if BOTH polynomials agree.
  * For non-adversarial corpora (token hashes ~uniform, fixed odd base)
  * a colliding pair has probability ≈2⁻⁶⁴ per polynomial, ≈2⁻¹²⁸
  * jointly — ~10⁻¹⁵ expected false window pairs across the ~10¹² windows
  * of a 100 TB corpus. Adversarially-constructed token streams CAN defeat
  * fixed-base mod-2⁶⁴ polynomials (Thue–Morse-style multiplicity
  * patterns); pipelines dedup'ing hostile input should use the
  * [[WordGrams]]+md5 substrate instead.
  *
  * Semantics parity with [[WordGrams]]: fewer than n tokens → empty
  * array; NULL array or any NULL element → NULL.
  */
case class RollingGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val n = right.eval(null)
      if (n != null && n.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = RollingGramHashes.outType

  override def nullIntolerant: Boolean = true

  // a NULL element yields NULL regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, n: Any): Any =
    RollingGramOps.hashes(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, n) => {
      // `nullable` is always true, so ev.isNull is a real variable
      s"""
         |${ev.value} = graft.functions.RollingGramOps.hashes($arr, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override def prettyName: String = "rolling_gram_hashes"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingGramHashes =
    copy(left = newLeft, right = newRight)
}

object RollingGramHashes {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)

  def rollingGramHashes(tokens: Column, n: Int): Column =
    GraftSql.column(RollingGramHashes(GraftSql.expression(tokens), Literal(n)))
}

/** Single-long form of [[RollingGramHashes]]: `rolling_gram_keys(tokens,
  * n)` emits `h1 ^ rotl(h2, 32)` per window — one 64-bit key mixing both
  * polynomials, for consumers that shuffle/probe the key rather than pin
  * its halves (decontamination gram sets). 64 bits is WIDER than the
  * md5₆₀ keys these call sites previously shuffled, so the birthday
  * arithmetic only improves; the same adversarial-corpus caveat as
  * [[RollingGramHashes]] applies (hostile token streams → use the
  * [[WordGrams]]+md5 substrate). Semantics parity: fewer than n tokens →
  * empty array; NULL array or NULL element → NULL.
  */
case class RollingGramKeys(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val n = right.eval(null)
      if (n != null && n.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  // a NULL element yields NULL regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, n: Any): Any =
    RollingGramOps.keys(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, n) => {
      // `nullable` is always true, so ev.isNull is a real variable
      s"""
         |${ev.value} = graft.functions.RollingGramOps.keys($arr, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override def prettyName: String = "rolling_gram_keys"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingGramKeys =
    copy(left = newLeft, right = newRight)
}

object RollingGramKeys {
  def rollingGramKeys(tokens: Column, n: Int): Column =
    GraftSql.column(RollingGramKeys(GraftSql.expression(tokens), Literal(n)))
}

/** Static helpers called from generated code. */
object RollingGramOps {
  // xxhash64 seed for per-token hashing; h2's token values derive from
  // h1's via an independent 64-bit finalizer so the token bytes are read
  // exactly once per token.
  private final val Seed = 0x5bd1e995L
  private final val H2Salt = 0x165667b19e3779f9L
  final val B1 = 0x9e3779b97f4a7c15L // odd → invertible mod 2^64
  final val B2 = 0xc2b2ae3d27d4eb4fL // odd, independent of B1

  /** MurmurHash3 fmix64 finalizer: a 64-bit bijection, so h2's token
    * values are a deterministic permutation of (h1 + salt) — independent
    * mixing without a second pass over the token bytes.
    */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** xxhash64 of one token's UTF-8 bytes — the h1 coefficient. Exposed so
    * tests and brute-force twins hash tokens identically.
    */
  def tokenHash(t: org.apache.spark.unsafe.types.UTF8String): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)

  def tokenHash2(h1: Long): Long = fmix64(h1 + H2Salt)

  /** One struct(h1, h2) per n-window, occurrence order; null return = a
    * NULL element was present (caller maps it to SQL NULL); empty array =
    * fewer than n tokens.
    */
  def hashes(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    val t1 = new Array[Long](len)
    val t2 = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (a.isNullAt(i)) return null
      val h = tokenHash(a.getUTF8String(i))
      t1(i) = h
      t2(i) = tokenHash2(h)
      i += 1
    }
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    var pow1 = 1L
    var pow2 = 1L
    i = 1
    while (i < n) { pow1 *= B1; pow2 *= B2; i += 1 }
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < n) { h1 = h1 * B1 + t1(i); h2 = h2 * B2 + t2(i); i += 1 }
    val out = new Array[Any](m)
    out(0) = new GenericInternalRow(Array[Any](h1, h2))
    i = 1
    while (i < m) {
      h1 = (h1 - t1(i - 1) * pow1) * B1 + t1(i + n - 1)
      h2 = (h2 - t2(i - 1) * pow2) * B2 + t2(i + n - 1)
      out(i) = new GenericInternalRow(Array[Any](h1, h2))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[hashes]] mixed to one long per window: `h1 ^ rotl(h2, 32)`. Same
    * rolling recurrence, no struct rows.
    */
  def keys(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    val t1 = new Array[Long](len)
    val t2 = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (a.isNullAt(i)) return null
      val h = tokenHash(a.getUTF8String(i))
      t1(i) = h
      t2(i) = tokenHash2(h)
      i += 1
    }
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    var pow1 = 1L
    var pow2 = 1L
    i = 1
    while (i < n) { pow1 *= B1; pow2 *= B2; i += 1 }
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < n) { h1 = h1 * B1 + t1(i); h2 = h2 * B2 + t2(i); i += 1 }
    val out = new Array[Any](m)
    out(0) = h1 ^ java.lang.Long.rotateLeft(h2, 32)
    i = 1
    while (i < m) {
      h1 = (h1 - t1(i - 1) * pow1) * B1 + t1(i + n - 1)
      h2 = (h2 - t2(i - 1) * pow2) * B2 + t2(i + n - 1)
      out(i) = h1 ^ java.lang.Long.rotateLeft(h2, 32)
      i += 1
    }
    new GenericArrayData(out)
  }
}
