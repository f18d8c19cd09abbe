package graft.expressions

import graft.functions.Hashing

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expressions for the dedup signature hot path.
  *
  * The `Column`-combinator formulations (16 × `transform`+`array_min` for
  * MinHash, 64 × `filter`/`size` for SimHash) are semantically right but
  * evaluate through interpreted higher-order-function lambdas — one boxed
  * call tree per element per permutation. These expressions compute the
  * identical values in a single primitive pass per row (measured ~10x on
  * the signature stage at sf0.1). Same preference order as SURVEY §7:
  * compose built-ins first, drop to a custom `Expression` where the
  * built-ins can't express the computation efficiently.
  *
  * All three are deterministic, null-safe, and participate in whole-stage
  * codegen. Codegen SHAPE is a measured decision (round 13, sf0.1 dedup
  * family, A/B on the same host): fully INLINING the loops into the
  * generated consume chain — the `DotProduct` treatment — was ~10-15%
  * SLOWER than the round-12 `CodegenFallback` (19.4/20.9 s fallback vs
  * 22.2/24.4 s inlined over the 7-query family; the 128-iteration inner
  * loop bloats an already-wide generated method past JIT-friendliness,
  * and the loop itself can't profit from expression-level codegen the way
  * DotProduct's per-pair loop does). What IS worth keeping from real
  * `doGenCode` is staying inside the whole-stage span without the
  * fallback's boxed re-evaluation of the child through an InternalRow: each
  * [[doGenCode]] therefore emits ONE static call per row into the shared
  * JIT-compiled helper ([[h32ArrayEval]]/[[minhashEval]]/[[simhashEval]])
  * that [[UnaryExpression.nullSafeEval]] also calls — bit-identical by
  * construction (single implementation), pinned by the CODEGEN_ONLY vs
  * NO_CODEGEN parity spec. Values are bit-identical to the combinator
  * forms and to the DuckDB oracle SQL (`Hashing.h32Sql`,
  * `Dedup.minhashSignatureSql`, `Dedup.simhashSql`).
  */
object SignatureExpressions {

  /** Per-thread MD5 instance: the interpreted path used to allocate one
    * MessageDigest per ROW; thread-local reuse removes that allocation from
    * both eval paths.
    */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Shared eval of [[H32Array]] — called by both the interpreted path and
    * the generated code (via the object's static forwarder).
    */
  def h32ArrayEval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val bytes = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 hex chars == first 4 bytes, read big-endian, unsigned
        out(i) = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
          ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shared eval of [[MinHashSignature]]: the `permA.length`-entry signature
    * — min over the array of `(a_p*h + b_p) mod M` per permutation — in one
    * primitive pass. Empty/all-null input yields an all-NULL signature
    * (matching `array_min(empty) = NULL`).
    */
  def minhashEval(arr: ArrayData, permA: Array[Long], permB: Array[Long]): ArrayData = {
    val numPerms = permA.length
    val n = arr.numElements()
    val mins = Array.fill[Long](numPerms)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i) % Hashing.M
        var p = 0
        while (p < numPerms) {
          // h' < M, a < M ⇒ a*h'+b < (M-1)²+M < 2^62: exact; operands
          // non-negative ⇒ % == pmod
          val v = (permA(p) * h + permB(p)) % Hashing.M
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](numPerms))
    else new GenericArrayData(mins)
  }

  /** Shared eval of [[SimHash32]]: bit j set iff at least half the hashes
    * have bit j set.
    */
  def simhashEval(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        total += 1
        val h = arr.getLong(i)
        var j = 0
        while (j < 32) {
          counts(j) += ((h >> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (2 * counts(j) >= total) out |= (1L << j)
      j += 1
    }
    out
  }

  private val Helper = "graft.expressions.SignatureExpressions"

  /** `array<string>` → `array<long>`: [[Hashing.h32]] of every element in
    * one pass (md5 via MessageDigest, first 8 hex chars as unsigned 32-bit).
    */
  case class H32Array(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "h32_array"

    override protected def nullSafeEval(input: Any): Any =
      h32ArrayEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $Helper.h32ArrayEval($a);")

    override protected def withNewChildInternal(newChild: Expression): H32Array =
      copy(child = newChild)
  }

  /** `array<long>` → `array<long>`: the `numPerms`-entry MinHash signature.
    * Width defaults to the narrow [[Hashing.NumPerms]] prefix; the wide
    * [[Hashing.NumPermsWide]] form backs the 16×8-banded near-dup path.
    */
  case class MinHashSignature(child: Expression, numPerms: Int = Hashing.NumPerms)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "minhash_signature"

    private val permA = Hashing.PermA.take(numPerms).toArray
    private val permB = Hashing.PermB.take(numPerms).toArray

    override protected def nullSafeEval(input: Any): Any =
      minhashEval(input.asInstanceOf[ArrayData], permA, permB)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("permA", permA, "long[]")
      val bRef = ctx.addReferenceObj("permB", permB, "long[]")
      nullSafeCodeGen(ctx, ev, in =>
        s"${ev.value} = $Helper.minhashEval($in, $aRef, $bRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** `array<long>` → `long`: 32-bit SimHash — bit j set iff at least half
    * the hashes have bit j set — in one pass.
    */
  case class SimHash32(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"

    override protected def nullSafeEval(input: Any): Any =
      simhashEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $Helper.simhashEval($in);")

    override protected def withNewChildInternal(newChild: Expression): SimHash32 =
      copy(child = newChild)
  }

  // ------------------------------------------------------- Column wrappers

  def h32Array(c: Column): Column =
    ColumnBridge.column(H32Array(ColumnBridge.expression(c)))

  def minhashSignature(c: Column, numPerms: Int = Hashing.NumPerms): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), numPerms))

  def simhash32(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))
}
