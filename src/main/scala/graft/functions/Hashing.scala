package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * Everything downstream that needs a numeric hash (minhash, simhash, LSH
  * bucketing, fingerprints) derives it from the first 8 hex chars of md5 —
  * NOT from Spark's `hash()`/`xxhash64()` — because the DuckDB oracle must
  * reproduce the value bit-for-bit with `CAST('0x' || substr(md5(x),1,8) AS
  * BIGINT)`. md5 is stable across engines; engine-native hash functions are
  * not. The 32-bit slice keeps all downstream affine arithmetic
  * (`a*h + b mod p`) inside exact Long range (a < 2^31, h < 2^32 ⇒ product
  * < 2^63).
  *
  * All of these are `Column` expressions built from Spark built-ins, so they
  * stay inside whole-stage codegen — no Scala UDF opacity, predicates around
  * them still push down.
  */
object Hashing {

  /** Universe size of [[h32]]: hashes are uniform in [0, 2^32). */
  val H32Max: Long = 1L << 32

  /** 32-bit hash of a string column as a Long in [0, 2^32). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB rendering of [[h32]] — keep in lockstep with the Column form. */
  def h32Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 8)) AS BIGINT)"

  /** Mersenne prime 2^31-1: modulus of the affine minhash permutations.
    * The hash is first reduced mod M, and multipliers range over [1, M),
    * so `a * (h mod M)` wraps the modulus ~10⁹ times — a genuinely mixing
    * universal-hash family. (An earlier family used modulus 2^61-1 with
    * multipliers < 2^30 to keep `a*h` in Long range, but then `a*h+b`
    * wraps AT MOST ONCE for 32-bit `h`: the map is close to
    * order-preserving, its argmins rank-correlate across "permutations",
    * and dissimilar documents agree on large signature prefixes — measured
    * as est-jaccard ≈ 0.57 on pairs with true jaccard < 0.01, which is
    * also the real driver of the ×100 banded-candidate explosion the
    * round-6 stress log attributed to banding shape alone.) Products stay
    * exact: (M-1)² < 2^62.
    */
  val M: Long = 2147483647L

  /** Fixed affine permutation constants: `a_i ∈ [1, M)`, `b_i ∈ [0, M)`,
    * generated from golden-ratio Weyl sequences (deterministic,
    * well-mixed, pairwise distinct). Any fixed values work — they just
    * must match the oracle side ([[permSql]]), which renders from these
    * same arrays.
    */
  val PermA: IndexedSeq[Long] =
    (0 until 128).map(i => (((0x9E3779B97F4A7C15L * (i + 1)) >>> 3) % (M - 1)) + 1)
  val PermB: IndexedSeq[Long] =
    (0 until 128).map(i => ((0xC2B2AE3D27D4EB4FL * (i + 1)) >>> 3) % M)

  /** Narrow signature width: the 16-perm prefix used by the r=2
    * low-threshold banding paths (`dedup_ngram_jaccard`) and the
    * SQL-injected `minhash_signature`.
    */
  val NumPerms: Int = 16

  /** Wide signature width for high-threshold LSH banding (16 bands × 8
    * rows — see `DedupQueries.minhashStages`): the ×100 stress run measured
    * 8×2 banding's n²·E[j²] random-collision term going quadratic by 5·10⁵
    * docs; 8 rows per band pushes random collisions (≈ E[j⁸] per band)
    * back under the linear term at the cost of recall below j ≈ 0.7.
    */
  val NumPermsWide: Int = 128
  require(PermA.size == NumPermsWide && PermB.size == NumPermsWide)
  require(PermA.distinct.size == NumPermsWide, "permutation multipliers must be distinct")
  require(PermA.forall(a => a > 0 && a < M) && PermB.forall(b => b >= 0 && b < M))

  /** Affine permutation `perm(i, h) = (a_i * (h mod M) + b_i) mod M`. */
  def perm(i: Int, h: Column): Column =
    pmod(pmod(h, lit(M)) * lit(PermA(i)) + lit(PermB(i)), lit(M))

  /** DuckDB rendering of [[perm]]. */
  def permSql(i: Int, hExpr: String): String =
    s"((($hExpr % $M) * ${PermA(i)} + ${PermB(i)}) % $M)"
}
