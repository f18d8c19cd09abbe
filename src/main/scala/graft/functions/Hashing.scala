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

  /** Mersenne prime 2^61-1: modulus of the affine minhash permutations.
    * a*h + b stays < 2^63 for a < 2^30, h < 2^32.
    */
  val P: Long = 2305843009213693951L

  /** Fixed affine permutation constants (prime multipliers < 2^30, so
    * `a*h` stays < 2^62 for 32-bit `h`). Derived from small primes; any
    * fixed values work, they just must match the oracle side ([[permSql]]).
    */
  val PermA: Seq[Long] = Seq(
    98317L, 196613L, 393241L, 786433L, 1572869L, 3145739L, 6291469L, 12582917L,
    25165843L, 50331653L, 100663319L, 201326611L, 402653189L, 805306457L, 268435399L, 536870909L)
  val PermB: Seq[Long] = Seq(
    53L, 97L, 193L, 389L, 769L, 1543L, 3079L, 6151L,
    12289L, 24593L, 49157L, 98317L, 196613L, 393241L, 786433L, 1572869L)
  val NumPerms: Int = PermA.size

  /** Affine permutation `perm(i, h) = (a_i * h + b_i) mod P` of a hash. */
  def perm(i: Int, h: Column): Column =
    pmod(h * lit(PermA(i)) + lit(PermB(i)), lit(P))

  /** DuckDB rendering of [[perm]]. */
  def permSql(i: Int, hExpr: String): String =
    s"(($hExpr * ${PermA(i)} + ${PermB(i)}) % $P)"
}
