package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins — the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. the skew is in the *build* of an
  * aggregation, or the planner's thresholds don't trigger).
  *
  * A hot key routes all its rows to one reducer; at 100 TB one key can be
  * a whole executor's worth of data. Salting scatters the large side's hot
  * keys across `salt` sub-keys and replicates the small side to match:
  * shuffle parallelism on the hot key becomes `salt` instead of 1, at the
  * cost of `salt`× the small side (which is why the small side must be the
  * replicated one).
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on in [[graft.GraftSession]])
  * solves the common sort-merge case at runtime; this utility is the
  * explicit, composable form.
  */
object SkewJoin {

  /** Inner equi-join of `large ⋈ small` on `key`, salted `salt` ways.
    * The salt for each large-side row is a deterministic hash of the whole
    * row, so repeated runs produce identical partition routing.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedLarge = large.withColumn(
      "__salt", pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val replicatedSmall = small.withColumn(
      "__salt", explode(array((0 until salt).map(lit): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
