package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed user-defined aggregators (the UDAF surface — SURVEY.md §2.3 maps
  * the reference's empty UDAF row to `Aggregator[IN, BUF, OUT]`).
  *
  * Aggregators run as partial (map-side) + merge (reduce-side) aggregation
  * like built-ins — the `merge` associativity contract is what makes them
  * safe at any partitioning, so buffers here are order-insensitive sums.
  */
object Udafs {

  /** Weighted mean: Σ(w·x) / Σ(w). Buffer is a pair of sums, so partial
    * aggregation and AQE partition coalescing can't change the result
    * beyond double-sum reorder (callers needing bit-stability aggregate
    * decimals instead).
    */
  final case class WeightedMeanBuf(sum: Double, weight: Double)

  object WeightedMean extends Aggregator[(Double, Double), WeightedMeanBuf, Double] {
    override def zero: WeightedMeanBuf = WeightedMeanBuf(0.0, 0.0)
    override def reduce(b: WeightedMeanBuf, in: (Double, Double)): WeightedMeanBuf =
      WeightedMeanBuf(b.sum + in._1 * in._2, b.weight + in._2)
    override def merge(a: WeightedMeanBuf, b: WeightedMeanBuf): WeightedMeanBuf =
      WeightedMeanBuf(a.sum + b.sum, a.weight + b.weight)
    override def finish(b: WeightedMeanBuf): Double =
      if (b.weight == 0.0) Double.NaN else b.sum / b.weight
    override def bufferEncoder: Encoder[WeightedMeanBuf] = Encoders.product
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** One scored candidate inside a top-k buffer. */
  final case class ScoredHit(vec_id: Long, label: String, cosine: Double)

  /** One scored (query, candidate) input row. */
  final case class QueryHit(query_id: Long, vec_id: Long, label: String, cosine: Double)

  /** Bounded per-group top-k under the total order (cosine DESC, vec_id
    * ASC). Because the order is total (vec_id is unique), reduce/merge are
    * exactly associative — the k survivors are the same for any partitioning
    * or merge order, and identical to `row_number() OVER (ORDER BY cosine
    * DESC, vec_id)` ≤ k.
    *
    * This is the scale fix for per-query exact top-k: as a typed Aggregator
    * it runs as map-side partial aggregation with an O(k) buffer, so the
    * shuffle ships ≤ queries × partitions × k tiny rows instead of the full
    * scored corpus into one task per query (the global-window formulation's
    * straggler at 100 TB).
    *
    * PRECONDITION: scores must be finite. Scala's total ordering on Double
    * ranks NaN as the WORST score, while `row_number() OVER (ORDER BY
    * cosine DESC)` — the documented-equivalent form and the oracle — ranks
    * NaN FIRST, so a NaN score (e.g. a cosine against a zero-norm vector)
    * would silently diverge. Callers guard upstream
    * (SimilarityQueries.normed drops zero-norm vectors).
    */
  final case class TopKByScore(k: Int) extends Aggregator[QueryHit, Seq[ScoredHit], Seq[ScoredHit]] {
    private val ord: Ordering[ScoredHit] =
      Ordering.by((s: ScoredHit) => (-s.cosine, s.vec_id))
    private def trim(s: Seq[ScoredHit]): Seq[ScoredHit] = s.sorted(ord).take(k)
    override def zero: Seq[ScoredHit] = Nil
    override def reduce(b: Seq[ScoredHit], a: QueryHit): Seq[ScoredHit] = {
      val hit = ScoredHit(a.vec_id, a.label, a.cosine)
      // fast path: buffer full (kept sorted by trim) and the new hit is no
      // better than the current worst — skip the O(k log k) re-sort, which
      // is almost every row once the heap warms up
      if (b.length >= k && ord.gteq(hit, b.last)) b
      else trim(hit +: b)
    }
    override def merge(a: Seq[ScoredHit], b: Seq[ScoredHit]): Seq[ScoredHit] = trim(a ++ b)
    override def finish(b: Seq[ScoredHit]): Seq[ScoredHit] = b.sorted(ord)
    override def bufferEncoder: Encoder[Seq[ScoredHit]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredHit]] = ExpressionEncoder()
  }

  /** One stratum member as seen by [[MinKByHash]]: the sampling hash plus
    * the document it belongs to (stratum columns ride along only for the
    * groupByKey, not the buffer).
    */
  final case class StratumDoc(source: String, lang: String, doc_id: Long, h: Long)

  /** One sampled survivor inside a [[MinKByHash]] buffer. */
  final case class SampledDoc(h: Long, doc_id: Long)

  /** Bounded per-stratum deterministic sample: the k members with the
    * smallest (hash, doc_id) — i.e. a uniform-without-replacement sample
    * whose randomness is a content-independent hash, so the same k docs are
    * selected on any cluster size or partitioning. Same associativity
    * argument as [[TopKByScore]]: (h, doc_id) is a total order (doc_id is
    * unique), so reduce/merge pick the same k survivors for any merge tree,
    * identical to `row_number() OVER (ORDER BY h, doc_id)` ≤ k.
    *
    * This is the scale shape for stratified sampling: a window formulation
    * shuffles and sorts the WHOLE stratum (one task per stratum at 100 TB);
    * this aggregator keeps O(k) state map-side and ships ≤ strata ×
    * partitions × k rows.
    */
  final case class MinKByHash(k: Int) extends Aggregator[StratumDoc, Seq[SampledDoc], Seq[SampledDoc]] {
    private val ord: Ordering[SampledDoc] =
      Ordering.by((s: SampledDoc) => (s.h, s.doc_id))
    private def trim(s: Seq[SampledDoc]): Seq[SampledDoc] = s.sorted(ord).take(k)
    override def zero: Seq[SampledDoc] = Nil
    override def reduce(b: Seq[SampledDoc], a: StratumDoc): Seq[SampledDoc] = {
      val hit = SampledDoc(a.h, a.doc_id)
      // buffer is kept sorted by trim; skip the re-sort when full and the
      // candidate is no better than the current worst survivor
      if (b.length >= k && ord.gteq(hit, b.last)) b
      else trim(hit +: b)
    }
    override def merge(a: Seq[SampledDoc], b: Seq[SampledDoc]): Seq[SampledDoc] = trim(a ++ b)
    override def finish(b: Seq[SampledDoc]): Seq[SampledDoc] = b.sorted(ord)
    override def bufferEncoder: Encoder[Seq[SampledDoc]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[SampledDoc]] = ExpressionEncoder()
  }

  /** Misra–Gries heavy-hitters summary: at most k counters over a stream of
    * items, O(k) state however large the stream. The classic guarantees,
    * which hold for ANY partitioning / merge order:
    *
    *   - every item with true count > N/(k+1) is present in the summary
    *     (N = total items seen);
    *   - each reported count undercounts by at most N/(k+1).
    *
    * The summary CONTENTS beyond the guarantee are merge-order-dependent
    * (which near-threshold items survive depends on decrement timing), so
    * queries must only expose order-insensitive consequences of the
    * theorem — see `q_heavy_hitters`, which emits "every guaranteed item
    * was found", not the raw summary.
    *
    * Merge is the Agarwal et al. summary merge: sum matching counters,
    * then subtract the (k+1)-largest count from all and drop non-positive
    * — associative in the guarantee-preserving sense above.
    */
  final case class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1L)
        case None if b.size < k => b.updated(item, 1L)
        case None => b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // the (k+1)-th largest via full sort: O(k log k) per merge BY
        // CHOICE — a selection algorithm is O(k), but at k=64 the sort is
        // ~a microsecond and merges run once per (partition × group); a
        // 10⁶-counter deployment should switch to quickselect
        val d = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.view.mapValues(_ - d).filter(_._2 > 0L).toMap
      }
    }
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** [[MisraGries]] over `(group, term)` tuples, summarizing the TERM and
    * ignoring the group column (which `groupByKey` already consumed as the
    * key) — the per-group heavy-hitters shape: one O(k) summary per group,
    * partial-merged map-side under the hash aggregation like any built-in.
    */
  final case class MisraGriesKeyed(k: Int)
      extends Aggregator[(String, String), Map[String, Long], Map[String, Long]] {
    private val mg = MisraGries(k)
    override def zero: Map[String, Long] = mg.zero
    override def reduce(b: Map[String, Long], in: (String, String)): Map[String, Long] =
      mg.reduce(b, in._2)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mg.merge(a, b)
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Bounded per-group top-k terms under the total order (count DESC, term
    * ASC) over `(group, term, count)` rows — same associativity argument as
    * [[TopKByScore]] (term is unique within a group, so the order is total
    * and the k survivors are partitioning-independent, identical to
    * `row_number() OVER (PARTITION BY group ORDER BY count DESC, term) ≤ k`).
    * The scale fix for per-group top-N: O(k) map-side state instead of
    * sorting each group's whole vocabulary in one window task.
    */
  final case class TermCountTopK(k: Int)
      extends Aggregator[(String, String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
    private val ord: Ordering[(String, Long)] =
      Ordering.by((t: (String, Long)) => (-t._2, t._1))
    private def trim(s: Seq[(String, Long)]): Seq[(String, Long)] = s.sorted(ord).take(k)
    override def zero: Seq[(String, Long)] = Nil
    override def reduce(b: Seq[(String, Long)], a: (String, String, Long)): Seq[(String, Long)] = {
      val hit = (a._2, a._3)
      // buffer kept sorted by trim; skip the re-sort when full and the
      // candidate is no better than the current worst survivor
      if (b.length >= k && ord.gteq(hit, b.last)) b
      else trim(hit +: b)
    }
    override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
      trim(a ++ b)
    override def finish(b: Seq[(String, Long)]): Seq[(String, Long)] = b.sorted(ord)
    override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
  }

  /** One (group, hash) row as fed to [[MinKLong]] via `groupByKey(_.grp)
    * .mapValues(_.h)` — the grouping column rides outside the buffer.
    */
  final case class KeyedHash(grp: String, h: Long)

  /** KMV (k-minimum-values) sketch buffer: the k smallest DISTINCT hash
    * values seen. min-k over a set is associative and duplicate-insensitive
    * (the buffer invariant is sorted-distinct), so reduce/merge produce the
    * same k survivors for any partitioning or merge order — identical to
    * `ORDER BY h LIMIT k` over the distinct hashes.
    *
    * This is the scale shape for distinct-cardinality sketching: O(k) state
    * map-side, ≤ groups × partitions × k longs through the shuffle, and the
    * finished sketches COMPOSE — the union sketch of two sets is the k
    * smallest of the two sketches' concatenation, no second pass over data
    * (used by `q_kmv_overlap` for union/intersection estimates).
    */
  final case class MinKLong(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)
    override def zero: Seq[Long] = Nil
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      // buffer kept sorted-distinct by trim; skip the re-sort when full
      // and the candidate is no better than the current worst survivor
      if (b.length >= k && h >= b.last) b else trim(h +: b)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Exact long-sum of the minimum element per group — a tiny example of a
    * custom order-insensitive aggregate (used by specs to pin Aggregator
    * registration + SQL call paths).
    */
  object LongMin extends Aggregator[Long, Long, Long] {
    override def zero: Long = Long.MaxValue
    override def reduce(b: Long, a: Long): Long = math.min(b, a)
    override def merge(a: Long, b: Long): Long = math.min(a, b)
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
