package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the bounded top-k aggregation:
  * `score` orders (descending), `id` breaks ties (ascending) and names the
  * neighbor, `pay` is an opaque payload carried through unchanged. The
  * exact-integer similarity tier threads its Long dot product as `pay` (so
  * no double→long round-trip is ever needed on the output path); the
  * recent-N operator threads a String column. Payload is a type parameter
  * rather than a fixed Long so each call site keeps a flat, fully-encoded
  * struct — no serialized blobs, no parallel aggregator classes. */
final case class Scored[P](score: Double, id: Long, pay: P)

/** The aggregation buffer/result: at most k candidates, kept sorted by
  * (score desc, id asc). A case class (not a bare Seq) so the buffer
  * serializes through `Encoders.product` — array-of-struct column out. */
final case class TopKBuf[P](items: Seq[Scored[P]])

/** Bounded top-k as a typed `Aggregator`: the partial-aggregating
  * replacement for `row_number().over(Window.partitionBy(qid))` ranking.
  *
  * Why it exists: a per-qid window sorts EVERY candidate row and
  * concentrates the whole corpus into (number of queries) tasks — 5
  * single-task full-corpus sorts at any scale. This aggregator holds a
  * size-k ordered buffer per group, combines map-side (ObjectHashAggregate
  * runs it in partial mode before the exchange), and ships only k rows per
  * (partition, qid) across the shuffle: at 100 TB the exchange carries
  * O(partitions × queries × k) tiny structs instead of the corpus.
  *
  * Ordering matches the windows it replaces exactly — score descending,
  * id ascending on ties — so ranked output is bit-identical for any total
  * order (null scores must be filtered by the caller). NaN-scored
  * candidates are DROPPED at insert: NaN loses every `>` comparison in
  * BOTH directions, so without the explicit drop a NaN arriving at a
  * not-yet-full buffer would land at position 0, never be displaced, and
  * once the buffer filled would block every real candidate behind it —
  * an arrival-order-dependent wrong top-k. (A desc window sorts NaN
  * first; callers that must rank NaN pre-filter, as rankTop5 does.)
  *
  * The buffer encoder comes in implicitly (concrete call sites summon it
  * via `Encoders.product[TopKBuf[...]]`), since a generic payload has no
  * TypeTag here. */
final class TopKAggregator[P](k: Int)(implicit enc: Encoder[TopKBuf[P]])
    extends Aggregator[Scored[P], TopKBuf[P], TopKBuf[P]] with Serializable {

  require(k > 0, s"top-k size must be positive, got $k")

  private def beats(a: Scored[P], b: Scored[P]): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Insert preserving order, capped at k. O(k) per row with k tiny. */
  private def insert(items: Seq[Scored[P]], x: Scored[P]): Seq[Scored[P]] =
    if (x.score.isNaN) items // not a total order under beats(): see Scaladoc
    else if (items.length >= k && !beats(x, items.last)) items
    else {
      val (pre, post) = items.span(beats(_, x))
      ((pre :+ x) ++ post).take(k)
    }

  override def zero: TopKBuf[P] = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf[P], x: Scored[P]): TopKBuf[P] = TopKBuf(insert(b.items, x))

  override def merge(b1: TopKBuf[P], b2: TopKBuf[P]): TopKBuf[P] =
    TopKBuf(b2.items.foldLeft(b1.items)(insert))

  override def finish(b: TopKBuf[P]): TopKBuf[P] = b

  override def bufferEncoder: Encoder[TopKBuf[P]] = enc
  override def outputEncoder: Encoder[TopKBuf[P]] = enc
}
