package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982) as a typed
  * `Aggregator`: a k-entry counter summary of an unbounded token stream
  * with the MERGEABLE-summaries guarantee (Agarwal et al., PODS'12) —
  * every token with true frequency > n/(k+1) is PRESENT in the final
  * summary, no matter how the stream was partitioned.
  *
  * Why this shape at 100 TB: the exact heavy-hitters query shuffles one
  * row per DISTINCT token (the full vocabulary — billions of keys on a
  * web corpus); this sketch shuffles exactly k counters per map
  * partition, merges associatively on the reducer, and never
  * materializes the vocabulary anywhere. The trade is one-sided error
  * (false POSITIVES possible, false negatives impossible), which the
  * catalog pins with a subset check against the exact answer (t14 —
  * same pin pattern as d11's banded-MinHash containment).
  *
  * reduce: +1 if tracked; insert if room; else decrement ALL (the
  * classic k-way cancellation — amortized O(1) via the count ledger).
  * merge: sum summaries, then subtract the (k+1)-th largest count and
  * drop non-positives — the PODS'12 merge that preserves the error
  * bound n/(k+1) across arbitrary partitionings.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < k => b.updated(tok, 1L)
      case None =>
        // decrement-all; dropping zeros keeps the summary ≤ k entries
        b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val m = mutable.Map.empty[String, Long] ++ x
    y.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
    if (m.size <= k) m.toMap
    else {
      // subtract the (k+1)-th largest count from every entry, keep > 0
      val kth = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.iterator.flatMap { case (t, c) =>
        if (c > kth) Some(t -> (c - kth)) else None
      }.toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
