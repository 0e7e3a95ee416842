package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** [EXT] Mergeable sketches with DETERMINISTIC cross-engine semantics.
  *
  * The standard approximate-distinct sketch (HyperLogLog — Spark's
  * `approx_count_distinct`, DuckDB's `approx_count_distinct`) cannot be
  * oracle-checked: the two engines' register layouts and hash functions
  * differ, so the estimates disagree by construction. KMV (k minimum
  * values, a.k.a. bottom-k) over md5 gives the same accuracy class
  * (relative error ~1/sqrt(k-2)) with a fully deterministic result: the k
  * smallest distinct hashes of a set are a pure function of the set, and
  * md5 hex compares identically in both engines. The estimator
  * `(k-1) / frac(kth smallest hash)` is one integer parse + one double
  * division — bit-reproducible anywhere.
  *
  * Scale posture: the aggregation state is BOUNDED at k strings (vs
  * `collect_set`'s unbounded state), merges are associative+commutative
  * (union → keep k smallest), and partial aggregation absorbs duplicates
  * map-side — the properties that let a distinct-count run over 100 TB
  * with fixed executor memory and one shuffle of k-row partials.
  */
object Sketch {

  /** Bounded sketch state: distinct hashes, sorted ascending, at most k. */
  case class KmvBuf(var hs: Vector[String])
  /** Sketch output: number of hashes retained (= exact distinct count
    * when < k) and the k-th smallest (the estimator's anchor; null when
    * fewer than k distinct values were seen). */
  case class KmvOut(n: Long, kth: String)

  /** KMV bottom-k distinct sketch over a hash column. Input must already
    * be a uniform hash (md5 hex): KMV's accuracy argument needs uniform
    * order statistics, and hex strings of equal width sort identically to
    * their numeric values. */
  class KmvAggregator(k: Int) extends Aggregator[String, KmvBuf, KmvOut] {
    def zero: KmvBuf = KmvBuf(Vector.empty)

    // k is small (tens); linear insert keeps this trivially correct and
    // allocation-light relative to the md5 that feeds it
    def reduce(b: KmvBuf, h: String): KmvBuf = {
      if (h != null && (b.hs.length < k || h < b.hs.last) &&
          !b.hs.contains(h)) {
        b.hs = (b.hs :+ h).sorted.take(k)
      }
      b
    }

    def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      a.hs = (a.hs ++ b.hs).distinct.sorted.take(k)
      a
    }

    def finish(b: KmvBuf): KmvOut =
      KmvOut(b.hs.length.toLong, if (b.hs.length == k) b.hs.last else null)

    def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
  }

  /** Column form: `kmv(k)(hashCol)` → struct(n, kth). */
  def kmv(k: Int) = udaf(new KmvAggregator(k))

  /** Sketch output carrying the FULL bottom-k hash set (ascending) —
    * what sketch COMPOSITION needs: two sources' sketches intersect /
    * union into a Jaccard estimate without ever joining the raw data
    * (qx26). Same bounded state and merge as [[KmvAggregator]]. */
  case class KmvSet(hs: Seq[String])

  class KmvSetAggregator(k: Int)
      extends Aggregator[String, KmvBuf, KmvSet] {
    private val inner = new KmvAggregator(k)
    def zero: KmvBuf = inner.zero
    def reduce(b: KmvBuf, h: String): KmvBuf = inner.reduce(b, h)
    def merge(a: KmvBuf, b: KmvBuf): KmvBuf = inner.merge(a, b)
    def finish(b: KmvBuf): KmvSet = KmvSet(b.hs)
    def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    def outputEncoder: Encoder[KmvSet] = Encoders.product[KmvSet]
  }

  /** Column form: `kmvSet(k)(hashCol)` → struct(hs: array<string>). */
  def kmvSet(k: Int) = udaf(new KmvSetAggregator(k))

  /** The KMV estimate from the sketch struct: exact `n` below capacity,
    * `(k-1) / frac(kth)` at capacity — where frac is the first 13 hex
    * digits (52 bits, exact in a double) of the k-th smallest hash over
    * 16^13. Spelled so DuckDB reproduces it bit-for-bit: the hex parse is
    * integer-exact in both engines (Spark `conv`, DuckDB digit fold) and
    * the one double division is IEEE-identical. */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(sk.getField("n") < k, sk.getField("n").cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(4503599627370496.0) /
          conv(substring(sk.getField("kth"), 1, 13), 16, 10).cast("double"))
}
