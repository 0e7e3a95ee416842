package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-layout helpers — the cluster-scale co-location toolkit.
  *
  * At 100 TB the cheapest shuffle is the one that never runs: writing a
  * fact table bucketed (and bucket-sorted) by its dominant join/agg key
  * lets every later equi-join against a same-bucketed table and every
  * groupBy on the key execute WITHOUT an exchange — the scan's bucketing
  * already satisfies the required distribution, so the "shuffle" was paid
  * once at write time and amortizes over every downstream query.
  * (Partition-by-date + bucket-by-key is the standard lakehouse layout:
  * dates prune, buckets co-locate.)
  */
object Layout {

  /** Write `df` as a parquet table bucketed by `key` into `buckets`
    * files per partition, optionally bucket-sorted (sorted buckets also
    * skip the sort under a SortMergeJoin). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Write `df` Z-order-clustered on two dimensions — multi-dimensional
    * data skipping for the layouts bucketing can't serve (range predicates
    * on TWO columns at once: time × value, lat × lon, length × score).
    *
    * A single-dim sort gives perfect min/max pruning on its lead column
    * and none on any other; the Morton curve trades a little of the first
    * for a lot of the rest — every file covers a small square-ish tile of
    * the 2-D space, so a box predicate touches only the files whose tile
    * intersects it.
    *
    * Scale posture (the whole point): the per-dim equi-depth boundaries
    * come from `approxQuantile` (sample-sketch pass, driver holds
    * 2×(2^bits-1) doubles), the z key is a codegen'd native expression
    * with the boundaries as referenced objects, and the only shuffle is
    * the `repartitionByRange` the write pays ONCE. Skew immunity is free:
    * equi-depth bins put equal row counts in every stripe no matter how
    * skewed the values. The `__z` key column is kept in the output (it is
    * the cluster key — and an optimizer that saw it dropped could
    * legally elide the clustering sort).
    */
  def writeZOrder(df: DataFrame, dimX: String, dimY: String, path: String,
                  files: Int, bits: Int = 10): Unit = {
    val nBins = 1 << bits
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val qs = df.stat.approxQuantile(Array(dimX, dimY), probs,
      1.0 / (4.0 * nBins))
    df.withColumn("__z", graft.meos.NativeExpressions.zorder2(
        col(dimX).cast("double"), col(dimY).cast("double"),
        qs(0), qs(1), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .write.mode("overwrite").parquet(path)
  }
}
