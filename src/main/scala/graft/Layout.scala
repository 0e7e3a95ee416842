package graft

import org.apache.spark.sql.DataFrame

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
}
