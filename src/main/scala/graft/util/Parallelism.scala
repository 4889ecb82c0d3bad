package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism guard (guide §2.5 "input skew": one huge —
  * or here one TINY — unsplittable input under-parallelizes every stage
  * up to the first exchange).
  *
  * A parquet scan's task count comes from row-group splits; a table
  * smaller than `spark.sql.files.maxPartitionBytes` scans as ONE
  * partition, so a pipeline whose expensive work is per-row (shingling,
  * md5, regex kernels) runs single-threaded until its first shuffle —
  * measured at sf0.1: the ngram posting stage spent 1.15 s of 2.27 s in
  * one task with 31 cores idle. At production scale the scan already
  * carries ≥ fleet parallelism and this helper is a NO-OP — it only
  * inserts a repartition when the input has fewer partitions than the
  * fleet, so it is the opposite of a constant tuned for local mode.
  *
  * With `keys`, partitioning is a deterministic hash on those columns
  * (safe under task retry); without, round-robin (Spark's
  * sort-before-repartition keeps retries deterministic).
  *
  * Applied SELECTIVELY: the inserted exchange (plus the partition-count
  * probe) costs ~50-150 ms locally, so only pipelines whose pre-exchange
  * per-row work dominates carry the guard — measured A/B at sf0.1
  * (min of 5): ngram_jaccard −0.46 s, lang_id −0.17 s, neardup
  * clusters/survivors −0.13 s each, but csv_md5_key +0.18 s and
  * dedup_exact +0.10 s, whose md5/sha2 is cheaper than the exchange.
  */
object Parallelism {

  def ensure(df: DataFrame, keys: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (keys.nonEmpty) df.repartition(p, keys: _*)
    else df.repartition(p)
  }
}
