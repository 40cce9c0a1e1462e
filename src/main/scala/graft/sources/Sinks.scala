package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output-side layouts for cluster-scale round trips. Correct writes are
  * easy; these encode the two layout decisions that matter at 100 TB:
  *
  *  - '''Partitioned parquet''' (hive directory layout): reads that filter
  *    on the partition column prune whole directories before any I/O —
  *    the scan lists only matching partitions (`PartitionFilters` in the
  *    plan), so a per-language or per-day query touches 1/N of the lake.
  *  - '''Bucketed tables''': rows pre-hashed into a fixed bucket count on
  *    the join/aggregation key at WRITE time. Every later join or groupBy
  *    on that key skips its exchange entirely — the shuffle is paid once,
  *    at ingest, instead of once per query. This is the standard remedy
  *    for a fact⋈fact join too big to broadcast either side.
  */
object Sinks {

  /** Hive-partitioned parquet write. `partitionCols` should be low-
    * cardinality (each value is a directory); high-cardinality keys
    * belong in bucketing, not partitioning.
    */
  def writeParquetPartitioned(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed (and bucket-sorted) managed table. Bucket count is fixed at
    * write time — size it so one bucket of the LARGEST future reader fits
    * in executor memory; joins co-locate only across tables bucketed to
    * the same count on the same key.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** JSON-lines export (interchange with non-Spark consumers; parquet
    * stays the internal format — jsonl trades ~5× size and all pushdown
    * for universality). One object per line so downstream readers split
    * by byte range.
    */
  def writeJsonLines(df: DataFrame, path: String,
                     mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Hive-partitioned ORC write — the other columnar lake format a corpus
    * arrives in (Spark's native ORC reader supports the same predicate
    * pushdown + partition pruning as parquet; asserted in SourcesSpec).
    * Same partitioning guidance as [[writeParquetPartitioned]].
    */
  def writeOrcPartitioned(df: DataFrame, path: String,
                          partitionCols: Seq[String],
                          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).orc(path)
}
