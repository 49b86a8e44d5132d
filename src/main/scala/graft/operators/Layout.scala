package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Physical data layout for scan-heavy tables: the write-side half of
  * file skipping. Parquet readers prune row groups and files from
  * min/max statistics, but statistics only help if the writer clustered
  * the data — these helpers produce the clustered ordering; the caller
  * `.write`s the result.
  */
object Layout {

  /** Multi-dimensional clustering by a Z-order key (see
    * `functions.ZOrder`): range-partition the table on the key into
    * `numFiles` output tasks, then sort within each — every produced
    * file covers one compact slice of the Morton curve, i.e. a small
    * hyper-rectangle in ALL interleaved dimensions, so a predicate on
    * any of them skips most files (a single-column sort clusters only
    * that column; LayoutSpec measures both).
    *
    * `repartitionByRange` samples the key to build balanced range
    * bounds — one extra pass over the key column, no skew pitfalls at
    * any scale (hot key values simply span adjacent ranges). */
  def clusterByZOrder(df: DataFrame, zkey: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, zkey).sortWithinPartitions(zkey)
}
