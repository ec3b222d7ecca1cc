package graft.operators

import org.apache.spark.sql.SparkSession

/**
 * Commit test for staged parquet: a stage path counts as committed only
 * when the Hadoop committer's `_SUCCESS` marker exists — an interrupted
 * write leaves data files but no marker, so resume recomputes exactly
 * the torn stages ([[TrainFilter.trainFilterStaged]],
 * [[Curation.curatePipelineStaged]]). Hadoop FileSystem, not
 * java.io.File: the stage dir lives wherever the output does
 * (HDFS/S3/local) and resume must see it there (same idiom as
 * [[graft.pipeline.Checkpoint.committedBuckets]]).
 */
object StageCommit {
  def committed(spark: SparkSession, path: String): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(marker)
  }
}
