package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Shared snapshot plumbing for the pipeline-state indexes
  * ([[SigIndex.snapshot]], [[IvfIndex.snapshot]]): hard-link a file with
  * a copy fallback (object stores and cross-device paths cannot link),
  * recursively link a directory tree, and mint a unique snapshot name —
  * [[graft.sources.PointsStore.snapshot]]'s recipe, factored once. */
private[pipeline] object SnapshotFiles {

  def freshName(): String =
    s"${System.currentTimeMillis()}-${java.lang.Long.toUnsignedString(System.nanoTime(), 36)}"

  def link(spark: SparkSession, f: org.apache.hadoop.fs.FileSystem,
           src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit = {
    val linked =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(src.toUri.getPath))
        true
      } catch { case _: Throwable => false }
    if (!linked) org.apache.hadoop.fs.FileUtil.copy(f, src, f, dst, false,
      spark.sparkContext.hadoopConfiguration)
  }

  def linkTree(spark: SparkSession, f: org.apache.hadoop.fs.FileSystem,
               src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit = {
    f.mkdirs(dst)
    f.listStatus(src).toSeq.foreach { st =>
      val d = new org.apache.hadoop.fs.Path(dst, st.getPath.getName)
      if (st.isDirectory) linkTree(spark, f, st.getPath, d)
      else link(spark, f, st.getPath, d)
    }
  }
}
