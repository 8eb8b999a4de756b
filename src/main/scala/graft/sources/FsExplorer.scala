package graft.sources

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Object-store exploration helpers (S6, reference
  * `services/explorations/aws_s3_exploration.py:35-117`): list/create/delete/
  * copy over the Hadoop FileSystem API, so the same calls work against
  * local paths here and s3a/gcs/hdfs on a cluster. Not a dataflow component —
  * a thin management utility, like the reference's bucket manager.
  */
final class FsExplorer(spark: SparkSession) {
  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def listDirs(path: String): Seq[String] = {
    val p = new Path(path)
    fs(p).listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  def listFiles(path: String): Seq[String] = {
    val p = new Path(path)
    fs(p).listStatus(p).filter(_.isFile).map(_.getPath.getName).toSeq.sorted
  }

  def exists(path: String): Boolean = { val p = new Path(path); fs(p).exists(p) }

  def createDir(path: String): Boolean = { val p = new Path(path); fs(p).mkdirs(p) }

  /** Refuses to delete a non-empty dir unless recursive — the reference's
    * guarded delete.
    */
  def deleteDir(path: String, recursive: Boolean = false): Boolean = {
    val p = new Path(path)
    fs(p).delete(p, recursive)
  }

  /** Server-side-style copy (K4's `latest` alias mechanism for single files). */
  def copy(src: String, dst: String): Boolean = {
    val s = new Path(src); val d = new Path(dst)
    FileUtil.copy(fs(s), s, fs(d), d, false, spark.sparkContext.hadoopConfiguration)
  }
}
