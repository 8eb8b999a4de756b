package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Naming scheme for the sharded raw-text corpus layout
  * ([[Sinks.writeTextCorpus]] with `nShards > 0`): one `<id>.txt` file per
  * document under `shard=<pmod(xxhash64(id), nShards)>/`.
  *
  * The id travels IN the file name, so it must survive two hostile
  * transformations: the filesystem's own naming rules, and Hadoop `Path` /
  * `input_file_name()` URI normalization on read-back (which re-encodes
  * `%`, making percent-escaping ambiguous — the reason this is NOT
  * URL-encoding). Scheme:
  *
  *   - ids matching `[a-z0-9_-][a-z0-9._-]*` are used verbatim — the
  *     common case (numeric ids, lowercase uuids, slugs) stays
  *     human-readable. A leading `.` is excluded (hidden files — Spark's
  *     file index skips them); `=` never appears in the safe set; and
  *     UPPERCASE is excluded so the scheme stays injective after case
  *     folding — corpora get copied to case-insensitive filesystems
  *     (macOS/Windows inspection copies), where verbatim `Doc1.txt` and
  *     `doc1.txt` would silently collapse into one file.
  *   - anything else (including the empty id) becomes `=<hex of UTF-8
  *     bytes>` — `=` marks the encoding, and hex `[0-9a-f]` is safe under
  *     every filesystem, URI rule, and case folding.
  *
  * Decode is expression-only (`when`/`unhex`/`decode` — codegen'd, no
  * UDF), so the reader stays inside the scan stage's whole-stage codegen.
  */
object TextCorpusLayout {

  private val Safe = "[a-z0-9_-][a-z0-9._-]*".r

  /** File name for a document id (JVM side — the executor writer). */
  def fileName(id: String): String = id match {
    case Safe() => s"$id.txt"
    case other =>
      val hex = other.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02x").mkString
      s"=$hex.txt"
  }

  /** Recover the id from a full file path (expression side — the reader):
    * basename minus `.txt`, hex-decoded when it carries the `=` marker.
    */
  def idFromFilePath(filePath: Column): Column = {
    val base = regexp_extract(filePath, "([^/]+)\\.txt$", 1)
    when(base.startsWith("="),
      decode(unhex(substring(base, 2, Int.MaxValue)), "UTF-8"))
      .otherwise(base)
  }
}

/** Minimal serializable carrier for a Hadoop `Configuration` (which is not
  * `java.io.Serializable`): ships the driver's conf — filesystem creds,
  * scheme implementations — into executor-side writer closures.
  */
private[graft] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
