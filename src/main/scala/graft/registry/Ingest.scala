package graft.registry

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.util.zip.ZipFile

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Fetch-stage ingest — the Spark analog of the reference's fetch
  * pipeline (pipelines/fetch.py:104-201): a downloaded registry zip
  * is unpacked into a dated raw snapshot directory, normalized to
  * typed parquet, and manifested with per-table checksums + the
  * snapshot date the staleness checks key off
  * ([[Registry.dataAgeDays]]).
  *
  * The unzip itself is driver-side java.util.zip — the fetch stage is
  * IO over one archive, not distributed compute (fetch.py:148 uses
  * ZipFile the same way); everything downstream (normalize, checksum,
  * manifest) runs distributed on executors.
  */
object Ingest {

  /** Unpack `zipPath` into `destDir`, rejecting entries that would
    * escape it (zip-slip). Returns the extracted file names. */
  def unzip(zipPath: String, destDir: String): Seq[String] = {
    val dest = new File(destDir).getCanonicalFile
    dest.mkdirs()
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala.filterNot(_.isDirectory).map { e =>
        val out = new File(dest, e.getName).getCanonicalFile
        require(out.getPath.startsWith(dest.getPath + File.separator),
          s"zip entry escapes snapshot dir: ${e.getName}")
        out.getParentFile.mkdirs()
        val in = zf.getInputStream(e)
        val os = new BufferedOutputStream(new FileOutputStream(out))
        try in.transferTo(os) finally { os.close(); in.close() }
        e.getName
      }.toSeq
    } finally zf.close()
  }

  /** Full snapshot ingest: unzip → `raw/<snapshotDate>/` →
    * [[RegistryNormalize.normalize]] → typed parquet under
    * `publish/` → [[Lineage.writeManifest]] (row counts, per-table +
    * per-file checksums, snapshot date). Returns the publish dir,
    * ready to back a [[Registry]]. */
  def fromZip(
      spark: SparkSession,
      zipPath: String,
      dataRoot: String,
      snapshotDate: String): String = {
    val rawDir = s"$dataRoot/raw/$snapshotDate"
    unzip(zipPath, rawDir)
    val publishDir = s"$dataRoot/publish"
    RegistryNormalize.normalize(spark, rawDir, publishDir)
    Lineage.writeManifest(spark, publishDir, Registry.tableNames,
      snapshotDate)
    publishDir
  }
}
