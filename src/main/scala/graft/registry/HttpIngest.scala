package graft.registry

import java.io.{BufferedOutputStream, File, FileOutputStream, IOException,
  InputStream}

/** Network half of the fetch stage — the shape of the reference's
  * `download_file` (pipelines/fetch.py:19-74): stream a URL to a
  * local file with bounded retries, exponential backoff, progress
  * reporting, and an optional SHA-256 integrity check that is itself
  * RETRYABLE (a corrupt artifact is re-downloaded, not fatal on
  * first sight). Driver-side by design, like [[Ingest.unzip]]: the
  * fetch stage is IO over one archive, not distributed compute.
  *
  * The transport and the sleeper are injectable so the retry/backoff
  * contract is unit-testable with zero egress (CliSpec drives a
  * flaky transport and real `file://` URLs); the default transport
  * is plain java.net URL streaming, which covers http(s) where the
  * deployment has egress and file:// everywhere.
  */
object HttpIngest {

  /** One completed download: where it landed, its size, how many
    * attempts it took, and the artifact's SHA-256 (computed while
    * streaming — the integrity check never re-reads the file). */
  final case class Fetched(
      path: String, bytes: Long, attempts: Int, sha256: String)

  /** Exponential backoff before retry `attempt+1`: 500ms, 1s, 2s, …
    * (fetch.py's retry sleep shape). */
  def backoffMs(attempt: Int): Long = 500L << (attempt - 1)

  def isUrl(s: String): Boolean =
    s.startsWith("http://") || s.startsWith("https://") ||
      s.startsWith("file://")

  /** Stream `url` to `dest`. Retries IOExceptions (including a
    * checksum mismatch) up to `maxAttempts` with [[backoffMs]]
    * between attempts; a failed attempt deletes its partial file so
    * no truncated artifact can be mistaken for a download. */
  def download(
      url: String,
      dest: String,
      maxAttempts: Int = 3,
      expectedSha256: Option[String] = None,
      progress: Long => Unit = _ => (),
      sleeper: Long => Unit = ms => Thread.sleep(ms),
      transport: String => InputStream = defaultTransport): Fetched = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    Option(new File(dest).getParentFile).foreach(_.mkdirs())
    var attempt = 0
    var lastErr: IOException = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val in = transport(url)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        var total = 0L
        val out = new BufferedOutputStream(new FileOutputStream(dest))
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) {
            out.write(buf, 0, n)
            md.update(buf, 0, n)
            total += n
            progress(total)
            n = in.read(buf)
          }
        } finally {
          out.close(); in.close()
        }
        val got = md.digest().map("%02x".format(_)).mkString
        expectedSha256.filterNot(_.equalsIgnoreCase(got)).foreach { hex =>
          throw new IOException(
            s"checksum mismatch for $url: expected $hex, got $got")
        }
        return Fetched(dest, total, attempt, got)
      } catch {
        case e: IOException =>
          lastErr = e
          new File(dest).delete()
          if (attempt < maxAttempts) sleeper(backoffMs(attempt))
      }
    }
    throw new IOException(
      s"download failed after $maxAttempts attempts: $url", lastErr)
  }

  private def defaultTransport(url: String): InputStream = {
    val conn = new java.net.URI(url).toURL.openConnection()
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.getInputStream
  }
}
