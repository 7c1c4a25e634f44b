package graft.sources

import java.io.{EOFException, InputStream}
import java.net.{HttpURLConnection, URI, URL}
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop FileSystem that resolves `graftds:/<size>/<b64>`
  * paths to presigned HTTP(S) URLs and serves ranged reads, so Spark's
  * vectorized parquet reader streams shared files directly from object
  * storage on each executor.
  *
  * The reference reaches presigned URLs by nesting a
  * `read_parquet('<url>')` query through DuckDB's httpfs
  * (`/root/reference/src/duck_delta_share_extension.cpp:578-613`);
  * the Spark-native equivalent is a FileSystem scheme the parquet
  * reader can seek in. The file size is embedded in the path (it comes
  * from `FileAction.size`), so `getFileStatus` never touches the
  * network — at 100 TB scale, per-file HEAD requests from every task
  * would otherwise dominate.
  *
  * Seek is implemented as close-and-reopen with an HTTP `Range`
  * header; positioned reads issue an independent one-shot ranged GET,
  * which is exactly the access pattern parquet footers + column chunks
  * need (a few ranges per file, no full download).
  */
class PresignedUrlFileSystem extends FileSystem {
  private var fsUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${PresignedUrlFileSystem.Scheme}:/")
  }

  override def getScheme: String = PresignedUrlFileSystem.Scheme
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = new Path(s"${PresignedUrlFileSystem.Scheme}:/")
  override def setWorkingDirectory(dir: Path): Unit = ()

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val (url, size) = PresignedUrlFileSystem.decode(f)
    new FSDataInputStream(new HttpRangeInputStream(url, size))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val (_, size) = PresignedUrlFileSystem.decode(f)
    new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L, f)
  }

  override def listStatus(f: Path): Array[FileStatus] = Array(getFileStatus(f))
  override def exists(f: Path): Boolean = true

  // read-only surface: Delta Sharing has no write path (SURVEY.md §7
  // non-goals)
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("read-only filesystem")
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("read-only filesystem")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException("read-only filesystem")
  override def delete(f: Path, recursive: Boolean): Boolean =
    throw new UnsupportedOperationException("read-only filesystem")
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    throw new UnsupportedOperationException("read-only filesystem")
}

object PresignedUrlFileSystem {
  val Scheme = "graftds"
  val ImplConfKey = s"fs.$Scheme.impl"
  val ImplClass: String = classOf[PresignedUrlFileSystem].getName

  /** Encode a presigned URL + its known size as a graftds path. */
  def encode(url: String, size: Long): String = {
    val b64 = Base64.getUrlEncoder.withoutPadding()
      .encodeToString(url.getBytes(StandardCharsets.UTF_8))
    s"$Scheme:/$size/$b64"
  }

  /** Inverse of [[encode]]. */
  def decode(p: Path): (String, Long) = {
    val parts = p.toUri.getPath.stripPrefix("/").split("/", 2)
    val url = new String(Base64.getUrlDecoder.decode(parts(1)),
      StandardCharsets.UTF_8)
    (url, parts(0).toLong)
  }

  /** Register the scheme on a Hadoop conf (idempotent). */
  def register(conf: Configuration): Unit =
    conf.set(ImplConfKey, ImplClass)
}

/** Seekable ranged-HTTP input stream (also handles `file:` URLs so
  * stub-server tests and local smoke runs skip the HTTP hop). */
private[sources] class HttpRangeInputStream(url: String, size: Long)
  extends InputStream with Seekable with PositionedReadable {

  private var pos = 0L
  private var in: InputStream = _
  private var inPos = -1L // stream's current offset, -1 = closed

  private def isLocal: Boolean = url.startsWith("file:") || url.startsWith("/")

  private def localPath: java.nio.file.Path =
    if (url.startsWith("file:")) java.nio.file.Paths.get(URI.create(url))
    else java.nio.file.Paths.get(url)

  private def openAt(offset: Long): InputStream =
    if (isLocal) {
      val ch = java.nio.file.Files.newInputStream(localPath)
      var skipped = 0L
      while (skipped < offset) {
        val s = ch.skip(offset - skipped)
        if (s <= 0) throw new EOFException(s"cannot skip to $offset in $url")
        skipped += s
      }
      ch
    } else {
      val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(20000)
      conn.setReadTimeout(120000)
      if (offset > 0) conn.setRequestProperty("Range", s"bytes=$offset-")
      val code = conn.getResponseCode
      if (code != 200 && code != 206)
        throw new java.io.IOException(s"HTTP $code reading $url at offset $offset")
      if (offset > 0 && code == 200) {
        // server ignored Range: emulate by skipping
        val s = conn.getInputStream
        var skipped = 0L
        while (skipped < offset) {
          val k = s.skip(offset - skipped)
          if (k <= 0) throw new EOFException(s"cannot skip to $offset in $url")
          skipped += k
        }
        s
      } else conn.getInputStream
    }

  /** Transient-failure retry: long scans of presigned URLs hit
    * connection resets; 3 attempts with backoff before surfacing.
    * (URL *expiry* — 403 after `expirationTimestamp` — needs a fresh
    * `/query` from the driver; the task failure propagates and
    * Spark's task retry re-plans, which re-POSTs.) */
  private def openWithRetry(offset: Long): InputStream = {
    var attempt = 0
    while (true) {
      try return openAt(offset)
      catch {
        case e: java.io.IOException if attempt < 3 =>
          attempt += 1
          Thread.sleep(200L << attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def ensureOpen(): Unit =
    if (in == null || inPos != pos) {
      if (in != null) in.close()
      in = openWithRetry(pos)
      inPos = pos
    }

  override def read(): Int = {
    if (pos >= size) return -1
    ensureOpen()
    val b = in.read()
    if (b >= 0) { pos += 1; inPos += 1 }
    b
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= size) return -1
    ensureOpen()
    val n = in.read(buf, off, len)
    if (n > 0) { pos += n; inPos += n }
    n
  }

  override def seek(newPos: Long): Unit = {
    if (newPos < 0 || newPos > size)
      throw new EOFException(s"seek($newPos) out of bounds [0,$size]")
    pos = newPos
  }

  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int,
      length: Int): Int = {
    if (position >= size) return -1
    val s = openWithRetry(position)
    try s.read(buffer, offset, math.min(length, (size - position).toInt))
    finally s.close()
  }

  override def readFully(position: Long, buffer: Array[Byte], offset: Int,
      length: Int): Unit = {
    var done = 0
    val s = openWithRetry(position)
    try {
      while (done < length) {
        val n = s.read(buffer, offset + done, length - done)
        if (n < 0) throw new EOFException(s"EOF at ${position + done} in $url")
        done += n
      }
    } finally s.close()
  }

  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)

  override def close(): Unit = {
    if (in != null) { in.close(); in = null }
    inPos = -1
  }
}
