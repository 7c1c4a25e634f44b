package graft.sources

import java.io.{EOFException, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URL}
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop FileSystem that resolves `graftds:/<size>/<b64-id>`
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
  * The path carries only an opaque **file id**, never the signed URL:
  * paths surface in the Spark UI, event logs, and task failure
  * messages, and a presigned URL there is a leaked credential. The id
  * resolves to the current URL through [[PresignedUrlCache]], which
  * also re-issues the original `/query` POST when a URL expires
  * mid-scan (multi-hour 100 TB scans outlive typical ~1 h URL TTLs;
  * task retries alone would re-read the same dead URL).
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
    val (id, size) = PresignedUrlFileSystem.decode(f)
    new FSDataInputStream(new HttpRangeInputStream(
      () => PresignedUrlCache.urlFor(id),
      stale => PresignedUrlCache.refresh(id, stale),
      size))
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

  /** Encode an opaque file id + known size as a graftds path (the id
    * is base64url'd so arbitrary server-issued ids stay path-safe). */
  def encode(fileId: String, size: Long): String = {
    val b64 = Base64.getUrlEncoder.withoutPadding()
      .encodeToString(fileId.getBytes(StandardCharsets.UTF_8))
    s"$Scheme:/$size/$b64"
  }

  /** Inverse of [[encode]]: (fileId, size). */
  def decode(p: Path): (String, Long) = {
    val parts = p.toUri.getPath.stripPrefix("/").split("/", 2)
    val id = new String(Base64.getUrlDecoder.decode(parts(1)),
      StandardCharsets.UTF_8)
    (id, parts(0).toLong)
  }

  /** Register the scheme on a Hadoop conf (idempotent). */
  def register(conf: Configuration): Unit =
    conf.set(ImplConfKey, ImplClass)

  /** Credential-safe rendering of a presigned URL (query string holds
    * the signature). */
  private[sources] def redact(url: String): String = url.split('?').head
}

/** Executor-local file-id → presigned-URL registry with expiry
  * refresh. InputPartitions carry (id, url) pairs and the reader
  * factory registers them on the executor before opening the file, so
  * the mapping exists in every JVM that reads — no driver round-trip.
  * On HTTP 403 (expired signature) the reading task re-issues the
  * scan's original `/query` POST via the stored [[RefreshSpec]] and
  * swaps in the fresh URLs for every file of the response.
  */
object PresignedUrlCache {

  /** Everything needed to re-issue the original request from an
    * executor when a presigned URL expires mid-scan. `changesRange`
    * set = the scan was a `/changes` (CDF) read and the refresh
    * re-issues that GET instead of a `/query` POST. */
  final case class RefreshSpec(
      profile: DeltaSharingProfile,
      share: String, schema: String, table: String,
      jsonPredicateHints: Option[String],
      predicateHints: Seq[String],
      limitHint: Option[Long],
      version: Option[Long],
      timestamp: Option[String] = None,
      changesRange: Option[graft.sources.v2.ChangesRange] = None)

  /** Stable identity for a shared file: the server's `id` when
    * present, else a digest of the URL with its (re-signed, volatile)
    * query string stripped. */
  def fileId(f: FileAction): String = fileId(f.id, f.url)

  def fileId(id: String, url: String): String =
    if (id.nonEmpty) id
    else {
      val stable = PresignedUrlFileSystem.redact(url)
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(stable.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }

  /** Entry cap for each of the two id-keyed maps. URLs + specs for a
    * multi-million-file scan would otherwise accumulate without bound
    * in every executor JVM for the life of the process (the registry
    * is a JVM-global object). Eviction is safe: every reader task
    * re-registers its own partition's (id, url, spec) immediately
    * before opening the file, and a URL evicted while still needed
    * heals through the spec-driven re-query, exactly like an expired
    * one. Override with `-Dgraft.presignedUrlCache.maxEntries=N`.
    * The parse is memoized on the raw property string (it sits on the
    * `removeEldestEntry` hot path, i.e. every map insertion), and a
    * malformed value falls back to the default instead of surfacing
    * as a NumberFormatException thrown from `register()` mid-scan. */
  @volatile private var maxEntriesMemo: (String, Int) = null
  private[graft] def maxEntries: Int = {
    val raw = sys.props.getOrElse("graft.presignedUrlCache.maxEntries", "65536")
    val memo = maxEntriesMemo
    if (memo != null && memo._1 == raw) memo._2
    else {
      val parsed = try raw.toInt catch { case _: NumberFormatException => 65536 }
      maxEntriesMemo = (raw, parsed)
      parsed
    }
  }

  /** Access-ordered LRU; all access is serialized on the enclosing
    * object's monitor (reads included — LinkedHashMap mutates its
    * order links on `get`). */
  private final class Lru[V] extends java.util.LinkedHashMap[String, V](
    64, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      size() > maxEntries
  }

  private val urls = new Lru[String]
  private val specs = new Lru[RefreshSpec]

  /** Serializes the network re-query so a wave of simultaneously-
    * expired tasks issues ONE POST. Distinct from the map monitor,
    * which is never held across the network call — cached reads and
    * registrations for OTHER files proceed while a refresh is in
    * flight (16 reader threads must not stall behind one hung
    * sharing-server round trip). Lock order: refreshLock, then the
    * object monitor; nothing acquires them in the other order. */
  private val refreshLock = new Object

  /** putIfAbsent semantics: a task retry replaying the original
    * partition must not clobber a URL an expiry refresh renewed. */
  def register(id: String, url: String, spec: RefreshSpec): Unit = synchronized {
    urls.putIfAbsent(id, url)
    specs.putIfAbsent(id, spec)
  }

  /** Current URL for `id`; if the entry was LRU-evicted but its
    * refresh spec survives, re-issues the `/query` instead of
    * failing the task. */
  def urlFor(id: String): String = {
    val cached = synchronized { urls.get(id) }
    if (cached != null) cached else requery(id, stale = None)
  }

  /** Renewed URL after a 401/403 on `staleUrl`; callers that raced a
    * completed refresh see the renewed value without a network call. */
  def refresh(id: String, staleUrl: String): String = {
    val current = synchronized { urls.get(id) }
    if (current != null && current != staleUrl) current
    else requery(id, stale = Option(staleUrl))
  }

  /** Re-issue the original `/query` for `id`'s scan and re-register
    * every returned file's URL. Holds `refreshLock` (not the map
    * monitor) across the POST; the double-check under the lock lets
    * racing expiries coalesce onto the winner's renewal. */
  private def requery(id: String, stale: Option[String]): String =
    refreshLock.synchronized {
      val winner = synchronized { urls.get(id) }
      if (winner != null && !stale.contains(winner)) winner
      else {
        val spec = synchronized { specs.get(id) }
        if (spec == null)
          throw new IOException(
            s"cannot refresh presigned URL for unknown file id $id")
        val client = new DeltaSharingClient(spec.profile)
        val files: Seq[(String, String)] = spec.changesRange match {
          case Some(range) =>
            range.fetch(client, spec.share, spec.schema, spec.table)
              .actions.map(a => (fileId(a.id, a.url), a.url))
          case None =>
            client.queryTable(
              spec.share, spec.schema, spec.table,
              jsonPredicateHints = spec.jsonPredicateHints,
              predicateHints = spec.predicateHints,
              limitHint = spec.limitHint,
              version = spec.version,
              timestamp = spec.timestamp).files
              .map(f => (fileId(f), f.url))
        }
        synchronized {
          // capture the target's URL from the RESPONSE while
          // re-registering: a listing larger than maxEntries would
          // LRU-evict the very entry being refreshed before a
          // read-back could see it
          var target: String = null
          files.foreach { case (fid, url) =>
            if (fid == id) target = url
            urls.put(fid, url)
          }
          if (target == null)
            throw new IOException(
              s"re-issued request no longer returns file id $id")
          target
        }
      }
    }

  /** Test hooks. */
  private[graft] def clear(): Unit = synchronized { urls.clear(); specs.clear() }
  private[graft] def cachedUrlCount: Int = synchronized { urls.size }
}

/** Non-2xx from the object store; carries the status so the retry loop
  * can distinguish expiry (403 → refresh) from transient failures. The
  * message holds only the redacted URL. */
private[sources] final class HttpStatusException(
    val code: Int, message: String) extends IOException(message)

/** Seekable ranged-HTTP input stream (also handles `file:` URLs so
  * stub-server tests and local smoke runs skip the HTTP hop). The URL
  * is re-resolved through `resolve` on every (re)open and `refresh` is
  * invoked once per open on HTTP 401/403, so an expired presigned URL
  * heals inside the running task instead of failing the job. */
private[sources] class HttpRangeInputStream(
    resolve: () => String,
    refresh: String => String,
    size: Long)
  extends InputStream with Seekable with PositionedReadable {

  private var pos = 0L
  private var in: InputStream = _
  private var inPos = -1L // stream's current offset, -1 = closed

  private def isLocal(url: String): Boolean =
    url.startsWith("file:") || url.startsWith("/")

  private def localPath(url: String): java.nio.file.Path =
    if (url.startsWith("file:")) java.nio.file.Paths.get(URI.create(url))
    else java.nio.file.Paths.get(url)

  private def redact(url: String): String =
    PresignedUrlFileSystem.redact(url)

  private def openAt(url: String, offset: Long): InputStream =
    if (isLocal(url)) {
      val ch = java.nio.file.Files.newInputStream(localPath(url))
      var skipped = 0L
      while (skipped < offset) {
        val s = ch.skip(offset - skipped)
        if (s <= 0) throw new EOFException(
          s"cannot skip to $offset in ${redact(url)}")
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
        throw new HttpStatusException(code,
          s"HTTP $code reading ${redact(url)} at offset $offset")
      if (offset > 0 && code == 200) {
        // server ignored Range: emulate by skipping
        val s = conn.getInputStream
        var skipped = 0L
        while (skipped < offset) {
          val k = s.skip(offset - skipped)
          if (k <= 0) throw new EOFException(
            s"cannot skip to $offset in ${redact(url)}")
          skipped += k
        }
        s
      } else conn.getInputStream
    }

  /** Transient-failure retry (3 attempts with backoff) plus one
    * expiry refresh: a 401/403 means the presigned signature lapsed,
    * so re-resolve through the refresh callback and continue. */
  private def openWithRetry(offset: Long): InputStream = {
    var attempt = 0
    var refreshed = false
    while (true) {
      val url = resolve()
      try return openAt(url, offset)
      catch {
        case e: HttpStatusException
            if (e.code == 401 || e.code == 403) && !refreshed =>
          refreshed = true
          refresh(url) // next resolve() sees the renewed URL
        case _: java.io.IOException if attempt < 3 =>
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
    // min as Long BEFORE narrowing: >2 GiB remaining would overflow a
    // (size - position).toInt to negative
    try s.read(buffer, offset, math.min(length.toLong, size - position).toInt)
    finally s.close()
  }

  override def readFully(position: Long, buffer: Array[Byte], offset: Int,
      length: Int): Unit = {
    var done = 0
    val s = openWithRetry(position)
    try {
      while (done < length) {
        val n = s.read(buffer, offset + done, length - done)
        if (n < 0) throw new EOFException(
          s"EOF at ${position + done} reading shared file")
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
