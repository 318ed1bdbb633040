package graft.testfs

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException, OutputStream}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** An in-JVM Hadoop `FileSystem` with OBJECT-STORE (S3) semantics, for
  * proving the manifest commit protocol on the store class the
  * reference itself deploys against (MinIO, `docker-compose.yaml:54`)
  * without network egress. Registered as scheme `s3x`. The semantic
  * contract modeled — each point is where S3 differs from HDFS/local
  * and where a commit protocol built on local-FS assumptions breaks:
  *
  *  - FLAT NAMESPACE: objects are (bucket, key) → bytes; directories do
  *    not exist. `mkdirs` is a no-op success; a "directory" is any key
  *    prefix with objects under it; empty directories cannot exist.
  *  - ATOMIC WHOLE-OBJECT PUT: bytes become visible all-at-once when the
  *    output stream CLOSES (one `putObject`), never partially — a reader
  *    sees the complete object or no object.
  *  - CONDITIONAL CREATE (`If-None-Match: *`, supported by S3 since
  *    2024-11 and by MinIO): `create(key, overwrite=false)` does a HEAD
  *    check at open (the S3A fast-fail) AND enforces the precondition
  *    ATOMICALLY AT CLOSE — if the key appeared meanwhile, close throws
  *    and nothing is written. This is the store-side CAS the manifest
  *    publish and commit lock build on.
  *  - NON-ATOMIC RENAME: rename is a client-side COPY then DELETE, per
  *    object. Mid-rename, BOTH keys exist; two racing renamers of one
  *    source can both "succeed". Nothing in the commit protocol may
  *    rely on rename exclusivity or atomicity here (tmp+rename manifest
  *    publish would be unsound — hence [[graft.engine.Manifest]]'s
  *    conditional-PUT publish path on this scheme).
  *
  * Reads snapshot the object at `open` (S3 GET semantics). Modification
  * times are recorded per object for retention-floor tests. Backed by a
  * static map so Spark executor threads (local[n], one JVM) share the
  * store; [[S3SemanticsFileSystem.clearBucket]] resets between tests.
  */
class S3SemanticsFileSystem extends FileSystem {
  import S3SemanticsFileSystem._

  private var fsUri: URI = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    workDir = new Path(fsUri.toString + "/")
  }

  override def getUri: URI = fsUri
  override def getScheme: String = "s3x"
  private def bucket: String = fsUri.getAuthority

  private def keyOf(f: Path): String =
    makeQualified(f).toUri.getPath.stripPrefix("/").stripSuffix("/")

  private def pathOf(k: String): Path =
    new Path(if (k.isEmpty) fsUri.toString + "/" else s"$fsUri/$k")

  private def obj(k: String): Option[Obj] = store.get((bucket, k))

  private def hasPrefix(k: String): Boolean = {
    val p = if (k.isEmpty) "" else k + "/"
    store.keysIterator.exists { case (b, kk) =>
      b == bucket && kk.startsWith(p) && (p.nonEmpty || kk.nonEmpty)
    }
  }

  private def fileStatus(k: String, o: Obj): FileStatus =
    new FileStatus(o.bytes.length.toLong, false, 1, BlockSize, o.mtime,
      pathOf(k))

  private def dirStatus(k: String): FileStatus =
    new FileStatus(0L, true, 1, 0L, 0L, pathOf(k))

  override def getFileStatus(f: Path): FileStatus = {
    val k = keyOf(f)
    obj(k) match {
      case Some(o) => fileStatus(k, o)
      case None =>
        if (k.isEmpty || hasPrefix(k)) dirStatus(k)
        else throw new FileNotFoundException(s"s3x://$bucket/$k")
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = keyOf(f)
    obj(k) match {
      case Some(o) => Array(fileStatus(k, o))
      case None =>
        if (k.nonEmpty && !hasPrefix(k))
          throw new FileNotFoundException(s"s3x://$bucket/$k")
        val prefix = if (k.isEmpty) "" else k + "/"
        // listing lag (round 16): hidden keys exist for GET/HEAD but
        // not for LIST — the S3 eventual-listing gap under injection
        val children = store.iterator.collect {
          case ((b, kk), o) if b == bucket && kk.startsWith(prefix) &&
            kk.length > prefix.length &&
            !S3SemanticsFileSystem.listingHides(kk) =>
            (kk.substring(prefix.length), o)
        }.toSeq
        val (files, dirs) = children.partition(!_._1.contains("/"))
        val dirNames = dirs.map(_._1.takeWhile(_ != '/')).distinct
        (files.map { case (n, o) => fileStatus(prefix + n, o) } ++
          dirNames.map(n => dirStatus(prefix + n))).toArray
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = keyOf(f)
    require(k.nonEmpty, "cannot create the bucket root")
    // HEAD fast-fail at open (what S3A does) …
    if (!overwrite && obj(k).isDefined)
      throw new FileAlreadyExistsException(s"s3x://$bucket/$k exists")
    val buf = new ByteArrayOutputStream()
    val out = new OutputStream {
      private var closed = false
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = if (!closed) {
        closed = true
        // … and the ATOMIC precondition at close: the whole object
        // lands iff the key is still absent (If-None-Match: *). With
        // [[S3SemanticsFileSystem.enforceConditionalCreate]] off, the
        // mock models STOCK S3A (HEAD at open, UNCONDITIONAL PUT at
        // close — last writer wins), which is what Manifest's
        // conditional-create honesty probe must detect and refuse.
        storeLock.synchronized {
          if (!overwrite && enforceConditionalCreate && obj(k).isDefined)
            throw new IOException(
              s"PreconditionFailed: If-None-Match on s3x://$bucket/$k")
          // injected faults (round 16): a plain 503 commits nothing; a
          // landFirst fault commits the object AND throws — the
          // ambiguous network-cut-after-PUT outcome
          takePutFault(k) match {
            case Some(false) =>
              throw new IOException(
                s"503 Slow Down (injected) on s3x://$bucket/$k")
            case Some(true) =>
              store.put((bucket, k),
                Obj(buf.toByteArray, System.currentTimeMillis()))
              throw new IOException(
                s"connection reset after PUT (injected; object landed) " +
                  s"on s3x://$bucket/$k")
            case None =>
              store.put((bucket, k),
                Obj(buf.toByteArray, System.currentTimeMillis()))
          }
        }
        ()
      }
    }
    new FSDataOutputStream(out, statistics)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = keyOf(f)
    val o = obj(k).getOrElse(
      throw new FileNotFoundException(s"s3x://$bucket/$k"))
    new FSDataInputStream(new BytesInput(o.bytes))
  }

  /** Client-side COPY + DELETE, per object — deliberately NON-atomic:
    * both keys exist mid-rename, and racing renamers can both report
    * success. Directory rename follows Hadoop path semantics (dst
    * existing dir → src moves UNDER it) so FileOutputCommitter works,
    * but each contained object moves as its own copy+delete pair.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = keyOf(src)
    val dk0 = keyOf(dst)
    obj(sk) match {
      case Some(_) =>
        val dk =
          if (obj(dk0).isDefined) return false
          else if (hasPrefix(dk0)) s"$dk0/${src.getName}"
          else dk0
        if (sk == dk) return true
        val o = obj(sk).getOrElse(return false)
        store.put((bucket, dk), o) // COPY (new PUT)
        store.remove((bucket, sk)) // then DELETE — two steps, a window
        true
      case None if hasPrefix(sk) =>
        val base =
          if (obj(dk0).isDefined) return false
          else if (hasPrefix(dk0)) s"$dk0/${src.getName}"
          else dk0
        val p = sk + "/"
        val ks = store.keysIterator.collect {
          case (b, kk) if b == bucket && kk.startsWith(p) => kk
        }.toList
        ks.foreach { kk =>
          store.get((bucket, kk)).foreach { o =>
            store.put((bucket, base + "/" + kk.substring(p.length)), o)
            store.remove((bucket, kk))
          }
        }
        true
      case None => false
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = keyOf(f)
    if (obj(k).isDefined) { store.remove((bucket, k)); true }
    else if (hasPrefix(k)) {
      if (!recursive)
        throw new IOException(s"s3x://$bucket/$k is a non-empty prefix")
      val p = if (k.isEmpty) "" else k + "/"
      store.keysIterator.collect {
        case key @ (b, kk) if b == bucket && kk.startsWith(p) => key
      }.toList.foreach(store.remove)
      true
    } else false
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = true

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores cannot append")

  override def setWorkingDirectory(d: Path): Unit = { workDir = d }
  override def getWorkingDirectory: Path = workDir
}

object S3SemanticsFileSystem {
  private val BlockSize = 128L * 1024 * 1024

  private final case class Obj(bytes: Array[Byte], mtime: Long)

  private val store =
    scala.collection.concurrent.TrieMap.empty[(String, String), Obj]
  private val storeLock = new Object

  /** When false, `create(…, overwrite=false)` stops enforcing the
    * precondition at close — the stock-S3A (pre-conditional-writes)
    * behavior where the last PUT silently wins. Tests flip this to
    * prove the manifest layer's honesty probe refuses such stores.
    */
  @volatile var enforceConditionalCreate: Boolean = true

  // ---- FAULT INJECTION (round 16, ADVICE/verdict item 5) ------------
  //
  // The real-store failure modes the commit protocol must survive,
  // modeled at the exact points S3 exhibits them:
  //
  //  - `failPutsMatching(substr, landFirst = false)`: the next close()
  //    of a matching key throws a 503-style IOException. With
  //    landFirst = false NOTHING lands (plain throttle — retry-safe);
  //    with landFirst = true the object COMMITS and the close still
  //    throws — the connection-cut-after-PUT AMBIGUOUS outcome, where
  //    the client cannot know whether its write took effect.
  //  - `hideFromListing(substr)`: matching keys vanish from
  //    listStatus() while GET/HEAD still serve them — S3-class listing
  //    lag. Reads that resolve through the manifest (one GET + the
  //    round-16 `#flen` ledger) must be immune; anything that LISTS
  //    for correctness is what this fault exposes.
  //
  // One fault of each kind at a time; both are one-shot/until-cleared
  // and reset by the companion's clear methods (test isolation).

  @volatile private var putFault: Option[(String, Boolean)] = None
  @volatile private var hiddenSubstr: Option[String] = None

  /** Arm a one-shot PUT failure for keys containing `substr`. */
  def failPutsMatching(substr: String, landFirst: Boolean = false): Unit =
    putFault = Some((substr, landFirst))

  def clearPutFault(): Unit = putFault = None

  /** Consume the armed fault if `k` matches: Some(landFirst). */
  private def takePutFault(k: String): Option[Boolean] = synchronized {
    putFault match {
      case Some((substr, land)) if k.contains(substr) =>
        putFault = None
        Some(land)
      case _ => None
    }
  }

  /** Hide every current and future key containing `substr` from
    * listStatus until [[settleListing]] — GETs still serve them.
    */
  def hideFromListing(substr: String): Unit = hiddenSubstr = Some(substr)

  def settleListing(): Unit = hiddenSubstr = None

  private def listingHides(k: String): Boolean =
    hiddenSubstr.exists(k.contains)

  /** Drop every object in `bucket` — test isolation. */
  def clearBucket(bucket: String): Unit =
    store.keysIterator.filter(_._1 == bucket).toList.foreach(store.remove)

  /** All keys currently in `bucket` (diagnostics / invariant checks,
    * e.g. "no `.list.tmp` key ever existed").
    */
  def keys(bucket: String): Seq[String] =
    store.keysIterator.collect { case (b, k) if b == bucket => k }.toSeq

  /** Register the scheme on a Hadoop configuration. */
  def register(conf: Configuration): Unit =
    conf.set("fs.s3x.impl", classOf[S3SemanticsFileSystem].getName)

  private final class BytesInput(bytes: Array[Byte])
      extends java.io.ByteArrayInputStream(bytes)
      with Seekable with PositionedReadable {
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new java.io.EOFException(s"seek $p")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= bytes.length) -1
      else {
        val n = math.min(length, bytes.length - position.toInt)
        System.arraycopy(bytes, position.toInt, buffer, offset, n)
        n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (position + length > bytes.length) throw new java.io.EOFException()
      System.arraycopy(bytes, position.toInt, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
