package graft.sources

import org.apache.spark.sql.SparkSession

/** Single-writer discipline for persisted index directories.
  *
  * The persisted layouts (near-dup band/gram stores, CDC chunk index,
  * the IVF-PQ serving index) assume ONE writer: two ingest jobs appending
  * to the same directory would interleave INSERTs, race the meta rename
  * that carries the exactly-once batch watermark, and a compaction
  * running beside an append loses the delta at the generation flip. This
  * makes the contract ENFORCED instead of implicit: every writer-side
  * index operation acquires the directory's lease first and fails LOUD
  * on conflict — no silent interleaving.
  *
  * Mechanics: `_writer.lock` under the index dir, created with the
  * filesystem's no-overwrite create (atomic on HDFS and object stores
  * with preconditions; on a local FS, where Hadoop's no-overwrite
  * create is a racy exists-then-open, the claim goes through the
  * kernel's `open(O_CREAT|O_EXCL)` instead — exact there too). The
  * file carries a random token,
  * owner description and acquisition epoch. A lease older than
  * `spark.graft.index.leaseTtlMs` (default 10 min) is considered
  * abandoned by a crashed writer and is BROKEN — and the break is
  * FENCED: the breaker atomically RENAMES the stale lock to a
  * tombstone carrying its own claim token, so when two breakers race
  * only one rename succeeds and exactly one proceeds to re-claim (a
  * delete-then-create break would let breaker B delete breaker A's
  * freshly re-created lock). A healthy write longer than the TTL must
  * call [[renew]] periodically to bump the lease clock — re-entrant
  * acquisition is a no-op and does NOT renew. Clock skew between
  * writers shifts the break point, never the conflict detection.
  *
  * Re-entrancy: [[withLease]] tracks the dirs this THREAD already holds,
  * so composite operations (appendIndexBatch = read meta → two appends →
  * advance meta, all under one lease) nest their leased building blocks
  * without deadlocking on themselves. */
object WriterLease {

  /** Thrown on a live conflicting lease — the caller's signal that a
    * second writer targeted the same index directory. */
  final class LeaseConflictException(msg: String)
    extends IllegalStateException(msg)

  private def ttlMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.index.leaseTtlMs")
      .map(_.toLong).getOrElse(10L * 60 * 1000)

  // dir → our claim token, for the dirs the current thread holds
  // (outermost withLease owns the lock file; the token lets renew and
  // release touch only OUR lease)
  private val held = ThreadLocal.withInitial[java.util.HashMap[String, String]](
    () => new java.util.HashMap[String, String]())

  private def lockPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_writer.lock")

  // serializes same-JVM stat→break→claim sequences per lock path: a
  // breaker's expiry decision and its rename/re-create must be atomic
  // against OTHER THREADS of this JVM, or a breaker holding a stale stat
  // can rename a rival's freshly re-created lock out from under it (and
  // the restore can fail while a third claimant slips in — observed as
  // 3 simultaneous "owners" in the breaker-race test). Cross-process
  // claims stay atomic via the no-overwrite create; the cross-process
  // break keeps the freshness-check+restore belt below. One small Object
  // per distinct index dir touched by this JVM.
  private val acquireMutex =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def mutexFor(lock: org.apache.hadoop.fs.Path): Object =
    acquireMutex.computeIfAbsent(lock.toString, _ => new Object)

  private def payloadOf(token: String, owner: String): Array[Byte] =
    (s"""{"token":"$token","owner":${graft.types.Json.str(owner)},""" +
      s""""epochMs":${System.currentTimeMillis()}}""")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Run `body` holding the writer lease on `dir`: acquire (breaking an
    * expired lease, failing loud on a live one), execute, release.
    * Re-entrant per thread — a nested withLease on a dir this thread
    * already holds just runs the body (without renewing; see [[renew]]). */
  def withLease[T](spark: SparkSession, dir: String, owner: String)
                  (body: => T): T = {
    val h = held.get()
    if (h.containsKey(dir)) return body
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir)) // first write creates dir
    val lock = lockPath(dir)
    val token = java.lang.Long.toUnsignedString(
      new java.security.SecureRandom().nextLong(), 36)
    acquire(spark, fs, lock, token, owner)
    h.put(dir, token)
    try body
    finally {
      h.remove(dir)
      // release only OUR lease: a TTL-breaker that raced us after a long
      // stall owns the file now — deleting it would unlock a live writer
      try {
        if (readToken(fs, lock).contains(token)) fs.delete(lock, false)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Bump the lease clock from inside a long-running leased body: rewrites
    * `_writer.lock` with our token and a fresh epoch so the mtime (and the
    * recorded epochMs) advance past the TTL horizon. Call this from write
    * or compaction loops that can exceed `spark.graft.index.leaseTtlMs` —
    * nested withLease does NOT renew. Fails loud if this thread does not
    * hold `dir`, or if the lock on disk no longer carries our token (a
    * TTL-breaker already claimed it: exclusivity is LOST and continuing
    * to write would interleave with the new owner). */
  def renew(spark: SparkSession, dir: String, owner: String): Unit = {
    val token = held.get().get(dir)
    require(token != null,
      s"renew($dir): this thread does not hold the lease")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = lockPath(dir)
    val onDisk = readToken(fs, lock)
    if (!onDisk.contains(token))
      throw new LeaseConflictException(
        s"renew($dir): lease was broken by another writer while we held " +
        s"it (on-disk token $onDisk != ours) — exclusivity lost; abort " +
        "this write and re-run under a fresh lease")
    // overwrite-rewrite of our OWN live lock; the token check above plus
    // the TTL arithmetic make a racing breaker vanishingly unlikely (it
    // would have to observe expiry in the instant before this rewrite)
    val out = fs.create(lock, true)
    try out.write(payloadOf(token, owner)) finally out.close()
  }

  private def acquire(spark: SparkSession,
                      fs: org.apache.hadoop.fs.FileSystem,
                      lock: org.apache.hadoop.fs.Path,
                      token: String, owner: String): Unit =
    mutexFor(lock).synchronized {
    val payload = payloadOf(token, owner)
    var attempt = 0
    while (attempt < 6) {
      attempt += 1
      val existed =
        if (fs.getScheme == "file") {
          // Hadoop's local create(overwrite=false) is a non-atomic
          // exists-then-open — racing claimers can ALL pass the check and
          // believe they won (observed: 3 simultaneous lease holders in
          // the breaker-race test). Claim through the kernel's
          // open(O_CREAT|O_EXCL) instead: exactly one creator succeeds.
          // A reader in the create→write gap sees an empty FRESH lock
          // and conflicts on its mtime, same as a torn payload.
          val nioLock = java.nio.file.Paths.get(lock.toUri.getPath)
          try {
            java.nio.file.Files.createFile(nioLock)
            try java.nio.file.Files.write(nioLock, payload)
            catch { case scala.util.control.NonFatal(e) =>
              java.nio.file.Files.deleteIfExists(nioLock); throw e }
            return
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => true
          }
        } else try {
          val out = fs.create(lock, false) // no-overwrite: the atomic claim
          try out.write(payload) finally out.close()
          return
        } catch {
          // only EXISTENCE routes to the conflict/break path; any other
          // IO failure (permissions, transient network) is a real error
          // the caller must see, not a phantom "another writer" message
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
          case e: java.io.IOException =>
            if (fs.exists(lock)) true else throw e
        }
      if (existed) {
        val st = try Some(fs.getFileStatus(lock))
                 catch { case _: java.io.FileNotFoundException => None }
        st match {
          case None => () // holder released between create and stat: retry
          case Some(s) =>
            val age = System.currentTimeMillis() - s.getModificationTime
            if (age <= ttlMs(spark)) {
              val who = try {
                  val in = fs.open(lock)
                  try new String(in.readAllBytes(),
                    java.nio.charset.StandardCharsets.UTF_8)
                  finally in.close()
                } catch { case _: java.io.IOException => "<unreadable>" }
              throw new LeaseConflictException(
                s"index at ${lock.getParent} is held by another writer " +
                s"(lease age ${age}ms <= ttl ${ttlMs(spark)}ms): $who — " +
                "one writer per index; stop the other job or raise " +
                "spark.graft.index.leaseTtlMs only if it is truly dead")
            } else {
              // expired: FENCED break — atomically rename the stale lock
              // to a tombstone carrying OUR token. Exactly one racing
              // breaker wins the rename (the loser's source is gone); a
              // delete+create break would let us delete a rival breaker's
              // freshly re-created lock between our stat and delete.
              val tomb = new org.apache.hadoop.fs.Path(
                s"${lock}.broken-$token")
              val won = try fs.rename(lock, tomb)
                        catch { case _: java.io.IOException => false }
              if (won) {
                // verify we renamed the STALE file, not a fresh lock a
                // rival breaker re-created between our stat and rename:
                // a fresh tombstone means we stole a live lease — put it
                // back and conflict on the next pass
                val fresh = try {
                    val ts = fs.getFileStatus(tomb)
                    System.currentTimeMillis() - ts.getModificationTime <=
                      ttlMs(spark)
                  } catch { case _: java.io.IOException => false }
                if (fresh) {
                  val restored = try fs.rename(tomb, lock)
                                 catch { case _: java.io.IOException => false }
                  if (!restored) // owner already re-claimed; drop our copy
                    try fs.delete(tomb, false)
                    catch { case _: java.io.IOException => () }
                } else
                  try fs.delete(tomb, false)
                  catch { case _: java.io.IOException => () }
              }
              // either way, loop back to the atomic create: the winner
              // claims; the loser sees the winner's fresh lock and
              // conflicts loudly on the next pass
            }
        }
      }
    }
    throw new LeaseConflictException(
      s"could not claim ${lock}: another writer kept winning the race")
    }

  private def readToken(fs: org.apache.hadoop.fs.FileSystem,
                        lock: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = fs.open(lock)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      """"token":"([^"]*)"""".r.findFirstMatchIn(text).map(_.group(1))
    } catch { case _: java.io.IOException => None }
}
