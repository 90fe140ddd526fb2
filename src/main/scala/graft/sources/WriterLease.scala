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
  * with preconditions; best-effort on a raw local FS, which is a
  * single-machine deployment anyway). The file carries a random token,
  * owner description and acquisition epoch. A lease older than
  * `spark.graft.index.leaseTtlMs` (default 10 min) is considered
  * abandoned by a crashed writer and is BROKEN — deleted and re-acquired
  * — so a crash never wedges the index forever; a healthy long write
  * must either finish inside the TTL or renew (re-entrant acquisition by
  * the same thread is a no-op, see below). Clock skew between writers
  * shifts the break point, never the conflict detection.
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

  // dirs the current thread holds (outermost withLease owns the lock file)
  private val held = ThreadLocal.withInitial[java.util.HashSet[String]](
    () => new java.util.HashSet[String]())

  private def lockPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_writer.lock")

  /** Run `body` holding the writer lease on `dir`: acquire (breaking an
    * expired lease, failing loud on a live one), execute, release.
    * Re-entrant per thread — a nested withLease on a dir this thread
    * already holds just runs the body. */
  def withLease[T](spark: SparkSession, dir: String, owner: String)
                  (body: => T): T = {
    val h = held.get()
    if (h.contains(dir)) return body
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir)) // first write creates dir
    val lock = lockPath(dir)
    val token = java.lang.Long.toUnsignedString(
      new java.security.SecureRandom().nextLong(), 36)
    acquire(spark, fs, lock, token, owner)
    h.add(dir)
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

  private def acquire(spark: SparkSession,
                      fs: org.apache.hadoop.fs.FileSystem,
                      lock: org.apache.hadoop.fs.Path,
                      token: String, owner: String): Unit = {
    val payload = (s"""{"token":"$token","owner":${graft.types.Json.str(owner)},""" +
      s""""epochMs":${System.currentTimeMillis()}}""")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var attempt = 0
    while (attempt < 2) {
      attempt += 1
      try {
        val out = fs.create(lock, false) // no-overwrite: the atomic claim
        try out.write(payload) finally out.close()
        return
      } catch {
        case _: java.io.IOException => // exists (or create raced) — inspect
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
              }
              // expired: break it and retry the atomic claim once
              fs.delete(lock, false)
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
