package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** Durable CROSS-SESSION generation pins for bucketed layouts.
  *
  * [[BucketedStore.vacuum]]'s floor arithmetic is per-caller: a Catalog
  * computes the oldest generation its OWN retained versions still scan
  * and vacuums below it. That is exact within one session — but a saved
  * layout is a shared multi-program surface (the reference's catalog is
  * explicitly that, Andl.Runtime/Catalog.cs:93-128): a rival session
  * attach-loaded on the same dir may hold a version history pinned to an
  * OLDER generation, invisible to this session's in-memory pin map. The
  * `keepPrior` grace window papers over one generation of that; a deep
  * as-of chain needs more.
  *
  * This makes the pins as durable as the writer discipline already is
  * (WriterLease files): each session owning retained versions over a
  * layout stamps ONE small pin file
  * `<layout>/_pins/<sessionId>.pin` carrying the MINIMUM generation its
  * retained versions reach. Vacuum honors the union of all sessions'
  * fresh pins; `keepPrior` demotes to a backstop for sessions whose pins
  * went stale (crashed without [[clear]]) — stale pins age out after
  * `spark.graft.catalog.pinTtlMs` (default 1 h) so a crashed reader can
  * never leak superseded generations forever. Long-lived readers
  * re-stamp on every as-of read (Catalog.relvarAt), which refreshes the
  * epoch.
  *
  * One writer per pin file (the owning session), so a plain overwrite
  * create is race-free; readers tolerate a torn/unreadable pin by
  * ignoring it (the TTL backstop covers that session like a crash).
  * SCALE: pins are O(sessions) metadata files read once per vacuum — a
  * file listing plus a few hundred bytes each, nothing per-row. */
object GenPins {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pinsDir(dir: String) = new Path(s"$dir/_pins")
  private def pinPath(dir: String, sessionId: String) =
    new Path(s"$dir/_pins/$sessionId.pin")

  /** Freshness horizon for OTHER sessions' pins
    * (`spark.graft.catalog.pinTtlMs`, default 1 h): a pin not re-stamped
    * within it is treated as a crashed session's leftover and stops
    * holding generations. Sessions re-stamp on every layout touch and
    * every as-of read, so only a genuinely dead (or fully idle) session
    * ages out. */
  def ttlMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.catalog.pinTtlMs")
      .map(_.toLong).getOrElse(60L * 60 * 1000)

  /** Stamp (or re-stamp) this session's pin: `minGen` is the oldest
    * generation any of its retained versions scans. The session is the
    * file's only writer, but a RIVAL may read mid-restamp — so the write
    * is tmp+delete+rename (the writeMeta pattern), and readers fall back
    * to the tmp when the main file is momentarily absent: a torn or
    * missing pin must never read as "no pin" to a vacuum. */
  def write(spark: SparkSession, dir: String, sessionId: String,
            minGen: Int): Unit = {
    val fs = fsOf(spark, dir)
    fs.mkdirs(pinsDir(dir))
    val payload =
      (s"""{"session":${graft.types.Json.str(sessionId)},""" +
        s""""minGen":$minGen,"epochMs":${System.currentTimeMillis()}}""")
        .getBytes(UTF_8)
    val main = pinPath(dir, sessionId)
    val tmp = new Path(s"$dir/_pins/$sessionId.pin.tmp")
    val out = fs.create(tmp, true)
    try out.write(payload) finally out.close()
    if (fs.exists(main)) fs.delete(main, false)
    require(fs.rename(tmp, main), s"GenPins: rename $tmp -> $main failed")
  }

  /** Remove this session's pin (retention released everything, the
    * relvar was dropped, or the session closed). Idempotent. */
  def clear(spark: SparkSession, dir: String, sessionId: String): Unit = {
    val fs = fsOf(spark, dir)
    try {
      fs.delete(pinPath(dir, sessionId), false)
      fs.delete(new Path(s"$dir/_pins/$sessionId.pin.tmp"), false)
    } catch { case _: java.io.IOException => () }
  }

  private val minGenRe = """"minGen"\s*:\s*(-?\d+)""".r
  private val epochRe = """"epochMs"\s*:\s*(\d+)""".r

  /** The minimum generation pinned by OTHER sessions' FRESH pin files
    * (None when no such pin exists). A session mid-restamp may have only
    * its `.pin.tmp` on disk for an instant — the tmp counts (main wins
    * when both parse). Unreadable or stale pins are skipped — the TTL is
    * the crashed-session backstop. */
  def minPinnedByOthers(spark: SparkSession, dir: String,
                        selfSessionId: String): Option[Int] = {
    val fs = fsOf(spark, dir)
    val pd = pinsDir(dir)
    if (!fs.exists(pd)) return None
    val now = System.currentTimeMillis()
    val ttl = ttlMs(spark)
    def freshMin(p: Path): Option[Int] =
      try {
        val mtime = fs.getFileStatus(p).getModificationTime
        val in = fs.open(p)
        val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
        // staleness = the NEWER of payload epoch and filesystem mtime,
        // BOTH clamped to `now`: a pinner whose clock runs behind must
        // not read as instantly stale (the mtime is the shared FS's
        // authority), and a pinner whose clock runs AHEAD must not mint
        // a pin that outlives the TTL backstop by its skew
        val payload =
          epochRe.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
        val epoch = math.min(now, math.max(math.min(payload, now), mtime))
        if (now - epoch <= ttl)
          minGenRe.findFirstMatchIn(txt).map(_.group(1).toInt)
        else None
      } catch { case _: Exception => None }
    fs.listStatus(pd).toSeq
      .filter(st => st.isFile &&
        (st.getPath.getName.endsWith(".pin") ||
          st.getPath.getName.endsWith(".pin.tmp")))
      .groupBy(_.getPath.getName.stripSuffix(".tmp"))
      .collect { case (name, _) if name != s"$selfSessionId.pin" =>
        // main preferred; the tmp covers the delete→rename restamp
        // window; the SECOND main read covers the instant where the
        // rename completed between our two opens — a live session's
        // restamp must never read as "no pin" to a vacuum
        val main = new Path(s"$pd/$name")
        val tmp = new Path(s"$pd/$name.tmp")
        freshMin(main).orElse(freshMin(tmp)).orElse(freshMin(main))
      }.flatten.minOption
  }
}
