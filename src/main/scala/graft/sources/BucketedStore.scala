package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External bucketed parquet layouts, reusable by every persisted index
  * (the near-dup band/gram stores, the CDC chunk-hash store): the
  * bucketing shuffle is paid ONCE at write, [[attach]] re-registers the
  * files with the recorded bucket spec without moving data, and every
  * later equi-join on the bucket keys co-locates against the stored
  * layout — the history side never exchanges again. [[append]] INSERTs a
  * delta through the spec (new bucket files land beside the old; a
  * partition write, never a rewrite).
  *
  * Bucketing metadata lives in the session metastore, not in parquet, so
  * each operation registers a throwaway table entry around the files and
  * drops it afterwards (external: metadata only, files stay). */
object BucketedStore {

  private val ids = new java.util.concurrent.atomic.AtomicInteger(0)

  private def quoted(keys: Seq[String]): String =
    keys.map(k => s"`$k`").mkString(", ")

  /** Write `df` to `path` as an external bucketed table layout. */
  def write(df: DataFrame, path: String, keys: Seq[String],
            buckets: Int): Unit = {
    val spark = df.sparkSession
    val tmp = s"graft_bstore_w_${ids.incrementAndGet()}"
    spark.sql(s"DROP TABLE IF EXISTS `$tmp`")
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path).format("parquet").saveAsTable(tmp)
    spark.sql(s"DROP TABLE `$tmp`")
  }

  /** Re-attach files written by [[write]] as a bucketed scan — no data
    * moves, no shuffle; the scan reports the stored hash-partitioning.
    * Self-heals [[compact]]'s crash window: a missing main dir with a
    * complete `.old` beside it means the compactor died between its two
    * renames — the old generation IS the data. */
  /** [[compact]] crash-window recovery: a missing main dir with a
    * complete `.old` beside it means the compactor died between its two
    * renames — the old generation IS the data; move it back. */
  private def heal(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val old = new org.apache.hadoop.fs.Path(s"$path.old")
      if (fs.exists(old)) require(fs.rename(old, p),
        s"crash-window recovery rename $old -> $p failed")
    }
  }

  /** `schemaDdl`: pass the schema recorded at write time (see the index
    * metas) so an EMPTY layout attaches too — a zero-row bucketed write
    * produces no parquet files, and schema inference over the bare
    * directory throws. The empty corpus is the natural INITIAL state of a
    * start-from-nothing streaming pipeline, not an error. */
  def attach(spark: SparkSession, path: String, keys: Seq[String],
             buckets: Int, schemaDdl: Option[String] = None): DataFrame =
    attachNamed(spark, path, keys, buckets, schemaDdl)._1

  /** [[attach]] that also returns the registered table name, so a caller
    * with a lifecycle (Catalog.close) can DROP the metadata entry when it
    * discards the attachment — external table, files stay. */
  def attachNamed(spark: SparkSession, path: String, keys: Seq[String],
                  buckets: Int,
                  schemaDdl: Option[String] = None): (DataFrame, String) = {
    heal(spark, path)
    val tbl = s"graft_bstore_a_${ids.incrementAndGet()}"
    val ddl = schemaDdl.getOrElse(spark.read.parquet(path).schema.toDDL)
    spark.sql(s"CREATE TABLE `$tbl` ($ddl) USING parquet " +
      s"CLUSTERED BY (${quoted(keys)}) SORTED BY (${quoted(keys)}) " +
      s"INTO $buckets BUCKETS LOCATION '$path'")
    (spark.table(tbl), tbl)
  }

  /** Rewrite a layout in place — the periodic bucket compaction an
    * append-heavy store needs: every [[append]] adds up to `buckets` new
    * files, and after many deltas the per-bucket file count (not the
    * data volume) is what slows scans and listings. The rewrite reads
    * the attached layout (already hash-distributed — the write replans
    * WITHOUT a shuffle) into a fresh one-generation tree, then swaps:
    * tmp → `.old` → main → delete. A crash between the renames leaves
    * `.old` as the only copy, which [[attach]] self-heals. NOT safe
    * under concurrent readers of this path (their captured file list
    * moves) — same contract as any bucket rewrite. */
  def compact(spark: SparkSession, path: String, keys: Seq[String],
              buckets: Int): Unit = {
    heal(spark, path) // a crashed previous compaction leaves only `.old`
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an empty layout (no part files yet) has nothing to fold — and no
    // schema to read
    if (!fs.exists(p) || !fs.listStatus(p).exists(
        _.getPath.getName.startsWith("part-"))) return
    val tmp = new org.apache.hadoop.fs.Path(s"$path.compacting")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // cluster on the bucket keys with the SAME partitioning the bucket id
    // uses (pmod(hash, buckets)) so each task holds exactly one bucket and
    // the rewrite lands ONE file per bucket — an unclustered bucketed
    // write emits a file per (task × bucket) and would re-fragment. Read
    // the files as PLAIN parquet here: reading through an attached
    // bucketed table makes the planner drop this repartition as redundant
    // (the scan claims the distribution) while auto-bucketed-scan may
    // serve file-split partitions that don't align with it — plain files
    // carry no such claim, so the shuffle stays and the writers align.
    val clustered = spark.read.parquet(path)
      .repartition(buckets,
        keys.map(org.apache.spark.sql.functions.col): _*)
    write(clustered, tmp.toString, keys, buckets)
    val old = new org.apache.hadoop.fs.Path(s"$path.old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(p, old), s"compact: rename $p -> $old failed")
    require(fs.rename(tmp, p), s"compact: rename $tmp -> $p failed")
    fs.delete(old, true)
  }

  /** INSERT a delta through the stored bucket spec: the delta's rows land
    * as NEW bucket files beside the existing ones. Readers attached
    * before the append keep their file listing (re-[[attach]] to see the
    * delta). */
  def append(spark: SparkSession, path: String, df: DataFrame,
             keys: Seq[String], buckets: Int,
             schemaDdl: Option[String] = None): Unit = {
    val tbl = s"graft_bstore_i_${ids.incrementAndGet()}"
    val ddl = schemaDdl.getOrElse(spark.read.parquet(path).schema.toDDL)
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.sql(s"CREATE TABLE `$tbl` ($ddl) USING parquet " +
      s"CLUSTERED BY (${quoted(keys)}) SORTED BY (${quoted(keys)}) " +
      s"INTO $buckets BUCKETS LOCATION '$path'")
    val view = s"${tbl}_delta"
    // INSERT binds by POSITION — select the delta's columns in the
    // TABLE's order by NAME, so a caller whose frame carries the same
    // columns in a different order appends correctly (and a missing
    // column fails loud here instead of misassigning silently)
    val ordered = df.select(spark.table(tbl).schema.fieldNames
      .map(n => df(n)): _*)
    ordered.createOrReplaceTempView(view)
    spark.sql(s"INSERT INTO `$tbl` SELECT * FROM `$view`")
    spark.catalog.dropTempView(view)
    spark.sql(s"DROP TABLE `$tbl`")
  }

  /** Tiny JSON meta beside the data, through `dir`'s own Hadoop FS with
    * atomic tmp+rename; [[readMeta]] covers the rename crash window. */
  def writeMeta(spark: SparkSession, dir: String, fileName: String,
                json: String): Unit = {
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/$fileName.tmp")
    val out = hfs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val tgt = new org.apache.hadoop.fs.Path(s"$dir/$fileName")
    if (hfs.exists(tgt)) hfs.delete(tgt, false)
    require(hfs.rename(tmp, tgt), s"writeMeta: rename $tmp -> $tgt failed")
  }

  def readMeta(spark: SparkSession, dir: String,
               fileName: String): com.fasterxml.jackson.databind.JsonNode = {
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val main = new org.apache.hadoop.fs.Path(s"$dir/$fileName")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/$fileName.tmp")
    val src = if (hfs.exists(main)) main
              else { require(hfs.exists(tmp), s"no $fileName under $dir"); tmp }
    val in = hfs.open(src)
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
  }
}
