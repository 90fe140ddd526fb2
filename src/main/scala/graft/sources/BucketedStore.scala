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
    * moves, no shuffle; the scan reports the stored hash-partitioning. */
  def attach(spark: SparkSession, path: String, keys: Seq[String],
             buckets: Int): DataFrame = {
    val tbl = s"graft_bstore_a_${ids.incrementAndGet()}"
    val ddl = spark.read.parquet(path).schema.toDDL
    spark.sql(s"CREATE TABLE `$tbl` ($ddl) USING parquet " +
      s"CLUSTERED BY (${quoted(keys)}) SORTED BY (${quoted(keys)}) " +
      s"INTO $buckets BUCKETS LOCATION '$path'")
    spark.table(tbl)
  }

  /** INSERT a delta through the stored bucket spec: the delta's rows land
    * as NEW bucket files beside the existing ones. Readers attached
    * before the append keep their file listing (re-[[attach]] to see the
    * delta). */
  def append(spark: SparkSession, path: String, df: DataFrame,
             keys: Seq[String], buckets: Int): Unit = {
    val tbl = s"graft_bstore_i_${ids.incrementAndGet()}"
    val ddl = spark.read.parquet(path).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.sql(s"CREATE TABLE `$tbl` ($ddl) USING parquet " +
      s"CLUSTERED BY (${quoted(keys)}) SORTED BY (${quoted(keys)}) " +
      s"INTO $buckets BUCKETS LOCATION '$path'")
    val view = s"${tbl}_delta"
    df.createOrReplaceTempView(view)
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
