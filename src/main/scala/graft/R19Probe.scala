package graft

// SCRATCH measurement mains for the r19 optimization round (guide §1:
// measure first). Not part of the library surface.
//
//   sbt "runMain graft.R19Probe while"  — job/stage counts and per-round
//     wall time of the q_while_dist fixpoint (is the per-round cost jobs,
//     stages, broadcast builds, or single-task serialization?)
//   sbt "runMain graft.R19Probe bm25"   — runs the full suite once (the
//     suite CONTEXT), then times q_bm25 in that dirty JVM, then after a
//     forced driver GC (lets the ContextCleaner reclaim dead broadcasts /
//     accumulated residue), then isolated-fresh — locating the
//     five-rounds-running q_bm25 suite-context tail.
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

object R19Probe {
  def newSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  final class Counter(verbose: Boolean = false) extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var maxConcurrentTasksSeen = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs += 1
      if (verbose) {
        val s0 = j.stageInfos.headOption
        System.err.println(s"[job] ${j.jobId} stages=${j.stageInfos.size} " +
          s"site=${s0.map(_.name).getOrElse("?")}")
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
      if (s.stageInfo.numTasks > maxConcurrentTasksSeen)
        maxConcurrentTasksSeen = s.stageInfo.numTasks
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; maxConcurrentTasksSeen = 0 }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("while")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = newSession()
    val c = new Counter(verbose = sys.env.contains("SPARK_GRAFT_PROBE_VERBOSE"))
    spark.sparkContext.addSparkListener(c)

    mode match {
      case "whileNoAqe" =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        Queries.qWhileDist(spark, dir).count()
        c.reset()
        val t0 = System.nanoTime()
        val probe = new graft.rel.WhileFix.Probe
        val n = Queries.qWhileDist(spark, dir, probe).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        println(f"[whileNoAqe] rows=$n total=$secs%.2f s distRounds=${probe.distributedRounds} jobs=${c.jobs} stages=${c.stages} tasks=${c.tasks}")

      case "while" =>
        // warm
        Queries.qWhileDist(spark, dir).count()
        c.reset()
        val t0 = System.nanoTime()
        val probe = new graft.rel.WhileFix.Probe
        val n = Queries.qWhileDist(spark, dir, probe).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener drain
        println(f"[while] rows=$n total=$secs%.2f s driverRounds=${probe.driverRounds} distRounds=${probe.distributedRounds} jobs=${c.jobs} stages=${c.stages} tasks=${c.tasks} maxStageTasks=${c.maxConcurrentTasksSeen}")
        println(f"[while] per-round: ${secs / math.max(probe.distributedRounds, 1)}%.3f s, jobs/round=${c.jobs.toDouble / math.max(probe.distributedRounds, 1)}%.1f, stages/round=${c.stages.toDouble / math.max(probe.distributedRounds, 1)}%.1f")

      case "bm25" =>
        def timeBm25(label: String, k: Int): Unit = {
          val xs = (1 to k).map { _ =>
            val t0 = System.nanoTime()
            Queries.qBm25(spark, dir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val mem = spark.sparkContext.getExecutorMemoryStatus
            .values.map { case (max, rem) => max - rem }.sum
          println(f"[bm25] $label%-18s ${xs.map(x => f"$x%.2f").mkString(" ")} (median ${xs.sorted.apply(k / 2)}%.2f)  storageUsed=${mem / 1e6}%.1f MB  gcTotal=${gcMillis()} ms  rdds=${spark.sparkContext.getPersistentRDDs.size}")
        }
        timeBm25("fresh", 5)
        // the suite context: one full alphabetical sweep with the bench's
        // pin drain (exactly Bench.runSweep minus timing bookkeeping)
        val names = SparkEntry.benchQueries.toSeq.sortBy(_._1)
        val gc0 = gcMillis()
        val t0 = System.nanoTime()
        names.foreach { case (name, fn) =>
          val before = spark.sparkContext.getPersistentRDDs.keySet
          try fn(spark, dir).count()
          catch { case e: Throwable => System.err.println(s"[bm25] $name failed: $e") }
          finally {
            val now = spark.sparkContext.getPersistentRDDs
            now.keysIterator.filterNot(before)
              .foreach(id => now.get(id).foreach(_.unpersist(blocking = false)))
          }
        }
        println(f"[bm25] suite sweep ${(System.nanoTime() - t0) / 1e9}%.1f s, gcDelta=${gcMillis() - gc0} ms")
        timeBm25("post-suite", 5)
        System.gc()
        Thread.sleep(3000) // let the ContextCleaner drain its queue
        System.gc()
        Thread.sleep(1000)
        timeBm25("post-suite+gc", 5)

      case other => sys.error(s"unknown probe mode $other")
    }
    spark.stop()
  }
}
