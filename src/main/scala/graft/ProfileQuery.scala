package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: `runMain graft.ProfileQuery q1 q2 ...`
  * runs each named query with the Bench session shape (fit-warmed,
  * same cpus/shuffle partitions) and prints, per query, the min wall
  * time over N samples plus the per-EXECUTION distributed-cost shape
  * from a SparkListener: job count, stage count, task count, summed
  * executor run/CPU time, shuffle read/write bytes, and input bytes.
  *
  * Wall time at sf0.1 on local[32] is mostly fixed per-stage/per-job
  * overhead, so the job/stage/shuffle counts are the signal that
  * transfers to cluster scale; the listener totals say which changes
  * removed real distributed work vs just local latency. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val samples = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", sys.env.getOrElse("SPARK_GRAFT_ANSI", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-job mode (SPARK_GRAFT_PROFILE_JOBS=1): one line per job of
    // the final sample — callsite + per-job stage/task/input/shuffle —
    // for localizing WHICH driver round-trip re-reads an input or
    // shuffles the bytes (the aggregate line says only that one does)
    val perJob = sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val runMs = new AtomicLong(0)
    val cpuNs = new AtomicLong(0)
    val shRead = new AtomicLong(0)
    val shWrite = new AtomicLong(0)
    val input = new AtomicLong(0)
    final class JobAgg(val site: String) {
      val stages = new AtomicInteger(0); val tasks = new AtomicInteger(0)
      val runMs = new AtomicLong(0); val input = new AtomicLong(0)
      val shRead = new AtomicLong(0); val t0 = System.nanoTime()
      @volatile var t1 = 0L
      val names = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    }
    val jobOf = new java.util.concurrent.ConcurrentHashMap[Int, JobAgg]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobOrder = java.util.Collections.synchronizedList(new java.util.ArrayList[Int]())
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          jobOf.put(j.jobId, new JobAgg(site))
          jobOrder.add(j.jobId)
          j.stageIds.foreach(sid => stageToJob.put(sid, j.jobId))
        }
        ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (perJob) Option(jobOf.get(j.jobId)).foreach(_.t1 = System.nanoTime())
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (perJob) Option(stageToJob.get(s.stageInfo.stageId))
          .flatMap(jid => Option(jobOf.get(jid))).foreach { a =>
            a.stages.incrementAndGet(); a.names.add(s.stageInfo.name); ()
          }
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
          shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          input.addAndGet(m.inputMetrics.bytesRead)
          if (perJob) Option(stageToJob.get(t.stageId))
            .flatMap(jid => Option(jobOf.get(jid))).foreach { a =>
              a.tasks.incrementAndGet(); a.runMs.addAndGet(m.executorRunTime)
              a.input.addAndGet(m.inputMetrics.bytesRead)
              a.shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            }
        }
      }
    }
    def zero(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      runMs.set(0); cpuNs.set(0); shRead.set(0); shWrite.set(0); input.set(0)
    }

    // Bench parity: untimed warmup + fit-once shared artifacts.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sf/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try PipelineQueries.warmSharedArtifacts(spark, sf)
    catch { case e: Throwable => System.err.println(s"warm: ${e.getMessage}") }

    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val walls = (1 to samples).map { i =>
        // profile ONLY the last sample (steady state): zero counters
        // right before it so the printed shape is one execution's
        if (i == samples) {
          Thread.sleep(300); zero() // drain queued listener events, then zero
          if (perJob) { jobOf.clear(); stageToJob.clear(); jobOrder.clear() }
        }
        val t0 = System.nanoTime()
        fn(spark, sf).count()
        val w = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.functions.GlobalRank.releaseStaged()
        w
      }
      Thread.sleep(300) // let queued listener events drain
      if (perJob) {
        import scala.jdk.CollectionConverters._
        jobOrder.asScala.foreach { jid =>
          val a = jobOf.get(jid)
          val ms = if (a.t1 > 0) (a.t1 - a.t0) / 1e6 else -1.0
          import scala.jdk.CollectionConverters._
          val nm = a.names.asScala.take(2).mkString(" | ")
          println(f"  JOB $name%s #$jid%d wall_ms=$ms%.0f " +
            f"stages=${a.stages.get}%d tasks=${a.tasks.get}%d " +
            f"run_ms=${a.runMs.get}%d input_mb=${a.input.get / 1e6}%.2f " +
            f"shuffle_r_mb=${a.shRead.get / 1e6}%.2f [$nm]")
        }
      }
      println(f"PROFILE $name wall_min=${walls.min}%.3f wall_last=${walls.last}%.3f " +
        f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
        f"exec_run_s=${runMs.get / 1e3}%.2f exec_cpu_s=${cpuNs.get / 1e9}%.2f " +
        f"shuffle_r_mb=${shRead.get / 1e6}%.2f shuffle_w_mb=${shWrite.get / 1e6}%.2f " +
        f"input_mb=${input.get / 1e6}%.2f")
    }
    spark.stop()
  }
}
