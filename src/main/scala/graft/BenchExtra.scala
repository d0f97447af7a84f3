package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** Round-6 optimization harness (guide §1.4): times a SUBSET of
  * SparkEntry.queries with the SAME session config and best-of-2
  * methodology as the frozen Bench, but additionally
  *  - counts Spark jobs + completed stages per query (scheduler-overhead
  *    telemetry: at sf0.1 the dedup family's seconds are mostly stage
  *    count × fixed stage cost, so stage count is the optimization
  *    target the wall-clock noise can't hide), and
  *  - can time through the noop sink instead of count() (env
  *    SPARK_GRAFT_NOOP=1) to force every column (guide §1.4).
  *
  * Usage: sbt "runMain graft.BenchExtra x13_jaccard_pairs,x14_dup_components"
  * (no args = every query, sorted). Prints one line per query and a
  * final JSON line. This main is ADDITIVE — Bench.scala stays frozen.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val useNoop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val names: Seq[String] =
      if (args.nonEmpty && args(0).nonEmpty) args(0).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogQuiet.muteCheckpointReleaseWarns()

    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })

    def run(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (useNoop) df.write.format("noop").mode("overwrite").save() else df.count()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // VERDICT r05 next #6 (load gate): Bench.scala is frozen, so the
    // r6 harness self-labels instead — loadavg at launch goes into the
    // record, and readings taken above ~2.0 1-min load should be
    // treated as contaminated.
    val loadavg = try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).mkString(",")
    catch { case _: Throwable => "" }
    println(s"loadavg at launch: $loadavg")

    val results = names.map { name =>
      spark.sparkContext.setJobDescription(s"benchx:$name")
      val warm = time(run(name))
      // listener counts settle asynchronously; snapshot around the timed run
      Thread.sleep(50)
      val (j0, s0) = (jobs.get(), stages.get())
      val t = time(run(name))
      Thread.sleep(50)
      val (j1, s1) = (jobs.get(), stages.get())
      val best = math.min(warm, t)
      println(f"$name%-26s best=$best%7.3f s  (warm=$warm%7.3f timed=$t%7.3f)  jobs=${j1 - j0}%3d stages=${s1 - s0}%3d")
      (name, best, j1 - j0, s1 - s0)
    }
    spark.sparkContext.setJobDescription(null)
    val total = results.map(_._2).sum
    def f(d: Double) = f"$d%.4f".toDouble
    val qs = results.map { case (k, v, j, s) => s""""$k":{"sec":${f(v)},"jobs":$j,"stages":$s}""" }.mkString("{", ",", "}")
    println(s"""{"bench_extra":true,"sf":"$sfDir","cores":$cores,"noop":$useNoop,"loadavg":"$loadavg","total_sec":${f(total)},"queries":$qs}""")
    spark.stop()
  }
}
