package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import scala.collection.mutable

/** Stage-level measurement probe (optimization guide §1.1/§7.1: the UI is
  * disabled in this harness, so a listener substitutes for the Stages tab):
  * runs each named query through the bench's noop terminal — warm-up pass,
  * then one timed pass — and prints one line per stage of the timed pass:
  * wall seconds, task count, input / shuffle-read / shuffle-write bytes,
  * disk spill, and the stage's call site. This attributes a key's wall time
  * to operators (scan vs exchange vs agg) instead of guessing from the
  * plan.
  *
  * Usage: runMain graft.StageProbe <query[,query...]> [sfDir]
  */
object StageProbe {
  private case class St(id: Int, name: String, wall: Double, tasks: Int,
      input: Long, shufRead: Long, shufWrite: Long, spill: Long,
      cpu: Double, gc: Double, run: Double)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProbe <query[,query...]> [sfDir]")
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)) / 1e3
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.name, wall, si.numTasks,
            m.inputMetrics.bytesRead,
            m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.diskBytesSpilled,
            m.executorCpuTime / 1e9, m.jvmGCTime / 1e3, m.executorRunTime / 1e3)
        }
      }
    })
    def mb(b: Long): String = f"${b / 1048576.0}%8.1f"
    // Drain the listener bus until the recorded stage set is STABLE (three
    // consecutive unchanged polls) instead of a fixed sleep (ADVICE r17):
    // under bus backlog a fixed sleep could let warm-up events leak into
    // the timed snapshot or miss late timed-pass events. Bounded at 10 s so
    // a wedged bus cannot hang the probe.
    def drain(): Unit = {
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = stages.synchronized(stages.size)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    }
    names.foreach { n =>
      Bench.exec(SparkEntry.queries(n)(spark, sfDir)) // warm-up (codegen/JIT)
      spark.catalog.clearCache(); System.gc()
      drain() // warm-up listener events
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      Bench.exec(SparkEntry.queries(n)(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      drain() // timed-pass listener events
      val snap = stages.synchronized(stages.toVector)
      println(f"== $n: $t%.2f s, ${snap.size} stages "
        + f"(Σ stage wall ${snap.map(_.wall).sum}%.2f s — overlap makes this > key wall)")
      println("   wall  tasks  input_MB  shuf_r_MB  shuf_w_MB  spill_MB   cpu_s    gc_s   run_s  stage")
      snap.sortBy(-_.wall).take(40).foreach { s =>
        println(f"  ${s.wall}%5.2f  ${s.tasks}%5d  ${mb(s.input)}  ${mb(s.shufRead)}   "
          + f"${mb(s.shufWrite)}  ${mb(s.spill)}  ${s.cpu}%6.2f  ${s.gc}%6.2f  ${s.run}%6.2f  [${s.id}] ${s.name.take(80)}")
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
