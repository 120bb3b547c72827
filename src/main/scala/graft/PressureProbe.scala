package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Memory-pressure validation harness (VERDICT r11 #3): the 128 GiB
  * sandbox never spills, so every "bounded state" claim had been tested
  * only with room to spare. This main runs named query keys under
  * WHATEVER heap the caller gives the JVM (`SPARK_DRIVER_MEM=4g
  * tools/run_main.sh graft.PressureProbe ...`), records per-key spill
  * bytes from the task metrics, and prints an order-insensitive content
  * fingerprint ([[graft.operators.Sync.fingerprint]]: row count +
  * BIT_XOR + exact decimal sum of per-row xxhash64) so a small-heap run
  * is hash-comparable against a big-heap baseline of the same corpus —
  * "completes with spills and unchanged result" is the pass condition,
  * per key.
  *
  * An optional third arg lowers `spark.memory.fraction` (default 0.6) so
  * the execution/storage pool shrinks below even the small heap — that
  * forces the spill paths (external sort, spillable aggregation maps,
  * state store eviction) to actually run rather than merely be reachable.
  *
  * Usage: `PressureProbe <sfDir> <key,key,...> [memoryFraction]`.
  */
object PressureProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PressureProbe <sfDir> <key,key,...> [memoryFraction]")
    val (dir, keys) = (args(0), args(1).split(",").toSeq)
    val builder = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    if (args.length > 2) builder.config("spark.memory.fraction", args(2))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val peakMem = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakMem.accumulateAndGet(m.peakExecutionMemory, math.max)
        }
      }
    })

    val heap = Runtime.getRuntime.maxMemory()
    keys.foreach { key =>
      val fn = SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown query key: $key"))
      memSpill.set(0); diskSpill.set(0); peakMem.set(0)
      val t0 = System.nanoTime()
      val (ok, fp) =
        try (true, Some(operators.Sync.fingerprint(fn(spark, dir))))
        catch {
          // Fatal VM errors (OOM, stack overflow) leave the JVM in an
          // undefined state — later keys' results and spill metrics in
          // this run would be tainted, so rethrow and let the process
          // die; probe one key per JVM when hunting the OOM floor
          // (ADVICE r12). Non-fatal failures are per-key and reported.
          case e: VirtualMachineError =>
            System.err.println(s"[pressure] $key FATAL: ${e.getClass.getSimpleName} — aborting run")
            throw e
          case e: Throwable =>
            System.err.println(s"[pressure] $key FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            (false, None)
        }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(s"""{"probe":"pressure","key":"$key","ok":$ok,"sec":$sec,""" +
        s""""heap_bytes":$heap,"mem_spill":${memSpill.get},"disk_spill":${diskSpill.get},""" +
        s""""peak_exec_mem":${peakMem.get},"rows":${fp.map(_.rows).getOrElse(-1L)},""" +
        s""""xor":${fp.map(_.xor).getOrElse(0L)},"sum":"${fp.map(_.sum).getOrElse("")}"}""")
    }
    spark.stop()
  }
}
