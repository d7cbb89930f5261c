package graft.bench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerTaskEnd}
import org.apache.spark.storage.RDDBlockId

/** Per-query resource counters for the bench sweep — the instrument the
  * r12 verdict asked for: the checkpoint-heavy query family
  * (q135/q154/q159/q163/q172/q174) reads 2–4× slower under the full
  * 518-query sweep than under focused single-query runs, and five
  * rounds of "ambient load" adjudication never tested the obvious
  * mechanism (localCheckpoint MEMORY_AND_DISK blocks competing for
  * storage memory inside the sweep → spill-to-disk or eviction →
  * recompute, which a quiet focused run never sees). This listener
  * turns that hypothesis into numbers: [[graft.Bench]] snapshots the
  * counters around each query's timed reps and writes the per-query
  * table next to the timing artifact, so the sweep-vs-focused gap is
  * adjudicated from evictions/spill/GC data instead of re-argued.
  *
  * Everything is a monotone counter updated from listener callbacks
  * (single dispatch thread + the caller's snapshot thread — the
  * `AtomicLong`s are for visibility, not contention), so the probe
  * costs nanoseconds per task and cannot perturb what it measures.
  * Attribution is exact up to listener-bus drain, which the harness
  * forces between queries ([[org.apache.spark.graft.BenchBus]]).
  */
object SweepStats {
  /** One query window's totals. `rddDiskStored` is the smoking gun for
    * the checkpoint hypothesis: bytes of RDD blocks (localCheckpoint
    * uses MEMORY_AND_DISK) that landed ON DISK — either evicted from
    * storage memory under pressure or never admitted — each of which a
    * later job must read back at disk speed. `rddBlocksDropped` counts
    * block states going to NONE mid-query (true evictions of
    * memory-only data → recompute). Peaks come from the task-end
    * executor metrics (JVM-wide, max over the window). */
  final case class Window(
      tasks: Long, runMs: Long, cpuMs: Long, gcMs: Long,
      memSpilled: Long, diskSpilled: Long,
      shuffleRead: Long, shuffleWrite: Long,
      rddMemStored: Long, rddDiskStored: Long, rddBlocksDropped: Long,
      peakStorageMem: Long, peakExecMem: Long, peakHeap: Long) {
    def toJson: String =
      s"""{"tasks":$tasks,"run_ms":$runMs,"cpu_ms":$cpuMs,"gc_ms":$gcMs,""" +
        s""""mem_spilled":$memSpilled,"disk_spilled":$diskSpilled,""" +
        s""""shuffle_read":$shuffleRead,"shuffle_write":$shuffleWrite,""" +
        s""""rdd_mem_stored":$rddMemStored,"rdd_disk_stored":$rddDiskStored,""" +
        s""""rdd_blocks_dropped":$rddBlocksDropped,""" +
        s""""peak_storage_mem":$peakStorageMem,"peak_exec_mem":$peakExecMem,""" +
        s""""peak_heap":$peakHeap}"""
  }
}

final class SweepStats extends SparkListener {
  import SweepStats.Window

  private val tasks, runMs, cpuMs, gcMs = new AtomicLong
  private val memSpilled, diskSpilled = new AtomicLong
  private val shuffleRead, shuffleWrite = new AtomicLong
  private val rddMemStored, rddDiskStored, rddBlocksDropped = new AtomicLong
  private val peakStorage, peakExec, peakHeap = new AtomicLong

  private def maxUp(a: AtomicLong, v: Long): Unit = {
    var cur = a.get()
    while (v > cur && !a.compareAndSet(cur, v)) cur = a.get()
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      tasks.incrementAndGet()
      runMs.addAndGet(m.executorRunTime)
      cpuMs.addAndGet(m.executorCpuTime / 1000000L)
      gcMs.addAndGet(m.jvmGCTime)
      memSpilled.addAndGet(m.memoryBytesSpilled)
      diskSpilled.addAndGet(m.diskBytesSpilled)
      shuffleRead.addAndGet(
        m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
    val em = e.taskExecutorMetrics
    if (em != null) {
      maxUp(peakStorage, em.getMetricValue("OnHeapStorageMemory"))
      maxUp(peakExec, em.getMetricValue("OnHeapExecutionMemory"))
      maxUp(peakHeap, em.getMetricValue("JVMHeapMemory"))
    }
  }

  override def onBlockUpdated(e: SparkListenerBlockUpdated): Unit = {
    val info = e.blockUpdatedInfo
    info.blockId match {
      case _: RDDBlockId =>
        if (!info.storageLevel.isValid) rddBlocksDropped.incrementAndGet()
        else {
          if (info.memSize > 0) rddMemStored.addAndGet(info.memSize)
          if (info.diskSize > 0) rddDiskStored.addAndGet(info.diskSize)
        }
      case _ => // broadcast / shuffle / stream blocks: not this question
    }
  }

  /** Read-and-zero every counter — the per-query window boundary.
    * Callers drain the listener bus first so the window is exact. */
  def snapshotAndReset(): Window = Window(
    tasks.getAndSet(0), runMs.getAndSet(0), cpuMs.getAndSet(0),
    gcMs.getAndSet(0), memSpilled.getAndSet(0), diskSpilled.getAndSet(0),
    shuffleRead.getAndSet(0), shuffleWrite.getAndSet(0),
    rddMemStored.getAndSet(0), rddDiskStored.getAndSet(0),
    rddBlocksDropped.getAndSet(0), peakStorage.getAndSet(0),
    peakExec.getAndSet(0), peakHeap.getAndSet(0))
}
