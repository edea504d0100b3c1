package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.functions.NerProxyFast
import graft.rules.Rules
import graft.sources.TranscriptGen
import org.apache.spark.unsafe.types.UTF8String

/** Thread-scaling of the per-turn KERNEL alone — the code this engine
  * actually adds to Spark's per-row path (clean chain, gazetteer scan,
  * ORG scan, NER-proxy counts), with no Spark machinery, no shuffle, no
  * GC-heavy row materialization. Isolates "does OUR per-row code scale
  * across threads in one JVM" from the host/Spark noise documented in
  * BENCH_SCALING.md. Levels interleave (8,32,8,32,…) so host drift
  * between phases cannot masquerade as a scaling effect; per-level score
  * is min-of-reps.
  */
object KernelScale {

  // shared by the thread harness below and KernelScaleWorker (the process
  // twin must measure EXACTLY this work)
  private[graft] def kernel(texts: Array[String]): Long = {
    var acc = 0L
    var i = 0
    while (i < texts.length) {
      val raw = texts(i)
      val clean = Rules.cleanString(raw)
      acc += Rules.scanGazetteer(clean).size
      acc += Rules.extractOrgs(raw).size
      acc += NerProxyFast.counts(UTF8String.fromString(clean)).numElements()
      acc += Rules.extractSalary(clean).map(_.values.size).getOrElse(0)
      i += 1
    }
    acc
  }

  private def run(texts: Array[String], threads: Int): Double = {
    val chunk = (texts.length + threads - 1) / threads
    val next = new AtomicInteger(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      val t = new Thread(() => {
        var c = next.getAndIncrement()
        while (c * chunk < texts.length) {
          kernel(texts.slice(c * chunk, math.min((c + 1) * chunk, texts.length)))
          c = next.getAndIncrement()
        }
      })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_KERNEL_CONVS", "30000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val texts = (0L until nConvs).flatMap(i =>
      TranscriptGen.turnsFor(i, 42L, 0, 0).map(_.text)).toArray
    println(s"[kernel] texts=${texts.length}")
    kernel(texts.take(20000)) // JIT warm-up
    val levels = Seq(8, 32)
    // interleaved reps: 8,32,8,32,... so host drift hits both levels alike
    val times = collection.mutable.Map(levels.map(_ -> List.empty[Double]): _*)
    (1 to reps).foreach { _ =>
      levels.foreach(l => times(l) = run(texts, l) :: times(l))
    }
    val best = levels.map(l => l -> times(l).min).toMap
    val tput = levels.map(l => l -> texts.length / best(l)).toMap
    val speedup = tput(32) / tput(8)
    val eff = speedup / 4.0
    val qs = levels.map(l =>
      f""""threads[$l]":{"sec":${best(l)}%.2f,"turns_per_sec":${tput(l)}%.1f}""").mkString(",")
    println(
      f"""{"metric":"kernel_scaling_efficiency","value":$eff%.3f,"unit":"ratio",$qs,"texts":${texts.length},"speedup":$speedup%.3f}""")
  }
}

/** Single-process worker for the PROCESS-level twin of [[KernelScale]]:
  * runs the same kernel single-threaded over a modulo shard of the same
  * corpus — N of these JVMs side-by-side model N one-core executors
  * exactly. Driven by scripts/proc_scale.sh.
  */
object KernelScaleWorker {
  def main(args: Array[String]): Unit = {
    val shard = args(0).toInt
    val nShards = args(1).toInt
    val nConvs = args(2).toLong
    val texts = (0L until nConvs).filter(_ % nShards == shard).flatMap(i =>
      TranscriptGen.turnsFor(i, 42L, 0, 0).map(_.text)).toArray
    // warm-up, then one timed pass (the parent measures wall time too)
    var acc = 0L
    acc += KernelScale.kernel(texts.take(20000))
    val t0 = System.nanoTime()
    acc += KernelScale.kernel(texts)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[worker] shard=$shard/$nShards texts=${texts.length} sec=$sec%.2f acc=$acc")
  }
}
