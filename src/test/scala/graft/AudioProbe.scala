package graft

import graft.operators.Multimodal.WavCodec

/** Dev aid: isolate the WAV-decode scaling hazard the round-6 10× smoke
  * surfaced (qm_audio_stats 1.2 s → 34.4 s at 10× data, ~28×). Decodes
  * the same synthetic payload set on 1 vs N JVM threads, with the
  * production [[WavCodec.decodeStats]] — if per-record cost balloons
  * with thread count, the bottleneck is shared JVM state (the
  * `AudioSystem` SPI registry lock), not the byte work.
  *
  * Usage: sbt "Test/runMain graft.AudioProbe [records] [threads]"
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(100000)
    val threads = args.lift(1).map(_.toInt).getOrElse(32)
    val payloads = (0 until n).map { i =>
      val id = i.toLong
      WavCodec.encode((8000 * (1 + id % 3)).toInt, (1 + id % 2).toInt,
        (120 + id % 77).toInt, s => ((id * 131 + s * 17) % 4001 - 2000).toInt)
    }.toArray

    def run(par: Int): Double = {
      val t0 = System.nanoTime()
      val chunks = payloads.grouped(math.max(1, n / par)).toSeq
      val ts = chunks.map { chunk =>
        val t = new Thread(() => chunk.foreach(p => require(WavCodec.decodeStats(p).isDefined)))
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    run(1) // JIT warm-up
    val t1 = run(1)
    val tN = run(threads)
    println(f"[audio-probe] n=$n 1-thread ${t1}%.2f s (${t1 / n * 1e6}%.1f us/rec) | " +
      f"$threads-thread ${tN}%.2f s (${tN / n * 1e6 * threads}%.1f us/rec-cpu) | " +
      f"speedup ${t1 / tN}%.1fx of ${threads}x ideal")
  }
}
