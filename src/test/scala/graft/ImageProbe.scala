package graft

import graft.operators.Multimodal.ImageIoCodec

/** Dev aid: check the compressed-image codec for the same shared-JVM-
  * state hazard [[AudioProbe]] caught in the audio codec (per-call SPI
  * registry locking). Decodes the same PNG payload set on 1 vs N
  * threads with the production [[ImageIoCodec.channelSums]].
  *
  * Usage: sbt "Test/runMain graft.ImageProbe [records] [threads]"
  */
object ImageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val threads = args.lift(1).map(_.toInt).getOrElse(32)
    val payloads = (0 until n).map { i =>
      ImageIoCodec.encode(6 + i % 11, 4 + i % 7, "png",
        p => ((i * 37 + p * 11) % 253))
    }.toArray

    def run(par: Int): Double = {
      val t0 = System.nanoTime()
      val ts = payloads.grouped(math.max(1, n / par)).toSeq.map { chunk =>
        val t = new Thread(() =>
          chunk.foreach(p => require(ImageIoCodec.channelSums(p).isDefined)))
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    run(1) // JIT warm-up
    val t1 = run(1)
    val tN = run(threads)
    println(f"[image-probe] n=$n 1-thread ${t1}%.2f s (${t1 / n * 1e6}%.1f us/rec) | " +
      f"$threads-thread ${tN}%.2f s | speedup ${t1 / tN}%.1fx of ${threads}x ideal")
  }
}
