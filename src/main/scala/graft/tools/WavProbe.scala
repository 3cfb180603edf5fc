package graft.tools

/** Throwaway probe: is WAV decode throughput limited by
  * AudioSystem.getAudioInputStream's SPI lookup (global lock)?
  */
object WavProbe {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.Multimodal.WavCodec
    val n = 4000
    val payloads = (0 until n).map(i => WavCodec.encodeWav(i.toLong, 100L + i % 700)).toArray
    // warmup
    payloads.take(500).foreach(WavCodec.decodeStats)
    var t0 = System.nanoTime()
    payloads.foreach(WavCodec.decodeStats)
    println(f"single-thread: ${(System.nanoTime() - t0) / 1e9}%.3f s for $n decodes")
    t0 = System.nanoTime()
    val threads = (0 until 8).map { t =>
      new Thread(() => payloads.foreach(WavCodec.decodeStats))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    println(f"8 threads x $n: ${(System.nanoTime() - t0) / 1e9}%.3f s (ideal ~= single-thread time)")
  }
}
