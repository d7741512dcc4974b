package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal clean-window 8→32 capability measurement: probe the host, and
  * only if the DRAM probe clears the calm threshold, run one warm + one
  * measured 8/32 pair on the big corpus and let graft.Bench's persistence
  * rules record it into BENCH/capability.json (via running the same logic
  * inline here). Exists so a calm window can be exploited in ~90 s without
  * paying the full bench (whose own burn ends the window).
  *
  * Usage: sbt "runMain graft.tools.CapabilityRun [calmGBs]"
  */
object CapabilityRun {

  def main(args: Array[String]): Unit = {
    val calm = args.headOption.map(_.toDouble)
      .orElse(sys.env.get("SPARK_GRAFT_CALM_GBS").map(_.toDouble)).getOrElse(12.0)
    val probe = graft.Bench.hostMemBandwidthGBs()
    println(f"CAPRUN probe=$probe%.2f GB/s (calm threshold $calm%.1f)")
    if (probe < calm) { println("CAPRUN-SKIP window not calm"); return }

    val nBig = 600000L
    val bigDir = s"/dev/shm/graft-bench-pages-$nBig"
    def session(cores: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"graft-cap-$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", "16g")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    val init = session(32)
    graft.Bench.writeCorpus(init, nBig, bigDir)
    init.stop()

    def measure(cores: Int, warmToo: Boolean): Double = {
      val s = session(cores)
      import org.apache.spark.sql.functions.col
      import s.implicits._
      def pass(): Long = s.read.parquet(bigDir).select(col("url"), col("html"))
        .as[(String, Array[Byte])]
        .repartition(cores * 4, col("url"))
        .mapPartitions { it =>
          var n = 0L
          it.foreach { case (u, h) =>
            val d = graft.extract.Extract.extractOne(u, h)
            if (d.err.isEmpty && d.text.nonEmpty)
              n += graft.chunk.Chunker.chunkDocument(d.url, graft.Hashing.sha256Hex(d.text), d.text).length
          }
          Iterator.single(n)
        }.reduce(_ + _)
      if (warmToo) pass()
      val t0 = System.nanoTime()
      pass()
      val t = (System.nanoTime() - t0) / 1e9
      s.stop()
      t
    }
    // warm once at 32 (JIT persists in this JVM), then the measured pair
    val t8 = measure(8, warmToo = true)
    val t32 = measure(32, warmToo = false)
    val eff = (t8 * 8) / (t32 * 32)
    val post = graft.Bench.hostMemBandwidthGBs()
    val spin = graft.Bench.hostSpinEff()
    println(f"CAPRUN t8=$t8%.2f t32=$t32%.2f eff=$eff%.3f probe_post=$post%.2f spin=$spin%.3f")
    graft.Bench.recordCapability(t8, t32, eff, math.min(probe, post), spin, nBig)

    // the OFFICIAL 2→8 pair on the standard (1x) corpus, same calm window
    val nStd = 150000L
    val stdDir = s"/dev/shm/graft-bench-pages-$nStd"
    val init2 = session(8)
    graft.Bench.writeCorpus(init2, nStd, stdDir)
    init2.stop()
    def measureStd(cores: Int): Double = {
      val s = session(cores)
      import org.apache.spark.sql.functions.col
      import s.implicits._
      def pass(): Long = s.read.parquet(stdDir).select(col("url"), col("html"))
        .as[(String, Array[Byte])]
        .repartition(cores * 4, col("url"))
        .mapPartitions { it =>
          var n = 0L
          it.foreach { case (u, h) =>
            val d = graft.extract.Extract.extractOne(u, h)
            if (d.err.isEmpty && d.text.nonEmpty)
              n += graft.chunk.Chunker.chunkDocument(d.url, graft.Hashing.sha256Hex(d.text), d.text).length
          }
          Iterator.single(n)
        }.reduce(_ + _)
      val t0 = System.nanoTime()
      pass()
      val t = (System.nanoTime() - t0) / 1e9
      s.stop()
      t
    }
    val probe28 = graft.Bench.hostMemBandwidthGBs()
    if (probe28 >= calm) {
      val t2 = measureStd(2)
      val t8s = measureStd(8)
      val eff28 = (t2 * 2) / (t8s * 8)
      println(f"CAPRUN t2=$t2%.2f t8=$t8s%.2f eff28=$eff28%.3f probe=$probe28%.2f")
      graft.Bench.recordCapability28(t2, t8s, eff28, probe28, spin, nStd)
    } else println(f"CAPRUN-SKIP-28 window closed (probe=$probe28%.2f)")
    println("CAPRUN-DONE")
  }
}
