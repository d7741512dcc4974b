package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.Extract
import graft.chunk.Chunker

/** Variant comparison for the bench pipeline: measures (local[8], local[32])
  * back-to-back pairs per Spark-conf variant so both sides of each ratio see
  * the same VM weather. Not part of the driver contract. */
object DiagBench {

  private def session(cores: Int, conf: Map[String, String]): SparkSession = {
    val b = SparkSession.builder().master(s"local[$cores]")
      .appName(s"diag-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
    conf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def full(s: SparkSession, dir: String, parts: Int): Unit = {
    import s.implicits._
    s.read.parquet(dir).select($"url", $"html").as[(String, Array[Byte])]
      .repartition(parts, col("url")).mapPartitions { it =>
        var n = 0L
        it.foreach { case (u, h) =>
          val d = Extract.extractOne(u, h)
          if (d.err.isEmpty && d.text.nonEmpty)
            n += Chunker.chunkDocument(d.url, graft.Hashing.sha256Hex(d.text), d.text).length
        }
        Iterator.single(n)
      }.reduce(_ + _)
  }

  final case class Variant(name: String, conf: Map[String, String], partsMult: Int)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-bench-pages-600000")
    val warm = "/tmp/graft-bench-pages-warm"
    val variants = Seq(
      Variant("base", Map.empty, 1),
      Variant("parts2x", Map.empty, 2),
      Variant("nocompress", Map("spark.shuffle.compress" -> "false"), 1),
      Variant("zstd", Map("spark.io.compression.codec" -> "zstd"), 1),
      Variant("split16m", Map("spark.sql.files.maxPartitionBytes" -> s"${16 * 1024 * 1024}"), 1))
    for (v <- variants) {
      def run(cores: Int): Double = {
        val s = session(cores, v.conf)
        full(s, warm, cores * v.partsMult)
        val t = time(full(s, dir, cores * v.partsMult))
        s.stop()
        t
      }
      val (t8a, t32a) = (run(8), run(32))
      val (t8b, t32b) = (run(8), run(32))
      val eff = Seq(t8a * 8 / (t32a * 32), t8b * 8 / (t32b * 32))
      println(f"${v.name}%-12s t8=[$t8a%6.2f,$t8b%6.2f] t32=[$t32a%6.2f,$t32b%6.2f] eff=[${eff(0)}%.3f,${eff(1)}%.3f]")
    }
  }
}
