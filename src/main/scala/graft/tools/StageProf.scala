package graft.tools

import java.lang.management.ManagementFactory
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.Extract
import graft.chunk.Chunker
import scala.jdk.CollectionConverters._
import scala.collection.mutable.ArrayBuffer

/** Stage-level profile of the bench pipeline at one parallelism level:
  * per-stage wall, summed task run time, GC time, shuffle bytes. Diagnoses
  * WHERE the 8->32 efficiency goes. Not part of the driver contract. */
object StageProf {

  private def gcMillis: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/dev/shm/graft-bench-pages-600000")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.memory.offHeap.enabled", sys.env.getOrElse("OFFHEAP", "false"))
      .config("spark.memory.offHeap.size", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    final case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
                        gcMs: Long, shufWrite: Long, shufRead: Long, tasks: Int)
    val stages = new ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages += St(i.stageId, i.name.take(40),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          m.executorRunTime, m.jvmGCTime,
          m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead,
          i.numTasks)
      }
    })

    def full(): Long = {
      spark.read.parquet(dir).select($"url", $"html").as[(String, Array[Byte])]
        .repartition(cores * 4, col("url")).mapPartitions { it =>
          var n = 0L
          it.foreach { case (u, h) =>
            val d = Extract.extractOne(u, h)
            if (d.err.isEmpty && d.text.nonEmpty)
              n += Chunker.chunkDocument(d.url, graft.Hashing.sha256Hex(d.text), d.text).length
          }
          Iterator.single(n)
        }.reduce(_ + _)
    }

    full() // warm
    stages.clear()
    val gc0 = gcMillis
    val t0 = System.nanoTime()
    full()
    val wall = (System.nanoTime() - t0) / 1e9
    val gcd = gcMillis - gc0
    println(f"cores=$cores wall=$wall%.2f s driverGC=${gcd}ms")
    stages.foreach { s =>
      println(f"  stage ${s.id}%3d ${s.name}%-40s wall=${s.wallMs}%6dms taskSum=${s.taskMs}%7dms gc=${s.gcMs}%6dms tasks=${s.tasks}%4d shufW=${s.shufWrite / 1e6}%8.1fMB shufR=${s.shufRead / 1e6}%8.1fMB")
    }
    spark.stop()
  }
}
