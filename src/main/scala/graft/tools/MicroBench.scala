package graft.tools

import java.util.concurrent.atomic.AtomicLong
import graft.corpus.PageGen
import graft.extract.Extract
import graft.chunk.Chunker

/** No-Spark threaded microbenchmark of the extract+chunk hot path.
  *
  * Purpose (BENCH/BASELINE.md): separate engine scaling from the single-VM
  * memory-subsystem ceiling. Each thread runs `extractOne` + `chunkDocument`
  * over its own slice of an in-memory page corpus — no shuffle, no I/O, no
  * Spark. If per-core throughput collapses from 8 → 32 threads HERE, the
  * collapse is the box (shared DRAM/LLC), not the Spark plan.
  *
  * Run: `sbt "runMain graft.tools.MicroBench [nPages] [threadCounts,...]"`.
  * Prints one line per thread count plus pairwise efficiencies.
  */
object MicroBench {

  /** Process pages[from, until); returns (docs, chunks) — chunk count is
    * returned to defeat dead-code elimination. */
  def work(urls: Array[String], bytes: Array[Array[Byte]], from: Int, until: Int): (Long, Long) = {
    var docs = 0L
    var chunks = 0L
    var i = from
    while (i < until) {
      val d = Extract.extractOne(urls(i), bytes(i))
      if (d.err.isEmpty && d.text.nonEmpty)
        chunks += Chunker.chunkDocument(d.url, graft.Hashing.sha256Hex(d.text), d.text).length
      docs += 1
      i += 1
    }
    (docs, chunks)
  }

  /** One timed pass at `threads` threads over the whole corpus. Returns
    * (wallSec, chunks). */
  def pass(urls: Array[String], bytes: Array[Array[Byte]], threads: Int): (Double, Long) = {
    val n = urls.length
    val chunkTotal = new AtomicLong(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val from = (n.toLong * t / threads).toInt
      val until = (n.toLong * (t + 1) / threads).toInt
      val th = new Thread(() => {
        val (_, c) = work(urls, bytes, from, until)
        chunkTotal.addAndGet(c)
      })
      th.start(); th
    }
    ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, chunkTotal.get())
  }

  def genCorpus(n: Int): (Array[String], Array[Array[Byte]]) = {
    val urls = new Array[String](n)
    val bytes = new Array[Array[Byte]](n)
    val nGen = Runtime.getRuntime.availableProcessors()
    val gs = (0 until nGen).map { g =>
      val th = new Thread(() => {
        var i = g
        while (i < n) {
          val r = PageGen.row(42L, i.toLong)
          urls(i) = r.url; bytes(i) = r.html
          i += nGen
        }
      })
      th.start(); th
    }
    gs.foreach(_.join())
    (urls, bytes)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(30000)
    val threadCounts = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 8, 32))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val (urls, bytes) = genCorpus(n)
    // warmup: full JIT of the hot path
    pass(urls, bytes, 8); pass(urls, bytes, 8)

    val best = threadCounts.map { t =>
      val times = (0 until reps).map(_ => pass(urls, bytes, t)._1)
      val w = times.min
      println(f"threads=$t%3d wall=$w%7.3f s  docs/s=${n / w}%9.1f  docs/s/core=${n / w / t}%8.1f")
      t -> w
    }.toMap
    for (Seq(a, b) <- threadCounts.sliding(2) if best.contains(a) && best.contains(b)) {
      val eff = (best(a) * a) / (best(b) * b)
      println(f"efficiency ${a}->${b}: $eff%.3f")
    }
  }
}
