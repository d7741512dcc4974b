package graft.extract

/** Per-document wall-clock budget — the Spark-side analog of the reference's
  * per-file timeout (reference: src/services/RAG/convert_to_embeddings.py:
  * 608-631, 1800 s per file). A budget is armed around each `extractOne`
  * call; the PDF machinery ticks it from its token loop, so a pathological
  * document (decompression bomb, degenerate content stream) yields an
  * err="timeout" ROW after the budget instead of owning the task forever.
  *
  * The HTML path needs no ticks: the tokenizer is one forward pass bounded
  * by the (64 MB-capped) input, with every loop strictly advancing.
  *
  * tick() amortizes the nanoTime call to 1/4096 invocations; the
  * ThreadLocal carries a 2-slot array (deadline, counter) to avoid boxing.
  */
object TimeBudget {

  final class Exceeded extends RuntimeException("per-doc time budget exceeded")

  private val state: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial[Array[Long]](() => Array(Long.MaxValue, 0L))

  def start(deadlineNanos: Long): Unit = {
    val a = state.get(); a(0) = deadlineNanos; a(1) = 0
  }

  def clear(): Unit = { state.get()(0) = Long.MaxValue }

  @inline def tick(): Unit = {
    val a = state.get()
    a(1) += 1
    if ((a(1) & 0xfffL) == 0L && a(0) != Long.MaxValue && System.nanoTime() > a(0))
      throw new Exceeded
  }
}
