package graft.extract

/** Per-document DETERMINISTIC work budget — the Spark-side analog of the
  * reference's per-file timeout (reference: src/services/RAG/
  * convert_to_embeddings.py:608-631, 1800 s per file), counted in work units
  * (parser ticks) instead of wall-clock nanos.
  *
  * Why not wall time: this engine's byte-identity contract (golden fixtures,
  * LakeSpec rerun equality) requires extraction output to be a pure function
  * of the input bytes. A wall-clock budget makes it a function of host
  * weather too — under a 3× host slow phase a legitimately heavy but valid
  * PDF could nondeterministically flip to an err row. A tick budget bounds
  * the same pathologies (decompression bombs, degenerate content streams —
  * every inflate/token loop strictly ticks, so ticks ∝ work) while staying
  * deterministic across reruns, hosts, and parallelism levels.
  *
  * A budget is armed around each `extractOne` call; the PDF machinery ticks
  * it from its token loop. The HTML path needs no ticks: the tokenizer is
  * one forward pass bounded by the (64 MB-capped) input, with every loop
  * strictly advancing.
  *
  * The ThreadLocal carries a 2-slot array (budget, counter) to avoid boxing;
  * tick() is a bare counter compare — no nanoTime call at all.
  */
object TimeBudget {

  final class Exceeded extends RuntimeException("per-doc work budget exceeded")

  private val state: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial[Array[Long]](() => Array(Long.MaxValue, 0L))

  def start(budgetTicks: Long): Unit = {
    val a = state.get(); a(0) = budgetTicks; a(1) = 0
  }

  def clear(): Unit = { state.get()(0) = Long.MaxValue }

  @inline def tick(): Unit = {
    val a = state.get()
    a(1) += 1
    if (a(1) > a(0)) throw new Exceeded
  }
}
