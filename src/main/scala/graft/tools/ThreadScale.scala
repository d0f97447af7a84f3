package graft.tools

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger
import graft.Extractor
import graft.model.Turn

/** Diagnostic: raw multi-threaded throughput of Extractor.extract with
  * no Spark involved — separates function-level scaling (allocation /
  * GC / regex contention) from Spark scheduling overhead.
  */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val tools = Array("plain", "document", "receipt", "id_card", "form",
      "table", "signage", "scientific", "multi_column", "html", "pdf", "book_page")
    val base = (0 until 5000).map { i =>
      val text = (0 until 40).map(j => s"word${(i * 7 + j) % 50} data value")
        .mkString(" ") + "\nsecond line here\n\nnew paragraph with more text."
      Turn(f"conv-$i%06d", i % 10, "user", text, tools(i % 12), new Timestamp(1700000000000L))
    }.toArray

    def run(nThreads: Int, perThread: Int): Double = {
      val counter = new AtomicInteger()
      val t0 = System.nanoTime()
      val threads = (0 until nThreads).map { _ =>
        new Thread(() => {
          var k = 0
          while (k < perThread) {
            val t = base(counter.getAndIncrement() % base.length)
            val r = Extractor.extract(t)
            if (r.text == null) throw new IllegalStateException()
            k += 1
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      nThreads * perThread / sec
    }

    run(4, 2000) // JIT warmup
    run(32, 2000)
    val thr1 = run(1, 8000)
    val thr8 = run(8, 8000)
    val thr32 = run(32, 8000)
    println(f"threads=1  thr=$thr1%.0f/s")
    println(f"threads=8  thr=$thr8%.0f/s  eff_vs1=${thr8 / thr1 / 8}%.2f")
    println(f"threads=32 thr=$thr32%.0f/s eff_vs8=${(thr32 / thr8) / 4}%.2f eff_vs1=${thr32 / thr1 / 32}%.2f")
  }
}
