package graft.tools

import graft.fixtures.CodeCorpus
import graft.index.IndexBuilder

/** Plain-threads micro-bench isolating analyzer+sha from Spark (dev tool). */
object TokBench {
  def run(name: String, n: Int, docs: Array[String], threads: Int)(work: String => Long): Unit = {
    val t0 = System.nanoTime()
    val chunk = (n + threads - 1) / threads
    val accs = new java.util.concurrent.atomic.AtomicLong()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var i = t * chunk
        val end = math.min(n, i + chunk)
        var acc = 0L
        while (i < end) { acc += work(docs(i)); i += 1 }
        accs.addAndGet(acc)
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[tokbench] $name%8s threads=$threads%2d sec=$sec%6.2f docs_per_sec=${(n / sec).toLong}%d (acc=${accs.get()}%d)")
  }

  def main(args: Array[String]): Unit = {
    val n = 200000
    val docs = (0L until n.toLong).map(CodeCorpus.contentFor).toArray
    val analyzer = graft.analysis.Analyzers.standard
    for (threads <- Seq(1, 8, 1, 8)) {
      run("sha", n, docs, threads)(d => IndexBuilder.sha256Hex(d).length.toLong)
      run("tokenize", n, docs, threads)(d => analyzer.analyze(d).size.toLong)
      run("invert", n, docs, threads)(d => { val (m, l) = analyzer.invert(d); (m.size + l).toLong })
    }
  }
}
