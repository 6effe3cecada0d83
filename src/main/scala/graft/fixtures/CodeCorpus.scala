package graft.fixtures

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.index.CodeFile

/** Deterministic synthetic source-code corpus (FIXTURES.md §1): the test and
  * bench stand-in for the north rule's Iceberg table of code repos
  * (repo, path, commit, lang, content). Seeded XorShift, no external data.
  *
  * Token mix exercises the engine's hard paths:
  *  - Zipf-heavy keywords (`if`, `return`, ...) -> term skew / salting
  *  - mid-frequency identifiers (`indexwriter`, `mergepolicy`, ...)
  *  - rare unique tokens (`uniq_tok_<i>`) -> singleton postings
  *  - UAX#29 edge cases: `foo.bar`, `x2y`, `3.14`, `foo_bar`, CJK, an
  *    over-255-char token (dropped but position-consuming), CamelCase
  */
object CodeCorpus {

  private val keywords = Array(
    "if", "return", "import", "the", "def", "val", "for", "while", "new", "class")
  private val identifiers = Array(
    "indexwriter", "parsequery", "mergepolicy", "segment", "buffer",
    "analyzer", "tokenstream", "directory", "scoredoc", "collector",
    "postings", "docvalues", "codec", "similarity", "weight")
  private val langs = Array("scala", "java", "py", "go", "md")
  private val exts = Map("scala" -> "scala", "java" -> "java", "py" -> "py", "go" -> "go", "md" -> "md")

  private val longToken = "x" * 300

  @inline private def xorshift(s0: Long): Long = {
    var s = s0
    s ^= s << 13; s ^= s >>> 7; s ^= s << 17
    s
  }

  /** Deterministic content for doc i — independent of partitioning. */
  def contentFor(i: Long): String = {
    var s = xorshift(42L ^ (i * 0x9E3779B97F4A7C15L) ^ 0x5DEECE66DL)
    val sb = new java.lang.StringBuilder(256)
    val nLines = 3 + (math.abs(s) % 8).toInt
    var line = 0
    while (line < nLines) {
      var w = 0
      val nWords = 4 + (math.abs(s) % 6).toInt
      while (w < nWords) {
        s = xorshift(s)
        val r = math.abs(s) % 100
        val tok =
          if (r < 45) keywords((math.abs(s >> 8) % keywords.length).toInt) // Zipf head
          else if (r < 80) identifiers((math.abs(s >> 8) % identifiers.length).toInt)
          else if (r < 86) s"uniq_tok_${i}_$w"
          else if (r < 88) "foo.bar"
          else if (r < 90) "x2y"
          else if (r < 92) "3.14"
          else if (r < 94) "foo_bar"
          else if (r < 95) "中文"
          else if (r < 96) longToken
          else "CamelCase"
        sb.append(tok)
        sb.append(if (w == nWords - 1) "\n" else " ")
        w += 1
      }
      line += 1
    }
    sb.toString
  }

  def fileFor(i: Long, nRepos: Int = 10): CodeFile = {
    val lang = langs((i % langs.length).toInt)
    val content = contentFor(i)
    CodeFile(
      repo = s"repo-${i % nRepos}",
      path = s"src/pkg${i % 7}/File$i.${exts(lang)}",
      commit = graft.index.IndexBuilder.sha256Hex(s"commit-$i").take(8),
      lang = lang,
      content = content,
      sha256 = graft.index.IndexBuilder.sha256Hex(content))
  }

  /** Driver-side corpus for unit tests. */
  def files(n: Int, nRepos: Int = 10): Seq[CodeFile] =
    (0L until n.toLong).map(fileFor(_, nRepos))

  /** Distributed corpus for bench scale — generated on executors. */
  def dataset(spark: SparkSession, n: Long, nRepos: Int = 10, parts: Int = 0): Dataset[CodeFile] = {
    import spark.implicits._
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    spark.range(0L, n, 1L, p).map(i => fileFor(i, nRepos))
  }
}
