package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LogicalPlan, Window => LWindow}

/** One-off diagnostic: list every SparkEntry query whose optimized plan
  * contains an unpartitioned Window NOT bounded by a constant limit —
  * the single-task-total-sort smell the scale audits watch for.
  * Usage: runMain graft.tools.WindowAudit <sfDir> [nameFilter] */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val filter = if (args.length > 1) args(1) else ""
    val spark = SparkSession.builder()
      .appName("window-audit").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def limitBounded(p: LogicalPlan): Boolean = p.exists {
      case GlobalLimit(Literal(v: Int, _), _) => v <= 100
      case _ => false
    }
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.isEmpty || n.contains(filter))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val bad = df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty && !limitBounded(w.child) => w
        }
        if (bad.nonEmpty) println(s"GLOBALWINDOW\t$name\t${bad.size}")
      } catch {
        case e: Throwable => println(s"ERR\t$name\t${e.getClass.getSimpleName}")
      }
    }
    println("AUDIT DONE")
    spark.stop()
  }
}
