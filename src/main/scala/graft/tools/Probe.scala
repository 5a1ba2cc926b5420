package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit main (not part of the driver contract): prints the
  * formatted physical plan of selected driver queries for pushdown /
  * broadcast / codegen review.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val qs = graft.SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter", "q10_tpch_q1", "q20_join_inner", "q21_join_multikey", "d01_dedup_exact")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      println(qs(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
