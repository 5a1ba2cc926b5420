package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        val tm = si.taskMetrics
        println(f"[probe]   stage ${si.stageId}%3d wall ${dur / 1000.0}%7.2f s  " +
          f"run ${tm.executorRunTime / 1000.0}%7.2f s  cpu ${tm.executorCpuTime / 1e9}%7.2f s  " +
          f"gc ${tm.jvmGCTime / 1000.0}%6.2f s  deser ${tm.executorDeserializeTime / 1000.0}%6.2f s  ${si.numTasks} tasks")
        stages += ((si.stageId, si.name.split("\n").head.take(60), dur, si.numTasks))
      }
    })
    time("warmup small") { spark.range(1000).selectExpr("sum(id)").count() }
    val docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for (k <- Seq(4, 8, 16)) {
      time(s"signatures first-run k=$k") {
        Dedup.minhashSignatures(docs01, "text", "doc_id", 3, k).count()
      }
    }
    time("signatures repeat k=16") {
      Dedup.minhashSignatures(docs01, "text", "doc_id", 3, 16).count()
    }
    stages.foreach { case (id, n, d, t) => if (d > 1000) println(f"[probe] stage $id%3d ${d / 1000.0}%8.2f s  $t tasks") }
    spark.stop()
  }
}
