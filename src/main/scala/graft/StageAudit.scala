package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-STAGE straggler auditor — the drill-down behind ScaleBench's
  * single worst_stage readout: runs one gate query against any data dir
  * and prints EVERY stage's task distribution (callsite, RDD scopes,
  * task count, max/median/total ms), slowest-max first. This is how a
  * "task max/median = 110" flag gets a name attached (the round-10
  * q_quality_pipeline question).
  *
  * Run: sbt 'runMain graft.StageAudit <dataDir> <query> [query …]'
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.StageAudit <dataDir> <query> [query ...]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    names.foreach(q => require(SparkEntry.queries.contains(q),
      s"unknown query: $q"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskTimes =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val stageNames =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null && t.taskInfo.successful)
            taskTimes.add((t.stageId, t.taskInfo.duration))
        override def onStageCompleted(
            s: org.apache.spark.scheduler
              .SparkListenerStageCompleted): Unit = {
          val info = s.stageInfo
          val scopes = info.rddInfos.flatMap(_.scope).map(_.name)
            .distinct.mkString(" | ")
          stageNames.put(info.stageId, s"${info.name} @ $scopes")
        }
      })

    names.foreach { name =>
      taskTimes.clear()
      stageNames.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      var size = -1
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (size != taskTimes.size && System.nanoTime() < deadline) {
        size = taskTimes.size
        Thread.sleep(50)
      }
      val all = taskTimes.toArray(Array.empty[(Int, Long)])
      println(f"== $name: ${sec}%.2f s, ${all.length} tasks, " +
        s"${all.map(_._1).distinct.length} stages")
      all.groupBy(_._1).toSeq
        .map { case (sid, ts) =>
          val d = ts.map(_._2).sorted
          (sid, d.last, d(d.length / 2), d.sum, d.length)
        }
        .sortBy(-_._2)
        .foreach { case (sid, mx, med, tot, n) =>
          println(f"  stage $sid%4d: $n%4d tasks  max $mx%6d ms  " +
            f"median $med%6d ms  total $tot%7d ms  " +
            s"ratio ${if (med > 0) f"${mx.toDouble / med}%.1f" else "inf"}" +
            s"  ${stageNames.getOrDefault(sid, "?")}")
        }
    }
    spark.stop()
  }
}
