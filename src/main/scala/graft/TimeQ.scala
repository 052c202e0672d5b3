package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: time individual SparkEntry queries, or diagnose the extraction
  * pipeline ("diag" mode) with per-stage wall/CPU metrics at a given
  * parallelism (SPARK_GRAFT_CPUS).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus.toInt, "graft-timeq")
    // dev A/B switch: measure a query with AQE off (TimeQ only — the bench
    // session is Sessions.local's tuned config either way)
    sys.env.get("GRAFT_TIMEQ_AQE").foreach(v => spark.conf.set("spark.sql.adaptive.enabled", v))
    implicit val s: SparkSession = spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long, Long, Int)]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val jobStarts = scala.collection.mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val m = si.taskMetrics
        stages += ((si.stageId, wall, m.executorRunTime, m.executorCpuTime / 1000000L,
          m.jvmGCTime, m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead,
          si.numTasks))
        if (sys.env.contains("GRAFT_TIMEQ_JOBS"))
          println(f"[diag-stage] ${si.stageId}%4d wall=${wall / 1000.0}%5.2fs tasks=${si.numTasks} ${si.name.take(90)}")
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStarts(js.jobId) = js.time
        if (sys.env.contains("GRAFT_TIMEQ_JOBS")) {
          val site = Option(js.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")
          println(f"[diag-job] ${js.jobId}%4d stages=${js.stageIds.length} $site")
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs += ((je.jobId, jobStarts.getOrElse(je.jobId, je.time), je.time))
    })

    def time[A](label: String)(f: => A): A = {
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val jobWall = jobs.map(j => j._3 - j._2).sum / 1000.0
      println(f"[diag] $label: $wall%.2f s  jobs=${jobs.length} jobWall=$jobWall%.2fs gaps=${wall - jobWall}%.2fs")
      stages.sortBy(-_._2).take(8).foreach { case (id, w, run, cpu, gc, shuf, n) =>
        println(f"[diag]    stage $id%4d wall=${w / 1000.0}%6.2fs taskRun=${run / 1000.0}%7.1fs cpu=${cpu / 1000.0}%7.1fs gc=${gc / 1000.0}%6.1fs shuffle=${shuf / 1e6}%8.1fMB tasks=$n")
      }
      r
    }

    args.toList match {
      case "diag" :: baseDir :: Nil =>
        val docs = spark.read.parquet(s"$baseDir/docs").as[graft.schema.Doc]
        val media = spark.read.parquet(s"$baseDir/media").as[graft.schema.Media]
        // warm codegen/JIT
        graft.pipeline.Extract.run(docs.limit(2000), media)
          .write.mode("overwrite").parquet(s"$baseDir/warmup")
        for (i <- 1 to 2) time(s"extract+write #$i") {
          graft.pipeline.Extract.run(docs, media)
            .write.mode("overwrite").parquet(s"$baseDir/out_w$i")
        }
      case "explain" :: names =>
        val sf = "/root/testdata/sf0.001"
        names.foreach { name =>
          println(s"===== $name =====")
          if (name == "extract_pipeline")
            graft.pipeline.Extract.runGenerated(100)(spark).explain("formatted")
          else SparkEntry.queries(name)(spark, sf).explain("formatted")
        }
      case "noop" :: sf :: names =>
        names.foreach { name =>
          for (i <- 1 to 2) time(s"$name noop#$i") {
            SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
          }
        }
      case names =>
        val sf = "/root/testdata/sf0.1"
        names.foreach { name =>
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(name)(spark, sf).count()
          println(f"[timeq] $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
    }
    spark.stop()
  }
}
