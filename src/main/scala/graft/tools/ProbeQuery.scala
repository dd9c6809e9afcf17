package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._

import graft.{GraftSession, SparkEntry}

/** Instrumented single-query probe: runs a SparkEntry query N times
  * through the noop sink with a listener that itemizes, for the LAST
  * (warm) run, every job's wall time, stage count, task count and
  * task-time sum — separating cluster work from driver-side gaps
  * (planning, codegen, AQE re-optimization), which show up as
  * wall-minus-task time and between-job gaps.
  *
  * Usage: runMain graft.tools.ProbeQuery <sfDir> <query> [repeat]
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeQuery <sfDir> <query> [repeat]")
    val sfDir = args(0)
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, var start: Long = 0L, var end: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L,
        var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    // stage -> job map from JobStart: broadcast-exchange jobs overlap
    // the main job even in local mode, so attributing a task to the
    // "most recent unfinished job" mis-charged concurrent jobs' tasks
    val stageToJob = mutable.HashMap.empty[Int, Int]
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (record) {
        val r = jobs.getOrElseUpdate(j.jobId, JobRec(j.jobId))
        r.start = j.time
        r.stages = j.stageInfos.size
        j.stageInfos.foreach(si => stageToJob(si.stageId) = j.jobId)
        r.desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (record) {
        jobs.get(j.jobId).foreach(_.end = j.time)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (record) {
        stageToJob.get(t.stageId).flatMap(jobs.get).foreach { r =>
          r.tasks += 1; r.taskMs += t.taskInfo.duration
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    for (r <- 1 to repeat) {
      val last = r == repeat
      if (last) { jobs.clear(); record = true }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      if (last) {
        record = false
        // let straggler listener events drain
        Thread.sleep(300)
        println(f"[probe] $name warm run: $sec%.2f s")
        var prevEnd = 0L
        var jobWall = 0L
        var gaps = 0L
        jobs.values.foreach { j =>
          val wall = j.end - j.start
          jobWall += wall
          val gap = if (prevEnd == 0L) 0L else j.start - prevEnd
          if (prevEnd != 0L) gaps += gap
          prevEnd = j.end
          println(f"[probe]   job ${j.id}%3d wall=${wall}%5d ms gapBefore=${gap}%5d ms stages=${j.stages}%2d tasks=${j.tasks}%4d taskSum=${j.taskMs}%6d ms  ${j.desc.take(60)}")
        }
        println(f"[probe] jobs=${jobs.size} jobWall=${jobWall} ms interJobGaps=${gaps} ms outsideJobs=${math.round(sec * 1000) - jobWall - gaps} ms")
      } else {
        println(f"[probe] $name warmup run$r: $sec%.2f s")
      }
    }
    spark.stop()
  }
}
