package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.core._

/** ST6/ST8 lifecycle parity: pause halts progress, unpause resumes,
  * quit stops threads; per-stage error callback fires and the pipeline
  * thread survives the failure (reference retry-with-sleep,
  * `migrator.go:396-417`).
  */
class RunnerLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("pause/unpause/quit lifecycle") {
    val src = tmpDir("rl-src"); val dest = tmpDir("rl-dest")
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.parquet(s"$src/t.parquet")
    val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
      params = Params(batchSize = 10, sleepBetweenRunsSec = 0.2))
    val runner = new Runner(spark, Seq(spec), s"$dest/_tracking")
    assert(runner.currentState === RunState.New)
    runner.run()
    assert(runner.currentState === RunState.Running)
    // let it drain fully (5 batches + idle sleeps)
    eventually(60000)(spark.read.parquet(s"$dest/t.parquet").count() === 50)
    runner.pause()
    assert(runner.currentState === RunState.Paused)
    runner.unpause()
    assert(runner.currentState === RunState.Running)
    runner.quit()
    runner.awaitTermination()
    assert(runner.currentState === RunState.Stopped)
    // resumed tracking is at the max key
    val st = new TrackingStore(spark, s"$dest/_tracking").get("a", "t").get
    assert(st.sequentialPosition === 50L)
  }

  test("error callback fires per failed batch with stage+table context; runner keeps going") {
    val dest = tmpDir("re-dest")
    // source table missing -> every batch errors
    val spec = PipelineSpec("a", "missing", "id", "b", "t",
      tmpDir("re-empty"), dest,
      params = Params(sleepBetweenRunsSec = 0.1))
    val errors = new AtomicInteger(0)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
    val runner = new Runner(spark, Seq(spec), s"$dest/_tracking",
      errorCallback = (ctx, _) => {
        seen.add((ctx.stage, ctx.table)); errors.incrementAndGet(); ()
      })
    runner.run()
    eventually(60000)(errors.get() >= 2) // repeated retry, not a crash
    runner.quit()
    runner.awaitTermination()
    assert(errors.get() >= 2)
    // per-stage context (reference migrator.go:50): a missing source
    // fails pipeline INIT (validate reads the schema), tagged as such
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.forall(_._2 === "missing"))
    assert(seen.asScala.map(_._1).subsetOf(
      Set(ErrorContext.Init, ErrorContext.Extract)))
    assert(seen.asScala.nonEmpty)
  }

  test("load-stage failures carry the load tag") {
    val src = tmpDir("rl2-src"); val dest = tmpDir("rl2-dest")
    (1L to 5L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.parquet(s"$src/t.parquet")
    // destination path that cannot be created: a FILE where the loader
    // needs a directory
    val blocker = new java.io.File(s"$dest/t.parquet")
    blocker.getParentFile.mkdirs(); blocker.createNewFile()
    val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
      params = Params(sleepBetweenRunsSec = 0.1))
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val runner = new Runner(spark, Seq(spec), s"$dest/_tracking",
      errorCallback = (ctx, _) => { stages.add(ctx.stage); () })
    runner.run()
    eventually(60000)(stages.contains(ErrorContext.Load))
    runner.quit()
    runner.awaitTermination()
    assert(stages.contains(ErrorContext.Load))
  }

  private def eventually(timeoutMs: Long)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline && !safe(cond)) Thread.sleep(100)
    assert(safe(cond), "condition not met within timeout")
  }
  private def safe(c: => Boolean): Boolean =
    try c catch { case _: Throwable => false }
}
