package graft

import graft.core.{Config, Runner}

/** CLI entry — parity with the reference's `cmd/migrator`
  * (`cmd/migrator/main.go:21-142` in /root/reference): load a YAML
  * config, run all pipelines concurrently, stop on SIGTERM/SIGINT or
  * after an optional wall-clock timeout.
  *
  * Usage: graft.Main <config.yaml> [timeoutSeconds]
  *   - `--once`: drain every pipeline once and exit (the batch facade,
  *     used instead of a timeout for deterministic runs)
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.yaml> [timeoutSeconds|--once]")
    val loaded = Config.loadFull(args(0))
    val specs = loaded.pipelines
    val spark = GraftSession.local()
    // precedence: YAML `tracking-path` > env > beside the first sink
    // (reference: TrackingTableName config, cmd/migrator/main.go:35)
    val trackingPath = loaded.trackingPath
      .orElse(sys.env.get("GRAFT_TRACKING_PATH"))
      .getOrElse(specs.head.destinationPath + "/_tracking")
    val runner = new Runner(spark, specs, trackingPath,
      errorCallback = (ctx, e) =>
        System.err.println(
          s"[graft] pipeline ${ctx.table} failed at ${ctx.stage}: ${e.getMessage}"))

    if (args.length > 1 && args(1) == "--once") {
      val totals = runner.drainOnce()
      println(s"[graft] drained: $totals")
    } else {
      // graceful shutdown on SIGTERM/SIGINT (reference main.go:30-32)
      Runtime.getRuntime.addShutdownHook(new Thread(() => runner.quit()))
      runner.run()
      args.drop(1).headOption.map(_.toLong).foreach { t =>
        new Thread(() => { Thread.sleep(t * 1000); runner.quit() }).start()
      }
      runner.awaitTermination()
    }
    spark.stop()
  }
}
