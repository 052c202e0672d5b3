package graft.operators

import graft.{Bench, SparkEntry, SparkSpec}

/** Regression guard against silent whole-stage-codegen fallbacks: replays
  * every headline bench query with `spark.sql.codegen.fallback=false`, so a
  * "Code grows beyond 64 KB" Janino failure (which Spark normally swallows
  * by re-running the stage interpreted, ~7x slower — exactly what happened
  * to sim2_ann_ivf in round 1) fails the build instead of the benchmark.
  */
class CodegenGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("headline queries compile under codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      Bench.headline.foreach { name =>
        try SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            fail(s"$name failed under fail-fast codegen: ${e.getMessage}", e)
        }
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
