package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // canonical graft session — bench numbers reflect deployment config
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM + file system once so per-query timings measure the
    // queries, not session bring-up.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // Per-query warm-up: the first execution of a query pays JIT + codegen
    // compilation (measured 3-5s of the cold time on the heaviest queries);
    // the steady-state run is the throughput number. Cold totals are still
    // reported as "cold_total" for transparency.
    // the *_dN staged diagnostic queries exist only to localize driver
    // correctness divergences (VERDICT round 2, task 1) — they re-derive
    // prefixes of their parent query, so timing them would double-count
    // work that is not part of the operator surface
    val benchQueries = SparkEntry.queries.filterNot(_._1.matches(".*_d\\d+$"))
    val results = benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a broken query must surface, not get timed as a fast success
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (cold, okCold) = once()
      val (warm, okWarm) = once()
      (name, cold, warm, okCold && okWarm)
    }
    val qs = results.map { case (k, _, w, _) => s"\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
    val total = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,""" +
      s""""failed":[${failed.mkString(",")}],"queries":$qs,"sf":"$sfDir"}""")
    if (failed.nonEmpty) {
      System.err.println(s"[bench] FAILED queries: ${failed.mkString(", ")}")
      sys.exit(1)
    }
    spark.stop()
  }
}
