package graft
import org.apache.spark.sql.SparkSession

/** Per-query repeat-timing harness: `runMain graft.QBench <sfDir> <query>...`
  * runs each named query 3 times and prints per-rep seconds — separates
  * JIT/codegen cold cost (rep1) from steady-state throughput (rep3), which
  * `Bench`'s single JSON line cannot show.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (name <- args.drop(1); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"QBENCH $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
