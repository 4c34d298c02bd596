package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", // static conf — must be set here
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      // static conf, same value as Sessions.builder: the codegen-cache
      // tripwire in PlanAuditSpec asserts repeat executions recompile
      // nothing, which needs the deployment-sized cache
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // mirror the deployment session (Sessions.builder applies
    // GraftExtensions): native SQL functions + the geo-radius rewrite
    // rule, so ContractSpec/PlanAuditSpec analyze the same plans the
    // driver runs. getOrCreate can't apply withExtensions to an
    // already-built session, hence the imperative route.
    org.apache.spark.sql.graft.Bridge.registerFunctions(s)
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ graft.plans.GeoRadiusJoinRule()
    s
  }
}
