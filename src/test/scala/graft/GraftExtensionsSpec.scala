package graft

class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after registration") {
    // newSession isolates the function registry but shares the context —
    // building a fresh session with .withExtensions would either return
    // the active session (no extensions applied) or require tearing down
    // the shared context. GraftExtensions delegates to the same builder.
    val s = spark.newSession()
    org.apache.spark.sql.graft.Bridge.registerFunctions(s)
    val out = s.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(out == 32.0)
    val err = intercept[Exception] {
      s.sql("SELECT graft_dot(array(1.0D))").head()
    }
    assert(err.getMessage.toLowerCase.contains("2 arguments"))
    // registration is session-scoped: a FRESH child session (no
    // registration) lacks the function — the shared SparkSpec session
    // registers deliberately, mirroring the deployment builder
    assert(intercept[Exception] {
      spark.newSession()
        .sql("SELECT graft_dot(array(1.0D), array(1.0D))").head()
    }.getMessage.toUpperCase.contains("UNRESOLVED_ROUTINE"))
  }
}
