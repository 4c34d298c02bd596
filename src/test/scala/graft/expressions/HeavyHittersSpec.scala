package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MisraGries guarantees: frequent items present, counts are lower bounds") {
    // zipf-ish stream: item i appears 1000/i times, i = 1..50; n ~ 4500
    val stream = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val mg = new MisraGries(10)
    scala.util.Random.shuffle(stream).foreach(mg.add)
    val est = mg.items.toMap
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = stream.size.toDouble / (10 + 1)
    // every item with true frequency > n/(k+1) survives
    truth.filter(_._2 > bound).keys.foreach { hot =>
      assert(est.contains(hot), s"$hot (freq ${truth(hot)}) missing, bound $bound")
    }
    // estimates are lower bounds within the bound
    est.foreach { case (item, e) =>
      assert(e <= truth(item), s"$item overestimated: $e > ${truth(item)}")
      assert(truth(item) - e <= bound, s"$item error ${truth(item) - e} > $bound")
    }
    assert(mg.size <= 10 && mg.n == stream.size)
  }

  test("merge keeps the mergeable-summaries bound across arbitrary splits") {
    val stream = (1 to 40).flatMap(i => Seq.fill(800 / i)(s"t$i"))
    val shuffled = scala.util.Random.shuffle(stream)
    val parts = shuffled.grouped(shuffled.size / 7 + 1).toSeq
    val merged = new MisraGries(12)
    parts.foreach { p =>
      val local = new MisraGries(12)
      p.foreach(local.add)
      // serialization round trip IS the exchange path — exercise it
      merged.merge(MisraGries.deserialize(local.serialize()))
    }
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = stream.size.toDouble / (12 + 1)
    val est = merged.items.toMap
    truth.filter(_._2 > bound).keys.foreach(hot => assert(est.contains(hot)))
    est.foreach { case (item, e) =>
      assert(e <= truth(item) && truth(item) - e <= bound)
    }
  }

  test("the aggregate finds per-group heavy hitters through real shuffles") {
    val rows =
      (1 to 300).map(_ => ("a", "hot")) ++ (1 to 80).map(i => ("a", s"x$i")) ++
      (1 to 200).map(_ => ("b", "warm")) ++ (1 to 50).map(i => ("b", s"y$i"))
    val df = rows.toDF("grp", "item").repartition(13)
    val out = df.groupBy("grp")
      .agg(graft.ops.TextAnalysis.heavyHitters(col("item"), 5).as("hh"))
      .select(col("grp"), expr("transform(hh, x -> x.item)").as("items"),
        expr("transform(hh, x -> x.est)").as("ests"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](1), r.getSeq[Long](2)))).toMap
    // the dominant item survives any merge order and ranks first
    assert(out("a")._1.head == "hot" && out("b")._1.head == "warm")
    // lower bound discipline: est(hot) <= 300 and within n/(k+1)
    assert(out("a")._2.head <= 300L && 300L - out("a")._2.head <= 380 / 6 + 1)
    assert(out.values.forall(_._1.size <= 5))
  }

  test("the sketch is legal inside a streaming groupBy aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF.toDF("g", "w")
      .groupBy("g")
      .agg(graft.ops.TextAnalysis.heavyHitters(col("w"), 4).as("hh"))
      .writeStream.format("memory").queryName("hh_stream_out")
      .outputMode("complete").start()
    try {
      mem.addData((1 to 50).map(_ => ("g", "dominant")) ++
        Seq(("g", "rare1"), ("g", "rare2")): _*)
      q.processAllAvailable()
      mem.addData((1 to 30).map(_ => ("g", "dominant")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val hh = spark.table("hh_stream_out")
      .selectExpr("hh[0].item", "hh[0].est").collect().head
    assert(hh.getString(0) == "dominant")
    assert(hh.getLong(1) <= 80L && hh.getLong(1) >= 80L - 82 / 5)
  }

  test("SQL registration: graft_heavy_hitters works from spark.sql") {
    // newSession: keep the SHARED session's registry pristine (the
    // extensions spec asserts the parent is untouched by registration)
    val s = spark.newSession()
    org.apache.spark.sql.graft.Bridge.registerFunctions(s)
    import s.implicits._
    Seq(("g", "a"), ("g", "a"), ("g", "b")).toDF("grp", "w")
      .createOrReplaceTempView("hh_in")
    val rows = s.sql(
      "SELECT grp, graft_heavy_hitters(w, 4) AS hh FROM hh_in GROUP BY grp")
      .selectExpr("grp", "hh[0].item", "hh[0].est").collect()
    assert(rows.head.getString(1) == "a" && rows.head.getLong(2) == 2L)
    // invalid k fails at ANALYSIS time, not as an executor crash
    for (bad <- Seq("0", "-3", "CAST(NULL AS INT)")) {
      val e = intercept[Exception] {
        s.sql(s"SELECT graft_heavy_hitters(w, $bad) FROM hh_in GROUP BY grp")
          .collect()
      }
      assert(e.getMessage.contains("k must"), s"k=$bad: ${e.getMessage}")
    }
  }
}
