package graft

import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Pins the [[graft.expr.SpaceSavingTopK]] guarantees the DuckDB oracle
  * cannot express: the approximate regime's overestimate bound and
  * guaranteed-presence property, and merge stability across partitionings.
  * (The exact regime IS oracle-covered: q_heavy_hitters.) */
class SpaceSavingSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus(rows: Seq[String]) = rows.toDF("text")

  test("exact regime: capacity >= |vocab| reproduces exact counts, err 0") {
    val docs = corpus(Seq("a b a c", "b a d", "e a b"))
    val got = TextAnalysis.heavyHitters(docs, capacity = 100, k = 10)
      .as[(String, Long, Long)].collect().toSeq
    val exact = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").count()
      .as[(String, Long)].collect().toMap
    assert(got.map(r => r._1 -> r._2).toMap === exact)
    assert(got.forall(_._3 == 0L))
    // sorted by cnt desc, term asc
    assert(got === got.sortBy(r => (-r._2, r._1)))
  }

  test("approximate regime: overestimate bound + heavy item guaranteed") {
    // one item at ~half the stream, 40 distinct light fillers, capacity 4:
    // "hot" has true count > N/capacity so SpaceSaving must retain it
    val tokens = Seq.fill(40)("hot") ++ (1 to 40).map(i => s"light$i")
    val docs = corpus(scala.util.Random.shuffle(tokens).grouped(8).map(_.mkString(" ")).toSeq)
    val trueCounts = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TextAnalysis.heavyHitters(docs, capacity = 4, k = 4)
      .as[(String, Long, Long)].collect()
    assert(got.map(_._1).contains("hot"))
    got.foreach { case (term, cnt, err) =>
      val t = trueCounts(term)
      assert(cnt >= t, s"$term estimate $cnt must overestimate true $t")
      assert(cnt - err <= t, s"$term lower bound ${cnt - err} must not exceed true $t")
    }
    val hot = got.find(_._1 == "hot").get
    assert(hot._2 >= 40L)
  }

  test("merge stability: same exact result under different partitionings") {
    val docs = corpus((1 to 200).map(i => s"t${i % 13} t${i % 7} common"))
    def run(parts: Int) =
      TextAnalysis.heavyHitters(docs.repartition(parts), capacity = 64, k = 25)
        .as[(String, Long, Long)].collect().toSeq
    assert(run(1) === run(8))
  }

  test("SQL surface: space_saving_topk registered and usable from SQL") {
    GraftFunctions.registerAll(spark)
    corpus(Seq("x y x", "y x z")).createOrReplaceTempView("ss_docs")
    val rows = spark.sql(
      """SELECT e.item, e.cnt FROM (
        |  SELECT explode(space_saving_topk(term, 10)) AS e FROM (
        |    SELECT explode(split(text, ' ')) AS term FROM ss_docs))
        |ORDER BY e.cnt DESC, e.item""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(rows === Seq(("x", 3L), ("y", 2L), ("z", 1L)))
  }
}
