package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension-injected functions must work in a session that graft
  * did not otherwise touch — pure `spark.sql.extensions` wiring.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("functions injected via SparkSessionExtensions work in pure SQL") {
    // getOrCreate returns any existing default session (ignoring the
    // extensions conf), so detach the shared test session first and
    // restore it afterwards — the SparkContext itself is reused.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions: the programmatic injection path. The conf-string
      // form (spark.sql.extensions=graft.GraftExtensions) is a STATIC
      // conf read at SparkContext creation — it works for spark-submit
      // launches but is ignored here where the test JVM's context
      // already exists.
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = spark.sql(
        """SELECT ner_shape('Ab1-') AS s,
          |       ner_packed_shape('AAbb11') AS p,
          |       ner_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                  array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS c
          |""".stripMargin).collect()(0)
      assert(r.getString(0) == "Xxdo")
      assert(r.getString(1) == "Xxd")
      assert(math.abs(r.getDouble(2) - 24.0 / 25.0) < 1e-12)
      val sh = spark.sql("SELECT ner_shingles('a b c', 2) AS g")
        .collect()(0).getSeq[String](0)
      assert(sh == Seq("a b", "b c"))
      // catalog-level registration survives newSession()
      val fresh = spark.newSession()
      assert(fresh.sql("SELECT ner_shape('Zz9') AS s").collect()(0)
        .getString(0) == "Xxd")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
