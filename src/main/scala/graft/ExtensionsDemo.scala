package graft

import org.apache.spark.sql.SparkSession

/** Standalone proof that `spark.sql.extensions=graft.GraftExtensions` wires
  * vec_dot into a fresh session for pure-SQL users (run via tools/run.sh —
  * needs its own JVM because extensions apply at session creation).
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").head()
    println(s"vec_dot via SQL extension = ${row.getDouble(0)} (expect 5.5)")
    assert(row.getDouble(0) == 5.5)
    val ng = spark.sql(
      "SELECT token_ngrams(array('a','b','c'), 2) AS t, char_ngrams('abc', 2) AS c").head()
    println(s"token_ngrams = ${ng.getSeq[String](0)}, char_ngrams = ${ng.getSeq[String](1)}")
    assert(ng.getSeq[String](0) == Seq("a b", "b c"))
    assert(ng.getSeq[String](1) == Seq("ab", "bc"))
    spark.stop()
  }
}
