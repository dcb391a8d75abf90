package graft.functions

import graft.SparkSuite

/** The SQL registration surface (GraftExtensions): implicit casts, arity
  * validation, and DESCRIBE FUNCTION metadata — the contracts a SQL-only
  * caller depends on, which the Column-API specs never exercise.
  */
class SqlFunctionsSpec extends SparkSuite {

  test("vector functions implicitly cast integer arrays (documented contract)") {
    val c = spark.sql("SELECT cosine_sim(array(1, 2), array(2, 4)) AS c")
      .head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12, s"colinear int vectors: $c")
    val n = spark.sql("SELECT l2_norm(array(3, 4)) AS n").head.getDouble(0)
    assert(n == 5.0, s"l2_norm(3,4): $n")
    val d = spark.sql("SELECT dot_product(array(1, 2), array(3, 4)) AS d")
      .head.getDouble(0)
    assert(d == 11.0, s"dot_product: $d")
  }

  test("wrong arity fails loudly naming the function, never silently drops args") {
    val tooFew = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0))").collect()
    }
    assert(tooFew.getMessage.contains("cosine_sim"), tooFew.getMessage)
    // Surplus args were previously DROPPED silently (ran as 2-arg).
    val tooMany = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0), array(1.0), array(1.0))").collect()
    }
    assert(tooMany.getMessage.contains("cosine_sim"), tooMany.getMessage)
    val unary = intercept[Exception] {
      spark.sql("SELECT fnv64('a', 'b')").collect()
    }
    assert(unary.getMessage.contains("fnv64"), unary.getMessage)
  }

  test("DESCRIBE FUNCTION carries the usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim").collect()
      .map(_.getString(0)).mkString("\n")
    assert(desc.contains("cosine similarity"), desc)
    assert(desc.contains("graft.functions.CosineSimilarity"), desc)
  }
}
