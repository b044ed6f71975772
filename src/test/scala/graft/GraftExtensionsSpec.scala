package graft

class GraftExtensionsSpec extends SparkTestBase {
  test("float_vec_dot is SQL-callable after registration") {
    GraftExtensions.registerTemp(spark)
    val r = spark.sql(
      "SELECT float_vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }
}
