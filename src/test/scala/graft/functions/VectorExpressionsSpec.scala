package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cep.spark.SparkT

class VectorExpressionsSpec extends AnyFunSuite {
  import SparkT.spark

  test("dot_product matches the interpreted HOF result and supports SQL") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.5, -1.0), Array(2.0, 2.0))).toDF("id", "a", "b")
    val got = df.select(col("id"), call_function("dot_product", col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = df.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
    assert(got(1L) == 32.0 && got(2L) == -1.0)
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT dot_product(a, b) AS d FROM vecs WHERE id = 1").head().getDouble(0)
    assert(viaSql == 32.0)
  }

  test("dot_product runs inside whole-stage codegen") {
    VectorFunctions.register(spark)
    // spark.range keeps the projection in a real codegen stage (a local Seq would be
    // constant-folded into a LocalTableScan before codegen)
    val df = spark.range(3)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"), array(lit(3.0), lit(4.0)).as("b"))
      .select(call_function("dot_product", col("a"), col("b")).as("d"))
    // the "*(n)" prefix marks operators compiled into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_product("), s"expected codegen'd projection:\n$plan")
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(8.0, 11.0, 14.0))
  }

  test("null arrays yield null") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    val r = df.select(call_function("dot_product", col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }
}
