package graft

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions._

/** Codegen must COMPILE when inputs are non-nullable — the round-14
  * DotProduct lesson: `nullSafeCodeGen` hands a non-nullable expression a
  * FalseLiteral isNull and never declares the variable, so generated code
  * that names `ev.isNull` fails Janino and silently drops the whole stage
  * to interpreted execution (19 interpreted stages in the 1M-vector ivfpq
  * rung — a pure perf cliff, invisible to every value-correctness spec
  * because eval semantics don't change). GenerateUnsafeProjection.generate
  * compiles EAGERLY with no fallback, so a regression fails HERE. */
class CodegenNonNullableSpec extends SparkSpec {
  import spark.implicits._

  private val vecT = ArrayType(DoubleType, containsNull = false)
  private def vec(ord: Int) = BoundReference(ord, vecT, nullable = false)
  private def str(ord: Int) = BoundReference(ord, StringType, nullable = false)

  test("every custom codegen expression compiles under NON-NULLABLE inputs " +
      "(no ev.isNull reference without a declaration)") {
    val childArrT = ArrayType(StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("cv", vecT, nullable = false))), containsNull = false)
    val exprs = Seq(
      "DotProduct" -> DotProduct(vec(0), vec(1)),
      "DotProduct(strict)" -> DotProduct(vec(0), vec(1), strict = true),
      "VecSub" -> VecSub(vec(0), vec(1)),
      "NearestCentroid" -> NearestCentroid(vec(0), Seq(0, 1),
        Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))),
      "NearestChildCell" -> NearestChildCell(vec(0),
        BoundReference(1, childArrT, nullable = false)),
      "CharClassCounts" -> CharClassCounts(str(0), Seq(Seq(('a', 'z')))),
      "CompressionRatio" -> CompressionRatio(str(0)),
      "Md5Long" -> Md5Long(str(0)),
      "JaroWinkler" -> JaroWinkler(str(0), str(1)),
      "RollingHash" -> RollingHash(str(0)),
      "WindowHashes" -> WindowHashes(str(0), sub = 8),
      "GramHash" -> GramHash(str(0)))
    exprs.foreach { case (name, e) =>
      try GenerateUnsafeProjection.generate(Seq(e.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Expression]))
      catch { case ex: Throwable =>
        fail(s"$name failed codegen under non-nullable inputs: $ex")
      }
    }
  }

  test("DotProduct over non-nullable arrays (range + array()) returns " +
      "correct values inside whole-stage codegen — the ivfpq-rung shape") {
    val df = spark.range(100).select(col("id"),
      array(col("id").cast("double"), lit(2.0)).as("v"))
    val got = df.select(col("id"),
        graft.sim.Similarity.dot(col("v"), col("v")).as("d"))
      .as[(Long, Double)].collect().toMap
    (0L until 100L).foreach { i =>
      assert(got(i) == i * i + 4.0, s"dot mismatch at $i: ${got(i)}")
    }
  }
}
