package graft.encode

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Target (mean) encoding as a Spark ML Estimator so it composes with
  * Pipeline stages and persists with them.
  *
  * Reference: /root/reference/Preprocessing/preprocessing.py:321-336 —
  * fit = groupby(cat)[target].mean() (a golden artifact exists:
  * output/epc_encoding.pkl = {A:384303.31, B:452563.23, C:427758.93,
  * D:359009.93, E:371628.37, F:357807.36}); transform = .map(encoding)
  * (unseen category → null, pandas NaN semantics).
  *
  * Scale: fit is one partial+final hash aggregate; transform is a broadcast
  * left join (the encoding table is |categories| rows — always tiny).
  */
class TargetEncoder(override val uid: String) extends Estimator[TargetEncoderModel] {
  def this() = this(Identifiable.randomUID("targetEncoder"))

  final val inputCol = new Param[String](this, "inputCol", "categorical column")
  final val targetCol = new Param[String](this, "targetCol", "numeric target column")
  final val outputCol = new Param[String](this, "outputCol", "encoded output column")

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setTargetCol(v: String): this.type = set(targetCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  setDefault(outputCol, "encoded")

  override def fit(ds: Dataset[_]): TargetEncoderModel = {
    val enc = ds.toDF()
      .filter(col($(inputCol)).isNotNull)
      .groupBy(col($(inputCol)).as("category"))
      .agg(avg(col($(targetCol))).as("mean_target"))
    val model = new TargetEncoderModel(uid,
      enc.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap,
      $(inputCol), $(outputCol))
    model.setParent(this)
    model
  }

  override def copy(extra: ParamMap): TargetEncoder = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField($(outputCol), DoubleType, nullable = true))
}

class TargetEncoderModel(
    override val uid: String,
    val encoding: Map[String, Double],
    val inputColName: String,
    val outputColName: String)
  extends Model[TargetEncoderModel] {

  override def transform(ds: Dataset[_]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val encDf = broadcast(encoding.toSeq.toDF("__te_category", outputColName))
    ds.toDF()
      .join(encDf, col(inputColName) === col("__te_category"), "left")
      .drop("__te_category")
  }

  /** Persist the encoding map as a small JSON artifact (replaces the
    * reference's joblib pickle, preprocessing.py:332-335).
    */
  def saveEncoding(path: String): Unit = {
    val json = encoding.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${k.replace("\"", "\\\"")}": $v""" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  override def copy(extra: ParamMap): TargetEncoderModel =
    copyValues(new TargetEncoderModel(uid, encoding, inputColName, outputColName), extra)

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField(outputColName, DoubleType, nullable = true))
}
