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

/** Out-of-fold (leakage-free) target encoding: each row is encoded with the
  * target mean of its category computed over the OTHER folds only, so a
  * row's own target never leaks into its feature (the CV-safe variant of
  * TargetEncoder, standard in gradient-boosting pipelines).
  *
  * enc(cat, fold) = (sum_all(cat) - sum_fold(cat, fold))
  *               / (cnt_all(cat) - cnt_fold(cat, fold))
  *
  * Scale shape: ONE keyed aggregate to the (category, fold) grain — a
  * #categories × #folds table — then the per-category totals come from a
  * window over that tiny table, and the corpus gets the encoding back via
  * a broadcast join. The corpus is scanned once and never shuffled.
  * Decimal sums keep the means order-independent (cross-engine contract).
  */
object OofTargetEncoder {

  /** Returns the (category, fold, enc) table. `fold` must be a
    * deterministic integer column (e.g. pmod(hash, k) or a key modulus).
    * A category seen only inside one fold gets a null enc for that fold
    * (no other-fold evidence — the unseen-category semantics).
    */
  def fit(df: DataFrame, cat: String, target: String, fold: org.apache.spark.sql.Column): DataFrame = {
    val byFold = df.filter(col(cat).isNotNull)
      .groupBy(col(cat).as("category"), fold.as("fold"))
      .agg(sum(col(target).cast("decimal(28,6)")).as("f_sum"),
        count(col(target)).as("f_cnt"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("category")
    byFold
      .withColumn("a_sum", sum(col("f_sum")).over(wAll))
      .withColumn("a_cnt", sum(col("f_cnt")).over(wAll))
      .select(col("category"), col("fold"),
        when(col("a_cnt") > col("f_cnt"),
          round((col("a_sum") - col("f_sum")).cast("double")
            / (col("a_cnt") - col("f_cnt")), 6)).as("enc"))
  }

  /** Encode the corpus: broadcast-join the fitted (category, fold) table.
    * The fitted side's join columns are renamed to scratch names so a
    * corpus column named `category`/`fold` can't collide. */
  def transform(df: DataFrame, fitted: DataFrame, cat: String,
      fold: org.apache.spark.sql.Column, outputCol: String): DataFrame =
    df.withColumn("__oof_fold", fold)
      .join(broadcast(fitted.select(col("category").as("__oof_cat"),
          col("fold").as("__oof_f"), col("enc").as(outputCol))),
        col(cat) === col("__oof_cat") && col("__oof_fold") === col("__oof_f"),
        "left")
      .drop("__oof_cat", "__oof_f", "__oof_fold")
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
