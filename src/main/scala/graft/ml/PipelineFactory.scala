package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.feature.{MinMaxScaler, PCA, StandardScaler, VectorAssembler}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config → spark.ml Pipeline — the analogue of the reference's
  * `serializer/pipeline_from_definition.py::from_definition` (public repo;
  * mount empty, SURVEY.md §0), which turns a nested dict keyed by dotted
  * class paths into an sklearn Pipeline.
  *
  * Definition shape (JSON; YAML front-ends can parse to the same tree):
  * {{{
  * {"steps": [
  *   {"type": "assembler", "inputCols": ["t1", "t2"]},
  *   {"type": "standard_scaler"},
  *   {"type": "pca_anomaly", "k": 2}
  * ]}
  * }}}
  * Each step type maps to a registered MLlib stage builder; unknown types
  * fail fast with the available registry listed (mirrors the reference's
  * import-error behavior for bad class paths).
  */
object PipelineFactory {

  val FeaturesCol = "features"
  val ScaledCol = "features_scaled"

  private type StageBuilder = Map[String, Any] => PipelineStage

  /** The stage registry — the analogue of from_definition's dynamic class
    * resolution, made explicit (no runtime reflection surprises).
    */
  val registry: Map[String, StageBuilder] = Map(
    "assembler" -> { params =>
      new VectorAssembler()
        .setInputCols(strList(params, "inputCols").toArray)
        .setOutputCol(FeaturesCol)
    },
    "minmax_scaler" -> { params =>
      new MinMaxScaler()
        .setInputCol(str(params, "inputCol", FeaturesCol))
        .setOutputCol(str(params, "outputCol", ScaledCol))
    },
    "standard_scaler" -> { params =>
      new StandardScaler()
        .setWithMean(bool(params, "withMean", default = true))
        .setWithStd(bool(params, "withStd", default = true))
        .setInputCol(str(params, "inputCol", FeaturesCol))
        .setOutputCol(str(params, "outputCol", ScaledCol))
    },
    "pca" -> { params =>
      new PCA()
        .setK(int(params, "k", 2))
        .setInputCol(str(params, "inputCol", ScaledCol))
        .setOutputCol(str(params, "outputCol", "pca_features"))
    }
  )

  /** Build a Pipeline from a parsed definition tree. */
  def fromDefinition(definition: Map[String, Any]): Pipeline = {
    val steps = definition.get("steps") match {
      case Some(s: Seq[_]) => s.map {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case other => throw new IllegalArgumentException(s"step must be an object, got: $other")
      }
      case _ => throw new IllegalArgumentException("definition needs a 'steps' list")
    }
    val stages = steps.map { step =>
      val tpe = step.get("type") match {
        case Some(t: String) => t
        case _ => throw new IllegalArgumentException(s"step missing 'type': $step")
      }
      registry.getOrElse(tpe,
        throw new IllegalArgumentException(
          s"unknown stage type '$tpe'; available: ${registry.keys.toSeq.sorted.mkString(", ")}")
      ).apply(step)
    }
    new Pipeline().setStages(stages.toArray)
  }

  /** Build from a JSON definition string. */
  def fromJson(json: String): Pipeline =
    fromDefinition(toPlain(JsonMethods.parse(json)).asInstanceOf[Map[String, Any]])

  private def toPlain(v: JValue): Any = v match {
    case JObject(fields) => fields.map { case (k, x) => k -> toPlain(x) }.toMap
    case JArray(items) => items.map(toPlain)
    case JString(s) => s
    case JInt(i) => i.toInt
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case JNull | JNothing => null
  }

  private def str(m: Map[String, Any], k: String, default: String): String =
    m.get(k).map(_.toString).getOrElse(default)
  private def strList(m: Map[String, Any], k: String): Seq[String] = m.get(k) match {
    case Some(s: Seq[_]) => s.map(_.toString)
    case _ => throw new IllegalArgumentException(s"'$k' must be a string list")
  }
  private def int(m: Map[String, Any], k: String, default: Int): Int = m.get(k) match {
    case Some(i: Int) => i
    case Some(other) => other.toString.toInt
    case None => default
  }
  private def bool(m: Map[String, Any], k: String, default: Boolean): Boolean = m.get(k) match {
    case Some(b: Boolean) => b
    case Some(other) => other.toString.toBoolean
    case None => default
  }
}
