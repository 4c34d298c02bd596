package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import org.apache.spark.sql.{DataFrame, SparkSession}

/** YAML front-end for machine/fleet configs — the reference's configs are
  * YAML documents (`workflow/config_elements/machine.py::Machine` +
  * `normalized_config.py::NormalizedConfig`, public repo; mount empty,
  * SURVEY.md §0), while [[WorkflowGenerator]] / [[ModelBuilder]] /
  * [[PipelineFactory]] consume JSON. This is a thin, driver-side
  * normalization layer: YAML parses to the SAME tree JSON would (the
  * scaladoc contract on [[WorkflowGenerator]]), so every downstream
  * consumer — deep merge, registry keying, builder routing — is shared
  * verbatim with the JSON path. No new semantics live here.
  *
  * Uses the YAML dataformat already on Spark's runtime classpath; the
  * tree is re-rendered through the same Jackson databind that json4s
  * wraps, so numeric/string/boolean scalars land as the identical node
  * types the JSON parser would produce.
  */
object YamlConfig {

  /** Parse a YAML document and render it as compact JSON — tags,
    * anchors/aliases and multi-document streams are rejected by the
    * underlying parser defaults; plain maps/lists/scalars round-trip.
    */
  def toJson(yaml: String): String = {
    val tree = new ObjectMapper(new YAMLFactory()).readTree(yaml)
    require(tree != null && !tree.isMissingNode, "empty YAML document")
    new ObjectMapper().writeValueAsString(tree)
  }

  /** YAML fleet document → normalized per-machine configs (name, model
    * type, canonical key-sorted JSON) — `from_definition` parity for the
    * reference's native config format.
    */
  def normalizeFleet(fleetYaml: String): Seq[(String, String, String)] =
    WorkflowGenerator.normalize(toJson(fleetYaml))

  /** Build a whole fleet straight from its YAML document. */
  def buildFleet(spark: SparkSession, fleetYaml: String, longDf: DataFrame,
      outDir: String): WorkflowGenerator.FleetResult =
    WorkflowGenerator.buildFleet(spark, toJson(fleetYaml), longDf, outDir)
}
