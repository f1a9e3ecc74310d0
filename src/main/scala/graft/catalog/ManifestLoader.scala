package graft.catalog

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import graft.functions.GraftFunctions.dsumSql

/** Loads a [[SemanticRegistry]] from a declarative manifest file (YAML
  * or JSON) — the reference's `build_semantic_manifest_from_dbt_project_
  * root` (dbt_query2.py:36) re-expressed: metric/model definitions live
  * in a data file a user edits, not in compiled Scala.
  *
  * Uses Jackson's tree model (already on the Spark classpath — Spark
  * itself depends on jackson-databind + dataformat-yaml), walked
  * manually so a malformed manifest fails with a field-path error
  * instead of a binder stack trace.
  *
  * Structured agg forms keep the engine's determinism discipline
  * declarative: `agg: sum` compiles to the exact-decimal distributed
  * sum ([[graft.functions.GraftFunctions.dsumSql]]) so a user-authored
  * metric is automatically order-independent and oracle-reproducible;
  * `agg: raw` is the audited escape hatch.
  */
object ManifestLoader {

  def load(path: String): SemanticRegistry = {
    val f = new java.io.File(path)
    require(f.exists(), s"manifest not found: $path")
    val mapper =
      if (path.endsWith(".json")) new ObjectMapper()
      else new ObjectMapper(new YAMLFactory())
    fromTree(mapper.readTree(f), path)
  }

  // ---------------------------------------------------------- tree walk

  private def arr(root: JsonNode, field: String): Seq[JsonNode] =
    Option(root.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def str(n: JsonNode, field: String, ctx: String): String = {
    val v = n.get(field)
    require(v != null && v.isTextual, s"manifest: missing/non-string '$field' in $ctx")
    v.asText()
  }

  private def optStr(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(!_.isNull).map(_.asText())

  private def optBool(n: JsonNode, field: String): Boolean =
    Option(n.get(field)).exists(_.asBoolean(false))

  private def strList(n: JsonNode, field: String): Seq[String] =
    Option(n.get(field)).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)

  private def fromTree(root: JsonNode, path: String): SemanticRegistry = {
    val models = arr(root, "semantic_models").map { m =>
      val name = str(m, "name", "semantic_models")
      SemanticModel(
        name = name,
        table = str(m, "table", s"model $name"),
        key = str(m, "primary_key", s"model $name"),
        dimensions = arr(m, "dimensions").map { d =>
          Dimension(
            name = str(d, "name", s"model $name dimensions"),
            expr = str(d, "expr", s"model $name dimensions"),
            isTime = optBool(d, "time"))
        },
        small = optBool(m, "small"))
    }

    val links = arr(root, "joins").map { j =>
      JoinLink(str(j, "from", "joins"), str(j, "from_col", "joins"),
        str(j, "to", "joins"))
    }

    val metrics = arr(root, "metrics").map { m =>
      val name = str(m, "name", "metrics")
      val aggSql = optStr(m, "agg").getOrElse("raw") match {
        case "sum" =>
          val scale = Option(m.get("scale")).map(_.asInt()).getOrElse(6)
          dsumSql(str(m, "expr", s"metric $name"), scale)
        case "count_distinct" =>
          s"COUNT(DISTINCT ${str(m, "expr", s"metric $name")})"
        case "median" =>
          s"CAST(percentile_disc(0.5) WITHIN GROUP " +
            s"(ORDER BY ${str(m, "expr", s"metric $name")}) AS DOUBLE)"
        case "percentile" =>
          val p = Option(m.get("percentile")).map(_.asDouble()).getOrElse(
            sys.error(s"manifest: metric $name (agg: percentile) needs a " +
              "`percentile:` fraction"))
          require(p > 0 && p <= 1, s"metric $name: percentile $p out of (0,1]")
          // percentile_disc picks an element (no interpolation), so any
          // engine pair agrees bit-exactly — see SemanticRegistry
          s"CAST(percentile_disc($p) WITHIN GROUP " +
            s"(ORDER BY ${str(m, "expr", s"metric $name")}) AS DOUBLE)"
        case "raw" =>
          str(m, "agg_sql", s"metric $name (agg: raw)")
        case other =>
          sys.error(s"manifest: metric $name has unknown agg '$other' " +
            "(want sum | count_distinct | median | percentile | raw)")
      }
      Metric(name, str(m, "model", s"metric $name"), aggSql,
        timeDim = optStr(m, "time_dim"),
        description = optStr(m, "description").getOrElse(""),
        filterSql = optStr(m, "filter"))
    }

    val derived = arr(root, "derived_metrics").map { m =>
      val name = str(m, "name", "derived_metrics")
      DerivedMetric(name, strList(m, "inputs"),
        str(m, "expr", s"derived metric $name"),
        description = optStr(m, "description").getOrElse(""),
        offsetInputs = arr(m, "offsets").map { o =>
          OffsetInput(
            alias = str(o, "alias", s"derived metric $name offsets"),
            input = str(o, "input", s"derived metric $name offsets"),
            n = Option(o.get("n")).map(_.asInt()).getOrElse(1),
            grain = str(o, "grain", s"derived metric $name offsets"))
        })
    }

    val conversions = arr(root, "conversion_metrics").map { m =>
      val name = str(m, "name", "conversion_metrics")
      ConversionMetric(
        name = name,
        model = str(m, "model", s"conversion metric $name"),
        entity = str(m, "entity", s"conversion metric $name"),
        timeDim = str(m, "time_dim", s"conversion metric $name"),
        baseFilterSql = str(m, "base_filter", s"conversion metric $name"),
        conversionFilterSql = str(m, "conversion_filter", s"conversion metric $name"),
        windowDays = Option(m.get("window_days")).map(_.asInt()).getOrElse(7),
        calculation = optStr(m, "calculation").getOrElse("conversion_rate"),
        description = optStr(m, "description").getOrElse(""))
    }

    val saved = arr(root, "saved_queries").map { q =>
      val name = str(q, "name", "saved_queries")
      name -> MetricQueryRequest(
        metrics = strList(q, "metrics"),
        groupBy = strList(q, "group_by"),
        where = optStr(q, "where"),
        startTime = optStr(q, "start_time"),
        endTime = optStr(q, "end_time"),
        orderBy = strList(q, "order_by"),
        limit = Option(q.get("limit")).filter(!_.isNull).map(_.asInt()))
    }.toMap

    new SemanticRegistry(models, links, metrics, saved, derived, conversions)
  }
}
