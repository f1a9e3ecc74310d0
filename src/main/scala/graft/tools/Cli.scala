package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.GraftClient
import graft.catalog.{DefaultRegistry, MetricQueryRequest}

/** `mf query`-shaped CLI over the engine (SURVEY §3.1 surface):
  *
  *   runMain graft.tools.Cli --metrics revenue --group-by o_orderdate__month \
  *     --where "o_orderpriority IN ('1-URGENT','2-HIGH')" --start 1995-01-01 \
  *     --end 1996-12-31 --order -revenue --limit 10 [--explain] [--csv DIR] \
  *     [--dump-sql DIR] [--sf-dir /root/testdata/sf0.001] [--decimals 2]
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val sfDir = opts.getOrElse("sf-dir", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --manifest <file.yml|json>: load the semantic layer from a
    // declarative manifest instead of the compiled-in default
    val client = opts.get("manifest")
      .map(GraftClient.fromManifest)
      .getOrElse(new GraftClient(DefaultRegistry.registry))

    val req = MetricQueryRequest(
      metrics = opts.getOrElse("metrics", "revenue").split(",").toSeq,
      groupBy = opts.get("group-by").map(_.split(",").toSeq).getOrElse(Nil),
      where = opts.get("where"),
      startTime = opts.get("start"), endTime = opts.get("end"),
      orderBy = opts.get("order").map(_.split(",").toSeq).getOrElse(Nil),
      limit = opts.get("limit").map(_.toInt),
      savedQuery = opts.get("saved-query"))

    // --list metrics|dimensions|saved-queries: registry introspection,
    // no Spark jobs (mf list parity)
    opts.get("list").foreach { what =>
      what match {
        case "metrics" => client.listMetrics.foreach { case (n, d, dims) =>
          println(s"$n${if (d.nonEmpty) s" — $d" else ""}  [dims: ${dims.mkString(", ")}]")
        }
        case "dimensions" => client.listDimensions.foreach { case (n, owner, time) =>
          println(s"$n  (model: $owner${if (time) ", time" else ""})")
        }
        case "saved-queries" => client.listSavedQueries.foreach(println)
        case other => println(s"[cli] unknown --list target: $other")
      }
      spark.stop(); return
    }

    opts.get("dump-sql") match {
      case Some(dumpDir) =>
        val written = client.dumpQueries(req.metrics.head, dumpDir)
        println(s"[cli] wrote ${written.size} SQL files to $dumpDir")
      case None =>
        if (opts.contains("explain")) {
          val e = client.explain(spark, sfDir, req)
          println("[cli] rendered SQL:\n" + e.sqlWithDescriptions)
          println("\n[cli] dataflow plan:\n" + e.planText)
          opts.get("svg").foreach { out =>
            client.explainSvg(spark, sfDir, req, out)
            println(s"[cli] plan SVG written to $out")
          }
        } else {
          val res = client.query(spark, sfDir, req,
            decimals = opts.getOrElse("decimals", "2").toInt)
          println(res.textTable)
          println(s"[cli] ${res.rowCount} rows")
          opts.get("csv").foreach { out =>
            client.queryToCsv(spark, sfDir, req, out)
            println(s"[cli] csv written to $out")
          }
        }
    }
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--explain" :: rest => parse(rest, acc + ("explain" -> "true"))
      case flag :: value :: rest if flag.startsWith("--") =>
        parse(rest, acc + (flag.stripPrefix("--") -> value))
      case other :: _ => sys.error(s"unexpected argument: $other")
    }
}
