package graft.api

import graft.SparkSuite
import graft.core.Catalog
import graft.json.JsonValue

/** Drives the engine exclusively through the reference's JSON wire shapes,
  * using the documented examples from
  * `docs/src/content/docs/reference/json-api/` as fixtures.
  */
class JsonApiSpec extends SparkSuite {

  private def result(resp: String): JsonValue = {
    val parsed = JsonValue.parse(resp)
    assert(parsed.get("status").exists(_.asLong < 300), s"error response: $resp")
    parsed.get("result").getOrElse(JsonValue.JNull)
  }

  test("full API lifecycle via reference wire shapes") {
    withTempDir { dir =>
      val api = new JsonApi(new Catalog(dir.toString), spark)

      result(api.createTable("webtable"))
      result(api.createColumnFamilies("webtable",
        """{"column_families":[{"name":"title"},{"name":"language"}]}"""))

      // docs ingest-data.md example shape
      val wr = result(api.write("webtable",
        """{"items":[
          |{"row_key":"org.apache.spark","cells":[
          |  {"column_key":"title:","time":0,"type":"string","value":"Apache Spark"},
          |  {"column_key":"language:","time":0,"type":"string","value":"en"}]},
          |{"row_key":"org.apache.kafka","cells":[
          |  {"column_key":"title:","time":0,"type":"string","value":"Apache Kafka"}]}
          |]}""".stripMargin))
      assert(wr.get("items").flatMap(_.get("cell_count")).map(_.asLong) == Some(3L))

      // docs retrieve-rows.md: multi-get with column filter
      val rows = result(api.getRows("webtable",
        """{"items":[{"row":{"key":"org.apache.spark"},"column":{"key":"title:"}}]}"""))
      assert(rows.get("rows").map(_.asArray.size) == Some(1))
      val row0 = rows.get("rows").get.asArray.head
      assert(row0.get("row_key").map(_.asString) == Some("org.apache.spark"))
      assert(row0.get("columns").flatMap(_.get("title")).isDefined)
      assert(row0.get("columns").flatMap(_.get("language")).isEmpty)

      // scan with prefix + row limit
      val scan = result(api.scan("webtable",
        """{"row":{"prefix":"org.apache","limit":10}}"""))
      assert(scan.get("rows").map(_.asArray.size) == Some(2))
      assert(scan.get("affected_locality_groups").map(_.asLong) == Some(1L))

      // range scan
      val ranged = result(api.scan("webtable",
        """{"row":{"range":{"start":"org.apache.l","end":"org.apache.z","inclusive":true}}}"""))
      assert(ranged.get("rows").get.asArray
        .map(_.get("row_key").get.asString) == Seq("org.apache.spark"))

      // graft extension flags (per_cell_diffusion, chunk_granular_metrics)
      // parse and flow through the wire scan — semantics are golden-tested
      // in LocalityMetricsSpec / ScanDifferentialSpec; here the fixture is
      // small enough (3 cells < first chunk) that both accounting modes
      // agree on 3
      val flagged = result(api.scan("webtable",
        """{"row":{"prefix":"org","limit":1,"sample":1.0},
          |"cell":{"limit":1},
          |"per_cell_diffusion":true,"chunk_granular_metrics":true}"""
          .stripMargin))
      assert(flagged.get("rows").map(_.asArray.size) == Some(1))
      assert(flagged.get("cells_scanned_count").map(_.asLong) == Some(3L))

      // count
      val cnt = result(api.count("webtable", """{"row":{"prefix":""}}"""))
      assert(cnt.get("row_count").map(_.asLong) == Some(2L))
      assert(cnt.get("cell_count").map(_.asLong) == Some(3L))

      // filtered delete
      val del = result(api.deleteRow("webtable",
        """{"row_key":"org.apache.spark","column_filter":{"key":"language:"}}"""))
      assert(del.get("deleted_cells_count").map(_.asLong) == Some(1L))
      val cnt2 = result(api.count("webtable", """{"row":{"prefix":""}}"""))
      assert(cnt2.get("cell_count").map(_.asLong) == Some(2L))

      // list tables: reference detail (list_tables.rs) — family gc_settings,
      // partitions with paths + segment counts, cache stats
      val listed = result(api.listTables())
      assert(listed.get("tables").flatMap(_.get("count")).map(_.asLong) == Some(1L))
      val entry = listed.get("tables").flatMap(_.get("items")).get.asArray.head
      assert(entry.get("column_families").get.asArray
        .forall(_.get("gc_settings").isDefined))
      val parts = entry.get("partitions").get.asArray
      assert(parts.exists(_.get("name").exists(_.asString == "_man_webtable")))
      assert(parts.exists(p => p.get("name").exists(_.asString == "_dat_webtable")
        && p.get("segment_count").exists(_.asLong > 0)))
      assert(listed.get("cache_stats")
        .flatMap(_.get("memory_usage_in_bytes")).isDefined)

      // system table names rejected
      val bad = JsonValue.parse(api.createTable("_secret"))
      assert(bad.get("status").map(_.asLong) == Some(400L))

      result(api.deleteTable("webtable"))
      val after = result(api.listTables())
      assert(after.get("tables").flatMap(_.get("count")).map(_.asLong) == Some(0L))
    }
  }

  test("per-call lat#* latency points land in _mtx_{t} when enabled") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val api = new JsonApi(cat, spark, recordLatencies = true)
      result(api.createTable("wt"))
      result(api.createColumnFamilies("wt",
        """{"column_families":[{"name":"v"}]}"""))
      result(api.write("wt",
        """{"items":[{"row_key":"r1","cells":[
          |{"column_key":"v:","time":0,"type":"string","value":"x"}]}]}""".stripMargin))
      result(api.getRows("wt", """{"items":[{"row":{"key":"r1"}}]}"""))
      result(api.scan("wt", """{"row":{"prefix":"r"}}"""))
      result(api.deleteRow("wt", """{"row_key":"r1"}"""))

      val m = graft.core.MetricsTable.open(spark, cat, Some("wt"))
      // per-call points coalesce in-process; the 60 s system sweep (or an
      // explicit flush) lands them — visibility is bounded, not immediate
      m.flushBuffered()
      for (metric <- Seq("lat#write#batch", "lat#write#cell", "lat#read#row",
          "lat#read#pfx", "lat#del#row", "lat#del#cell")) {
        val pts = m.latest(metric)
        assert(pts.size == 1, s"$metric must have exactly one point: $pts")
        assert(pts.head._2 >= 0.0)
      }
    }
  }

  test("lat#* self-metrics are off by default (bench-safe)") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val api = new JsonApi(cat, spark)
      result(api.createTable("wt"))
      result(api.createColumnFamilies("wt",
        """{"column_families":[{"name":"v"}]}"""))
      result(api.write("wt",
        """{"items":[{"row_key":"r1","cells":[
          |{"column_key":"v:","time":0,"type":"string","value":"x"}]}]}""".stripMargin))
      result(api.scan("wt", """{"row":{"prefix":"r"}}"""))
      val m = graft.core.MetricsTable.open(spark, cat, Some("wt"))
      assert(m.latest("lat#write#batch").isEmpty)
      assert(m.latest("lat#read#pfx").isEmpty)
    }
  }

  test("typed values round-trip through the wire format") {
    withTempDir { dir =>
      val api = new JsonApi(new Catalog(dir.toString), spark)
      result(api.createTable("t"))
      result(api.createColumnFamilies("t", """{"column_families":[{"name":"v"}]}"""))
      result(api.write("t",
        """{"items":[{"row_key":"r","cells":[
          |{"column_key":"v:i","time":0,"type":"i64","value":9007199254740993},
          |{"column_key":"v:f","time":0,"type":"f64","value":2.5},
          |{"column_key":"v:b","time":0,"type":"boolean","value":true},
          |{"column_key":"v:u","time":0,"type":"byte","value":255}]}]}""".stripMargin))
      val rows = result(api.getRows("t", """{"items":[{"row":{"key":"r"}}]}"""))
      val cols = rows.get("rows").get.asArray.head.get("columns").get.get("v").get
      def cell(q: String) = cols.get(q).get.asArray.head
      assert(cell("i").get("value").map(_.asLong) == Some(9007199254740993L))
      assert(cell("f").get("value").map(_.asDouble) == Some(2.5))
      assert(cell("b").get("value").map(_.asBoolean) == Some(true))
      assert(cell("u").get("value").map(_.asLong) == Some(255L))
    }
  }

  test("verbs never resurrect a deleted table (non-creating open)") {
    withTempDir { dir =>
      val cat = new Catalog(dir.toString)
      val api = new JsonApi(cat, spark)
      // the verb path's open treats absent as absent: no directory made
      assert(graft.core.Smoltable.openExisting(spark, cat, "ghost").isEmpty)
      assert(!cat.tableExists("ghost"))
      // a delete-then-verb sequence (the TOCTOU interleaving, serialized):
      // the verb must 404 and must NOT leave an empty directory behind
      api.createTable("zombie")
      api.deleteTable("zombie")
      val resp = graft.json.JsonValue.parse(
        api.scan("zombie", """{"row":{"prefix":""}}"""))
      assert(resp.get("status").map(_.asLong) == Some(404L))
      assert(!cat.tableExists("zombie"), "verb resurrected a deleted table")
      assert(!cat.listTables().contains("zombie"))
    }
  }
}
