package graft.api

import graft.core.{Catalog, MetricsTable}
import graft.model.Json

/** Server-rendered metrics dashboard, the analog of the reference's `GET /`
  * (`server/src/html.rs:11-197` + `server/src/main.rs:133-146`): reads the
  * newest 720 points of each metric series off the self-hosted metrics
  * tables (the reference's `multi_get` with `cell_limit: 1440/2`) and
  * renders one page. The reference injects the series JSON into a built
  * front-end bundle; with no bundler in a zero-dependency build, the
  * sparklines are rendered server-side as inline SVG and the raw series
  * are embedded as JSON data islands under the reference's
  * `{{system_metrics}}` / `{{table_stats}}` placeholders' ids, so a
  * front-end can still consume them unchanged.
  *
  * Series charted per user table (reference `html.rs:72-193`): write/read/
  * delete latency points (`lat#*`, recorded by [[JsonApi]] when
  * `recordLatencies` is on), the worker gauges `stats#du` / `stats#seg_cnt`
  * / `stats#row_cnt` / `stats#cell_cnt`, and `gc#del_cnt`; globally
  * `sys#cpu` / `sys#mem` (the fjall `wal#len` / `wbuf#size` gauges have no
  * Spark analog — `core.Workers` doc).
  */
object Dashboard {

  private val SystemSeries = Seq("sys#cpu", "sys#mem")
  private val TableSeries = Seq(
    "lat#write#cell", "lat#write#batch", "lat#read#pfx", "lat#read#row",
    "lat#del#row", "stats#du", "stats#seg_cnt", "stats#row_cnt",
    "stats#cell_cnt", "gc#del_cnt")
  private val CellLimit = 1440 / 2 // reference html.rs cell_limit

  def render(catalog: Catalog,
      spark: org.apache.spark.sql.SparkSession): String = {
    val t0 = System.nanoTime()
    val global = MetricsTable.open(spark, catalog, None)
    val sys = SystemSeries.map(k => k -> global.latest(k, CellLimit))
    val tables = catalog.listTables().filterNot(_.startsWith("_")).map { t =>
      val m = MetricsTable.open(spark, catalog, Some(t))
      t -> TableSeries.map(k => k -> m.latest(k, CellLimit))
    }
    val renderMs = (System.nanoTime() - t0) / 1000000L
    page(sys, tables, renderMs)
  }

  // ---------------------------------------------------------- rendering

  private def fmt(v: Double): String = {
    val a = math.abs(v)
    if (a >= 1e9) f"${v / 1e9}%.1fG"
    else if (a >= 1e6) f"${v / 1e6}%.1fM"
    else if (a >= 1e3) f"${v / 1e3}%.1fk"
    else if (a == math.floor(a)) v.toLong.toString
    else f"$v%.2f"
  }

  /** One series card: metric name, latest value (direct label), inline-SVG
    * sparkline of the points oldest→newest. Single series per chart — the
    * title names it, values stay in ink tokens, the mark carries one hue.
    */
  private def card(name: String, pts: Seq[(Long, Double)]): String = {
    val latest = pts.headOption.map(p => fmt(p._2)).getOrElse("—")
    val spark =
      if (pts.size < 2) ""
      else {
        val vs = pts.reverse.map(_._2) // oldest → newest, left → right
        val (lo, hi) = (vs.min, vs.max)
        val span = if (hi == lo) 1.0 else hi - lo
        val w = 120.0; val h = 28.0; val pad = 2.0
        val step = (w - 2 * pad) / (vs.size - 1)
        val xy = vs.zipWithIndex.map { case (v, i) =>
          (pad + i * step, h - pad - (v - lo) / span * (h - 2 * pad))
        }
        val path = xy.map { case (x, y) => f"$x%.1f,$y%.1f" }.mkString(" ")
        val (cx, cy) = xy.last
        s"""<svg viewBox="0 0 120 28" role="img" aria-label="${esc(name)} history"><title>${esc(name)}: ${vs.size} points, min ${fmt(lo)}, max ${fmt(hi)}</title><polyline points="$path" fill="none" stroke="var(--accent)" stroke-width="2" stroke-linejoin="round" stroke-linecap="round"/><circle cx="$cx" cy="$cy" r="3" fill="var(--accent)"/></svg>"""
      }
    s"""<div class="card"><div class="mname">${esc(name)}</div><div class="mval">$latest</div>$spark</div>"""
  }

  private def section(title: String,
      series: Seq[(String, Seq[(Long, Double)])]): String = {
    val cards = series.map { case (n, pts) => card(n, pts) }.mkString
    val rows = series.map { case (n, pts) =>
      val last = pts.headOption
      s"""<tr><td>${esc(n)}</td><td>${last.map(p => fmt(p._2)).getOrElse("—")}</td><td>${last.map(_._1.toString).getOrElse("—")}</td><td>${pts.size}</td></tr>"""
    }.mkString
    s"""<section><h2>${esc(title)}</h2><div class="grid">$cards</div><details><summary>table view</summary><table><thead><tr><th>metric</th><th>latest</th><th>ts (ns)</th><th>points</th></tr></thead><tbody>$rows</tbody></table></details></section>"""
  }

  private def seriesJson(series: Seq[(String, Seq[(Long, Double)])]): String =
    series.map { case (n, pts) =>
      val arr = pts.map { case (ts, v) => s"""[$ts,$v]""" }.mkString("[", ",", "]")
      s"${Json.quote(n)}:$arr"
    }.mkString("{", ",", "}")

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def page(sys: Seq[(String, Seq[(Long, Double)])],
      tables: Seq[(String, Seq[(String, Seq[(Long, Double)])])],
      renderMs: Long): String = {
    val tableSections =
      tables.map { case (t, series) => section(s"table: $t", series) }.mkString
    val tableStatsJson = tables.map { case (t, series) =>
      s"${Json.quote(t)}:${seriesJson(series)}"
    }.mkString("{", ",", "}")
    s"""<!doctype html>
<html lang="en"><head><meta charset="utf-8"><meta name="viewport" content="width=device-width,initial-scale=1">
<title>smoltable-spark</title>
<style>
:root{--bg:#ffffff;--ink:#1f1f1f;--muted:#6b6b6b;--accent:#3b6bb5;--line:#e4e4e4;--card:#f7f7f7}
@media (prefers-color-scheme:dark){:root{--bg:#141414;--ink:#e8e8e8;--muted:#9a9a9a;--accent:#7ea6e0;--line:#2c2c2c;--card:#1d1d1d}}
body{background:var(--bg);color:var(--ink);font:14px/1.5 system-ui,sans-serif;margin:2rem auto;max-width:72rem;padding:0 1rem}
h1{font-size:1.3rem;margin:0}h2{font-size:1rem;margin:1.6rem 0 .6rem;color:var(--ink)}
.sub{color:var(--muted);margin:.2rem 0 1rem}
.grid{display:grid;grid-template-columns:repeat(auto-fill,minmax(170px,1fr));gap:10px}
.card{background:var(--card);border:1px solid var(--line);border-radius:8px;padding:10px}
.mname{color:var(--muted);font-size:.78rem;overflow-wrap:anywhere}
.mval{font-size:1.25rem;font-variant-numeric:tabular-nums;margin:.1rem 0 .3rem}
svg{display:block;width:100%;height:28px}
details{margin-top:.7rem;color:var(--muted)}
table{border-collapse:collapse;margin-top:.5rem;font-variant-numeric:tabular-nums}
th,td{border-bottom:1px solid var(--line);text-align:left;padding:.25rem .8rem .25rem 0;font-weight:normal}
th{color:var(--muted);font-size:.78rem}
</style></head><body>
<h1>smoltable-spark</h1>
<p class="sub">metrics dashboard · render time $renderMs ms</p>
${section("system", sys)}
$tableSections
<script type="application/json" id="system_metrics">${seriesJson(sys)}</script>
<script type="application/json" id="table_stats">$tableStatsJson</script>
</body></html>"""
  }
}
