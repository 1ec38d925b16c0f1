package graft.core

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model._

/** Differential fuzz for the MUTATION verbs: random interleavings of
  * batch writes (with overwrites), filtered row deletes, version/TTL GC
  * and compaction run against a REAL [[Smoltable]], compared after every
  * step with a sequential in-memory reference model implementing the
  * reference semantics directly (`table/mod.rs:567-598` delete,
  * `:455-562` GC, `cell.rs:214-266` filter match, LWW overwrite). The
  * scan family has had this guard since round 5 (ScanDifferentialSpec);
  * this is the same net under the copy-on-write rewrite machinery —
  * a rewrite that drops, resurrects, or double-counts cells under any
  * composition of mutations lands as a seeded, replayable failure.
  */
class MutationDifferentialSpec extends SparkSuite {

  private type Coord = (String, String, String, Long) // row, fam, qual, ts

  private val Rows = (0 until 6).map(i => s"r$i")
  private val Fams = Seq("a", "b") // b lives in its own locality group
  private val Quals = (0 until 3).map(i => s"q$i")
  private val TsPool = (1L to 5L).map(_ * 1000000000L) // 1..5 s in ns

  private def randomCoord(rnd: Random): Coord =
    (Rows(rnd.nextInt(Rows.length)), Fams(rnd.nextInt(Fams.length)),
      Quals(rnd.nextInt(Quals.length)), TsPool(rnd.nextInt(TsPool.length)))

  private def engineCells(t: Smoltable): Map[Coord, Double] =
    t.cellsFor(None)
      .select(col("row_key"), col("family"), col("qualifier"), col("ts"),
        col("value.f64"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)), r.getDouble(4)))
      .toMap

  private def filterMatches(f: ColumnFilter, fam: String,
      qual: String): Boolean = f match {
    case ColumnFilter.Key(k) =>
      k.qualifier match {
        case Some(q) => fam == k.family && qual == q
        case None    => fam == k.family
      }
    case ColumnFilter.Multi(keys) =>
      keys.exists(k => filterMatches(ColumnFilter.Key(k), fam, qual))
    case ColumnFilter.Prefix(k) =>
      k.qualifier match {
        case Some(q) => fam == k.family && qual.startsWith(q)
        case None    => fam == k.family
      }
  }

  private def randomFilter(rnd: Random): Option[ColumnFilter] =
    rnd.nextInt(5) match {
      case 0 => None // whole-row delete
      case 1 => Some(ColumnFilter.Key(ColumnKey(
        Fams(rnd.nextInt(Fams.length)), None)))
      case 2 => Some(ColumnFilter.Key(ColumnKey(
        Fams(rnd.nextInt(Fams.length)),
        Some(Quals(rnd.nextInt(Quals.length))))))
      case 3 => Some(ColumnFilter.Prefix(ColumnKey(
        Fams(rnd.nextInt(Fams.length)), Some("q"))))
      case _ => Some(ColumnFilter.Multi(Seq(
        ColumnKey(Fams(0), Some(Quals(rnd.nextInt(Quals.length)))),
        ColumnKey(Fams(1), Some(Quals(rnd.nextInt(Quals.length)))))))
    }

  test("random mutation interleavings match the sequential reference model") {
    for (seed <- 0 until 8) withTempDir { dir =>
      val rnd = new Random(seed)
      val t = Smoltable.open(spark, new Catalog(dir.toString), s"fz$seed")
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("a")))
      t.createColumnFamilies(Seq(ColumnFamilyDefinition("b")),
        localityGroup = true)
      var model = Map.empty[Coord, Double]

      // seed load: ~25 random cells in one bulk batch
      val seedCells = Seq.fill(25)(randomCoord(rnd)).distinct
        .map(c => c -> rnd.nextInt(1000).toDouble)
      model = seedCells.toMap
      t.write(seedCells.map { case ((r, f, q, ts), v) =>
        RowWriteItem(r, Seq(ColumnWriteItem(
          ColumnKey(f, Some(q)), Some(ts), CellValue.F64(v))))
      })

      def check(step: String): Unit = {
        val got = engineCells(t)
        assert(got == model,
          s"seed=$seed after $step:\n  engine-only=${
            (got.toSet -- model.toSet).toSeq.sorted.take(5)}\n  model-only=${
            (model.toSet -- got.toSet).toSeq.sorted.take(5)}")
      }
      check("seed load")

      for (step <- 0 until 5) {
        rnd.nextInt(4) match {
          case 0 => // batch write with overwrites
            val cells = Seq.fill(6)(randomCoord(rnd)).distinct
              .map(c => c -> rnd.nextInt(1000).toDouble)
            model ++= cells.toMap
            t.write(cells.map { case ((r, f, q, ts), v) =>
              RowWriteItem(r, Seq(ColumnWriteItem(
                ColumnKey(f, Some(q)), Some(ts), CellValue.F64(v))))
            })
            check(s"$step:write")
          case 1 => // filtered row delete
            val row = Rows(rnd.nextInt(Rows.length))
            val f = randomFilter(rnd)
            model = model.filterNot { case ((r, fam, q, _), _) =>
              r == row && f.forall(filterMatches(_, fam, q)) }
            t.deleteRow(row, f)
            check(s"$step:delete($row,$f)")
          case 2 => // version-limit or TTL GC on one family
            val fam = Fams(rnd.nextInt(Fams.length))
            if (rnd.nextBoolean()) {
              val limit = 1 + rnd.nextInt(3)
              model = model.groupBy { case ((r, fm, q, _), _) => (r, fm, q) }
                .flatMap { case ((_, fm, _), cells) =>
                  if (fm != fam) cells
                  else cells.toSeq.sortBy(-_._1._4).take(limit)
                }
              t.runVersionGcWith(
                Map(fam -> GcSettings(versionLimit = Some(limit))))
              check(s"$step:gc-version($fam)")
            } else {
              // now = 4 s: with ttl = 1 s, cells at ts <= 2 s expire
              // ((4 - ts_sec) > 1), 3..5 s survive
              val now = 4L * 1000000000L
              model = model.filterNot { case ((_, fm, _, ts), _) =>
                fm == fam && ts > 0 &&
                  (now / 1000000000L - ts / 1000000000L) > 1L }
              t.runVersionGcWith(
                Map(fam -> GcSettings(ttlSecs = Some(1L))), now)
              check(s"$step:gc-ttl($fam)")
            }
          case _ => // compaction: physical only, no semantic change
            t.compact()
            check(s"$step:compact")
        }
      }
    }
  }
}
