#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with views over the
sf_dir parquet tables, and compares: column names (sorted), row counts, and
cell values (rows sorted by all columns). Exact compare; floats must match
bit-for-bit, mirroring a hash-based driver check.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "as_py"):
        v = v.as_py()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    # Decimal -> normalized string without trailing zeros trouble: keep as str
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


# The driver's hash is TYPE-sensitive: a DuckDB column widened to HUGEINT
# (windowed sum(BIGINT), or arithmetic on one) hashes differently from
# Spark's int64 even when every value is equal (r14: ext_pack_sequences).
# Map each DuckDB result type to the set of pyarrow types it hashes equal to;
# anything unmapped (HUGEINT, DECIMAL, UHUGEINT, INT128...) is a drift fail.
DUCK_TO_ARROW = {
    "BOOLEAN": {"bool"},
    "TINYINT": {"int8"},
    "SMALLINT": {"int16"},
    "INTEGER": {"int32"},
    "BIGINT": {"int64"},
    "FLOAT": {"float"},
    "DOUBLE": {"double"},
    "VARCHAR": {"string", "large_string"},
    "BLOB": {"binary", "large_binary"},
    "DATE": {"date32[day]"},
}


def type_ok(duck_t, arrow_t):
    d = str(duck_t).upper()
    a = str(arrow_t)
    if d.startswith("TIMESTAMP"):
        return a.startswith("timestamp")
    if d.endswith("[]") or d.startswith("LIST") or d.startswith("STRUCT") or d.startswith("MAP"):
        return a.startswith(("list", "large_list", "struct", "map"))
    allowed = DUCK_TO_ARROW.get(d)
    return allowed is not None and a in allowed


def rows_of(cols, names):
    # dict col->list; produce sorted list of tuples ordered by sorted names
    order = sorted(names)
    data = list(zip(*[cols[n] for n in order])) if order else []
    return sorted(
        [tuple(norm(v) for v in row) for row in data],
        key=lambda r: tuple((x is None, str(x)) for x in r),
    )


def main(out_dir, sf_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        try:
            table = pq.read_table(qdir)
        except Exception as e:
            print(f"FAIL {name}: cannot read result parquet: {e}")
            n_fail += 1
            continue
        spark_names = list(table.column_names)
        spark_cols = {n: table.column(n).to_pylist() for n in spark_names}
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={table.num_rows} (no oracle)")
            n_noracle += 1
            continue
        try:
            res = con.sql(oracle[name])
            duck_names = list(res.columns)
            fetched = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(duck_names) != sorted(spark_names):
            print(f"FAIL {name}: columns differ spark={sorted(spark_names)} duck={sorted(duck_names)}")
            n_fail += 1
            continue
        # Oracle-type drift gate: the driver hashes (value, type); catch a
        # DuckDB widening the way the driver would, before any value compare.
        arrow_types = {f.name: f.type for f in table.schema}
        drift = [
            (n, str(t), str(arrow_types[n]))
            for n, t in zip(duck_names, res.types)
            if not type_ok(t, arrow_types[n])
        ]
        if drift:
            n, dt, at = drift[0]
            print(f"FAIL {name}: oracle type drift on '{n}': duck={dt} vs spark={at}"
                  + (f" (+{len(drift)-1} more)" if len(drift) > 1 else "")
                  + " — CAST the oracle column to the Spark type")
            n_fail += 1
            continue
        duck_cols = {n: [r[i] for r in fetched] for i, n in enumerate(duck_names)}
        a = rows_of(spark_cols, spark_names)
        b = rows_of(duck_cols, duck_names)
        if len(a) != len(b):
            print(f"FAIL {name}: row count spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if bad:
            i, x, y = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(a)} rows differ; first at {i}:\n  spark={x}\n  duck ={y}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(a)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
