#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--skip-verify]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_only_arg = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")), None)
if "--skip-verify" not in sys.argv:
    _filter = f" {_only_arg}" if _only_arg else ""
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{_filter}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
    if r.returncode != 0:
        print(tail)
        sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    # driver data is a single file; Spark-generated scale data is a directory
    src = f"{SF}/{t}.parquet"
    pattern = f"{src}/*.parquet" if Path(src).is_dir() else src
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    if t == "events":
        # Spark-regenerated scale data carries ts as epoch-nanos BIGINT
        # (nanosAsLong round-trip); present it as the TIMESTAMP the
        # driver data has, with the same ns→µs truncation DuckDB applies
        # to the native TIMESTAMP_NS column.
        ts_type = dict((r[0], r[1]) for r in con.execute("DESCRIBE events").fetchall())
        if ts_type.get("ts") == "BIGINT":
            con.execute("DROP VIEW events")
            con.execute(
                f"CREATE VIEW events AS SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                f"FROM read_parquet('{pattern}')")

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(out, key=lambda r: tuple(str(x) for x in r)), [cols[i] for i in order]


def vals_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


# Above this many rows, the per-row Python compare would materialize
# both result sets as Python objects (15M-row condensation at sf1 OOMed
# the harness in round 1) — switch to an in-DuckDB bag comparison:
# EXCEPT ALL in both directions over the sorted column list, streamed
# and hashed inside the engine, no Python materialization. Exact value
# equality, bag (multiset) semantics — same contract as the small path.
BIG_ROWS = 2_000_000


def duckdb_bag_compare(name, pdir, sql, n_spark):
    con.execute(
        f"CREATE OR REPLACE VIEW _spark AS SELECT * FROM read_parquet('{pdir}/*.parquet')")
    scols = [d[0] for d in con.execute("SELECT * FROM _spark LIMIT 0").description]
    dcols = [d[0] for d in con.execute(f"SELECT * FROM ({sql}) LIMIT 0").description]
    if sorted(scols) != sorted(dcols):
        print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
        return False
    cols = ", ".join(f'"{c}"' for c in sorted(scols))
    n_duck = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    if n_duck != n_spark:
        print(f"FAIL {name}: rows spark={n_spark} duck={n_duck}")
        return False
    n_diff = con.execute(
        f"SELECT count(*) FROM ("
        f"(SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM ({sql}))"
        f" UNION ALL "
        f"(SELECT {cols} FROM ({sql}) EXCEPT ALL SELECT {cols} FROM _spark))"
    ).fetchone()[0]
    if n_diff:
        sample = con.execute(
            f"SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM ({sql}) LIMIT 2"
        ).fetchall()
        print(f"FAIL {name}: {n_diff} differing rows (bag compare); spark-only sample: {sample}")
        return False
    print(f"OK   {name} ({n_spark} rows, in-engine bag compare)")
    return True


# --only a,b,c: compare just the named queries (targeted re-validation
# after a fix — the full sf1 sweep pays ~1h of DuckDB on the heaviest
# generated oracles, pointless when one query changed)
only = None
for arg in sys.argv:
    if arg.startswith("--only="):
        only = set(arg.split("=", 1)[1].split(","))

fails = 0
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    pdir = Path(OUT) / name
    if not pdir.exists():
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    n_spark = sum(pq.ParquetFile(f).metadata.num_rows for f in pdir.glob("*.parquet"))
    if n_spark > BIG_ROWS:
        if not duckdb_bag_compare(name, pdir, oracle[name], n_spark):
            fails += 1
        continue
    tbl = pq.read_table(str(pdir))
    scols = tbl.column_names
    srows = [tuple(row[c] for c in scols) for row in tbl.to_pylist()]
    try:
        res = con.execute(oracle[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails += 1
        continue
    sr, sc = canon(srows, scols)
    dr, dc = canon(drows, dcols)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}")
        fails += 1
        continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
        print("  spark sample:", sr[:2])
        print("  duck  sample:", dr[:2])
        fails += 1
        continue
    bad = None
    for i, (a, b) in enumerate(zip(sr, dr)):
        if not all(vals_eq(x, y) for x, y in zip(a, b)):
            bad = (i, a, b)
            break
    if bad:
        print(f"FAIL {name}: first diff at row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(sr)} rows)")

queries_missing = [n for n in sorted(set(p.name for p in Path(OUT).iterdir() if p.is_dir())) if n not in oracle]
if queries_missing:
    print("rows-only (no oracle):", queries_missing)
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
