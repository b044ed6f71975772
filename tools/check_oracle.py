#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--skip-verify]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow as pa
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
    # Type-sensitive: the driver hashes SERIALIZED cells, so a DuckDB
    # Decimal('42') vs Spark int64 42 is a driver FAIL even though
    # Python's == says True (the r11–r13 HUGEINT saga: sum(BIGINT)
    # widens to HUGEINT in DuckDB → decimal128 through Arrow → hash
    # mismatch on value-equal results, invisible to a pure value
    # compare). Require the same canonical type family per cell.
    if a is None or b is None:
        return a is None and b is None
    ka, kb = _type_key(a), _type_key(b)
    if ka != kb:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def _type_key(v):
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return type(v).__name__


# --- Result-schema diff: DuckDB DESCRIBE vs Spark parquet schema ------
# The driver's hash is serialization-sensitive, so column TYPES must
# match, not just values. HUGEINT/UHUGEINT in an oracle result is an
# unconditional fail (no Spark type maps to it). Integer widths are
# compared exactly (the oracles CAST row_number() to INTEGER for this
# reason); timestamps compare at family level (driver data is
# TIMESTAMP_NS parquet, Spark writes µs — driver-green today).

def _duck_type_canon(t):
    t = t.upper()
    ints = {"TINYINT": "INT8", "SMALLINT": "INT16", "INTEGER": "INT32",
            "BIGINT": "INT64", "UTINYINT": "UINT8", "USMALLINT": "UINT16",
            "UINTEGER": "UINT32", "UBIGINT": "UINT64"}
    if t in ints:
        return ints[t]
    if t in ("HUGEINT", "UHUGEINT"):
        return "HUGEINT"
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")  # keep (p,s): serialized decimals differ per precision/scale
    if t in ("FLOAT", "REAL"):
        return "FLOAT32"
    if t == "DOUBLE":
        return "FLOAT64"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t == "DATE":
        return "DATE"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "STRING"
    if t == "BOOLEAN":
        return "BOOL"
    if t == "BLOB":
        return "BINARY"
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST")):
        return "NESTED"
    return t


def _arrow_type_canon(t):
    if pa.types.is_boolean(t):
        return "BOOL"
    if pa.types.is_integer(t):
        return str(t).upper()  # e.g. int64 → INT64, uint32 → UINT32
    if pa.types.is_float32(t):
        return "FLOAT32"
    if pa.types.is_float64(t):
        return "FLOAT64"
    if pa.types.is_decimal(t):
        return f"DECIMAL({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    if pa.types.is_date(t):
        return "DATE"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "STRING"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BINARY"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_struct(t) or pa.types.is_map(t)):
        return "NESTED"
    return str(t).upper()


def schema_types_ok(name, spark_schema, sql):
    try:
        dtypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    except Exception as e:
        print(f"FAIL {name}: duckdb DESCRIBE error: {e}")
        return False
    stypes = {f.name: f.type for f in spark_schema}
    ok = True
    if set(dtypes) != set(stypes):
        # fail here, not just in the value path: --types-only skips the
        # value compare, and a column-set drift is a guaranteed driver
        # hash failure the types sweep must not wave through
        print(f"FAIL {name}: column sets differ: "
              f"duck-only={sorted(set(dtypes) - set(stypes))} "
              f"spark-only={sorted(set(stypes) - set(dtypes))}")
        ok = False
    for col in sorted(set(dtypes) | set(stypes)):
        if col not in dtypes or col not in stypes:
            continue  # reported above
        dc = _duck_type_canon(dtypes[col])
        sc_ = _arrow_type_canon(stypes[col])
        if dc == "HUGEINT":
            print(f"FAIL {name}: oracle column '{col}' is {dtypes[col]} "
                  f"(no Spark equivalent — cast the aggregate, e.g. "
                  f"CAST(sum(..) AS BIGINT))")
            ok = False
        elif dc != sc_:
            print(f"FAIL {name}: type mismatch on '{col}': "
                  f"duck={dtypes[col]}({dc}) spark={stypes[col]}({sc_})")
            ok = False
    return ok


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

# --types-only: skip value comparison, just diff result schemas (fast
# full-surface sweep for latent type widening — verdict r13 #3)
types_only = "--types-only" in sys.argv

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
    first_part = next(pdir.glob("*.parquet"), None)
    if first_part is None:
        print(f"FAIL {name}: no parquet files in {pdir}")
        fails += 1
        continue
    spark_schema = pq.ParquetFile(first_part).schema_arrow
    if not schema_types_ok(name, spark_schema, oracle[name]):
        fails += 1
        continue
    if types_only:
        print(f"OK   {name} (types)")
        continue
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
