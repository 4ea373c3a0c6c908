#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare (t2).

Reads the Verify output dir (per-query parquet + oracle_sql.json),
registers the sf tables as DuckDB views, runs each oracle SQL, and
compares row-by-row with columns sorted by name — the strictest
interpretation of the driver's "sorts columns by name before hashing
values" contract (exact value AND dtype-category equality).
"""
import json, sys, math
from decimal import Decimal

import duckdb
import pyarrow as pa


def spark_emittable(t):
    """True iff a Spark DataFrame can emit this arrow type verbatim.

    DuckDB silently widens sum(BIGINT) to HUGEINT (arrow decimal128(38,0));
    Spark emits BIGINT for the same expression, so the driver's type-aware
    hash mismatches even when every value is identical (cost: 2 keys in r4).
    Rejecting non-emittable ORACLE types up front turns that class of
    failure into a named local error instead of a driver hash mystery.
    """
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return spark_emittable(t.value_type)
    if pa.types.is_struct(t):
        return all(spark_emittable(f.type) for f in t)
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_boolean(t) or pa.types.is_string(t)
            or pa.types.is_large_string(t) or pa.types.is_timestamp(t)
            or pa.types.is_date(t) or pa.types.is_binary(t)
            or pa.types.is_null(t))


def oracle_type_drift(tbl):
    """Columns whose oracle arrow type Spark cannot emit (e.g. HUGEINT)."""
    return [f"{f.name}:{f.type}" for f in tbl.schema
            if not spark_emittable(f.type)]


def selftest():
    """Feed a known HUGEINT-producing SQL; the guard must name the column."""
    c = duckdb.connect()
    t = c.execute(
        "SELECT CAST(1 AS BIGINT) AS ok, sum(x) AS cum "
        "FROM (SELECT CAST(range AS BIGINT) AS x FROM range(5)) "
        "GROUP BY 1").fetch_arrow_table()
    drift = oracle_type_drift(t)
    assert drift and drift[0].startswith("cum:decimal128"), drift
    good = c.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS cum "
        "FROM (SELECT CAST(range AS BIGINT) AS x FROM range(5))"
    ).fetch_arrow_table()
    assert not oracle_type_drift(good), oracle_type_drift(good)
    print("selftest OK: HUGEINT guard names the drifting column")


if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
    selftest()
    sys.exit(0)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    return str(v)

fails, passes = [], 0
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        want = con.execute(sql).fetch_arrow_table()
        got = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')"
        ).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"load/exec error: {e}"))
        continue
    drift = oracle_type_drift(want)
    if drift:
        # not "inexpressible" — Spark CAN emit DecimalType; decimal is
        # rejected because the driver's hash floats one side only, so any
        # trailing-zero decimal value hash-mismatches (the repo's policy
        # is double-at-the-output-boundary, Tables.sumDec/moneyOut)
        fails.append((name, "oracle emits driver-hash-unsafe type(s) "
                            "(HUGEINT/decimal drift; emit DOUBLE or CAST "
                            f"to BIGINT at the output boundary): {drift}"))
        continue
    dec_cols = [f.name for f in got.schema if "decimal" in str(f.type)]
    if dec_cols:
        # The driver's hash floats one side but not the other: a decimal
        # value with a trailing zero ("253942.00" vs "253942.0") always
        # hash-mismatches. Emit DOUBLE at the output boundary instead
        # (see Tables.sumDec/moneyOut); r02 lost 12 keys to this.
        fails.append((name, f"decimal output columns (driver hash-unsafe): {dec_cols}"))
        continue
    wcols, gcols = sorted(want.column_names), sorted(got.column_names)
    if wcols != gcols:
        fails.append((name, f"schema: oracle {wcols} vs spark {gcols}"))
        continue
    if want.num_rows != got.num_rows:
        fails.append((name, f"rows: oracle {want.num_rows} vs spark {got.num_rows}"))
        continue
    wp = want.select(wcols).to_pylist()
    gp = got.select(gcols).to_pylist()
    bad = None
    for i, (wr, gr) in enumerate(zip(wp, gp)):
        for c in wcols:
            if canon(wr[c]) != canon(gr[c]):
                bad = (i, c, wr[c], gr[c], type(wr[c]).__name__,
                       type(gr[c]).__name__)
                break
        if bad:
            break
    if bad:
        fails.append((name, f"value row {bad[0]} col {bad[1]}: "
                            f"oracle={bad[2]!r}({bad[4]}) spark={bad[3]!r}({bad[5]})"))
    else:
        passes += 1

print(f"\nPASS {passes}/{passes + len(fails)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
