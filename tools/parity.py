#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run Verify output vs DuckDB.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, struct
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Bit-strict on floats: the driver hashes IEEE bit patterns, where
    # -0.0 != +0.0 even though Python's == says they are equal (the
    # x119 class: round(cos, 3) lands on -0.0 in one engine and +0.0 in
    # the other). Round to 9 dp first (the long-standing tolerance for
    # values the queries already round in-engine), then compare the
    # PACKED BITS of the result so a sign difference at zero fails
    # loudly here before it fails at the driver.
    #
    # Byte-packing DELIBERATELY flips two behaviors vs plain ==, both
    # chosen to mirror the driver's typed-value hashing (round 10
    # review): (1) cross-type equality is GONE — a DOUBLE 1.0 no
    # longer matches a BIGINT 1, which is wanted because the driver
    # hash-fails on the type divergence anyway (see the TYPE MISMATCH
    # gate below; an oracle missing a CAST must fail HERE, not pass
    # here and fail there); (2) NaN compares EQUAL to NaN — wanted,
    # because a query that legitimately emits NaN on both engines is a
    # match, whereas Python's NaN != NaN would report a phantom value
    # mismatch no re-run could clear.
    if isinstance(v, float):
        return struct.pack('<d', round(v, 9))
    # Recurse into nested values so array<double> / struct<... double>
    # columns get the same bit-strict treatment (to_pylist yields
    # lists for arrays and dicts for structs).
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, tuple):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm(x)) for k, x in sorted(v.items()))
    return v

def selftest():
    assert norm(-0.0) != norm(0.0), "parity norm() is blind to signed zero"
    assert norm(round(-1e-13, 3)) != norm(round(1e-13, 3)), \
        "parity norm() is blind to signed zero after rounding"
    assert norm(1.5) == norm(1.5)
    assert norm(float('nan')) == norm(float('nan'))
    assert norm(0.1 + 0.2) == norm(0.30000000000000004)
    assert norm([-0.0]) != norm([0.0]), \
        "parity norm() is blind to signed zero inside arrays"
    assert norm({"a": -0.0}) != norm({"a": 0.0}), \
        "parity norm() is blind to signed zero inside structs"
    assert norm([[1.0, -0.0]]) != norm([[1.0, 0.0]]), \
        "parity norm() is blind to signed zero in nested arrays"
    assert norm([1.5, "x"]) == norm([1.5, "x"])
    print("parity selftest OK: norm() is bit-strict (distinguishes -0.0, "
          "including inside arrays/structs)")

def rows_of(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    if not data:
        return cols, []
    rows = sorted(zip(*data), key=lambda r: tuple(
        (x is None, str(type(x)), x) for x in map(norm, r)))
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        spark_tbl = pq.read_table(files[0]) if files else None
        if name not in oracle:
            results[name] = f"rows-only: {spark_tbl.num_rows if spark_tbl else 0} rows"
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        sc, sr = rows_of(spark_tbl)
        dc, dr = rows_of(duck_tbl)
        stypes = {c: str(spark_tbl.schema.field(c).type) for c in spark_tbl.column_names}
        dtypes = {c: str(duck_tbl.schema.field(c).type) for c in duck_tbl.column_names}
        tdiff = {c: (stypes.get(c), dtypes.get(c)) for c in set(stypes) | set(dtypes)
                 if stypes.get(c) != dtypes.get(c)}
        if tdiff:
            # Hard failure: the driver's comparator hashes typed values, so
            # any arrow-type divergence (e.g. DuckDB DECIMAL(38,0) vs engine
            # BIGINT from an un-cast SUM) can hash-fail even when the values
            # are numerically equal. Keep this gate at least as strict.
            results[name] = f"TYPE MISMATCH {tdiff}"
            continue
        if sc != dc:
            results[name] = f"SCHEMA MISMATCH spark={sc} duck={dc}"
        elif len(sr) != len(dr):
            results[name] = f"ROWCOUNT MISMATCH spark={len(sr)} duck={len(dr)}"
        else:
            bad = [(a, b) for a, b in zip(sr, dr) if tuple(map(norm, a)) != tuple(map(norm, b))]
            if bad:
                results[name] = f"VALUE MISMATCH ({len(bad)} rows) first: spark={bad[0][0]} duck={bad[0][1]}"
            else:
                results[name] = f"OK ({len(sr)} rows)"
    width = max(len(k) for k in results)
    fails = 0
    for k, v in sorted(results.items()):
        flag = " " if v.startswith(("OK", "rows-only")) else "X"
        if flag == "X":
            fails += 1
        print(f"{flag} {k:<{width}} {v[:300]}")
    print(f"\n{fails} failures / {len(results)} queries")
    return fails

if __name__ == "__main__":
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
        sys.exit(0)
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
