"""Local stand-in for the driver's t2 correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB over the same
sf dir, then compares row count, column names, and an order-insensitive value
hash (columns sorted by name, floats compared bit-exact with a tolerance
fallback reported separately).

Usage: python tools/check_oracle.py [sf_dir] [query_id ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def norm_cell(v, strict_floats: bool = True):
    """strict_floats=True compares floats BIT-EXACT (full repr round-trip);
    False rounds to 10 significant digits — the labeled tolerance fallback."""
    import datetime

    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if strict_floats else f"{v:.10g}"
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, (datetime.date,)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, np.ndarray)):
        return tuple(norm_cell(x, strict_floats) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x, strict_floats)) for k, x in v.items()))
    return v


def frame_key(df, strict_floats: bool = True):
    """pandas frame -> sorted multiset of normalized rows (cols sorted by name)."""
    cols = sorted(df.columns)
    rows = [
        tuple(norm_cell(v, strict_floats) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return cols, rows


# Rows-only-BY-DESIGN queries whose correctness claim lives in a
# hash-gated delta companion (the companion makes each engine check its
# own sketches/builtins against its own exact math and hashes the
# verdict): the pairing is ASSERTED here, so "rows-only by design" can
# never silently outlive its justification — a run that covers the
# rows-only id fails unless its companion is also present AND green
# (VERDICT r10, Next #6).
NO_ORACLE_COMPANIONS = {
    "q_agg_approx": "q_agg_approx_delta",
    "q_agg_stats_builtin": "q_agg_stats_delta",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # selecting a paired rows-only id pulls its companion into the run
    if only:
        only |= {NO_ORACLE_COMPANIONS[n] for n in only
                 if n in NO_ORACLE_COMPANIONS}

    import duckdb

    from substreams_sink_parquet_spark.catalog import registry
    from substreams_sink_parquet_spark.session import get_spark

    spark = get_spark("check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    from substreams_sink_parquet_spark.tables import TABLE_NAMES
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    reg = registry()
    names = [n for n in reg if not only or n in only]
    failures, rows_only, tol_pass = [], [], []
    for name in names:
        spec = reg[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if spec.oracle is None:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        scols, srows = frame_key(sdf)
        ocols, orows = frame_key(odf)
        ok = True
        if scols != ocols:
            print(f"FAIL  {name}: column mismatch spark={scols} oracle={ocols}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            ok = False
        elif srows != orows:
            # bit-exact miss: retry under the labeled 10-sig-digit tolerance
            _, srows_t = frame_key(sdf, strict_floats=False)
            _, orows_t = frame_key(odf, strict_floats=False)
            if srows_t == orows_t:
                n_ulp = sum(1 for a, b in zip(srows, orows) if a != b)
                print(f"OK~   {name}: {len(srows)} rows — float tolerance pass "
                      f"({n_ulp} rows differ bit-exact; last-ulp drift) "
                      f" [{time.time()-t0:.1f}s]")
                tol_pass.append(name)
            else:
                diff = [i for i, (a, b) in enumerate(zip(srows_t, orows_t)) if a != b]
                print(f"FAIL  {name}: {len(diff)} differing rows of {len(srows)}; first: ")
                i = diff[0]
                print(f"   spark : {srows_t[i]}")
                print(f"   oracle: {orows_t[i]}")
                ok = False
        if ok:
            if name not in tol_pass:
                print(f"OK    {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    # mechanical coupling: each paired rows-only id demands its hash-gated
    # companion present and green in THIS run
    for ro, comp in NO_ORACLE_COMPANIONS.items():
        if ro not in names or ro in failures:
            continue  # absent from the run, or already red on its own
        if comp not in names:
            print(f"FAIL  {ro}: rows-only by design, but its hash-gated "
                  f"companion {comp} is not in this run")
            failures.append(ro)
        elif comp in failures:
            print(f"FAIL  {ro}: rows-only by design, but its hash-gated "
                  f"companion {comp} is red")
            failures.append(ro)
        else:
            print(f"pair  {ro}: rows-only by design — justified by "
                  f"hash-green companion {comp}")
    print(f"\n{len(names)-len(failures)}/{len(names)} pass ({len(rows_only)} rows-only"
          + (f", {len(tol_pass)} float-tolerance" if tol_pass else "") + ")")
    if tol_pass:
        print("float-tolerance (driver hash may be stricter — investigate):",
              " ".join(tol_pass))
    if failures:
        print("failures:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
