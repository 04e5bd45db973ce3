"""Snapshot every catalog query's full result as a stable hash, for
before/after equivalence proofs during optimization rounds.

Usage: python tools/snapshot_queries.py <out.json> [sf_dir] [query_id ...]

Every query is deterministic by design (hash-derived randomness, decimal
partial sums), so an optimization that preserves semantics must reproduce
the exact hash — including the rows-only (no-oracle) queries the driver
only row-counts.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])

    from tools.check_oracle import frame_key

    from substreams_sink_parquet_spark.catalog import registry
    from substreams_sink_parquet_spark.session import get_spark

    spark = get_spark("snapshot-queries")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = [n for n in reg if not only or n in only]
    out = {}
    for name in names:
        t0 = time.time()
        try:
            pdf = reg[name].fn(spark, sf_dir).toPandas()
            cols, rows = frame_key(pdf)
            h = hashlib.sha256(repr((cols, rows)).encode()).hexdigest()[:16]
            out[name] = {"rows": len(rows), "cols": cols, "hash": h}
            print(f"{name}: {len(rows)} rows {h}  [{time.time()-t0:.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)}
            print(f"ERR  {name}: {e!r}", flush=True)
        spark.catalog.clearCache()
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(out)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
