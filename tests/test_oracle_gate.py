"""pytest mirror of the driver's t2 gate for the catalog ids the driver's
fixed CORRECTNESS artifact does NOT cover (VERDICT r2 Missing #4).

The driver checks a fixed ~50-id subset each round; the other ~56 registered
queries were verified only by ad-hoc runs of tools/check_oracle.py. This
module pins them in CI: each driver-unchecked id runs on Spark AND its
DuckDB oracle at sf0.01 and must match by (columns, rowcount, value
multiset) — the same comparison the driver applies. Rows-only ids (no
oracle by design) must at least execute and return a stable schema.

Run in isolation with `pytest -m oracle`.
"""

from __future__ import annotations

import glob
import json
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.01"


def _driver_checked_ids() -> set[str]:
    arts = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    if not arts:
        return set()
    with open(arts[-1]) as f:
        return set(json.load(f))


def _unchecked_ids() -> list[str]:
    from substreams_sink_parquet_spark.catalog import registry

    checked = _driver_checked_ids()
    return [n for n in registry() if n not in checked]


@pytest.fixture(scope="module")
def oracle_con():
    import duckdb

    from substreams_sink_parquet_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.oracle
@pytest.mark.parametrize("qid", _unchecked_ids())
def test_driver_unchecked_query_matches_oracle(spark, oracle_con, qid):
    from check_oracle import frame_key

    from substreams_sink_parquet_spark.catalog import registry

    spec = registry()[qid]
    sdf = spec.fn(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        # rows-only by design (non-SQL-expressible) — driver parity is the
        # weaker executes-with-stable-schema check
        assert list(sdf.columns), qid
        return
    odf = oracle_con.execute(spec.oracle).fetchdf()
    scols, srows = frame_key(sdf)
    ocols, orows = frame_key(odf)
    assert scols == ocols, f"{qid}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{qid}: rowcount {len(srows)} vs {len(orows)}"
    if srows != orows:
        # bit-exact miss: allow the labeled 10-significant-digit tolerance
        _, srows_t = frame_key(sdf, strict_floats=False)
        _, orows_t = frame_key(odf, strict_floats=False)
        assert srows_t == orows_t, f"{qid}: value mismatch beyond float tolerance"
