"""Plan inspection helpers.

``plan_report(df)`` parses ``explain("formatted")`` output into the plan
properties that matter at 100 TB:

- ``pushed_filters``: predicates that reached the parquet scan (a filter
  evaluated post-scan reads every row group; a pushed one prunes IO);
- ``read_schemas``: columns actually read per scan (column pruning check —
  a 2-column projection must not scan 16 columns);
- ``broadcast_joins`` / ``sortmerge_joins`` / ``hash_joins``: physical join
  strategy chosen by Catalyst/AQE;
- ``exchanges``: shuffle count — the dominant cost driver;
- ``codegen_spans``: WholeStageCodegen regions (wider = more work fused into
  a single JVM loop);
- ``has_cartesian``: accidental cross products.

Tests in tests/test_plans.py pin these properties for the headline queries so
a regression in plan shape fails CI, not a cluster bill.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@dataclass
class PlanReport:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    hash_joins: int = 0
    exchanges: int = 0
    broadcast_exchanges: int = 0
    codegen_spans: int = 0
    has_cartesian: bool = False
    text: str = ""

    @property
    def shuffle_exchanges(self) -> int:
        return self.exchanges - self.broadcast_exchanges


def plan_report(df: DataFrame) -> PlanReport:
    text = explain_str(df, "formatted")
    rep = PlanReport(text=text)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            rep.pushed_filters.append(m.group(1).strip())
    rep.read_schemas = [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", text)]
    # formatted explain prints each node twice (tree + "(N) NodeName" detail
    # section); count the numbered detail headers so each node counts once
    def nodes(pattern: str) -> int:
        return len(re.findall(rf"\(\d+\) (?:{pattern})(?:\b|$)", text, re.M))

    rep.broadcast_joins = nodes("BroadcastHashJoin|BroadcastNestedLoopJoin")
    rep.sortmerge_joins = nodes("SortMergeJoin")
    rep.hash_joins = nodes("ShuffledHashJoin")
    rep.broadcast_exchanges = nodes("BroadcastExchange")
    rep.exchanges = nodes("Exchange|BroadcastExchange")
    rep.codegen_spans = codegen_spans(df)
    rep.has_cartesian = "CartesianProduct" in text
    return rep


def codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (fused JVM loops). Wider spans =
    fewer virtual calls; 0 means everything fell back to interpreted eval.

    AQE wraps the plan in AdaptiveSparkPlan and reports 0 subtrees until
    execution, so adaptive planning is toggled off for the introspection."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # .alias() forces a fresh QueryExecution: the original Dataset caches
        # its physical plan from any earlier explain under AQE
        text = explain_str(df.alias("__codegen_probe"), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
