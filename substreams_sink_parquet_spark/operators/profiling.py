"""Table profiling: per-column stats and fixed-bound numeric histograms.

The data-quality gate every ingest pipeline wants in front of a 100 TB lake:
one pass over the table answering "how null, how distinct, what range" per
column, plus a distribution sketch for numeric columns. The reference sink
exposes only file-level stats (`stats` CLI; reference parquet/stats.go is
row-count accounting) — column-level profiling is part of the downstream
tooling it delegates, same bucket as the rest of the query surface.

Scale shape:

- ``profile_table`` is ONE aggregate over the table. With the default
  ``exact_distinct=False`` the distinct counts are HyperLogLog++ sketches
  (``approx_count_distinct``), so every per-column stat combines map-side
  and the exchange carries one small sketch buffer per column — total
  shuffled bytes independent of row count. ``exact_distinct=True`` switches
  to real COUNT(DISTINCT): Spark plans multi-column distinct aggregates via
  an Expand (each row replicated once per profiled column, map-side) and the
  exchange then carries each column's distinct values — exact answers at the
  cost of a distinct-values-sized shuffle. That trade is the caller's: exact
  for oracle-checked correctness and modest-cardinality columns, approx for
  crawl-scale profiling runs.
- ``numeric_histogram`` takes EXPLICIT [lo, hi) bounds, so binning is a
  map-only projection (no pre-pass to find the range) into a groupBy whose
  exchange is at most ``n_bins`` partial rows per task. A data-dependent
  range would need min/max first — callers who want that can read them off
  ``profile_table`` and still pay only one extra tiny job.

The min/max representations are STRINGS by design: one output schema for any
column mix, and each type pins its cross-engine formatting explicitly
(doubles through DECIMAL, timestamps through date_format) per the
hash-stability rules in catalog.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load

__all__ = ["profile_table", "numeric_histogram", "profile_drift",
           "profile_quantiles"]


def _repr_expr(dtype: str, c: Column) -> Column:
    """Hash-stable string projection of an already-aggregated min/max value
    (aggregation happens on the NATIVE type — a string-typed min would
    order '10' before '9').

    Doubles route through DECIMAL(18,2) (binary-float formatting differs
    across engines), timestamps through a fixed date_format (unit and
    zone-suffix conventions differ); everything else is a plain string
    cast, which integers and strings render identically everywhere.

    Non-finite and decimal-overflow doubles get explicit reprs (code
    review r12): NaN / +-Infinity abort the decimal cast under ANSI in
    BOTH engines — and NaN compares greatest in both, so it IS the max
    of any column containing one — and a finite value past 10^16
    overflows DECIMAL(18,2) the same way. The profile of a column must
    describe poisoned data, never crash on it: NaN/Infinity label
    themselves, an overflowing finite value falls back to the plain
    double repr (its exactness matters less than the profile surviving).
    """
    if dtype in ("double", "float"):
        # ONE coalesce covers every failure mode: try_cast maps NaN,
        # +-Infinity, AND decimal overflow to NULL, and Spark's native
        # double->string cast renders exactly "NaN" / "Infinity" /
        # "-Infinity" for the non-finite values — no when-chain needed
        # (the chain's larger codegen cost ~0.2s of constant
        # plan-compile time per profile)
        return F.coalesce(
            c.try_cast("decimal(18,2)").cast("string"),
            c.cast("string"),
        )
    if dtype.startswith("timestamp"):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def profile_table(df: DataFrame, cols: list[str],
                  exact_distinct: bool = False,
                  rsd: float = 0.05) -> DataFrame:
    """One-pass per-column profile → (column, n_rows, n_nulls, n_distinct,
    min_repr, max_repr), one row per requested column.

    ``n_distinct`` ignores NULLs (both engines' COUNT(DISTINCT) contract);
    ``exact_distinct`` picks COUNT(DISTINCT) vs the HLL sketch default —
    see the module docstring for the shuffle trade. The wide single-row
    aggregate is unpivoted driver-free: a literal-array inline on the
    1-row result, so the plan is Aggregate → tiny Generate, never a
    per-column job or a driver collect-and-reshape.

    Determinism assumption (ADVICE r13): exact mode scans ``df`` TWICE
    (stats aggregate crossJoin distinct aggregate). For a deterministic
    input — every catalog producer; any file-backed frame — the halves
    see identical data and the split is result-identical to the
    historical single aggregate (pytest-pinned). A non-deterministic
    unpersisted lineage (rand()-derived columns, a re-sampled source)
    could feed the two halves different data: persist such a frame
    before profiling with ``exact_distinct=True``, or use the single-
    pass approx mode.
    """
    if not cols:
        raise ValueError("profile_table needs at least one column")
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in table: {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.min(F.col(c)).alias(f"__mn_{c}"),
            F.max(F.col(c)).alias(f"__mx_{c}"),
        ]
    if exact_distinct:
        # Exact mode: the distinct counts run as their OWN aggregate and
        # the two 1-row results cross-join (optimization r13, guide §2.3/
        # §7.2). Folding COUNT(DISTINCT c1..cN) into the same Aggregate as
        # the min/max/count stats planned as Expand(N+1 copies of every
        # row) -> Sort -> SortAggregate: min/max over STRING columns have
        # immutable buffer types, which forces the whole expanded stream
        # through sort-based aggregation (plans/r13/
        # q_profile_columns_before.txt, nodes 2-10). Split, the distinct
        # half stays a hash aggregate over the Expand and the stats half
        # is a single-group aggregate with no Expand at all — measured
        # 2.58 s -> 0.86 s on orders at sf0.1, identical results. The
        # second scan re-reads only the profiled columns (columnar), and
        # both exchanges carry the same per-task-distinct partials as
        # before — at lake scale the removed full-table sort dwarfs one
        # extra pruned scan.
        nd_aggs = [
            F.count_distinct(F.col(c)).alias(f"__nd_{c}") for c in cols
        ]
        wide = df.agg(*aggs).crossJoin(df.agg(*nd_aggs))
    else:
        # approx mode: HLL sketches are hash-friendly fixed-width buffers —
        # one single-pass aggregate stays the right plan
        for c in cols:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"__nd_{c}"))
        wide = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            _repr_expr(dtypes[c], F.col(f"__mn_{c}")).alias("min_repr"),
            _repr_expr(dtypes[c], F.col(f"__mx_{c}")).alias("max_repr"),
        )
        for c in cols
    ])
    return wide.select(F.inline(entries))


def numeric_histogram(df: DataFrame, col: str, lo: float, hi: float,
                      n_bins: int) -> DataFrame:
    """Fixed-width histogram of ``col`` over explicit [lo, hi) →
    (bin, bin_lo, bin_hi, cnt), empty bins omitted. Rows outside the
    bounds clamp into the edge bins (bin 0 / n_bins-1) rather than
    vanishing — a profiler that silently drops outliers would hide
    exactly the rows worth seeing; NULLs and NaNs are excluded. NaN is
    not an outlier, it is a non-value: Spark's floor(NaN) lands it in
    bin 0 while DuckDB's NaN-sorts-greatest clamps it to the TOP bin —
    silently skewing opposite tails of the histogram — so it joins the
    corpus-wide NaN-exclusion contract instead (code review r12; the
    similarity/quantizer family's rule). +-Infinity is orderable and
    still clamps into its edge bin. Map-only binning (bounds are
    literals) into a ≤``n_bins``-group aggregate."""
    if not (hi > lo and n_bins > 0):
        raise ValueError(f"need hi > lo and n_bins > 0, got [{lo}, {hi}) x {n_bins}")
    w = (hi - lo) / n_bins
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(w))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    return (
        df.filter(F.col(col).isNotNull() & ~F.isnan(F.col(col)))
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
            "cnt",
        )
    )


def profile_drift(old: DataFrame, new: DataFrame,
                  null_rate_tol: float = 0.05,
                  distinct_ratio_tol: float = 0.5) -> DataFrame:
    """Column-level drift between two :func:`profile_table` outputs →
    (column, null_rate_old, null_rate_new, n_distinct_old, n_distinct_new,
    range_changed, drifted) — the check a pipeline runs between corpus
    versions or ingest epochs before pointing training at the new data.

    ``drifted`` flags: a null-rate move beyond ``null_rate_tol`` (absolute),
    a distinct-count ratio outside [1-tol, 1+tol] (relative — raw deltas
    would flag every growing table), a min/max repr change, or a column
    present on only one side (appearing/disappearing columns are the
    loudest drift there is; a FULL OUTER join keeps them). Inputs are
    column-count-sized, so the join is trivially broadcast; rates round
    through DECIMAL at 6dp for cross-engine hash stability."""
    def side(p: DataFrame, tag: str) -> DataFrame:
        # n_rows = 0 (an empty table's profile) leaves the rate NULL →
        # the one-sided branch flags it: a side with no rows at all is
        # drift, never an ANSI divide-by-zero abort
        return p.select(
            "column",
            F.when(
                F.col("n_rows") > 0,
                F.round(
                    (F.col("n_nulls") / F.col("n_rows")).cast("decimal(18,6)"),
                    6,
                ).cast("double"),
            ).alias(f"null_rate_{tag}"),
            F.col("n_distinct").alias(f"n_distinct_{tag}"),
            F.col("min_repr").alias(f"min_{tag}"),
            F.col("max_repr").alias(f"max_{tag}"),
        )
    j = side(old, "old").join(side(new, "new"), "column", "full_outer")
    return _drift_flags(j, null_rate_tol, distinct_ratio_tol)


def _drift_flags(j: DataFrame, null_rate_tol: float, distinct_ratio_tol: float,
                 keys: tuple[str, ...] = ("column",)) -> DataFrame:
    """Shared drift verdict over a frame carrying *_old / *_new stat
    columns — one implementation so the two-profile compare and the
    epoch-history lag path cannot diverge on thresholds or null logic.

    min/max compare null-safely (an all-NULL column has NULL reprs on
    both sides — identical, not "changed", and never a SQL-NULL verdict)
    and the distinct-ratio test is skipped when BOTH sides have zero
    distinct values: a column that is entirely NULL in every epoch is
    unchanged, not permanently drifted (its 0/1 ratio would otherwise
    trip the lower band forever)."""
    one_sided = F.col("null_rate_old").isNull() | F.col("null_rate_new").isNull()
    range_changed = one_sided | (
        ~F.col("min_old").eqNullSafe(F.col("min_new"))
        | ~F.col("max_old").eqNullSafe(F.col("max_new"))
    )
    ratio = F.col("n_distinct_new") / F.greatest(F.col("n_distinct_old"), F.lit(1))
    distinct_moved = F.when(
        (F.col("n_distinct_old") == 0) & (F.col("n_distinct_new") == 0),
        F.lit(False),
    ).otherwise(
        (ratio < 1 - distinct_ratio_tol) | (ratio > 1 + distinct_ratio_tol)
    )
    drifted = (
        one_sided
        | (F.abs(F.col("null_rate_new") - F.col("null_rate_old")) > null_rate_tol)
        | distinct_moved
        | range_changed
    )
    return j.select(
        *keys, "null_rate_old", "null_rate_new",
        "n_distinct_old", "n_distinct_new",
        range_changed.alias("range_changed"),
        drifted.alias("drifted"),
    )


def profile_quantiles(df: DataFrame, cols: list[str],
                      probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
                      exact: bool = True) -> DataFrame:
    """Per-column quantiles → (column, p, q), one row per (column, prob),
    all columns in ONE aggregate pass (same single-job unpivot shape as
    :func:`profile_table`).

    ``exact=True`` uses Spark's exact interpolated percentile — its
    aggregation state holds each column's distinct (value, count) pairs,
    so it is the right mode when distinct values are bounded (prices,
    scores, lengths) and the mode the oracle hash demands. ``exact=False``
    switches to the KLL-style ``percentile_approx`` sketch whose state is
    fixed-size regardless of cardinality — the scale default for
    continuous columns on a crawl. Values round to 6 dp (interpolation
    arithmetic is the only float in play; see catalog.py rules).

    NaN values in double/float columns are excluded like NULLs (code
    review r12, the numeric_histogram contract): NaN sorts greatest, so
    one poisoned row otherwise turns every upper quantile of the column
    into NaN."""
    if not cols:
        raise ValueError("profile_quantiles needs at least one column")
    dtypes = dict(df.dtypes)
    plist = [float(p) for p in probs]

    def _src(c: str):
        if dtypes.get(c) in ("double", "float"):
            return F.when(~F.isnan(F.col(c)), F.col(c))
        return F.col(c)

    aggs = [
        (F.percentile(_src(c), F.lit(plist)) if exact
         else F.percentile_approx(_src(c), plist, 10000)).alias(f"__q_{c}")
        for c in cols
    ]
    wide = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.lit(p).alias("p"),
            F.round(F.element_at(f"__q_{c}", i + 1).cast("double"), 6).alias("q"),
        )
        for c in cols
        for i, p in enumerate(plist)
    ])
    return wide.select(F.inline(entries))


def document_profile(docs: DataFrame, exact: bool = False) -> DataFrame:
    """Distribution profile of a document table on DERIVED per-doc
    metrics — chars and words of ``text``, plus ``lang`` when present —
    in sketch mode by default (one aggregate pass, column-count-sized
    exchange). The shared corpus-shape snapshot: curate's before/after
    drift report and the streaming corpus builder's per-epoch history
    both use it, so their numbers are comparable across the batch and
    streaming paths. ``exact=True`` is the oracle-gate mode
    (q_profile_documents pins the chars/words derivation against an
    independent engine)."""
    view = docs.select(
        F.length("text").alias("chars"),
        F.size(F.split("text", " ")).alias("words"),
        *(["lang"] if "lang" in docs.columns else []),
    )
    return profile_table(view, view.columns, exact_distinct=exact)


def read_profile_history(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-epoch ingest profiles written by the streaming sink's
    ``profile_columns`` stage: ``{lake}/_profile/epoch={id}/`` →
    (epoch, column, n_rows, n_nulls, n_distinct, min_repr, max_repr).
    Kilobytes per epoch — the whole history of a year-long stream reads
    in one tiny scan."""
    from ..fsio import url_join

    return spark.read.parquet(url_join(out_dir, "_profile"))


def profile_history_drift(hist: DataFrame,
                          null_rate_tol: float = 0.05,
                          distinct_ratio_tol: float = 0.5) -> DataFrame:
    """Epoch-over-epoch drift within an ingest-profile history: each
    (epoch, column) row compared against the SAME column's previous
    epoch via one lag window — a single exchange on ``column`` over a
    kilobytes-sized history, with the verdict logic shared with
    :func:`profile_drift`. Only each column's FIRST epoch (no baseline)
    is omitted — the cut is by lag position, not by a null rate, because
    an EMPTY epoch (n_rows=0, rates NULL) must flag one-sided drift on
    its own row AND leave the following epoch's verdict in the report
    (also one-sided: its baseline was empty). A column vanishing from
    the stream's schema mid-history is a schema-drift event the sink's
    ``ensure_schema_compatible`` guard already refuses."""
    from pyspark.sql.window import Window

    nr = F.when(
        F.col("n_rows") > 0,
        F.round(
            (F.col("n_nulls") / F.col("n_rows")).cast("decimal(18,6)"), 6
        ).cast("double"),
    )
    cur = hist.select(
        "epoch", "column",
        nr.alias("null_rate_new"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_repr").alias("min_new"),
        F.col("max_repr").alias("max_new"),
    )
    w = Window.partitionBy("column").orderBy("epoch")
    lagged = cur.select(
        "epoch", "column", "null_rate_new", "n_distinct_new",
        "min_new", "max_new",
        F.lag("null_rate_new").over(w).alias("null_rate_old"),
        F.lag("n_distinct_new").over(w).alias("n_distinct_old"),
        F.lag("min_new").over(w).alias("min_old"),
        F.lag("max_new").over(w).alias("max_old"),
        F.lag("epoch").over(w).alias("__prev_epoch"),
    ).filter(F.col("__prev_epoch").isNotNull()).drop("__prev_epoch")
    return _drift_flags(lagged, null_rate_tol, distinct_ratio_tol,
                        keys=("epoch", "column"))


# -- catalog entries -------------------------------------------------------

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderpriority"]

# min/max aggregate on the NATIVE type and only the RESULT is cast to the
# repr, mirroring profile_table exactly (aggregating pre-cast values could
# diverge if the repr rounding reordered elements)
_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column",
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST({rep.format(v=f'MIN({c})')} AS VARCHAR) AS min_repr,
       CAST({rep.format(v=f'MAX({c})')} AS VARCHAR) AS max_repr
FROM orders"""
    for c, rep in [
        ("o_orderkey", "{v}"),
        ("o_custkey", "{v}"),
        ("o_orderstatus", "{v}"),
        ("o_totalprice", "CAST({v} AS DECIMAL(18,2))"),
        ("o_orderpriority", "{v}"),
    ]
)


@register(
    "q_profile_columns",
    _PROFILE_ORACLE,
    doc="Per-column table profile (null count, exact distinct count, "
        "min/max repr) over five orders columns in ONE aggregate pass, "
        "unpivoted via a 1-row inline — the data-quality gate in front "
        "of an ingest lake. exact_distinct=True here because the oracle "
        "hash demands exact answers; the scale default is the HLL-sketch "
        "variant whose exchange is column-count-sized (pytest pins the "
        "approx mode against the exact counts)",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return profile_table(orders, _PROFILE_COLS, exact_distinct=True)


_DRIFT_OLD_COLS = ["o_orderkey", "o_orderstatus", "o_totalprice",
                   "o_orderpriority"]
_DRIFT_NEW_COLS = ["o_orderkey", "o_orderstatus", "o_totalprice"]


def _drift_profile_sql(cols_reprs: list[tuple[str, str]], src: str) -> str:
    return "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST({rep.format(v=f'MIN({c})')} AS VARCHAR) AS mn,
           CAST({rep.format(v=f'MAX({c})')} AS VARCHAR) AS mx
    FROM {src}"""
        for c, rep in cols_reprs
    )


def _drift_oracle() -> str:
    reprs = {"o_totalprice": "CAST({v} AS DECIMAL(18,2))"}
    old_p = _drift_profile_sql(
        [(c, reprs.get(c, "{v}")) for c in _DRIFT_OLD_COLS], "orders")
    new_p = _drift_profile_sql(
        [(c, reprs.get(c, "{v}")) for c in _DRIFT_NEW_COLS], "newt")
    return f"""
    WITH newt AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'F' THEN NULL
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
    ),
    po AS ({old_p}),
    pn AS ({new_p}),
    j AS (
        SELECT COALESCE(po.col, pn.col) AS "column",
               CAST(ROUND(CAST(po.n_nulls / po.n_rows AS DECIMAL(18,6)), 6)
                    AS DOUBLE) AS null_rate_old,
               CAST(ROUND(CAST(pn.n_nulls / pn.n_rows AS DECIMAL(18,6)), 6)
                    AS DOUBLE) AS null_rate_new,
               po.n_distinct AS n_distinct_old,
               pn.n_distinct AS n_distinct_new,
               po.mn AS mn_old, po.mx AS mx_old,
               pn.mn AS mn_new, pn.mx AS mx_new
        FROM po FULL OUTER JOIN pn ON po.col = pn.col
    )
    SELECT "column", null_rate_old, null_rate_new,
           n_distinct_old, n_distinct_new,
           (null_rate_old IS NULL OR null_rate_new IS NULL
            OR mn_old IS DISTINCT FROM mn_new
            OR mx_old IS DISTINCT FROM mx_new) AS range_changed,
           (null_rate_old IS NULL OR null_rate_new IS NULL
            OR ABS(null_rate_new - null_rate_old) > 0.05
            OR (NOT (n_distinct_old = 0 AND n_distinct_new = 0)
                AND (n_distinct_new / GREATEST(n_distinct_old, 1) < 0.5
                     OR n_distinct_new / GREATEST(n_distinct_old, 1) > 1.5))
            OR mn_old IS DISTINCT FROM mn_new
            OR mx_old IS DISTINCT FROM mx_new) AS drifted
    FROM j
    """


@register(
    "q_profile_drift",
    _drift_oracle(),
    doc="Column-level drift between two profile_table outputs: orders vs "
        "a degraded epoch (o_totalprice nulled for 'F' rows, "
        "o_orderpriority gone) — null-rate delta, distinct-count ratio, "
        "min/max change, and one-sided columns all flag via a FULL OUTER "
        "join of two column-count-sized profiles (trivially broadcast). "
        "The gate a pipeline runs between corpus versions before "
        "retraining",
)
def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    degraded = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "F", F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice")),
    )
    return profile_drift(
        profile_table(orders, _DRIFT_OLD_COLS, exact_distinct=True),
        profile_table(degraded, _DRIFT_NEW_COLS, exact_distinct=True),
    )


# document_profile derives chars via length() and words via
# size(split(text, ' ')) — Spark's split keeps empty tokens, so words ==
# (number of spaces + 1); the oracle derives the SAME count from
# len(str_split), which DuckDB defines identically
_DOC_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS "column",
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({expr}) AS n_nulls,
       CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       CAST(MIN({expr}) AS VARCHAR) AS min_repr,
       CAST(MAX({expr}) AS VARCHAR) AS max_repr
FROM documents"""
    for name, expr in [
        ("chars", "len(text)"),
        ("words", "len(str_split(text, ' '))"),
        ("lang", "lang"),
    ]
)


@register(
    "q_profile_documents",
    _DOC_PROFILE_ORACLE,
    doc="The shared corpus-shape snapshot (document_profile) in exact "
        "mode: per-doc derived chars/words plus lang, profiled in one "
        "aggregate pass — pins the chars/words derivation (length, "
        "whitespace-split token count incl. empty tokens) against an "
        "independent engine, since curate --profile and both streaming "
        "profile histories report exactly these metrics",
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return document_profile(docs, exact=True)


_QUANT_COLS = ["o_totalprice", "o_orderkey"]
_QUANT_PROBS = (0.25, 0.5, 0.75, 0.95)

_QUANT_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", CAST({p} AS DOUBLE) AS p,
       ROUND(quantile_cont(CAST({c} AS DOUBLE), {p}), 6) AS q
FROM orders"""
    for c in _QUANT_COLS
    for p in _QUANT_PROBS
)


@register(
    "q_profile_quantiles",
    _QUANT_ORACLE,
    doc="Exact interpolated quantiles (p25/50/75/95) for two orders "
        "columns in ONE aggregate pass, unpivoted via 1-row inline — the "
        "distribution row of the profiling family. Exact mode's state is "
        "distinct-value-bounded (right for prices/keys and demanded by "
        "the oracle hash); the percentile_approx sketch mode is the "
        "documented scale default for continuous crawl columns",
)
def q_profile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return profile_quantiles(orders, _QUANT_COLS, _QUANT_PROBS)


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 400000.0, 16


def _hist_oracle() -> str:
    w = (_HIST_HI - _HIST_LO) / _HIST_BINS
    return f"""
    SELECT bin,
           {_HIST_LO} + bin * {w} AS bin_lo,
           {_HIST_LO} + (bin + 1) * {w} AS bin_hi,
           COUNT(*) AS cnt
    FROM (
        SELECT CAST(LEAST(GREATEST(
                   FLOOR((o_totalprice - {_HIST_LO}) / {w}), 0),
               {_HIST_BINS - 1}) AS BIGINT) AS bin
        FROM orders
        WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
    ) b
    GROUP BY bin
    """


@register(
    "q_profile_histogram",
    _hist_oracle(),
    doc="Fixed-bound 16-bin histogram of orders.o_totalprice: explicit "
        "[lo, hi) bounds make binning a map-only literal projection (no "
        "range pre-pass) into a <=16-group aggregate; out-of-range rows "
        "clamp into the edge bins instead of silently dropping",
)
def q_profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return numeric_histogram(orders, "o_totalprice",
                             _HIST_LO, _HIST_HI, _HIST_BINS)
