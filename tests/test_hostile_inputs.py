"""Hostile-input gate (code review r12): a small, fast slice of the
oracle check run against the HOSTILE fixture variant — null/empty/
whitespace-only text, null lang, null/wrong-dim/null-element/zero-norm/
empty embeddings (tools/make_hostile.py).

The r11 review found 29 latent defects whose shared root cause was that
the clean fixtures never exercise these rows; this test makes a
representative subset of the catalog's hostile behavior part of the
always-on pytest gate (the FULL 181-query hostile sweep stays in
tools/check_oracle.py testdata-hostile/sf0.01 — run it per round)."""

import subprocess
import sys

import pytest

# one query per hostile class closed in r12:
#   ANSI crash (zero-norm cosine), ragged-matrix UDF (OPQ), pandas
#   astype-NaN (scalar UDF), MLlib Tokenizer NPE (HashingTF), null-text
#   sampler contract, null-lang group verdict, engine null-semantics
#   (concat/array_to_string/list indexing), null-payload multimodal
_SUBSET = [
    "q_sim_topk",
    "q_embed_quantize",
    "q_udf_scalar",
    "q_udaf",
    "q_text_hashing_tf_delta",
    "q_sample_token_budget",
    "q_agg_topk_sketch_delta",
    "q_fn_string",
    "q_fn_url",
    "q_text_winnow",
    "q_multimodal_features",
    "q_dedup_incremental",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hostile") / "sf0.01")
    subprocess.run(
        [sys.executable, "tools/make_hostile.py", "/root/testdata/sf0.01", out],
        check=True, cwd="/root/repo",
    )
    return out


def test_hostile_subset_matches_oracle(hostile_dir):
    """The representative subset must pass the exact driver-style compare
    (row count + sorted-column value multiset vs DuckDB) on the hostile
    fixture. A red here means a null/corrupt-input contract regressed to
    undefined or engine-divergent."""
    res = subprocess.run(
        [sys.executable, "tools/check_oracle.py", hostile_dir, *_SUBSET],
        capture_output=True, text=True, cwd="/root/repo", timeout=1200,
    )
    tail = "\n".join(res.stdout.splitlines()[-40:])
    assert res.returncode == 0, f"hostile subset failed:\n{tail}\n{res.stderr[-2000:]}"
