"""Generate the HOSTILE fixture variant: sf0.01 plus the adversarial rows
the clean fixtures never carry (VERDICT r11 Next #4 — the 29 r11 review
defects shared one root cause: every fixture row is well-formed, so
fail-open classes stayed invisible to the oracle gate for ten rounds).

Copies every table verbatim and APPENDS to ``documents`` / ``embeddings``:

documents (doc_id 9001+):
  - NULL text (with NULL n_chars — the metadata is hostile too)
  - empty text ''
  - whitespace-only text
  - a single-word doc (no bigrams/shingles — the sequence(0,-1) class)
  - tab/newline whitespace and a NUL-free control char
  - a NULL lang (null groupBy keys / null-score groups downstream)
  - a doc_id duplicated text (exact-dup pair against doc 9004)

embeddings (vec_id 9001+):
  - NULL embedding
  - wrong-dimension embedding (2 floats where the corpus is 64)
  - an embedding containing a NULL element
  - the all-zero vector (zero norm: cosine 0/0)
  - an empty array
  - an embedding containing a NaN element (NaN compares greater than any
    double in BOTH engines, so an unguarded ranking would hand the
    poisoned vector rank 1 for every query)

Usage: python tools/make_hostile.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 -> testdata-hostile/sf0.01

Deterministic: same inputs produce byte-identical hostile rows, so
check_oracle runs against it are reproducible round over round.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HOSTILE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (9001, None, "en", "src0", None),
    (9002, "", "en", "src0", 0),
    (9003, "   ", "en", "src0", 3),
    (9004, "solo", "en", "src0", 4),
    (9005, "a\tb\nc  d", "en", "src1", 8),
    (9006, "normal words but null lang", None, "src1", 26),
    (9007, "solo", "de", "src2", 4),  # exact-dup of 9004, other lang
]

HOSTILE_EMB = [
    # (vec_id, embedding, label)
    (9001, None, None),
    (9002, [0.1, 0.2], 0),
    (9003, None, 1),  # placeholder; null element injected below
    (9004, None, 2),  # placeholder; zero vector injected below
    (9005, [], 3),
    (9006, None, 4),  # placeholder; NaN element injected below (NaN
    # compares GREATER than any double — the rank-1-everywhere poison)
]


def _append_rows(src_path: str, dst_path: str, rows: list[tuple]) -> None:
    tab = pq.read_table(src_path)
    cols = {name: tab.column(name).to_pylist() for name in tab.column_names}
    for r in rows:
        for name, v in zip(tab.column_names, r):
            cols[name].append(v)
    out = pa.table(
        {n: pa.array(cols[n], type=tab.schema.field(n).type)
         for n in tab.column_names},
        schema=pa.schema([tab.schema.field(n) for n in tab.column_names]),
    )
    pq.write_table(out, dst_path)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata-hostile", "sf0.01",
    )
    os.makedirs(out, exist_ok=True)
    dim = len(pq.read_table(
        os.path.join(src, "embeddings.parquet")
    ).column("embedding")[0].as_py())
    emb_rows = []
    for vec_id, emb, label in HOSTILE_EMB:
        if vec_id == 9003:
            emb = [0.1] * dim
            emb[dim // 2] = None  # null element mid-vector
        elif vec_id == 9004:
            emb = [0.0] * dim  # zero norm
        elif vec_id == 9006:
            emb = [0.1] * dim
            emb[0] = float("nan")  # NaN element
        emb_rows.append((vec_id, emb, label))
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        s, d = os.path.join(src, name), os.path.join(out, name)
        if name == "documents.parquet":
            _append_rows(s, d, HOSTILE_DOCS)
        elif name == "embeddings.parquet":
            _append_rows(s, d, emb_rows)
        else:
            shutil.copyfile(s, d)
    print(f"hostile fixture written to {out}")


if __name__ == "__main__":
    main()
