#!/usr/bin/env python
"""Generate an sf1-scale probe dataset (10x the bench's sf0.1) for the
quadratic-risk scale probe (BASELINE.md "Round-9 sf1 scale probe").

The driver only ships sf{0.001,0.01,0.1}; the 2x perf contract is
therefore only ever tested at sf0.1. This writes a 10x dataset whose
DISTRIBUTIONS match the driver generator's observables at sf0.1
(measured 2026-08-15, seed-42 data):

- documents: 10x rows (50k), same 31-word vocabulary (fixed domain —
  sf0.01 and sf0.1 both show exactly 31 words), uniform word draw,
  length ~ U[10,100], 5 langs / 20 sources at the observed proportions,
  exact-duplicate copies injected at the observed ~0.16% rate.
- embeddings: 10x rows (20k), 64-dim UNIT-NORM gaussian vectors
  (sf0.1's per-label centers have norm ≈0.07 with within-distance
  ≈1.0 — i.e. labels are NOT geometric clusters), labels uniform 0-9.
- events: 10x rows (1M), same one-month span at 10x density, 10x the
  user domain (15k), 5 uniform event types, value ~ Exp(mean 50),
  props {"k": U[0,99]}.
- part: 10x rows (200k), SAME fixed name/brand/type domains (the
  domain does not grow sf0.01→sf0.1, so a true sf1 keeps it) — this
  makes d22/d23's blocking groups 10x deeper, which is exactly the
  stress the frequency caps exist to absorb.

Only the four tables the probe rows read are generated. Output dir is
NOT the driver's testdata (read-only); default /tmp/rtdw_sf1_probe.

    python tools/gen_sf1_probe.py [outdir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42


def _observed_doc_domains() -> tuple[list[str], list[str], list[float], list[str]]:
    import duckdb

    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) w "
            f"FROM '{SRC}/documents.parquet' ORDER BY w"
        ).fetchall()
    ]
    langs_rows = con.sql(
        f"SELECT lang, COUNT(*) FROM '{SRC}/documents.parquet' "
        "GROUP BY lang ORDER BY lang"
    ).fetchall()
    langs = [r[0] for r in langs_rows]
    tot = sum(r[1] for r in langs_rows)
    lang_p = [r[1] / tot for r in langs_rows]
    sources = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT source FROM '{SRC}/documents.parquet' "
            "ORDER BY source"
        ).fetchall()
    ]
    return vocab, langs, lang_p, sources


def gen_documents(out: str, rng: np.random.Generator, n: int = 50_000) -> None:
    vocab, langs, lang_p, sources = _observed_doc_domains()
    v = np.array(vocab)
    lens = rng.integers(10, 101, size=n)
    texts: list[str] = []
    for L in lens:
        texts.append(" ".join(v[rng.integers(0, len(v), size=L)]))
    # exact-dup injection at the observed sf0.1 rate (8/5000)
    n_dups = int(n * 8 / 5000)
    for i in rng.integers(1, n, size=n_dups):
        texts[int(i)] = texts[int(i) - 1]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                rng.choice(langs, size=n, p=lang_p), pa.string()
            ),
            "source": pa.array(rng.choice(sources, size=n), pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out: str, rng: np.random.Generator, n: int = 20_000) -> None:
    emb = rng.standard_normal((n, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n).astype(np.int32), pa.int32()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def gen_events(out: str, rng: np.random.Generator, n: int = 1_000_000) -> None:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 31 * 24 * 3600 * 1_000_000
    ts = base + np.sort(rng.integers(0, span_us, size=n)).astype(
        "timedelta64[us]"
    )
    types = np.array(["error", "signup", "view", "click", "purchase"])
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, 15_000, size=n), pa.int64()
            ),
            "event_type": pa.array(
                types[rng.integers(0, 5, size=n)], pa.string()
            ),
            "value": pa.array(
                np.round(rng.exponential(50.0, size=n), 2), pa.float64()
            ),
            "props": pa.array(
                [
                    json.dumps({"k": int(k)})
                    for k in rng.integers(0, 100, size=n)
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def gen_part(out: str, rng: np.random.Generator, n: int = 200_000) -> None:
    import duckdb

    con = duckdb.connect()
    names = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT p_name FROM '{SRC}/part.parquet' ORDER BY 1"
        ).fetchall()
    ]
    brands = [f"Brand#{i}" for i in range(25)]
    types = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT p_type FROM '{SRC}/part.parquet' ORDER BY 1"
        ).fetchall()
    ]
    tbl = pa.table(
        {
            "p_partkey": pa.array(np.arange(n), pa.int64()),
            "p_name": pa.array(rng.choice(names, size=n), pa.string()),
            "p_brand": pa.array(rng.choice(brands, size=n), pa.string()),
            "p_type": pa.array(rng.choice(types, size=n), pa.string()),
            "p_size": pa.array(
                rng.integers(1, 51, size=n).astype(np.int32), pa.int32()
            ),
            "p_retailprice": pa.array(
                900.0 + np.arange(n) * 0.1, pa.float64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "part.parquet"))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtdw_sf1_probe"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    gen_documents(out, rng)
    gen_embeddings(out, rng)
    gen_events(out, rng)
    gen_part(out, rng)
    print(f"sf1 probe dataset written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
