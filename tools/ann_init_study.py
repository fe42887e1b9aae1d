"""Coarse-quantizer INIT A/B at probe scale: uniform vs k-means++,
across seeds (r11; follows the single-point probe reading where
k-means++ measured recall 0.74/0.76 vs r10-uniform's 0.80 at 243
cells — is that a real regression or seed noise?).

Runs the EXACT ivfpq math driver-side in numpy (the operators'
UDF bodies are numpy already; Lloyd/k-means++/PQ-train are imported
from the module, routing/encode/ADC replicated line-for-line from
_ivfpq_encode_udf/_pq_adc_pair_udf) over the probe's 1M-vector
parquet, so an init x seed sweep costs seconds per config instead of
a Spark probe run per point.

Prints one JSON line per (init, seed) with recall@10 for ivfpq and
empty/starved-cell counts — the failure mode k-means++ is meant to
cure.

Usage: python tools/ann_init_study.py [emb_parquet]
       (default /root/repo/.scaledata/ann_emb_x500.parquet)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow.dataset as ds

from lingo_db_spark.operators.similarity import (
    _kmeanspp_init,
    _pq_train,
)

STRIDE = 1_000_000
N_CELLS, N_PROBE, M, N_CODES, RERANK, K = 243, 91, 16, 32, 1024, 10


def _lloyd(X, n_cells, seed, init):
    rng = np.random.RandomState(seed)
    if init == "kmeanspp":
        cents = _kmeanspp_init(X, n_cells, rng)
    else:  # the pre-r11 uniform init, reproduced verbatim
        cents = X[rng.choice(len(X), size=min(n_cells, len(X)),
                             replace=False)]
    for _ in range(10):
        assign = (X @ cents.T
                  - 0.5 * (cents * cents).sum(axis=1)).argmax(axis=1)
        for ci in range(len(cents)):
            members = X[assign == ci]
            if len(members):
                cents[ci] = members.mean(axis=0)
    return cents


def main() -> int:
    path = (sys.argv[1] if len(sys.argv) > 1
            else "/root/repo/.scaledata/ann_emb_x500.parquet")
    tbl = ds.dataset(path).to_table(columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    V = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False))
    V = V.astype(float)
    # probe semantics: queries = originals 0..4; their replica families
    # leave the base corpus
    qmask = (ids % STRIDE) < 5
    Q = V[qmask & (ids < 5)]
    base_mask = (ids % STRIDE) >= 5
    B, bids = V[base_mask], ids[base_mask]

    Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # exact truth (cosine == normalized dot)
    truth = []
    for q in Qn:
        s = Bn @ q
        top = np.argsort(-s, kind="stable")
        # deterministic tie-break on id is irrelevant at float precision
        truth.append(set(bids[top[:K]]))

    # training sample: deterministic pseudo-random spread (the probe
    # uses xxhash64(id) order; any fixed id-keyed shuffle serves the
    # same purpose for an init A/B — both arms share it exactly)
    train_n = max(2048, 64 * N_CELLS)
    order = np.random.RandomState(0).permutation(len(Bn))[:train_n]
    X = Bn[order].copy()

    for init in ("uniform", "kmeanspp"):
        for seed in (42, 43, 44):
            cents = _lloyd(X.copy(), N_CELLS, seed, init)
            tr_assign = (X @ cents.T
                         - 0.5 * (cents * cents).sum(axis=1)
                         ).argmax(axis=1)
            sizes = np.bincount(tr_assign, minlength=N_CELLS)
            books = _pq_train(X - cents[tr_assign], M, N_CODES, seed=seed)
            # corpus encode (the _ivfpq_encode_udf math, one pass)
            half_c = 0.5 * (cents * cents).sum(axis=1)
            cell = (Bn @ cents.T - half_c).argmax(axis=1)
            R = Bn - cents[cell]
            sub = Bn.shape[1] // M
            half_b = 0.5 * (books * books).sum(axis=2)
            codes = np.empty((len(Bn), M), dtype=np.int64)
            for s in range(M):
                codes[:, s] = (R[:, s * sub:(s + 1) * sub] @ books[s].T
                               - half_b[s]).argmax(axis=1)
            # query: probe routing + residual ADC + exact re-rank
            lut = np.einsum("qsd,scd->qsc",
                            Qn.reshape(len(Qn), M, sub), books)
            qdotc = Qn @ cents.T
            hits_total = 0
            for qi in range(len(Qn)):
                probe = np.argsort(-(qdotc[qi] - half_c))[:N_PROBE]
                cand = np.flatnonzero(np.isin(cell, probe))
                adc = qdotc[qi, cell[cand]].copy()
                for s in range(M):
                    adc += lut[qi, s, codes[cand, s]]
                top = cand[np.argsort(-adc, kind="stable")[:RERANK]]
                exact = Bn[top] @ Qn[qi]
                final = bids[top[np.argsort(-exact,
                                            kind="stable")[:K]]]
                hits_total += len(set(final) & truth[qi])
            print(json.dumps({
                "init": init, "seed": seed,
                "recall": round(hits_total / (len(Qn) * K), 3),
                "empty_cells": int((sizes == 0).sum()),
                "min_cell": int(sizes.min()),
                "max_cell": int(sizes.max()),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
