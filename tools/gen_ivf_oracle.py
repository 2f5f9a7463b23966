"""Generate a literal-VALUES DuckDB oracle for the llm_ivf_topk gate query.

Independent numpy reimplementation of the IVF spec (same algorithm
parameters as llmops.similarity.ivf_build/ivf_topk: seed-42 k-means on
the full sf0.01 sample, 8 clusters, 10 Lloyd iterations, nprobe=4,
query = vec_id 0, top-10 cosine) — no Spark involved, so it is a true
cross-check of the Spark path rather than a snapshot of its output.

Deterministic: fixed seed, fixed data (the driver's correctness gate
always runs at sf0.01). Usage:

    python tools/gen_ivf_oracle.py [sf_dir]   # prints the SQL
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np


def ivf_topk_oracle(sf_dir: str, n_clusters: int = 8, iters: int = 10,
                    nprobe: int = 4, k: int = 10) -> list[tuple[int, float]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype="int64")
    X = np.array([r[1] for r in rows], dtype="float64")

    q = X[ids == 0][0]
    mask = ids != 0
    ids, X = ids[mask], X[mask]

    rng = np.random.RandomState(42)
    cents = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        for c in range(len(cents)):
            pts = X[lab == c]
            if len(pts):
                cents[c] = pts.mean(0)

    # final assignment via the same expanded form the Spark expression uses
    # (||v||^2 - 2 v.c + ||c||^2), strict first-wins argmin
    d2 = (X * X).sum(1)[:, None] - 2 * X @ cents.T + (cents * cents).sum(1)[None, :]
    lab = d2.argmin(1)

    probe = (((cents - q) ** 2).sum(1)).argsort()[:nprobe]
    sel = np.isin(lab, probe)
    cand_ids, cand = ids[sel], X[sel]
    cos = cand @ q / (np.linalg.norm(cand, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(cand_ids)), key=lambda i: (-cos[i], cand_ids[i]))[:k]
    return [(int(cand_ids[i]), round(float(cos[i]), 6)) for i in order]


def to_sql(rows: list[tuple[int, float]]) -> str:
    vals = ", ".join(f"({i}, {c})" for i, c in rows)
    return (
        "SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cosine AS DOUBLE) AS cosine "
        f"FROM (VALUES {vals}) AS t(vec_id, cosine)"
    )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    print(to_sql(ivf_topk_oracle(sf_dir)))
