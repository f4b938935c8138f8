"""ANN recall on a CLUSTERED embedding corpus (VERDICT r6 task 2).

The synthetic `/root/testdata` embeddings are near-uniform on the
sphere, which is the regime where IVF cell pruning is weakest (every
cell is equidistant, so recall needs n_probe ~ n_cells) and where PQ
residual encoding cannot gain (residuals look like the originals).
This probe builds a deterministic mixture-of-Gaussians corpus — the
shape real sentence/doc embeddings have — and measures what the
SCALE.md r6 table could only argue:

* IVF recall@10 vs n_probe at n_clusters=32: recall should hold at
  n_probe << n_cells (the pruning claim).
* PQ-ADC vs residual-IVFPQ recall at the same code budget: residual
  encoding should show a NONZERO gain (r6 measured zero on uniform).

Ground truth is the exact JVM-side cosine top-k over the same corpus.

Usage: python scripts/ann_clustered_probe.py [n_vectors] [n_mixture]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from olap_xtrctr_spark import get_spark
from olap_xtrctr_spark.operators import similarity as S

N_VECTORS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
N_MIXTURE = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM = 64
SEED = 20260814
SCRATCH = "/tmp/ann_clustered_probe"


def build_clustered(spark):
    """Mixture of N_MIXTURE anisotropic Gaussians, deterministic seed.

    Anisotropy: each cluster's noise scale varies per dimension
    (drawn once per cluster), so clusters are ellipsoids of different
    orientation-free widths — enough to stop PQ subspace codebooks
    from being trivially shared across clusters."""
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0.0, 1.0, size=(N_MIXTURE, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    scales = rng.uniform(0.02, 0.15, size=(N_MIXTURE, DIM))
    assign = rng.integers(0, N_MIXTURE, size=N_VECTORS)
    noise = rng.normal(0.0, 1.0, size=(N_VECTORS, DIM))
    vecs = centers[assign] + noise * scales[assign]
    rows = [(int(i), [float(x) for x in vecs[i]], int(assign[i]))
            for i in range(N_VECTORS)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, "
                                     "label int")
    dst = os.path.join(SCRATCH, "embeddings.parquet")
    df.repartition(32).write.mode("overwrite").parquet(dst)
    return dst


def topk_map(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return out


def recall_at_k(exact, approx, k):
    hits = tot = 0
    for q, nbrs in exact.items():
        truth = set(nbrs[:k])
        tot += len(truth)
        hits += len(truth & set(approx.get(q, [])[:k]))
    return hits / tot


def main() -> None:
    spark = get_spark("ann-clustered-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dst = build_clustered(spark)
    emb = spark.read.parquet(dst).cache()
    n = emb.count()
    print(f"# corpus: {n} vectors, {N_MIXTURE} mixture components, "
          f"dim={DIM}, seed={SEED}")

    qids = list(range(0, N_VECTORS, N_VECTORS // 50))[:50]
    K = 10
    t0 = time.time()
    exact = topk_map(S.cosine_topk(emb, qids, k=K).collect())
    print(f"exact cosine top-{K} ground truth: {time.time() - t0:.1f}s")

    print(f"\n{'n_probe':>8} {'frac_cells':>10} {'recall@10':>10} "
          f"{'s':>6}   (IVF, n_clusters={N_MIXTURE})")
    for n_probe in (1, 2, 3, 5, 8):
        t0 = time.time()
        approx = topk_map(S.ivf_cosine_topk(
            emb, qids, k=K, n_clusters=N_MIXTURE,
            n_probe=n_probe).collect())
        dt = time.time() - t0
        r = recall_at_k(exact, approx, K)
        print(f"{n_probe:>8} {n_probe / N_MIXTURE:>10.2f} {r:>10.3f} "
              f"{dt:>6.1f}")

    print("\nPQ vs residual-IVFPQ at the same code budget (recall@3):")
    exact3 = {q: v[:3] for q, v in exact.items()}
    t0 = time.time()
    pq = topk_map(S.pq_cosine_topk(emb, qids, k=3).collect())
    t_pq = time.time() - t0
    r_pq = recall_at_k(exact3, pq, 3)
    t0 = time.time()
    ivfpq = topk_map(S.ivfpq_cosine_topk(
        emb, qids, k=3, n_clusters=N_MIXTURE, n_probe=5).collect())
    t_ivfpq = time.time() - t0
    r_ivfpq = recall_at_k(exact3, ivfpq, 3)
    print(f"  pq_topk    (global codebooks): recall@3={r_pq:.3f} "
          f"({t_pq:.1f}s)")
    print(f"  ivfpq_topk (residual, n_probe=5/{N_MIXTURE}): "
          f"recall@3={r_ivfpq:.3f} ({t_ivfpq:.1f}s)")
    print(f"  residual gain: {r_ivfpq - r_pq:+.3f}")


if __name__ == "__main__":
    main()
