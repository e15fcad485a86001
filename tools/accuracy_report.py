"""Generate ACCURACY.md: measured error of every sketch against its exact
oracle, over the reference's distribution sweep.

Usage: python tools/accuracy_report.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ddspark.datasets import DATASET_NAMES, exact_quantile, generate
from ddspark.sketch import Sketch, SketchConfig
from ddspark.sketches.hll import estimate_from_registers
from ddspark.sketches.kll import KLL
from ddspark.sketches.tdigest import TDigest
from ddspark.store import COLLAPSE_HIGHEST, COLLAPSE_LOWEST, DENSE

QUANTILES = [0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 1]
SIZES = [3, 5, 10, 100, 1000]
ALPHA = 0.05

CONFIGS = {
    "dense": SketchConfig(ALPHA, mode=DENSE),
    "collapse_lowest(1024)": SketchConfig(ALPHA, mode=COLLAPSE_LOWEST, bin_limit=1024),
    "collapse_highest(1024)": SketchConfig(ALPHA, mode=COLLAPSE_HIGHEST, bin_limit=1024),
    "linear-mapping": SketchConfig(ALPHA, mapping="linear"),
    "cubic-mapping": SketchConfig(ALPHA, mapping="cubic"),
}


def ddsketch_table() -> list[str]:
    rows = ["| config | max normalized error* | distributions x sizes x quantiles |", "|---|---|---|"]
    for name, cfg in CONFIGS.items():
        worst = -np.inf
        n_checks = 0
        for ds in DATASET_NAMES:
            for size in SIZES:
                values = generate(ds, size)
                sk = Sketch.from_values(values, cfg)
                for q in QUANTILES:
                    est = sk.quantile(q)
                    exact = exact_quantile(values, q)
                    err = abs(est - exact) - ALPHA * abs(exact)
                    worst = max(worst, err)
                    n_checks += 1
        rows.append(f"| {name} | {worst:.2e} | {n_checks} |")
    return rows


def rank_sketch_table() -> list[str]:
    rng = np.random.default_rng(42)
    rows = ["| sketch | dataset | worst rank error (10 quantiles) |", "|---|---|---|"]
    for ds in ["lognormal", "normal", "exponential"]:
        values = np.abs(rng.lognormal(3, 1.5, 100_000)) if ds == "lognormal" else (
            rng.normal(100, 15, 100_000) if ds == "normal" else rng.exponential(5, 100_000)
        )
        s = np.sort(values)
        td = TDigest.from_values(values)
        kl = KLL.from_values(values, k=200)
        for name, sk in [("t-digest(100)", td), ("KLL(200)", kl)]:
            worst = 0.0
            for q in QUANTILES:
                est = sk.quantile(q)
                rank = np.searchsorted(s, est) / len(s)
                worst = max(worst, abs(rank - q))
            rows.append(f"| {name} | {ds} | {worst:.4f} |")
    return rows


def hll_table() -> list[str]:
    rng = np.random.default_rng(7)
    rows = ["| p | m | distinct | estimate | rel err | bound 3*1.04/sqrt(m) |", "|---|---|---|---|---|---|"]
    for p in (10, 12, 14):
        m = 1 << p
        n_distinct = 50_000
        # simulate registers from uniform hashes (same math as the engine)
        h = rng.integers(0, 2**63, size=n_distinct, dtype=np.int64).astype(np.uint64) * 2
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        regs = np.zeros(m, dtype=np.int64)
        for b, r in zip(bucket, rest):
            rank = 64 - p + 1 if r == 0 else min(64 - int(r).bit_length() + 1, 64 - p + 1)
            regs[b] = max(regs[b], rank)
        est = estimate_from_registers(regs)
        rel = abs(est - n_distinct) / n_distinct
        rows.append(
            f"| {p} | {m} | {n_distinct} | {est:.0f} | {rel:.4f} | {3 * 1.04 / np.sqrt(m):.4f} |"
        )
    return rows


def mg_table() -> list[str]:
    """Misra-Gries: measured worst undercount vs the self-certified bound,
    simulating the distributed pipeline (8 partitions, batched adds)."""
    import pandas as pd

    from ddspark.sketches.mgfreq import mg_compress

    rng = np.random.default_rng(23)
    rows = [
        "| k | stream (n=200k) | worst (true - est) | certified bound | all >bound items kept |",
        "|---|---|---|---|---|",
    ]
    for a, label in [(1.3, "zipf(1.3)"), (1.7, "zipf(1.7)")]:
        data = rng.zipf(a, 200_000).clip(max=100_000)
        exact = pd.Series(data).value_counts()
        for k in (64, 256, 1024):
            parts = np.array_split(rng.permutation(data), 8)
            partials = []
            for p in parts:
                counts, err = pd.Series(dtype=np.float64), 0.0
                for i in range(0, len(p), 10_000):
                    batch = pd.Series(p[i : i + 10_000]).value_counts().astype(float)
                    counts = counts.add(batch, fill_value=0.0)
                    counts, e = mg_compress(counts, k)
                    err += e
                partials.append((counts, err))
            merged, bound = pd.Series(dtype=np.float64), 0.0
            for c, e in partials:
                merged = merged.add(c, fill_value=0.0)
                bound += e
            merged, e2 = mg_compress(merged, k)
            bound += e2
            worst = max(
                (exact[it] - est for it, est in merged.items()), default=0.0
            )
            complete = all(
                it in merged.index for it, c in exact.items() if c > bound
            )
            rows.append(
                f"| {k} | {label} | {worst:.0f} | {bound:.0f} | {complete} |"
            )
    return rows


def theta_table() -> list[str]:
    """Theta/KMV: distinct-count and intersection error vs the published
    1/sqrt(k-2) sigma and the Poisson intersection certificate (uniform
    hash model, same math as the engine)."""
    from ddspark.sketches.theta import (
        theta_intersect,
        theta_intersect_bound,
    )

    rng = np.random.default_rng(29)
    rows = [
        "| k | n_a | n_b | overlap | est distinct A (rel err) | est overlap | certified half-width | inside |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for k in (256, 1024, 4096):
        n_a, n_b, ov = 100_000, 60_000, 20_000
        h_shared = rng.random(ov)
        h_a = np.sort(np.concatenate([h_shared, rng.random(n_a - ov)]))
        h_b = np.sort(np.concatenate([h_shared, rng.random(n_b - ov)]))
        ks_a, ta = h_a[:k], float(h_a[k - 1])
        ks_b, tb = h_b[:k], float(h_b[k - 1])
        est_a = (k - 1) / ta
        est_i, nc, theta = theta_intersect(ks_a, ta, ks_b, tb)
        half = theta_intersect_bound(nc, theta)
        rows.append(
            f"| {k} | {n_a} | {n_b} | {ov} | {est_a:.0f} ({abs(est_a-n_a)/n_a:.4f}) "
            f"| {est_i:.0f} | {half:.0f} | {abs(est_i-ov) <= half} |"
        )
    return rows




def lsh_recall_table() -> list[str]:
    """Analytic banded-LSH candidate probability (the S-curve) for the
    default 64-hash/16-band configuration, next to the rule-of-thumb
    operating points.  The measured end-to-end recall of the REAL
    pipeline on a graded-similarity corpus lives in
    tests/test_pipeline.py::test_minhash_lsh_recall_against_exact_jaccard
    (>= 0.9 at exact Jaccard 0.7, zero candidates below 0.3)."""
    rows = [
        "| exact Jaccard j | P(candidate) = 1-(1-j^r)^b  (r=4, b=16) |",
        "|---|---|",
    ]
    for j in (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
        pcand = 1.0 - (1.0 - j**4) ** 16
        rows.append(f"| {j:.1f} | {pcand:.4f} |")
    rows.append(
        "\nThreshold ~= (1/b)^(1/r) = 0.50: below it pairs are mostly"
    )
    rows.append(
        "filtered, above 0.7 recall exceeds 98% analytically; the pytest"
    )
    rows.append("asserts the measured pipeline matches.")
    return rows

def main() -> None:
    out = [
        "# ACCURACY — measured error vs exact oracles\n",
        "Generated by `python tools/accuracy_report.py` (alpha = 0.05, the",
        "reference test configuration; DDSketch bound is the reference's own",
        "assertion `|est - exact| - alpha*|exact| <= 1e-15`).\n",
        "\n## DDSketch (18 distributions x 5 sizes x 10 quantiles)\n",
        "\n*normalized error = `|est - exact| - alpha*|exact|`; negative or",
        "~1e-15 means the bound holds with slack.\n",
    ]
    out.extend(ddsketch_table())
    out.append("\n## Rank sketches (100k values)\n")
    out.extend(rank_sketch_table())
    out.append("\n## HyperLogLog (simulated uniform hashes)\n")
    out.extend(hll_table())
    out.append("\n## Misra-Gries heavy hitters (simulated distributed pipeline)\n")
    out.extend(mg_table())
    out.append("\n## Theta/KMV set algebra (uniform hash model)\n")
    out.extend(theta_table())
    out.append("\n## MinHash-LSH dedup recall (banded S-curve)\n")
    out.extend(lsh_recall_table())
    out.append("")
    with open(os.path.join(REPO, "ACCURACY.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote ACCURACY.md")


if __name__ == "__main__":
    main()
