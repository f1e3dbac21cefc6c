"""Dedup QUALITY eval — measure, don't guess: recall of the
MinHash-LSH near-dup pipeline against ground truth, compared with the
theoretical banding S-curve.

Corpus: filler docs (150 tokens over a 5k vocab, rng-per-doc
deterministic) + planted pairs whose second member replaces a
controlled fraction of token positions — sweeping the true 3-shingle
Jaccard through the S-curve's transition band.  Ground truth is the
EXACT shingle Jaccard with the same tokenization the engine uses
(whitespace split, k consecutive tokens, functions/dedup.MinHasher).

For ``num_perm=64, num_bands=16`` (rows r=4): P(candidate) =
1-(1-s^r)^b.  The pipeline's verify stage then keeps only pairs with
exact Jaccard ≥ threshold, so for true-positive pairs (s ≥ t) measured
recall should track the S-curve, and sub-threshold planted pairs must
be rejected by verify regardless of banding luck (precision 1.0 up to
documented transitive closure).

Usage: python tools/eval_neardup.py [n_filler] [pairs_per_level] [num_cpus]
Owns its Ray session.  One JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 5000
DOC_LEN = 150
K = 3
REPLACE_LEVELS = [0.01, 0.02, 0.03, 0.05, 0.08, 0.12, 0.16, 0.22, 0.30,
                  0.40]


def _doc(rng: random.Random) -> list[str]:
    return [f"w{rng.randrange(VOCAB)}" for _ in range(DOC_LEN)]


def _mutate(tokens: list[str], frac: float, rng: random.Random) -> list[str]:
    out = list(tokens)
    for pos in rng.sample(range(len(out)), max(1, int(len(out) * frac))):
        out[pos] = f"m{rng.randrange(VOCAB)}"
    return out


def _jaccard(a: list[str], b: list[str]) -> float:
    sa = {tuple(a[i:i + K]) for i in range(len(a) - K + 1)}
    sb = {tuple(b[i:i + K]) for i in range(len(b) - K + 1)}
    return len(sa & sb) / len(sa | sb)


def main() -> None:
    n_filler = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    per_level = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    num_perm, num_bands = 64, 16
    r = num_perm // num_bands

    ids, texts = [], []
    pairs = []  # (id_a, id_b, true_jaccard)
    next_id = 0
    for li, frac in enumerate(REPLACE_LEVELS):
        for j in range(per_level):
            rng = random.Random(900_000 + li * 10_000 + j)
            a = _doc(rng)
            b = _mutate(a, frac, rng)
            ids += [next_id, next_id + 1]
            texts += [" ".join(a), " ".join(b)]
            pairs.append((next_id, next_id + 1, _jaccard(a, b)))
            next_id += 2
    for j in range(n_filler):
        rng = random.Random(5_000_000 + j)
        ids.append(next_id)
        texts.append(" ".join(_doc(rng)))
        next_id += 1

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                      "worker_process_setup_hook":
                          "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.dedup import minhash_lsh_dedup

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2 * cpus)

    import time

    def run_eval(threshold: float) -> dict:
        t0 = time.perf_counter()
        clusters = minhash_lsh_dedup(ds, threshold=threshold,
                                     num_perm=num_perm,
                                     num_bands=num_bands)
        canon = {}
        for b in clusters.iter_batches(batch_format="pyarrow",
                                       batch_size=8192):
            for d, c in zip(b["doc_id"].to_pylist(),
                            b["canonical_id"].to_pylist()):
                canon[d] = c
        wall = time.perf_counter() - t0

        # bucket planted pairs by true Jaccard; compare to the S-curve
        bins: dict[float, dict] = {}
        sub_detected, sub_total = 0, 0
        for ia, ib, s in pairs:
            detected = (ia in canon and ib in canon
                        and canon[ia] == canon[ib])
            if s < threshold:
                sub_total += 1
                sub_detected += int(detected)
                continue
            key = round(int(s / 0.05) * 0.05, 2)
            st = bins.setdefault(key, {"n": 0, "hit": 0, "s_sum": 0.0})
            st["n"] += 1
            st["hit"] += int(detected)
            st["s_sum"] += s

        curve = []
        for key in sorted(bins):
            st = bins[key]
            s_mean = st["s_sum"] / st["n"]
            theory = 1 - (1 - s_mean ** r) ** num_bands
            curve.append({
                "s_bin": key, "n": st["n"], "s_mean": round(s_mean, 4),
                "recall": round(st["hit"] / st["n"], 4),
                "s_curve": round(theory, 4),
            })

        above = [(ia, ib) for ia, ib, s in pairs if s >= threshold]
        overall = (
            sum(1 for ia, ib in above
                if ia in canon and ib in canon and canon[ia] == canon[ib])
            / max(1, len(above)))
        return {
            "threshold": threshold, "wall_s": round(wall, 2),
            "recall_above_threshold": round(overall, 4),
            "n_above_threshold": len(above),
            "sub_threshold_detected": sub_detected,
            "sub_threshold_total": sub_total,
            "curve": curve,
        }

    print(json.dumps({
        "n_docs": len(ids), "n_pairs": len(pairs),
        "num_perm": num_perm, "num_bands": num_bands, "rows_per_band": r,
        # t=0.7: production setting — recall at/above the verify cutoff
        # plus sub-threshold leakage.  t=0.5: pushes the verify cutoff
        # BELOW the banding S-curve's transition band, so measured
        # recall in s∈[0.5, 0.75] exercises the banding miss rate the
        # theory predicts (the verify stage no longer masks it).
        "evals": [run_eval(0.7), run_eval(0.5)],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
