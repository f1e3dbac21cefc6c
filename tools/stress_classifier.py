"""Corpus-scale stress of the trained NB-analog classifier
(functions/classifier.py): extract 960k pages, then train on a 50%
split and score the held-out half, recording the three phase walls —
feature explode + persist (the only text-reading pass), the
bucket-keyed train aggregation (≤ 256-row exchange per block), and the
broadcast-join score pass — plus peak object-store usage.

The stress label is deliberately unlearnable noise (``doc_id % 19``) —
walls and exchange shapes are the point here; learnability and exact
integer parity are pinned by tests/test_classifier.py and the
``nb_classifier`` driver oracle.

Usage: python tools/stress_classifier.py [n_pages] [num_cpus]
Owns its Ray session. Results go to stdout as one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from stress_curate import PlasmaPeak  # noqa: E402
from stress_incremental import ensure_unique_corpus  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

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

    from docling_translate_ray.functions.classifier import (_ExplodeLabeled,
                                                            nb_train)
    from docling_translate_ray.pipelines.extract import run_extract_job
    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.util import auto_pool_size

    pages = ensure_unique_corpus(n_pages)
    work = f"/tmp/dtr_stress_nb_{n_pages}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    mon = PlasmaPeak()
    mon.start()

    t0 = time.perf_counter()
    res = run_extract_job(pages, os.path.join(work, "extract"),
                          layout="shard", resume=False)
    t_extract = time.perf_counter() - t0

    def docs_view(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url", "extracted_text"]))
        return (
            df.with_columns(pl.col("url").hash(7).reinterpret(signed=True)
                            .alias("doc_id"))
            .rename({"extracted_text": "text"})
            .with_columns((pl.col("doc_id") % 19 == 0).alias("label"),
                          (pl.col("doc_id") % 2 == 0).alias("is_train"))
            .select(["doc_id", "text", "label", "is_train"])
            .to_arrow()
        )

    docs = ray.data.read_parquet(
        os.path.join(work, "extract", "docs"),
        columns=["url", "extracted_text"],
    ).map_batches(docs_view, batch_format="pyarrow")

    # phase 1: tokenize → md5[:2] buckets → narrow feature parquet
    # (the one pass that reads text; everything after is ints)
    scratch = os.path.join(work, "feats")
    t1 = time.perf_counter()
    feats = docs.map_batches(
        _ExplodeLabeled, batch_format="pyarrow",
        fn_constructor_args=("doc_id", "text", "label", "is_train", 2),
        concurrency=auto_pool_size(),
    )
    feats.write_parquet(scratch)
    t_explode = time.perf_counter() - t1
    feats = ray.data.read_parquet(scratch)
    n_feat_rows = feats.count()

    # phase 2: train counts (≤ 256-row exchange per block)
    t2 = time.perf_counter()
    weights_df, (def_pos, def_neg) = nb_train(feats)
    t_train = time.perf_counter() - t2

    # phase 3: score the held-out half (broadcast ≤ 256-row join, one
    # doc-keyed exchange of 4 ints per doc)
    import polars as pl

    def weigh(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch)
            .filter(~pl.col("is_train"))
            .join(weights_df, on="bucket", how="left")
            .with_columns(pl.col("s_pos").fill_null(def_pos),
                          pl.col("s_neg").fill_null(def_neg))
        )
        return (
            df.with_columns((pl.col("cnt") * pl.col("s_pos")).alias("_sp"),
                            (pl.col("cnt") * pl.col("s_neg")).alias("_sn"))
            .select(["doc_id", "cnt", "cnt_pos", "_sp", "_sn"])
            .to_arrow()
        )

    t3 = time.perf_counter()
    scored = grouped_sum(
        feats.map_batches(weigh, batch_format="pyarrow"),
        ["doc_id"],
        [pl.col("cnt").sum().alias("_n"),
         pl.col("cnt_pos").sum().alias("_np"),
         pl.col("_sp").sum().alias("_p"),
         pl.col("_sn").sum().alias("_g")],
        {"n_tokens": "_n", "n_pos_tok": "_np",
         "score_pos": "_p", "score_neg": "_g"},
        num_partitions=32,
    )
    n_scored = n_right = 0
    for b in scored.iter_batches(batch_format="pyarrow", batch_size=8192):
        df = pl.from_arrow(b)
        n_scored += df.height
        n_right += df.filter(
            (pl.col("score_pos") > pl.col("score_neg"))
            == (pl.col("n_pos_tok") > 0)).height
    t_score = time.perf_counter() - t3

    mon.stop()
    mon.join()

    total = t_extract + t_explode + t_train + t_score
    print(json.dumps({
        "n_pages": n_pages, "num_cpus": cpus,
        "extract_sec": round(t_extract, 1),
        "explode_persist_sec": round(t_explode, 1),
        "train_sec": round(t_train, 1),
        "score_sec": round(t_score, 1),
        "total_sec": round(total, 1),
        "doc_count": res["doc_count"],
        "n_feature_rows": n_feat_rows,
        "n_buckets": weights_df.height,
        "n_scored": n_scored,
        "noise_label_accuracy": round(n_right / max(n_scored, 1), 3),
        "docs_per_sec_classify_only": round(
            res["doc_count"] / (t_explode + t_train + t_score), 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))


if __name__ == "__main__":
    main()
