"""Corpus-scale stress of the bitext factory composite: n synthetic
multilingual pages (n/3 sites × {en,de,fr}, lang-suffixed word streams
of varying length) through ``pipelines/bitext.run_bitext_job`` —
URL-pattern pair mining → semi-filtered sentencization → Gale-Church
alignment — recording wall time, PEAK object-store usage, and the
marker-resume wall (second run over the same work_dir must skip every
stage).

Confirms the scale claims: the mining exchange carries narrow
(site_key, lang, id) rows only, the corpus text is sentencized ONLY
for docs that actually pair (broadcast-or-exchange semi filter), each
pair's O(n·m) DP is an independent map task (no shuffle after the two
attach joins), and the bead stream is consumed, never collected.

Usage: python tools/stress_bitext.py [n_docs] [num_cpus]
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

_LANGS = ("en", "de", "fr")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
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

    from docling_translate_ray.pipelines.bitext import run_bitext_job

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        doc_id, url, text = [], [], []
        for i in ids:
            site, slot = i // 3, i % 3
            lang = _LANGS[slot]
            n_words = 10 + site % 41 + 2 * slot
            doc_id.append(i)
            url.append(f"https://s{site % 4096}.example/{lang}/a{site}")
            text.append(" ".join(
                f"w{site}x{k}{lang}" for k in range(n_words)))
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "url": pa.array(url, pa.string()),
            "text": pa.array(text, pa.string()),
        })

    corpus_dir = f"/tmp/stress_bitext_corpus_{n_docs}"
    if not os.path.exists(corpus_dir):
        ray.data.range(n_docs).map_batches(
            gen, batch_format="pyarrow").write_parquet(corpus_dir)

    work_dir = f"/tmp/stress_bitext_work_{n_docs}"
    shutil.rmtree(work_dir, ignore_errors=True)

    mon = PlasmaPeak()
    mon.start()

    t0 = time.perf_counter()
    beads, stats = run_bitext_job(
        ray.data.read_parquet(corpus_dir), work_dir=work_dir,
        num_partitions=2 * cpus)
    n_beads = 0
    for b in beads.iter_batches(batch_format="pyarrow", batch_size=8192):
        n_beads += b.num_rows
    wall = time.perf_counter() - t0

    mon.stop()
    mon.join(timeout=5)

    n_sites = n_docs // 3
    assert stats["n_pairs"] == 2 * n_sites, stats
    assert stats["n_docs_paired"] == n_docs, stats
    assert n_beads == stats["n_beads"], (n_beads, stats)

    # marker resume: all three stages must come back from their .done
    # markers (the input is NOT re-read — parity with the pytest poison
    # test, timed here at corpus scale)
    t1 = time.perf_counter()
    _, stats2 = run_bitext_job(
        ray.data.read_parquet(corpus_dir), work_dir=work_dir,
        num_partitions=2 * cpus, resume=True)
    resume_wall = time.perf_counter() - t1
    assert stats2 == stats, (stats, stats2)

    print(json.dumps({
        "metric": "stress_bitext", "n_docs": n_docs, "num_cpus": cpus,
        "wall_sec": round(wall, 1),
        "docs_per_sec": int(n_docs / wall),
        "n_pairs": stats["n_pairs"],
        "n_beads": stats["n_beads"],
        "beads_per_sec": int(stats["n_beads"] / wall),
        "resume_wall_sec": round(resume_wall, 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
