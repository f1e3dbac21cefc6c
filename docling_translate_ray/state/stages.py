"""Stage checkpoints for composite pipelines (curate / mixture).

``run_extract_job`` resumes at bucket/shard granularity; the composite
pipelines chain whole stages through durable parquet, so their resume
unit is the STAGE.  Contract:

* a stage is complete iff its sibling marker ``<stage_dir>.done``
  exists.  The marker is written only AFTER the stage's parquet write
  returns, so a crash mid-write leaves no marker and the rerun rebuilds
  the stage (the visible-only-when-complete family of contracts —
  ``util.compact_partition_dirs`` renames before deleting for the same
  reason).  The marker lives NEXT TO the stage dir, never inside it,
  so dataset readers over the stage dir never see a non-parquet file.
* once any stage rebuilds, every downstream stage rebuilds too (the
  runner turns dirty) — a resumed composite can never mix generations.
* resuming with different parameters is an error, not a silent
  recompute: the runner records the param dict in
  ``<work_dir>/composite_meta.json`` and refuses a mismatch (the same
  guard ``state.checkpoint.check_job_meta`` applies to mixed-mode
  extract resumes).

At 100 TB the payoff is the obvious one: a 7-stage selection composite
that dies in stage 6 re-pays stages 1-5 with parquet-metadata reads,
not recomputation.
"""

from __future__ import annotations

import json
import os
import shutil


class StageRunner:
    """Sequential stage executor with skip-if-complete resume."""

    def __init__(self, work_dir: str, resume: bool = False,
                 params: dict | None = None) -> None:
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        meta_path = os.path.join(work_dir, "composite_meta.json")
        # round-trip through JSON so recorded and compared values share
        # one representation (tuples become lists, ints stay ints)
        params = json.loads(json.dumps(params or {}, sort_keys=True))
        if resume and os.path.exists(meta_path):
            with open(meta_path) as f:
                prev = json.load(f)
            if prev != params:
                raise ValueError(
                    "composite resume with different parameters: "
                    f"checkpoint has {prev}, caller passed {params} — "
                    "use a fresh work_dir (or resume=False) to rebuild")
        else:
            with open(meta_path, "w") as f:
                json.dump(params, f, sort_keys=True)
        self._dirty = not resume

    def stage(self, name: str, build) -> str:
        """Run ``build(stage_dir)`` unless the stage is already complete
        on a clean resume; return the stage dir either way."""
        d = os.path.join(self.work_dir, name)
        marker = d + ".done"
        if not self._dirty and os.path.exists(marker):
            return d
        self._dirty = True
        if os.path.exists(marker):
            os.remove(marker)
        shutil.rmtree(d, ignore_errors=True)
        build(d)
        # durable-marker write: temp + fsync + rename + directory fsync,
        # so a power crash can never journal the marker ahead of the
        # stage data it vouches for (process-kill crashes are safe either
        # way — the marker write is the last step)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, marker)
        dfd = os.open(self.work_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        return d
