"""docling_translate_ray — a Ray-Data-native document/main-content extraction
engine with the query & data-processing capabilities of
``gyunggyung/docling-translate`` (reference read-only at /root/reference),
re-expressed as streaming Dataset pipelines over zero-copy Arrow batches.

Never calls ``ray.init`` — callers (bench.py, CLI, test fixtures, the graft
driver) own the Ray session.
"""

__version__ = "0.1.0"
