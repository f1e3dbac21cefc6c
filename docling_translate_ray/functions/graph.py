"""Link-graph centrality over the corpus — iterative distributed PageRank.

Web-curation pipelines rank pages by link-graph centrality (Common-Crawl
publishes harmonic/PageRank host ranks and corpus filters consume them);
this module provides the iterative-algorithm representative of that
family, expressed Ray-Data-first: each iteration is

* a constant-fan-out **contribution explode** (every node sends
  ``rank // out_degree`` to its fixed out-neighbours), fully vectorized
  in polars — the out-edges are a deterministic affine function of the
  node id, so no edge table is ever shipped;
* one combiner-first :func:`~docling_translate_ray.stages.shuffle.grouped_sum`
  over ``(dst, contrib)`` — the shuffle carries one partial row per
  (batch, dst), never the raw fan-out.  Each node also emits itself with
  a zero contribution, so the grouped result covers the full node set
  (nodes with no in-links keep the teleport base) and no join back onto
  the node list is needed — ONE exchange per iteration.

All arithmetic is scaled-integer (rank in millionths, floor division),
so the DuckDB oracle's unrolled iterations hash-compare exactly — a
float damping multiply would drift in the last ulp between engines.

Scale notes: the per-iteration lineage is two exchanges; for many
iterations at 100 TB you would checkpoint ranks to partitioned parquet
every few rounds (as ``pipelines/extract.run_extract_job`` does between
phases) instead of growing one lazy plan.  A real crawl graph replaces
the affine out-edge rule with an edge table pre-hash-partitioned by
``src`` once and re-used every iteration.
"""

from __future__ import annotations

import pyarrow as pa

from docling_translate_ray.stages.shuffle import grouped_sum

# fixed out-edge rule: node i links to (i*m + a) % n for each (m, a)
DEFAULT_EDGES = ((7, 1), (13, 5), (31, 11))


def pagerank_int(
    ds,
    id_column: str = "doc_id",
    iterations: int = 3,
    edges=DEFAULT_EDGES,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    num_partitions: int = 32,
):
    """Integer-exact PageRank over the affine link graph.

    ``rank_0 = scale``;
    ``rank_{t+1} = base + damping_pct * (Σ in-contribs) // 100`` with
    ``contrib = rank_t // out_degree`` and
    ``base = (100 - damping_pct) * scale // 100``.

    Output: ``(id_column, pr:int64)`` — rank in units of ``scale``-ths.
    """
    import polars as pl

    nodes = ds.select_columns([id_column])
    n = nodes.count()
    d = len(edges)
    base = (100 - damping_pct) * scale // 100

    def init(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pr", pa.array([scale] * batch.num_rows, pa.int64())
        )

    ranks = nodes.map_batches(init, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        parts = [
            df.select(
                ((pl.col(id_column) * m + a) % n).alias("_dst"),
                (pl.col("pr") // d).alias("_c"),
            )
            for (m, a) in edges
        ]
        # zero self-row keeps every node in the grouped result, so no
        # join back onto the node list is needed afterwards
        parts.append(
            df.select(
                pl.col(id_column).alias("_dst"),
                pl.lit(0, dtype=pl.Int64).alias("_c"),
            )
        )
        return pl.concat(parts).to_arrow()

    def apply_damping(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            pl.col("_dst").alias(id_column),
            (base + damping_pct * pl.col("s") // 100).cast(pl.Int64).alias("pr"),
        ).to_arrow()

    for _ in range(iterations):
        ranks = grouped_sum(
            ranks.map_batches(explode, batch_format="pyarrow"),
            ["_dst"],
            [pl.col("_c").sum().alias("_c")],
            {"s": "_c"},
            num_partitions=num_partitions,
        ).map_batches(apply_damping, batch_format="pyarrow")
    return ranks
