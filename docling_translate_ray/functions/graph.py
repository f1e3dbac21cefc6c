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


def anchor_text_agg(edges_ds, dst_column: str = "dst",
                    anchor_column: str = "anchor", num_partitions: int = 32):
    """Per-target anchor-text aggregation — the web-graph text signal
    search/quality pipelines keep per url (how often a page is linked,
    with how many distinct anchor phrases, and which phrase dominates).

    Input: edge rows ``(dst, anchor)``.  Output per dst:
    ``(dst, n_inlinks, n_unique_anchors, top_anchor)`` with
    ``top_anchor`` = the most frequent anchor, ties broken by the
    lexicographically smallest — a pure function of the edge multiset.

    ONE exchange: the per-batch combiner collapses duplicate
    ``(dst, anchor)`` pairs to partial counts, the exchange partitions by
    ``dst`` ALONE (all anchors of a target co-locate — the word_commonness
    trick), and the final pass does totals + distinct + argmax in one
    vectorized polars window.  A hot page (site-wide footer link) costs
    its partition ≤ ``num_blocks × distinct-anchors`` combiner rows,
    never its raw in-degree.
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def partial(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch.select([dst_column, anchor_column]))
            .group_by([dst_column, anchor_column])
            .agg(pl.len().cast(pl.Int64).alias("_cnt"))
            .to_arrow()
        )

    def final(part: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(part)
            .group_by([dst_column, anchor_column])
            .agg(pl.col("_cnt").sum().alias("_cnt"))
        )
        return (
            df.sort([dst_column, "_cnt", anchor_column],
                    descending=[False, True, False])
            .group_by(dst_column, maintain_order=True)
            .agg(
                pl.col("_cnt").sum().alias("n_inlinks"),
                pl.len().cast(pl.Int64).alias("n_unique_anchors"),
                pl.col(anchor_column).first().alias("top_anchor"),
            )
            .to_arrow()
        )

    return hash_partition_apply(
        edges_ds.map_batches(partial, batch_format="pyarrow"),
        [dst_column], final, num_partitions=num_partitions,
    )


# --------------------------------------------------------------- link extract

import re as _re

_LINK_RE = _re.compile(
    r"<a\b[^>]*?href\s*=\s*(?:\"([^\"]*)\"|'([^']*)')[^>]*>(.*?)</a>",
    _re.IGNORECASE | _re.DOTALL,
)
_TAG_RE = _re.compile(r"<[^>]*>")
_WS_RE = _re.compile(r"\s+")
_SCHEME_RE = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_ORIGIN_RE = _re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)")


def link_reciprocity(edges_ds, src_column: str = "src_host",
                     dst_column: str = "dst_host",
                     num_partitions: int = 32):
    """Per-host link-reciprocity — the classic link-farm / link-exchange
    spam signal (TrustRank-family heuristics: organic sites link out far
    more than they are linked back by the same peers; a host whose
    out-links are mostly reciprocated is trading links).

    Input: host-level edge rows ``(src_host, dst_host)`` (duplicates
    fine — uniqueness is enforced inside the exchange).  Output per
    host: ``(host, n_out, n_recip, recip_pct)`` where ``n_out`` counts
    DISTINCT out-neighbours (self-loops dropped), ``n_recip`` counts
    those that link back, ``recip_pct = 100 * n_recip // n_out``.

    Scale shape (single consumption chain — the mirror_hosts lesson):
    per-batch map canonicalizes each edge to ``(lo, hi, dir)`` with a
    local-unique combiner → ONE pair-keyed exchange whose block
    dedups globally (pairs co-located) and emits per-endpoint partial
    rows ``(host, out=1, recip=both_directions)`` per present
    direction → ONE host-keyed grouped_sum merge.  Two narrow
    exchanges total; no dataset consumed twice.
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import (
        grouped_sum,
        hash_partition_apply,
    )

    _EDGE = pa.schema([("lo", pa.string()), ("hi", pa.string()),
                       ("fwd", pa.int8())])

    def canon(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch.select([src_column, dst_column]))
            .rename({src_column: "s", dst_column: "d"})
            .drop_nulls()
            .filter(pl.col("s") != pl.col("d"))
            .select(
                pl.min_horizontal("s", "d").alias("lo"),
                pl.max_horizontal("s", "d").alias("hi"),
                (pl.col("s") < pl.col("d")).cast(pl.Int8).alias("fwd"),
            )
            .unique(keep="any")
        )
        return df.to_arrow().cast(_EDGE)

    _PARTIAL = pa.schema([("host", pa.string()), ("n_out", pa.int64()),
                          ("n_recip", pa.int64())])

    def pair_block(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part).unique(keep="any")  # global (co-located)
        per_pair = (
            df.group_by(["lo", "hi"])
            .agg(pl.col("fwd").max().alias("has_fwd"),
                 (1 - pl.col("fwd").min()).alias("has_bwd"))
            .with_columns(
                (pl.col("has_fwd") * pl.col("has_bwd"))
                .cast(pl.Int64).alias("recip"))
        )
        fwd = per_pair.filter(pl.col("has_fwd") == 1).select(
            pl.col("lo").alias("host"), pl.lit(1, dtype=pl.Int64)
            .alias("n_out"), pl.col("recip").alias("n_recip"))
        bwd = per_pair.filter(pl.col("has_bwd") == 1).select(
            pl.col("hi").alias("host"), pl.lit(1, dtype=pl.Int64)
            .alias("n_out"), pl.col("recip").alias("n_recip"))
        return pl.concat([fwd, bwd]).to_arrow().cast(_PARTIAL)

    partials = hash_partition_apply(
        edges_ds.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], pair_block,
        num_partitions=num_partitions, label="pair:reciprocity")

    merged = grouped_sum(
        partials, ["host"],
        [pl.col("n_out").sum().alias("_o"),
         pl.col("n_recip").sum().alias("_r")],
        {"n_out": "_o", "n_recip": "_r"},
        num_partitions=num_partitions)

    def pct(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            (100 * pl.col("n_recip") // pl.col("n_out")).alias("recip_pct"))
        return df.rename({"host": "host"}).to_arrow().cast(pa.schema([
            ("host", pa.string()), ("n_out", pa.int64()),
            ("n_recip", pa.int64()), ("recip_pct", pa.int64())]))

    return merged.map_batches(pct, batch_format="pyarrow")


def resolve_href(base_url: str, href: str) -> str | None:
    """Fetchable absolute URL for ``href`` found on ``base_url``, or
    ``None`` when the link is not a crawl edge.  The documented subset
    of RFC 3986 resolution (no dot-segment normalization — crawl-graph
    edges don't need it and the oracle mirrors the rules as strings):

    * fragment stripped; a pure-fragment link is not an edge
    * absolute ``http(s)://`` kept; any other scheme (mailto, javascript,
      data, ...) skipped
    * ``//host/...`` → base scheme
    * ``/path`` → base origin
    * relative path → base directory (base up to its last ``/`` past the
      authority); skipped when the base itself has no ``scheme://``
    """
    href = (href or "").split("#", 1)[0]
    if not href:
        return None
    if href.startswith("//"):
        m = _ORIGIN_RE.match(base_url or "")
        if not m:
            return None
        return base_url.split("://", 1)[0] + ":" + href
    if _SCHEME_RE.match(href):
        return href if href.startswith(("http://", "https://")) else None
    m = _ORIGIN_RE.match(base_url or "")
    if not m:
        return None
    if href.startswith("/"):
        return m.group(1) + href
    path = base_url[len(m.group(1)):].split("?", 1)[0]
    base_dir = path[: path.rfind("/") + 1] if "/" in path else "/"
    return m.group(1) + base_dir + href


def extract_links_batch(batch: pa.Table, url_column: str = "url",
                        html_column: str = "html") -> pa.Table:
    """Explode each page's ``<a href>`` links into rows ``(url, link,
    anchor, pos)`` — the crawl-graph ingest step that feeds
    :func:`anchor_text_agg` / :func:`pagerank_int` from raw pages.

    ``pos`` is the 1-based ordinal among the page's KEPT links (document
    order — link position is a ranking feature).  ``anchor`` is the
    inner text with tags stripped and whitespace collapsed.  Accepts a
    string or binary html column (binary decodes utf-8/replace; in the
    extraction DAG this runs post-decode).  Per-row compiled-regex scan
    — the parser-kernel family (cf. extract_core), not a relational op;
    there is no shuffle here at all.
    """
    urls_out: list[str] = []
    links_out: list[str] = []
    anchors_out: list[str] = []
    pos_out: list[int] = []
    for url, html in zip(batch[url_column].to_pylist(),
                         batch[html_column].to_pylist()):
        if html is None:
            continue
        if isinstance(html, (bytes, bytearray)):
            html = bytes(html).decode("utf-8", errors="replace")
        pos = 0
        for m in _LINK_RE.finditer(html):
            href = m.group(1) if m.group(1) is not None else m.group(2)
            link = resolve_href(url or "", href)
            if link is None:
                continue
            pos += 1
            urls_out.append(url or "")
            links_out.append(link)
            anchors_out.append(
                _WS_RE.sub(" ", _TAG_RE.sub("", m.group(3))).strip())
            pos_out.append(pos)
    return pa.table({
        "url": pa.array(urls_out, pa.string()),
        "link": pa.array(links_out, pa.string()),
        "anchor": pa.array(anchors_out, pa.string()),
        "pos": pa.array(pos_out, pa.int64()),
    })


def host_components(edges_ds, src_column: str = "src_host",
                    dst_column: str = "dst_host",
                    num_partitions: int = 16,
                    single_block_threshold: int = 2_000_000):
    """Connected components of the host link graph: label every host
    with the LEXICOGRAPHICALLY SMALLEST host string in its component —
    the canonical "site group" id web pipelines key mirror detection,
    per-site quotas and crawl budgets on (hosts that interlink heavily
    behave as one site even across domains).

    Physical shape (no driver iteration anywhere):

    1. edges dedup to narrow ``(id_a, id_b)`` int64 pairs (``id`` =
       64-bit hash of the host string — a collision can only MERGE two
       components, never split one; at 2^32 hosts the birthday risk is
       the standard 64-bit one and the canonical label is still a real
       member host);
    2. :func:`~docling_translate_ray.functions.dedup.connected_components`
       does the closure (single-task union-find under the pair budget,
       distributed min-label propagation above — the same two physical
       paths as near-dup clustering);
    3. the component's min host STRING is a combiner-first grouped min
       keyed on the canonical id, broadcast-or-exchange joined back —
       so the string canonicalization costs one component-sized
       exchange, not an edge-sized one.

    Returns ``(host, component_host)`` with one row per distinct host.
    """
    import polars as pl

    from docling_translate_ray.functions.dedup import connected_components
    from docling_translate_ray.stages.shuffle import (
        broadcast_join,
        distinct,
        hash_partition_apply,
    )

    def _hash_expr(col: str, alias: str):
        return (pl.col(col).hash(seed=0)
                .reinterpret(signed=True).alias(alias))

    def to_pairs(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([src_column, dst_column]))
        return (df.with_columns(_hash_expr(src_column, "id_a"),
                                _hash_expr(dst_column, "id_b"))
                .select(["id_a", "id_b"]).to_arrow()
                .cast(pa.schema([("id_a", pa.int64()),
                                 ("id_b", pa.int64())])))

    def to_nodes(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([src_column, dst_column]))
        nodes = pl.concat([
            df.select(pl.col(src_column).alias("host")),
            df.select(pl.col(dst_column).alias("host")),
        ]).unique()
        return (nodes.with_columns(_hash_expr("host", "hid"))
                .to_arrow()
                .cast(pa.schema([("host", pa.string()),
                                 ("hid", pa.int64())])))

    pairs = distinct(
        edges_ds.map_batches(to_pairs, batch_format="pyarrow"),
        ["id_a", "id_b"], num_partitions=num_partitions)
    cc = connected_components(pairs, id_column="hid",
                              num_partitions=num_partitions,
                              single_block_threshold=single_block_threshold)
    nodes = distinct(
        edges_ds.map_batches(to_nodes, batch_format="pyarrow"),
        ["host", "hid"], num_partitions=num_partitions)
    labeled = broadcast_join(nodes, cc, on=["hid"], how="inner",
                             num_partitions=num_partitions)

    def local_min(batch: pa.Table) -> pa.Table:
        return (pl.from_arrow(batch.select(["canonical_id", "host"]))
                .group_by("canonical_id")
                .agg(pl.col("host").min().alias("component_host"))
                .to_arrow()
                .cast(pa.schema([("canonical_id", pa.int64()),
                                 ("component_host", pa.string())])))

    def block_min(part: pa.Table) -> pa.Table:
        return (pl.from_arrow(part)
                .group_by("canonical_id")
                .agg(pl.col("component_host").min())
                .to_arrow()
                .cast(pa.schema([("canonical_id", pa.int64()),
                                 ("component_host", pa.string())])))

    comp_min = hash_partition_apply(
        labeled.map_batches(local_min, batch_format="pyarrow"),
        ["canonical_id"], block_min, num_partitions=num_partitions)
    out_schema = pa.schema([("host", pa.string()),
                            ("component_host", pa.string())])

    def finalize(batch: pa.Table) -> pa.Table:
        return batch.select(["host", "component_host"]).cast(out_schema)

    return broadcast_join(
        labeled, comp_min, on=["canonical_id"], how="inner",
        num_partitions=num_partitions,
    ).map_batches(finalize, batch_format="pyarrow")
