"""Block-level boilerplate removal — the jusText / Readability /
trafilatura-style main-content extractor every webtext pipeline runs
between raw HTML and quality filtering.

Model: jusText (Pomikálek 2011) reduced to its deterministic core.  A
page is a sequence of BLOCKS (``<p> <li> <nav> <footer> <header>
<aside>``, non-nested — the synthetic corpus and the oracle share this
framing; real-world nesting is a pre-flatten concern).  Per block:

* ``text``  = the block's tag-stripped inner text;
* ``n_words`` = ``\\S+`` count over ``text`` (the repo's lockstep
  tokenizer, @NONWS@ in the SQL oracles);
* ``link_chars`` = total tag-stripped character length of the block's
  ``<a>…</a>`` spans.

A block is BOILERPLATE when any of (integer-exact, no float density):

* its tag is structural chrome (``nav footer header aside``);
* ``n_words < min_words`` (short teasers, "Read more", timestamps);
* ``2·link_chars >= text_chars`` (link density ≥ ½ — menus, tag
  clouds, related-article lists).

``clean_text`` is the ``\\n\\n``-join of the surviving blocks in page
order.  Every input row emits exactly one output row (docs with no
blocks keep ``clean_text=''``) so the operator composes with joins and
lineage counts downstream.

Physical shape: pure per-batch ``map_batches`` — block split, feature
extraction and the keep decision are all vectorized polars regex /
string kernels over an exploded block frame; the per-doc reassembly is
a batch-local group_by (blocks of one page never leave their batch).
No shuffle, no state: the operator scales linearly with pages.

Reference parity note: the reference repo parses curated documents via
docling (reference ``src/core.py``); boilerplate stripping of crawled
HTML is the beyond-reference webtext first mile feeding the same
extract → filter → translate chain.
"""

from __future__ import annotations

import pyarrow as pa

BLOCK_TAGS = ("p", "li", "nav", "footer", "header", "aside")
DROP_TAGS = ("nav", "footer", "header", "aside")

_BLOCK_RE = "(?s)" + "|".join(
    rf"<{t}\b[^>]*>.*?</{t}>" for t in BLOCK_TAGS)
_TAG_RE = r"<[^>]+>"
_A_RE = r"(?s)<a\b[^>]*>.*?</a>"

_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("clean_text", pa.string()),
    ("n_blocks", pa.int64()),
    ("n_kept", pa.int64()),
])


def strip_boilerplate(ds, id_column: str = "doc_id",
                      html_column: str = "html", min_words: int = 5):
    """Return one row per input doc: ``(id_column, clean_text,
    n_blocks, n_kept)`` under the module-docstring block rules.  The
    id column keeps its input type (int doc ids and the input_hint
    pages table's string urls both work); binary html decodes
    utf-8/replace."""

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        narrow = batch.select([id_column, html_column])
        if pa.types.is_binary(narrow.schema.field(html_column).type) or \
                pa.types.is_large_binary(narrow.schema.field(html_column).type):
            # input_hint pages carry html as binary — decode with the
            # lenient ladder tail (utf-8/replace; the extract DAG's full
            # decode ladder runs upstream when charset fidelity matters)
            decoded = pa.array(
                [None if v is None else v.decode("utf-8", errors="replace")
                 for v in narrow[html_column].to_pylist()],
                pa.string())
            narrow = narrow.set_column(
                narrow.schema.get_field_index(html_column), html_column,
                decoded)
        df = (
            pl.from_arrow(narrow)
            .rename({id_column: "_id", html_column: "_h"})
        )
        base = df.select("_id")
        ex = (
            df.with_columns(
                pl.col("_h").fill_null("")
                .str.extract_all(_BLOCK_RE).alias("_b"))
            .drop("_h")
            .explode("_b")
            .drop_nulls("_b")
            .with_columns(
                pl.col("_b").str.extract(r"^<([a-z]+)").alias("_tag"),
                pl.col("_b")
                .str.replace(r"^<[a-z]+[^>]*>", "")
                .str.replace(r"</[a-z]+>$", "")
                .alias("_inner"),
            )
            .with_columns(
                pl.col("_inner").str.replace_all(_TAG_RE, "")
                .alias("_text"))
            .with_columns(
                pl.col("_text").str.len_chars().cast(pl.Int64)
                .alias("_len"),
                pl.col("_text").str.count_matches(r"\S+").cast(pl.Int64)
                .alias("_nw"),
                pl.col("_inner").str.extract_all(_A_RE)
                .list.eval(
                    pl.element().str.replace_all(_TAG_RE, "")
                    .str.len_chars())
                .list.sum().fill_null(0).cast(pl.Int64).alias("_link"),
            )
            .with_columns(
                ((~pl.col("_tag").is_in(list(DROP_TAGS)))
                 & (pl.col("_nw") >= min_words)
                 & (2 * pl.col("_link") < pl.col("_len"))).alias("_keep"))
        )
        stats = ex.group_by("_id").agg(
            pl.len().cast(pl.Int64).alias("n_blocks"),
            pl.col("_keep").cast(pl.Int64).sum().alias("n_kept"),
            pl.col("_text").filter(pl.col("_keep")).str.join("\n\n")
            .alias("clean_text"),
        )
        out = (
            base.join(stats, on="_id", how="left")
            .with_columns(
                pl.col("clean_text").fill_null(""),
                pl.col("n_blocks").fill_null(0),
                pl.col("n_kept").fill_null(0),
            )
            .select(["_id", "clean_text", "n_blocks", "n_kept"])
        )
        schema = pa.schema(
            [pa.field(id_column, batch.schema.field(id_column).type)]
            + list(_OUT_SCHEMA)[1:])
        return out.to_arrow().rename_columns(schema.names).cast(schema)

    return ds.map_batches(fn, batch_format="pyarrow")
