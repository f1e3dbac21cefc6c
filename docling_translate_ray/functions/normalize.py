"""Unicode text normalization — the pre-hash cleanup pass of a web
curation recipe (CCNet/Dolma-style): strip C0/DEL control characters
(tabs/newlines survive), NFC-compose, collapse space runs, trim edge
spaces.  Running it BEFORE any hash-keyed dedup stage makes visually
identical pages (decomposed vs composed accents, stray control bytes
from broken decoders, double-spaced boilerplate) hash equal instead of
escaping every exact/near-dup family.

Engine parity (the oracle story): polars ``str.normalize("NFC")``
matches DuckDB ``nfc_normalize`` codepoint-for-codepoint — audited over
EVERY assigned codepoint plus base×combining pairs and Hangul jamo
composition, zero divergences (hotspots pinned as a regression test);
pyarrow's ``utf8_normalize`` is a no-op in this build (measured, not
assumed), and the two regex steps stay inside ASCII classes where
RE2/rust-regex/DuckDB agree byte-for-byte.  Adversarial fixtures (combining accents,
NBSP, half-width forms, C0 bytes) are pinned in
``tests/test_normalize.py``.

Scale shape: pure per-batch ``map_batches`` — no exchange, no state, no
driver participation; the 100 TB cost is one streaming pass.
"""

from __future__ import annotations

import pyarrow as pa

# C0 controls minus \t (09) / \n (0A) / \r (0D), plus DEL — the bytes a
# broken decode ladder leaves behind; ASCII-only so every regex engine
# involved agrees on the class
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_expr(column: str):
    """The polars expression for the full normalize chain
    (control-strip → NFC → space-run collapse → edge-space trim).

    Control-strip runs BEFORE NFC on purpose: a C0 byte between a base
    char and its combining mark blocks composition, so NFC-first is not
    idempotent (found by the fuzz test — ``N \\x7f \\u0301`` composes to
    ``Ń`` only on a second pass).  NFC never *produces* control chars or
    spaces, so this order is a fixpoint after one application."""
    import polars as pl

    return (
        pl.col(column)
        .str.replace_all(CONTROL_CLASS, "")
        .str.normalize("NFC")
        .str.replace_all(r" {2,}", " ")
        .str.strip_chars(" ")
    )


def normalize_docs(ds, column: str = "text", id_column: str = "doc_id"):
    """Return ``(id_column, text_norm, changed)`` for every row:
    ``text_norm`` is the normalized text, ``changed`` is null-safe
    inequality vs the input (SQL ``IS DISTINCT FROM``)."""

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch.select([id_column, column]))
            .with_columns(normalize_expr(column).alias("text_norm"))
            .with_columns(
                pl.col("text_norm").ne_missing(pl.col(column)).alias("changed"))
            .select([id_column, "text_norm", "changed"])
            .to_arrow()
        )
        return out.cast(pa.schema([
            (id_column, batch.schema.field(id_column).type),
            ("text_norm", pa.string()),
            ("changed", pa.bool_()),
        ]))

    return ds.map_batches(fn, batch_format="pyarrow")
