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


# ---------------------------------------------------------------------
# Mojibake repair (the CCNet/ftfy encoding-fix slot): web corpora are
# full of UTF-8 text that was once decoded as cp1252/latin-1 and
# re-encoded ("café" → "cafÃ©", "—" → "â€"").  The repair is a FROZEN
# replace table generated from one target list: for each target char,
# the garbled form is its UTF-8 bytes read back through cp1252 with the
# WHATWG fallback (bytes undefined in cp1252 pass through as their
# latin-1/C1 codepoint).  Table-driven repair is the pragmatic
# production recipe — vectorized literal replaces, and the SQL oracle
# replays the SAME table as a nested replace() chain built from the
# SAME constant (no second source of truth).  Known tradeoff (inherent
# to any table repair, documented not hidden): text that legitimately
# contains a garble sequence ("Ã" + "©" meaning itself) is rewritten.
#
# No garble is a substring of another (2-char garbles start at Ã/Â =
# C3/C2 lead bytes; 3-char start at â = E2 with continuation chars from
# the 0x80–0xBF row only).  Some REPLACEMENT chars do occur inside
# other garbles (€ œ â are both targets and cp1252 row chars), so on
# adversarial self-referential input (a garble formed ACROSS a
# replacement boundary, e.g. "ââ‚¬¦") the result depends on chain
# order — the order is therefore FROZEN (longest garble first, then
# lexicographic) and the SQL oracle replays the identical order, so
# the two sides agree on every input; pinned in tests.

MOJIBAKE_TARGETS = (
    "é", "è", "ê", "ë", "á", "à", "â", "ä", "ç", "í", "î", "ï",
    "ñ", "ó", "ô", "ö", "ú", "ü", "ß", "œ",
    "‘", "’", "“", "”",  # ' ' " "
    "–", "—", "…",            # – — …
    "«", "»", "°", "€", "™",
)


def _cp1252_garble(ch: str) -> str:
    """How ``ch`` renders after a UTF-8 → cp1252 mis-decode (WHATWG
    fallback: the five bytes cp1252 leaves undefined pass through as
    their C1 controls, exactly what lenient web decoders do)."""
    out = []
    for b in ch.encode("utf-8"):
        if b < 0x80:
            out.append(chr(b))
        else:
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
    return "".join(out)


MOJIBAKE_TABLE = tuple(sorted(
    ((_cp1252_garble(ch), ch) for ch in MOJIBAKE_TARGETS),
    key=lambda gf: (-len(gf[0]), gf[0])))


def fix_mojibake_expr(column: str):
    """The polars expression chaining every table repair (literal
    replaces — vectorized, zero shuffle)."""
    import polars as pl

    expr = pl.col(column).fill_null("")
    for garble, fixed in MOJIBAKE_TABLE:
        expr = expr.str.replace_all(garble, fixed, literal=True)
    return expr


def fix_mojibake_batch(batch: pa.Table, column: str = "text",
                       id_column: str = "doc_id") -> pa.Table:
    """map_batches body: ``(id_column, text_fixed, chars_removed)`` —
    ``chars_removed`` is the char-length delta (every repair shrinks
    the text, so 0 means the row was untouched)."""
    import polars as pl

    df = pl.from_arrow(batch.select([id_column, column]))
    out = df.select(
        pl.col(id_column).cast(pl.Int64),
        fix_mojibake_expr(column).alias("text_fixed"),
        pl.col(column).fill_null("").str.len_chars()
        .cast(pl.Int64).alias("_len_before"),
    ).with_columns(
        (pl.col("_len_before")
         - pl.col("text_fixed").str.len_chars().cast(pl.Int64))
        .alias("chars_removed")
    ).drop("_len_before")
    return out.to_arrow().cast(pa.schema([
        (id_column, pa.int64()), ("text_fixed", pa.string()),
        ("chars_removed", pa.int64())]))


def fix_mojibake_docs(ds, column: str = "text",
                      id_column: str = "doc_id"):
    """Dataset wrapper — one streaming pass, no exchange."""
    return ds.map_batches(
        lambda b: fix_mojibake_batch(b, column=column,
                                     id_column=id_column),
        batch_format="pyarrow")


# one clean sample exercising every garble family (2-byte Latin-1,
# 3-byte punctuation, € ™ « »); the driver query plants
# _cp1252_garble(MOJIBAKE_SAMPLE) and the oracle plants the identical
# chr()-literal — one source of truth for both sides
MOJIBAKE_SAMPLE = " café costs €5™ — “naïve” Björk… «°»"


def mojibake_sql_literal(s: str) -> str:
    """``s`` as an encoding-proof DuckDB expression (variadic
    ``concat(chr(..), ...)`` — no quoting or transport-encoding hazards
    for C1/0x80-row chars, and flat: a ``||`` chain of a few hundred
    chars exceeds DuckDB's 128-deep binder recursion)."""
    if not s:
        return "''"
    return "concat(" + ", ".join(f"chr({ord(c)})" for c in s) + ")"


def mojibake_sql_expr(col: str) -> str:
    """The DuckDB expression replaying :func:`fix_mojibake_expr`'s
    replace chain in the SAME frozen order."""
    expr = col
    for garble, fixed in MOJIBAKE_TABLE:
        expr = (f"replace({expr}, {mojibake_sql_literal(garble)}, "
                f"{mojibake_sql_literal(fixed)})")
    return expr
