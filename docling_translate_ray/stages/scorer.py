"""Scorer / "translation engine" actor-pool stages.

Re-expresses the reference's engine layer (BaseTranslator ABC + registry +
thread-pool batch driver, /root/reference/src/translation/base.py:18-97 and
translation/__init__.py:23-54) as Ray Data actor-pool stages:

* a registry of named engines (T1-T9 analogs) — string key → engine class;
* each engine loads its state ONCE per actor in ``__init__`` (model-load
  analog: here a deterministic lexicon, since no model weights exist in this
  sandbox) and transforms a batch of unique sentences in ``__call__``;
* retry + engine-fallback semantics (openai.py:60-91, google.py:29-31
  analogs): per-sentence try/except with bounded retries, falling back to the
  ``identity`` engine — a failure never kills the block;
* the reference's ``ThreadPoolExecutor(max_workers)`` (base.py:63-88) is
  subsumed by ``map_batches(Engine, concurrency=N, batch_size=B)``.

Engines are pure/deterministic so golden tests and the DuckDB oracle can
reproduce them.
"""

from __future__ import annotations

import time

import pyarrow as pa


class BaseEngine:
    """Engine protocol: ``prepare()`` once per actor, ``score(list[str])``.

    Analog of BaseTranslator (base.py:18-36); subclasses override ``score``.
    Retry policy mirrors the reference API engines
    (engines/openai.py:60-91): up to ``max_retries`` attempts with
    **exponential backoff** (``backoff_base · 2^attempt`` seconds) on
    RETRIABLE errors only (429 / 503 / rate_limit / overloaded markers —
    openai.py:84); a non-retriable error stops retrying immediately.  On
    exhaustion the engine falls back to a *different named engine*
    (``fallback_engine`` — openai.py:93 falls back to google), whose own
    policy applies in turn; the end of every chain is identity
    (return-the-original, google.py:29-31).
    """

    name = "base"
    max_retries = 3
    backoff_base = 1.0  # seconds; attempt n sleeps backoff_base * 2**n
    fallback_engine: str | None = None  # next engine in the chain (T8)
    # true-batched engines (NLLB CT2, nllb.py:103-155) score fixed-size
    # chunks — the intra-batch vectorization unit, independent of the Ray
    # batch_size above it; None = whole batch at once
    chunk_size: int | None = None
    RETRIABLE_MARKERS = ("429", "503", "rate_limit", "overloaded")
    _sleep = staticmethod(time.sleep)  # injectable for tests

    def __init__(self, **options) -> None:
        """``options`` is the engine-options surface (chunk_size=16,
        beam=4-style knobs, nllb.py:69-100): recognized keys override the
        class attributes; everything lands in ``self.options`` for
        ``prepare`` to consume."""
        self.options = options
        for key in ("chunk_size", "max_retries", "backoff_base", "fallback_engine"):
            if key in options:
                setattr(self, key, options[key])
        self.prepare()

    def prepare(self) -> None:  # model load / regex compile / lexicon build
        pass

    def score(self, texts: list[str]) -> list[str]:
        raise NotImplementedError

    @classmethod
    def _is_retriable(cls, exc: Exception) -> bool:
        msg = str(exc).lower()
        return any(m.lower() in msg for m in cls.RETRIABLE_MARKERS)

    def _score_with_backoff(self, texts: list[str]) -> list[str]:
        """One engine's attempt loop (openai.py:60-91): retriable errors
        back off 2^attempt seconds between tries; others raise at once."""
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                return self.score(texts)
            except Exception as exc:
                last = exc
                if self._is_retriable(exc) and attempt < self.max_retries - 1:
                    self._sleep(self.backoff_base * (2 ** attempt))
                    continue
                break
        raise last if last is not None else RuntimeError("empty retry loop")

    def _fallback(self) -> "BaseEngine | None":
        if self.fallback_engine is None:
            return None
        inst = getattr(self, "_fallback_inst", None)
        if inst is None:
            inst = self._fallback_inst = ENGINE_REGISTRY[self.fallback_engine]()
        return inst

    def score_with_retry(self, texts: list[str]) -> list[str]:
        """Batch-first, then per-sentence isolation, then the cross-engine
        fallback chain: one poison input must not cost the whole batch its
        scores, and one dead engine must not cost the batch its engine.
        Engines with a ``chunk_size`` score chunk-at-a-time (the NLLB
        chunking loop, nllb.py:126-155) — retry/fallback apply per chunk."""
        if self.chunk_size and len(texts) > self.chunk_size:
            out: list[str] = []
            for i in range(0, len(texts), self.chunk_size):
                out.extend(self.score_with_retry(texts[i : i + self.chunk_size]))
            return out
        try:
            return self._score_with_backoff(texts)
        except Exception:
            pass
        fb = self._fallback()
        out: list[str] = []
        for t in texts:  # isolate the poison input(s)
            # single attempt, NO backoff: the batch-level loop above already
            # spent the retry budget proving the engine unhealthy — a
            # per-sentence 2^n sleep schedule on a 2048-row batch would be
            # hours of pure sleeping per actor for one dead engine
            try:
                out.append(self.score([t])[0])
                continue
            except Exception:
                pass
            if fb is not None:
                try:
                    out.append(fb.score_with_retry([t])[0])
                    continue
                except Exception:
                    pass
            out.append(t)  # identity — the end of every chain (google.py:29-31)
        return out


class IdentityEngine(BaseEngine):
    """Round-trip oracle engine — output == input."""

    name = "identity"

    def score(self, texts: list[str]) -> list[str]:
        return list(texts)


class UpperEngine(BaseEngine):
    """Deterministic visible transform (uppercase) for join-back tests."""

    name = "upper"

    def score(self, texts: list[str]) -> list[str]:
        return [t.upper() for t in texts]


class LexiconEngine(BaseEngine):
    """Word-lexicon 'model' built once per actor (T2-T7 local-model analog).

    The lexicon stands in for GGUF/CT2 weights: built deterministically in
    ``prepare`` (once per actor, amortized over every batch the actor sees),
    applied vectorized per batch.
    """

    name = "lexicon"

    def prepare(self) -> None:
        # deterministic "weights": reverse-map of common words
        words = (
            "data stream engine block batch arrow parquet shuffle actor pool "
            "page document extract translate sentence span token cluster"
        ).split()
        self.lexicon = {w: w[::-1] for w in words}

    def score(self, texts: list[str]) -> list[str]:
        lex = self.lexicon
        return [" ".join(lex.get(w.lower(), w) for w in t.split()) for t in texts]


ENGINE_REGISTRY: dict[str, type[BaseEngine]] = {
    "identity": IdentityEngine,
    "upper": UpperEngine,
    "lexicon": LexiconEngine,
}


def register_engine(cls: type[BaseEngine]) -> type[BaseEngine]:
    """User-extension surface (translation/__init__.py:36-48 analog)."""
    ENGINE_REGISTRY[cls.name] = cls
    return cls


class ScoreSentences:
    """Actor-pool callable: score a ``sentence`` column → add ``scored``.

    Use as ``ds.map_batches(ScoreSentences, fn_constructor_kwargs=
    {"engine": "identity"}, concurrency=N, batch_size=B,
    batch_format="pyarrow")`` — engine state pinned per actor.
    ``engine_options`` forwards the per-engine knob surface (chunk_size,
    backoff, fallback — see BaseEngine.__init__).
    """

    def __init__(self, engine: str = "identity", column: str = "sentence",
                 engine_options: dict | None = None) -> None:
        self._engine = ENGINE_REGISTRY[engine](**(engine_options or {}))
        self._column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self._column].to_pylist()
        scored = self._engine.score_with_retry(texts)
        return batch.append_column("scored", pa.array(scored, pa.string()))
