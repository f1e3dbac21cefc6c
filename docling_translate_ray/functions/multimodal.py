"""Multimodal (image/audio/video) column plumbing — Ray-side real, codecs stubbed.

The reference saves table/picture images per document (utils.py:25-77,
S10 in SURVEY.md §2); at corpus scale media are opaque ``binary`` columns
with typed metadata, processed by actor-pool stages.  The image/audio codec
libraries are NOT in this container, so the decode kernels are stubbed:

* ``deterministic_fake=True`` (default in tests) produces features derived
  from the payload bytes (blake2b-seeded) — schema/batching/actor plumbing
  is fully real and tested;
* ``deterministic_fake=False`` raises ``NotImplementedError`` at the exact
  point a real decoder (PIL/ffmpeg) would be called.

Schema convention (FIXTURES/media):
``media(media_id:int64, url:string, kind:string{image,audio,video},
payload:binary, meta:struct<width:int32, height:int32, duration_ms:int32>)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        (
            "meta",
            pa.struct(
                [("width", pa.int32()), ("height", pa.int32()), ("duration_ms", pa.int32())]
            ),
        ),
    ]
)


def gen_media(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded pseudo-random bytes)."""
    import random

    ids, urls, kinds, payloads, metas = [], [], [], [], []
    for i in range(n_rows):
        rng = random.Random((seed << 16) ^ i)
        kind = ("image", "audio", "video")[i % 3]
        size = rng.randint(256, 4096)
        ids.append(i)
        urls.append(f"https://media.example/{kind}/{i}")
        kinds.append(kind)
        payloads.append(rng.randbytes(size))
        metas.append(
            {
                "width": rng.randint(16, 1920) if kind != "audio" else 0,
                "height": rng.randint(16, 1080) if kind != "audio" else 0,
                "duration_ms": rng.randint(100, 60000) if kind != "image" else 0,
            }
        )
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        }
    )


class MediaFeaturizer:
    """Actor-pool stage: payload → fixed-dim feature vector + basic stats.

    Real pipeline shape (small ``batch_size`` for MB-scale binary cells,
    model "loaded" once per actor in ``__init__``); the codec itself is the
    stubbed part.  Output adds ``payload_bytes:int64`` and
    ``features:list<float>(dim)``.
    """

    def __init__(self, dim: int = 16, deterministic_fake: bool = True) -> None:
        self.dim = dim
        self.fake = deterministic_fake
        # "model load" happens here, once per actor
        self._proj_seed = 1234

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg, not present in this "
                "environment; run with deterministic_fake=True"
            )
        digest = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
        return rng.rand(self.dim).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = [self._decode(p or b"", k).tolist() for p, k in zip(payloads, kinds)]
        nbytes = [len(p or b"") for p in payloads]
        return batch.append_column(
            "payload_bytes", pa.array(nbytes, pa.int64())
        ).append_column("features", pa.array(feats, pa.list_(pa.float64())))


def frame_sample_plan(duration_ms: int, every_ms: int = 1000) -> list[int]:
    """Frame-sampling timestamps for a video payload (pure planning logic —
    the actual frame grab is behind the same stub boundary)."""
    if duration_ms <= 0:
        return []
    return list(range(0, duration_ms, every_ms))


class MediaResizer:
    """Actor-pool resize stage for image rows (S10 analog at corpus scale).

    Real Ray plumbing: small ``batch_size`` for binary cells, per-actor
    "codec" setup in ``__init__``, meta struct rewritten with the target
    box (aspect-preserving fit).  The pixel work itself is stubbed: the
    fake produces size-proportional deterministic bytes; ``deterministic_
    fake=False`` raises at the exact PIL call site.
    """

    def __init__(self, max_w: int = 256, max_h: int = 256,
                 deterministic_fake: bool = True) -> None:
        self.max_w, self.max_h = max_w, max_h
        self.fake = deterministic_fake

    def _fit(self, w: int, h: int) -> tuple[int, int]:
        if w <= 0 or h <= 0:
            return 0, 0
        scale = min(self.max_w / w, self.max_h / h, 1.0)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def _resize(self, payload: bytes, w: int, h: int) -> bytes:
        if not self.fake:
            raise NotImplementedError(
                "real resize requires PIL, not present in this environment; "
                "run with deterministic_fake=True"
            )
        seed = hashlib.blake2b(payload, digest_size=8).digest()
        n = max(16, (w * h) // 8)  # size-proportional fake jpeg-ish payload
        reps = (n // len(seed)) + 1
        return (seed * reps)[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        metas = batch["meta"].to_pylist()
        out_payload, out_meta = [], []
        for p, k, m in zip(payloads, kinds, metas):
            if k != "image":
                out_payload.append(p)
                out_meta.append(m)
                continue
            w, h = self._fit(m["width"], m["height"])
            out_payload.append(self._resize(p or b"", w, h))
            out_meta.append({**m, "width": w, "height": h})
        idx_p = batch.column_names.index("payload")
        idx_m = batch.column_names.index("meta")
        return batch.set_column(
            idx_p, "payload", pa.array(out_payload, pa.binary())
        ).set_column(
            idx_m, "meta", pa.array(out_meta, MEDIA_SCHEMA.field("meta").type)
        )


class FrameSampler:
    """Actor-pool explode stage: one output row per sampled video frame.

    The 1-row→N-rows explode, schema, and timestamps are real
    (``frame_sample_plan``); the frame-grab kernel is stubbed the same way
    as the other codecs.  Non-video rows are dropped (use a union with the
    original stream if both are needed).  Output: ``media_id, url,
    frame_ts_ms:int64, frame:binary``.
    """

    def __init__(self, every_ms: int = 1000, deterministic_fake: bool = True) -> None:
        self.every_ms = every_ms
        self.fake = deterministic_fake

    def _grab(self, payload: bytes, ts_ms: int) -> bytes:
        if not self.fake:
            raise NotImplementedError(
                "real frame grab requires ffmpeg, not present in this "
                "environment; run with deterministic_fake=True"
            )
        return hashlib.blake2b(
            payload + ts_ms.to_bytes(8, "big"), digest_size=32
        ).digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_id, o_url, o_ts, o_frame = [], [], [], []
        for mid, url, kind, payload, meta in zip(
            batch["media_id"].to_pylist(), batch["url"].to_pylist(),
            batch["kind"].to_pylist(), batch["payload"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            if kind != "video":
                continue
            for ts in frame_sample_plan(meta["duration_ms"], self.every_ms):
                o_id.append(mid)
                o_url.append(url)
                o_ts.append(ts)
                o_frame.append(self._grab(payload or b"", ts))
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "url": pa.array(o_url, pa.string()),
                "frame_ts_ms": pa.array(o_ts, pa.int64()),
                "frame": pa.array(o_frame, pa.binary()),
            }
        )
