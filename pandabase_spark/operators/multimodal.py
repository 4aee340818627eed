"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) is carried as an opaque ``binary`` column
next to typed metadata columns — the storage layer (keyed tables,
parquet segments) treats it like any other value column, and everything
metadata-shaped (sizes, content hashes, format sniffing) runs JVM-side.

Decode/feature-extraction is Python territory and runs through
``mapInPandas`` (Arrow-batched iterator-of-DataFrames — the ONLY
sanctioned Python boundary in this engine). The actual codecs (PIL,
torchvision, ffmpeg) are NOT available in this container, so the decode
step is STUBBED: ``decoder="fake"`` (default) derives deterministic
pseudo-features from the payload bytes so the full pipeline — schema,
batching, partitioning, one-to-many frame explosion — is real and
tested end-to-end. ``decoder="real"`` lazily imports PIL (decode /
resize) when installed and raises NotImplementedError at the exact
codec seam when it is not; frame sampling and payload embedding keep
the hard stub (they need ffmpeg / a model, never present here).

Scale notes: payload columns ride the same hash-bucketed segments as
scalars (parquet stores binary efficiently); mapInPandas batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for
multi-MB payloads set it low (e.g. 64) to keep executor memory flat.
The reference has no media support of any kind; this is pure extension
surface.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

FAKE = "fake"
REAL = "real"

_STUB_MSG = (
    "real media decode requires a codec library (PIL/torchaudio/ffmpeg) "
    "that is not installed in this environment; the Spark-side plumbing "
    "is complete — plug a decoder in here"
)


def _require_pil():
    """Lazy optional dependency: ``decoder='real'`` uses PIL when it is
    installed and degrades to the documented NotImplementedError seam
    when it is not — the plumbing (schema, batching, pruning) is
    identical either way."""
    try:
        from PIL import Image

        return Image
    except ImportError as ex:
        raise NotImplementedError(_STUB_MSG) from ex


def attach_fake_payload(df: DataFrame, src_col: str, *, media_type: str = "image/png") -> DataFrame:
    """Testing helper: derive an opaque binary payload (+ media_type)
    from an existing column — stands in for real image/audio bytes."""
    return df.withColumn("payload", F.col(src_col).cast("binary")).withColumn(
        "media_type", F.lit(media_type)
    )


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side payload metadata: byte length + sha256 content hash.

    No Python boundary — this is the cheap pass you run over 100 TB of
    media BEFORE deciding what to decode (dedup by content hash, drop
    zero-byte blobs, size histograms)."""
    return df.withColumn(
        "n_bytes", F.length(F.col(payload_col)).cast("long")
    ).withColumn("sha256", F.sha2(F.col(payload_col), 256))


def _fake_image_features(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode: dimensions/intensity from content
    hash — stable across processes, no RNG."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 if h[2] % 4 == 0 else 3
    mean_intensity = round(h[3] / 255.0, 6)
    return width, height, channels, mean_intensity


IMAGE_FEATURES_SCHEMA = (
    "id long, width int, height int, channels int, mean_intensity double"
)


def decode_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = FAKE,
) -> DataFrame:
    """Decode image payloads to (width, height, channels, mean_intensity).

    Arrow-batched ``mapInPandas``: the udf receives an ITERATOR of
    pandas batches and yields result batches — payloads never exist as
    one driver-side list, and column pruning drops everything except
    (id, payload) before the Python boundary.

    ``decoder="real"`` decodes via PIL when installed (lazy optional
    import — raises NotImplementedError at this seam when absent); the
    plumbing is byte-identical to the fake path.
    """
    if decoder == REAL:
        _require_pil()  # fail fast on the driver if the codec is absent
    elif decoder != FAKE:
        raise ValueError(f"decoder must be '{FAKE}' or '{REAL}', got {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == REAL:
            import io as _io

            Image = _require_pil()

            def feat(payload: bytes):
                with Image.open(_io.BytesIO(payload)) as img:
                    gray = img.convert("L")
                    import numpy as np

                    mean = round(float(np.asarray(gray).mean()) / 255.0, 6)
                    return img.width, img.height, len(img.getbands()), mean
        else:
            feat = _fake_image_features

        for pdf in batches:
            feats = [
                feat(p if p is not None else b"") for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_intensity": [f[3] for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame_sha int"


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 10,
    decoder: str = FAKE,
) -> DataFrame:
    """One-to-many frame sampling (video → every_n-th frame).

    Demonstrates the UDTF-shaped mapInPandas contract: each input row
    yields a variable number of output rows. Fake decoder: frame count
    = payload_len // 32; per-frame token derived from (content hash,
    frame index)."""
    if decoder == REAL:
        raise NotImplementedError(_STUB_MSG)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = p if p is not None else b""
                n_frames = max(len(payload) // 32, 1)
                digest = hashlib.sha256(payload).digest()
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i))
                    idxs.append(fi)
                    shas.append(digest[fi % 32])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_sha": shas})

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


def payload_embedding(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 16,
    decoder: str = FAKE,
) -> DataFrame:
    """Fake feature extractor: payload → deterministic array<double>
    (unit-normalized), so the media pipeline plugs straight into the
    similarity-search operators. Swap the body for a real model at the
    same seam."""
    if decoder == REAL:
        raise NotImplementedError(_STUB_MSG)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vecs = []
            for p in pdf[payload_col]:
                payload = p if p is not None else b""
                raw = hashlib.sha256(payload).digest()
                need = (dim * 4 + 31) // 32
                buf = b"".join(
                    hashlib.sha256(raw + bytes([i])).digest() for i in range(need)
                )
                v = np.frombuffer(buf[: dim * 4], dtype="<u4").astype("float64")
                v = v / max(float(np.linalg.norm(v)), 1.0)
                vecs.append(v.tolist())
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "embedding": vecs}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, "id long, embedding array<double>"
    )


RESIZE_SCHEMA = (
    "id long, out_width int, out_height int, out_bytes int, resized_sha string"
)


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target: tuple[int, int] = (224, 224),
    decoder: str = FAKE,
) -> DataFrame:
    """Batch image resize to ``target`` (w, h) — the standard
    model-input normalization pass.

    Same Arrow-batched ``mapInPandas`` seam as :func:`decode_images`;
    the fake decoder derives the "resized" payload deterministically
    (sha256 over payload + target) and reports the byte size a real
    RGB resize would produce (w·h·3), so downstream size accounting
    and schema handling are exercised for real. ``decoder="real"``
    resizes via PIL when installed (lazy optional import, PNG
    re-encode), keeping batch shape and memory bounds identical.
    """
    if decoder == REAL:
        _require_pil()
    elif decoder != FAKE:
        raise ValueError(f"decoder must be '{FAKE}' or '{REAL}', got {decoder!r}")
    tw, th = int(target[0]), int(target[1])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == REAL:
            import io as _io

            Image = _require_pil()

            def one(payload: bytes) -> tuple[int, str]:
                with Image.open(_io.BytesIO(payload)) as img:
                    out = _io.BytesIO()
                    img.resize((tw, th)).save(out, format="PNG")
                    raw = out.getvalue()
                    return len(raw), hashlib.sha256(raw).hexdigest()
        else:

            def one(payload: bytes) -> tuple[int, str]:
                return (
                    tw * th * 3,
                    hashlib.sha256(
                        payload + f"-resize-{tw}x{th}".encode()
                    ).hexdigest(),
                )

        for pdf in batches:
            ids, nbytes, shas = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                nb, sha = one(p if p is not None else b"")
                ids.append(int(i))
                nbytes.append(nb)
                shas.append(sha)
            n = len(ids)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "out_width": [tw] * n,
                    "out_height": [th] * n,
                    "out_bytes": nbytes,
                    "resized_sha": shas,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)
