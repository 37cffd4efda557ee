"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The decode kernels themselves are STUBBED (PIL/ffmpeg are not in this
container): ``decode_image_meta`` raises NotImplementedError when
``real_decode=True`` and otherwise emits a deterministic fake decode whose
outputs (md5 content hash, byte-length-derived dimensions) are reproducible
by a SQL oracle. Everything Spark-side — schema contracts, mapInPandas batch
shape, Arrow transfer, 1:N fan-out — is real and tested, so swapping in a
real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, byte_len long, content_md5 string, width int, height int, format string"
)

_FORMATS = ["jpeg", "png", "webp"]


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Testdata has no binary tables; treat utf-8 text bytes as the opaque
    payload so the binary-column plumbing is exercised end-to-end."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload"))


def fake_decode_dims(byte_len: int) -> tuple[int, int, str]:
    """Deterministic decoder stand-in: dims/format from the payload length
    (trivially reproducible in any SQL engine for oracle checks)."""
    return 64 + byte_len % 192, 64 + (byte_len * 7) % 192, _FORMATS[byte_len % 3]


def decode_image_meta(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas image-metadata extraction over binary payloads.

    Batch contract: input pdf columns (doc_id, payload:bytes); output one row
    per input with metadata. Arrow moves the bytes; Python only sees whole
    batches (vectorized — never a per-row UDF call).
    """
    from chronon_spark.udfship import ship_by_value

    ship_by_value(__name__)  # closure touches fake_decode_dims (module-level)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            if real_decode:
                import PIL.Image  # noqa: F401  (not in this container)
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "real image decode requires pillow; install it or use the "
                "deterministic fake decode (real_decode=False)"
            ) from e
        for pdf in batches:
            payloads = pdf["payload"].map(bytes)
            lens = payloads.map(len)
            meta = [fake_decode_dims(n) for n in lens]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": lens.astype("int64"),
                    "content_md5": payloads.map(lambda p: hashlib.md5(p).hexdigest()),
                    "width": pd.Series([m[0] for m in meta], dtype="int32"),
                    "height": pd.Series([m[1] for m in meta], dtype="int32"),
                    "format": [m[2] for m in meta],
                }
            )

    return df.mapInPandas(decode_batches, IMAGE_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video-frame-sampling stand-in: emit one 'frame' per N payload bytes
    (1:N row fan-out through mapInPandas — the real shape of frame
    extraction, with the ffmpeg call stubbed to a slice hash)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i, off in enumerate(range(0, max(len(b), 1), every_n_bytes)):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(b[off : off + every_n_bytes]).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.Series(idxs, dtype="int32"), "frame_md5": hashes}
            )

    return df.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


EMBED_SCHEMA = "doc_id long, embedding array<float>"


def embed_payload(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stand-in: binary payload -> embedding vector
    (array<float>) through Arrow-batched mapInPandas — the real shape of an
    encoder-model feature extractor (binary in, fixed-dim float vector
    out, batch-at-a-time), with the model call stubbed to a deterministic
    md5-seeded kernel: component j = md5(payload || ':' || j) mapped to
    [-1, 1) at 2^-32 resolution, so any SQL engine reproduces the vector
    bit-for-bit (floats are exact dyadic rationals). Output feeds the
    similarity operators unchanged — multimodal ingest composes with
    brute-force/LSH/IVF ANN end-to-end."""

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                vecs.append(
                    [
                        (int(hashlib.md5(b + f":{j}".encode()).hexdigest()[:8], 16) + 0.5)
                        / 2**31
                        - 1.0
                        for j in range(dim)
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return df.mapInPandas(embed, EMBED_SCHEMA)
