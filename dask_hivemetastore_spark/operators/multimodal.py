"""Multimodal columns (SURVEY.md §2-K K5): opaque binary payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is stubbed
exactly as the task prescribes: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` with the intended contract, and
``fake_decode_meta`` is a deterministic stand-in so the Spark-side plumbing
(binary column, schema, batch iteration, partitioning) is real and tested.

Scale notes: binary payloads ride through shuffles as opaque bytes — never
groupBy a payload; key by id/metadata and let payloads stay put. Feature
extraction is mapInPandas (no shuffle); at 100 TB the win is colocating the
decode with the scan (one pass) and writing features to a separate, narrow
table partitioned like the source.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a multimodal-shaped table: binary payload + typed metadata
    struct (the embeddings fixture's array<float> plays the tensor role)."""
    return df.withColumns(
        {
            "payload": F.encode(F.col(text_col), "utf-8"),
            "media_meta": F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
            ),
        }
    )


def decode_image(payload: bytes) -> "object":
    """Decode an image payload → (H, W, C) array. STUB: the container has no
    image codec libraries; on a real cluster plug in PIL/cv2 here. The
    surrounding Spark plumbing (schema, batching) is exercised via
    :func:`fake_decode_meta`."""
    raise NotImplementedError(
        "image decoding requires an image codec library (PIL/cv2) not present "
        "in this environment; use fake_decode_meta for plumbing tests"
    )


def decode_audio(payload: bytes) -> "object":
    """STUB — see :func:`decode_image`."""
    raise NotImplementedError(
        "audio decoding requires an audio codec library not present in this "
        "environment; use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a decoder: pseudo width/height derived
    from the first payload bytes."""
    w = (payload[0] if payload else 0) + 1
    h = (payload[1] if len(payload) > 1 else 0) + 1
    return w, h


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the binary column: byte length,
    sha256 hex, pseudo-decoded dimensions. This is the real 100 TB shape —
    Arrow batches of (id, bytes) in, narrow feature rows out. NULL
    payloads degrade to zero-features rather than killing the task
    (r7 review) but keep a NULL ``sha_hex`` — sha2(NULL) is NULL in SQL,
    and hashing a sentinel b'' would collapse every corrupt/absent row
    into one dedup group (r8 review). The decode runs ONCE per payload
    (the template rule real decoders must follow), and the declared id
    type follows the input schema rather than assuming long."""
    id_type = df.schema[id_col].dataType.simpleString()

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_null = pdf["payload"].isna()
            payloads = pdf["payload"].map(lambda b: b if b is not None else b"")
            dims = payloads.map(fake_decode_meta)  # one decode per payload
            sha = payloads.map(
                lambda b: hashlib.sha256(b).hexdigest()
            ).astype("object")
            sha[is_null] = None  # NULL payload -> NULL hash, not sha(b'')
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha_hex": sha,
                    "fake_w": dims.map(lambda d: d[0]).astype("int32"),
                    "fake_h": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        feats,
        f"{id_col} {id_type}, n_bytes long, sha_hex string, "
        "fake_w int, fake_h int",
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload. STUB: needs an image codec (PIL/cv2) absent
    from this environment — on a real cluster this is a vectorized
    decode→interpolate→encode inside the same mapInPandas pass as
    :func:`extract_features` (one decode per image, never two)."""
    raise NotImplementedError(
        "image resize requires an image codec library (PIL/cv2) not present "
        "in this environment"
    )


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 frame_bytes: int = 64, stride: int = 4) -> DataFrame:
    """Frame sampling over a binary "video" column: chunk each payload into
    fixed-size frames and keep every ``stride``-th one — the 1→N row
    expansion every video pipeline needs, as an Arrow-batched mapInPandas
    (a real decoder would yield decoded frames here; the chunking stand-in
    keeps the plumbing — schema, batch shape, expansion — identical and
    oracle-checkable).

    Scale: expansion happens executor-side with no shuffle; the sampled
    frames table is narrow (id, idx, frame) and should be written
    partitioned like its source. Frames are never a join/groupBy key —
    key by (id, frame_idx)."""

    id_type = df.schema[id_col].dataType.simpleString()

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, outs, totals = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    ids.append(did)
                    idxs.append(i)
                    outs.append(b[i * frame_bytes:(i + 1) * frame_bytes])
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(outs, dtype=object),
                    "n_frames": pd.Series(totals, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        frames,
        f"{id_col} {id_type}, frame_idx long, frame binary, n_frames long",
    )
