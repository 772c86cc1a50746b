"""Adversarial BINARY-payload gate for the K5 multimodal operators (r11).

VERDICT r10 "Next round #6": multimodal was the one registered table
family whose keys had never seen adversarial input, and the r10
embeddings gate found a kernel-crash class (wrong-dim ``np.stack``) from
exactly this shape of malformed data. The binary kernels share the risk:
they index into payload bytes (``fake_decode_meta``), slice them
(``frame_sample``), and hash them (``extract_features``).

Corpus classes (VERDICT's list, mapped to this engine's contracts):
- truncated payloads  -> 0-byte and 1-byte blobs (the decode stand-in
  reads payload[0] and payload[1]);
- zero-length binary  -> b"" distinct from NULL;
- NULL payload / NULL struct fields -> NULL-degrade contract
  (n_bytes 0, dims 1x1, sha NULL; zero frames);
- wrong-magic-byte blobs -> non-UTF-8 bytes, \\x00/\\xff prefixes — the
  operators treat payloads as OPAQUE bytes, so "wrong magic" must never
  crash a kernel or change length/hash semantics;
- metadata/payload disagreement -> media_meta.n_bytes lies about
  len(payload): features MUST derive from the payload itself, the
  declared metadata is advisory (pinned explicitly);
- frame-boundary exactness -> lengths at 63/64/65/256/257 bytes and a
  1 MiB blob: frame index set, slice content, and n_frames all checked
  against an independent scalar reimplementation.

Every expectation is computed by a pure-Python twin (no Spark, no
numpy) — the same exact-contract style as the r10 simhash brute twin.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

FRAME_BYTES = 64
STRIDE = 4

# (id, payload, declared_n_bytes) — declared_n_bytes deliberately LIES
# for ids 20/21 (metadata/payload disagreement class).
_BLOBS: list[tuple[int, bytes | None, int | None]] = [
    (0,  b"", 0),                          # zero-length binary
    (1,  None, None),                      # NULL payload
    (2,  b"\x00", 1),                      # 1-byte, NUL content
    (3,  b"\xff", 1),                      # 1-byte, high bit
    (4,  b"\x89PNG\r\n\x1a\n" + b"\x00" * 8, 16),   # PNG magic, bogus body
    (5,  b"RIFF....WAVEfmt ", 16),         # WAV magic, truncated
    (6,  b"\xde\xad\xbe\xef" * 16, 64),    # exactly one frame (64 B)
    (7,  bytes(range(63)), 63),            # one byte short of a frame
    (8,  bytes(range(65)), 65),            # one byte over a frame
    (9,  (b"\x01\x02" * 128), 256),        # 4 frames, idx 0 sampled only
    (10, (b"ab" * 128) + b"z", 257),       # 5 frames -> idx 0,4
    (11, b"\xf0\x9f\x99\x82 not utf8 \xc3\x28", 14),  # invalid UTF-8 mix
    (12, bytes([0] * 300), 300),           # all-NUL multi-frame
    (13, b"x" * (1 << 20), 1 << 20),       # 1 MiB: 16384 frames -> 4096 kept
    (20, b"liar", 999_999),                # metadata says ~1 MB, payload 4 B
    (21, b"", 12),                         # metadata says 12, payload empty
]


def _fake_wh(b: bytes) -> tuple[int, int]:
    w = (b[0] if b else 0) + 1
    h = (b[1] if len(b) > 1 else 0) + 1
    return w, h


def _expected_features() -> dict[int, tuple]:
    out = {}
    for did, payload, _ in _BLOBS:
        b = payload if payload is not None else b""
        sha = None if payload is None else hashlib.sha256(b).hexdigest()
        w, h = _fake_wh(b)
        out[did] = (len(b), sha, w, h)
    return out


def _expected_frames() -> set[tuple]:
    rows = set()
    for did, payload, _ in _BLOBS:
        b = payload if payload is not None else b""
        n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
        for i in range(0, n_frames, STRIDE):
            rows.add((did, i, b[i * FRAME_BYTES:(i + 1) * FRAME_BYTES],
                      n_frames))
    return rows


_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("media_meta", StructType([
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
    ])),
])


@pytest.fixture(scope="module")
def hostile_blobs(spark):
    rows = [
        (did, payload,
         (None if declared is None else ("application/octet-stream",
                                         declared)))
        for did, payload, declared in _BLOBS
    ]
    # 5 partitions on purpose: empty Arrow batches and sub-frame splits
    # are part of the surface under test
    return spark.createDataFrame(rows, _SCHEMA).repartition(5)


def test_extract_features_exact(spark, hostile_blobs):
    """Every feature column must match the scalar twin byte-for-byte —
    including the ids whose metadata LIES about the payload length
    (features derive from the payload, never the declared struct)."""
    from dask_hivemetastore_spark.operators.multimodal import extract_features

    got = {
        r.doc_id: (r.n_bytes, r.sha_hex, r.fake_w, r.fake_h)
        for r in extract_features(hostile_blobs, "doc_id").collect()
    }
    assert got == _expected_features()


def test_extract_features_ignores_declared_metadata(spark, hostile_blobs):
    """The disagreement class, isolated: id 20 declares ~1 MB but carries
    4 bytes; id 21 declares 12 but carries b"". n_bytes must report the
    PAYLOAD truth."""
    from dask_hivemetastore_spark.operators.multimodal import extract_features

    got = {
        r.doc_id: r.n_bytes
        for r in extract_features(hostile_blobs, "doc_id").collect()
    }
    assert got[20] == 4
    assert got[21] == 0


def test_frame_sample_exact(spark, hostile_blobs):
    """Frame index set, slice content, and n_frames against the scalar
    twin. Pins: 0-byte and NULL payloads yield ZERO rows (a zero-byte
    video vanishes — no ghost frame 0); 63/64/65-byte payloads land on
    the exact frame-count boundaries; the 1 MiB blob expands to exactly
    4096 sampled frames of its 16384."""
    from dask_hivemetastore_spark.operators.multimodal import frame_sample

    got = {
        (r.doc_id, r.frame_idx, bytes(r.frame), r.n_frames)
        for r in frame_sample(hostile_blobs, "doc_id").collect()
    }
    assert got == _expected_frames()
    sampled_1mib = [t for t in got if t[0] == 13]
    assert len(sampled_1mib) == 4096
    assert all(t[3] == 16384 for t in sampled_1mib)
    assert not [t for t in got if t[0] in (0, 1, 21)]


def test_frame_sample_null_id_and_duplicate_ids(spark):
    """NULL ids and duplicated ids pass through the expansion untouched —
    frames key by (id, frame_idx) downstream, so the operator must not
    dedup, drop, or invent ids."""
    from dask_hivemetastore_spark.operators.multimodal import frame_sample

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ])
    df = spark.createDataFrame(
        [(None, b"n" * 70), (5, b"a" * 70), (5, b"b" * 70)], schema
    )
    rows = frame_sample(df, "doc_id").collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.doc_id, []).append(r)
    assert len(by_id[None]) == 1 and bytes(by_id[None][0].frame) == b"n" * 64
    # duplicate id 5: BOTH payloads expand (2 rows at frame_idx 0)
    assert sorted(bytes(r.frame)[:1] for r in by_id[5]) == [b"a", b"b"]


def test_attach_payload_roundtrip_non_ascii(spark):
    """attach_binary_payload + extract_features on astral-plane /
    multi-byte text: n_bytes must count UTF-8 BYTES (not codepoints) and
    the sha must hash those bytes — the r8 hostile-corpus find, pinned
    here at the operator level."""
    from dask_hivemetastore_spark.operators.multimodal import (
        attach_binary_payload, extract_features,
    )

    texts = ["naïve–café🙂", "soh", "", None, "plain"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bytes, r.sha_hex)
        for r in extract_features(attach_binary_payload(df), "doc_id").collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] == (0, None)
        else:
            b = t.encode("utf-8")
            assert got[i] == (len(b), hashlib.sha256(b).hexdigest()), t


def test_registered_keys_on_hostile_documents(spark, tmp_path):
    """The two REGISTERED K5 keys replayed on a documents corpus whose
    text column carries the poison families (NULL, empty, control bytes,
    non-UTF-8-able surrogates excluded — parquet is UTF-8 — astral
    emoji, 100 kB monster): engine vs registered DuckDB oracle, the
    standard hostile-gate compare."""
    import os

    import duckdb

    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.catalog import TABLE_NAMES
    from .conftest import SF_SMOKE
    from .oracle_harness import compare

    base = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    poison = ["", None, "\x01\x02ctrl", "naïve–café🙂", "x" * 100_000,
              "line\nbreak", "﻿bom", " pad ", "\\N"]
    text = base["text"].copy().astype("object")
    for j, i in enumerate(range(0, len(text), 7)):
        text.iloc[i] = poison[j % len(poison)]
    hostile = base.copy()
    hostile["text"] = text
    d = tmp_path / "hostile_mm"
    d.mkdir()
    hostile.to_parquet(d / "documents.parquet", index=False)
    for f in os.listdir(SF_SMOKE):
        if f != "documents.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), d / f)

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        for key in ("multimodal_extract", "multimodal_frame_sample"):
            sdf = plans.QUERIES[key](spark, str(d))
            problems = compare(key, sdf, con.sql(plans.ORACLES[key]))
            assert not problems, f"{key}:\n" + "\n".join(problems)
    finally:
        con.close()
