"""Adversarial EMBEDDINGS corpus over the vector/ANN family (r10).

The r9 work injected corrupt vectors into the STRESS harnesses
(operator-level, exit-code invariants) and unit-tested ``finite_vectors``
— but the embeddings TABLE itself was never poisoned and replayed
through the REGISTERED keys against their REGISTERED oracles, the gate
every other table family has (documents r8, events r8, numerics r9,
strings/format r10). This closes that last family.

Poison classes, each a distinct failure mode:
- NULL vector cell / empty list / vector with NULL elements;
- NaN / +Inf / −Inf components (non-finite dots);
- WRONG-DIMENSION vectors (32 and 96 against the corpus's 64) — the
  class that crashes ``np.stack`` in every Arrow-batched kernel if it
  reaches one, and silently NULL-pads ``zip_with``/``list_zip`` if it
  doesn't;
- the zero vector (norm 0 — a legal row whose cosine against anything
  is 0, must not be excluded);
- large-but-finite components (norm ~8000) — the documented
  PASS-THROUGH class (magnitude screening is ingest QA, not the
  operator's job);
- an exact duplicate of a real vector under a new id (a legitimate
  planted pair the gate must still find);
- NULL label.

Contract encoded by the fixes this gate forced: a vector participates in
similarity/ANN math iff it is non-NULL, fully finite, and has the
DECLARED dimension (the embedding pipeline always knows its model dim —
it is table metadata, like a schema). Excluded rows vanish from vector
results; both each key's engine path and its DuckDB oracle state that
same rule explicitly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_SMOKE
from .oracle_harness import compare

DIM = 64

_FULL_ORACLE_KEYS = [
    "array_funcs_embeddings",
    "dedup_embedding_components",
    "embedding_group_centroid",
    "embedding_near_pairs",
    "embedding_quantize_roundtrip",
    "knn_cosine_topk",
    "knn_join_batch",
    "knn_pq_topk",
    # r12 graduates/additions: the LSH recall-verdict audit and the IVF
    # drift detector both carry derived full oracles that hold on the
    # poisoned corpus too (eligibility + zero-norm exclusion align on
    # both sides; the drift flags are threshold decisions with measured
    # margin, not knife-edge values)
    "knn_lsh_topk",
    "knn_lsh_indexed",
    # r14: the IVFPQ family's recall-verdict oracles hold on the
    # poisoned corpus too — eligibility excludes the corrupt rows from
    # BOTH the index (finite_vectors in assign/encode) and the exact
    # twin, and the 0.5/0.6 floors carry margin even with the
    # quantizer retrained on the poisoned eligible set (verified
    # empirically before pinning; contrast knn_ivf_topk's note below)
    "knn_ivfpq_topk",
    "knn_ivfpq_join",
    # ivf_drift_check is NOT in the full-oracle replay: its pinned
    # shifted-flag verdict is a clean-fixture contract. On THIS corpus
    # the legal norm-8000 all-ones vector hands KMeans a cell aligned
    # with the shift direction û, so the α=2-shifted batch fits at
    # cosine ~0.89 and the FIT rule correctly declines to flag a mode
    # the quantizer already owns — see the dedicated property test.
]
# knn_ivf_topk is NOT replayed against its brute-force oracle here: its
# oracle equality holds on the REAL corpus (nprobe=8/16 recovers the full
# top-10 there, deterministically — verified across fresh processes), but
# this poisoned corpus retrains the coarse quantizer on a different
# eligible set, scattering true neighbors across unprobed cells — the
# recall trade that makes IVF an ANN, not a bug. Its hostile-corpus
# contract is the property test below instead. (knn_pq_topk stays in the
# replay: its 10%-of-corpus shortlist keeps recall 1.0 here too.)


def write_hostile_embeddings(dirpath) -> None:
    pdf = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    emb = pdf["embedding"].tolist()
    labels = pdf["label"].astype("object").tolist()

    def vec(fill):
        return np.asarray(fill, dtype=np.float32)

    nan_v = np.array(emb[20], dtype=np.float32).copy()
    nan_v[7] = np.nan
    inf_v = np.array(emb[21], dtype=np.float32).copy()
    inf_v[3] = np.inf
    ninf_v = np.array(emb[22], dtype=np.float32).copy()
    ninf_v[0] = -np.inf

    poison = {
        10: None,                                  # NULL vector
        11: vec([]),                               # empty list
        12: np.array([v if i != 5 else None for i, v in enumerate(emb[12])],
                     dtype=object),                # NULL element
        20: nan_v,
        21: inf_v,
        22: ninf_v,
        30: vec(np.zeros(DIM)),                    # zero vector (legal)
        31: vec(np.ones(32) * 0.1),                # wrong dim: short
        32: vec(np.ones(96) * 0.1),                # wrong dim: long
        # large-but-finite (legal pass-through: magnitude screening is
        # ingest QA, not the operator's job). 1e3 per component ≈ norm
        # 8000 — unambiguously unnormalized, while keeping dot products
        # small enough (~1e4) that the engines' different summation
        # orders still agree at the canonicalizer's 9-decimal grain;
        # truly astronomical magnitudes (1e30) differ at the ULP level
        # between ANY two independent float implementations.
        33: vec(np.full(DIM, 1e3)),
    }
    for i, v in poison.items():
        emb[i] = v
    labels[40] = None                              # NULL label

    # planted exact duplicate of row 2's vector under a fresh id
    pdf2 = pd.DataFrame(
        {
            "vec_id": pd.array(list(pdf["vec_id"]) + [9000], dtype="int64"),
            "embedding": emb + [np.array(emb[2], dtype=np.float32)],
            "label": pd.array(labels + [labels[2]], dtype="Int32"),
        }
    )
    pdf2.to_parquet(os.path.join(str(dirpath), "embeddings.parquet"),
                    index=False)


@pytest.fixture(scope="module")
def hostile_emb_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("hostile_emb_sf")
    write_hostile_embeddings(d)
    for f in os.listdir(SF_SMOKE):
        if f != "embeddings.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), d / f)
    return str(d)


@pytest.fixture(scope="module")
def hostile_emb_duck(hostile_emb_dir):
    import duckdb

    from dask_hivemetastore_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{hostile_emb_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _FULL_ORACLE_KEYS)
def test_embedding_keys_on_hostile_corpus(spark, key, hostile_emb_dir,
                                          hostile_emb_duck):
    from dask_hivemetastore_spark import plans

    sdf = plans.QUERIES[key](spark, hostile_emb_dir)
    problems = compare(key, sdf, hostile_emb_duck.sql(plans.ORACLES[key]))
    assert not problems, "\n".join(problems)


def test_ivf_on_hostile_corpus_properties(spark, hostile_emb_dir):
    """IVF on the poisoned corpus: the index must RUN (no KMeans crash on
    NaN/Inf, no ragged np.stack), return only eligible finite ids, and
    keep useful recall against the exact brute-force top-10 computed on
    the same corpus (deterministic: seeded KMeans, fixed data)."""
    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.operators import similarity

    emb = spark.read.parquet(f"{hostile_emb_dir}/embeddings.parquet")
    brute = [r.vec_id for r in similarity.knn_topk(
        emb, query_id=0, k=10, dim=DIM).collect()]
    ivf = plans.QUERIES["knn_ivf_topk"](spark, hostile_emb_dir).collect()
    assert 0 < len(ivf) <= 10
    assert all(np.isfinite(r.cosine) for r in ivf)
    corrupt_ids = {10, 11, 12, 20, 21, 22, 31, 32}
    assert not corrupt_ids & {r.vec_id for r in ivf}
    recall = len({r.vec_id for r in ivf} & set(brute)) / 10
    assert recall >= 0.5, (recall, [r.vec_id for r in ivf], brute)


def test_planted_duplicate_still_found(spark, hostile_emb_dir):
    """The gate must not only exclude garbage — the legitimate planted
    exact-duplicate pair (vec 2 ≡ vec 9000, cosine 1.0) must survive all
    the filtering and be reported by the near-pair operator."""
    from dask_hivemetastore_spark.operators import similarity

    emb = spark.read.parquet(f"{hostile_emb_dir}/embeddings.parquet")
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.similar_pairs(
            emb, threshold=0.99, dim=DIM
        ).collect()
    }
    assert (2, 9000) in pairs, sorted(pairs)[:5]


def test_drift_check_on_hostile_corpus_properties(spark, hostile_emb_dir):
    """The drift detector on the poisoned corpus: must RUN (eligibility
    excludes corrupt rows; counts = 48 eligible positive-norm control
    rows), must NOT flag the in-distribution control batch, and — since
    the r16 null-space axis — MUST flag the shifted batch here too: the
    key's drift direction is now orthogonal to EVERY trained centroid
    by construction (centroid_nullspace_axis), so even the hostile
    corpus's legal norm-8000 all-ones vector (id 33, which hands KMeans
    a centroid on the old fixed û) cannot own the mode, and the
    shifted=1 pin holds on hostile data as well as every sf.

    The instructive owned-mode property the old fixed axis demonstrated
    is still pinned — at the OPERATOR level, where it belongs: shifting
    along the all-ones direction (which the hostile centroid owns)
    assigns at cosine ~0.89 and the fit-only rule correctly stays
    quiet; a share-based rule would have flagged that batch forever (it
    concentrates in û's cell)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.operators import similarity

    rows = {r.batch: r for r in
            plans.QUERIES["ivf_drift_check"](spark, hostile_emb_dir).collect()}
    assert rows["control"].n_vectors == 48
    assert rows["shifted"].n_vectors == 48
    assert rows["control"].retrain_flag == 0
    assert rows["shifted"].retrain_flag == 1  # unowned by construction

    # owned-mode property (operator level): the hostile centroid on the
    # all-ones û means an û-shifted batch FITS — no flag
    emb = spark.read.parquet(f"{hostile_emb_dir}/embeddings.parquet")
    C = similarity.ivf_train_centroids(
        emb, n_cells=16, cache_key=hostile_emb_dir, dim=DIM
    )
    refd = similarity.ivf_drift_reference(emb, C, dim=DIM)
    sq = F.aggregate(
        "embedding", F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    ctrl = emb.where(F.col("vec_id") % 10 == 0).where(sq > 0)
    owned = similarity.shift_vectors(ctrl, alpha=2.0, dim=DIM)  # û axis
    st = similarity.ivf_drift_stats(owned, C, dim=DIM)
    assert st[0] > 0.8  # assigns into the û-owned cell at high cosine
    assert not similarity.ivf_drift_flag(
        st, (refd["ref_mean"], refd["ref_max_share"], refd["n"]),
        sigma=refd["ref_sigma"],
    )


def test_raw_lsh_path_survives_corruption(spark, hostile_emb_dir):
    """The raw LSH serving path (single- and multi-table) must RUN on
    the poisoned corpus — no np.stack crash from a ragged batch — and
    return only finite, real ids. (The registered ``knn_lsh_topk`` key
    graduated to a derived recall-verdict oracle in r12 and is covered
    by the full-oracle replay above; this guards the operator surface
    the key composes.)"""
    from dask_hivemetastore_spark.operators import similarity

    emb = spark.read.parquet(f"{hostile_emb_dir}/embeddings.parquet")
    for n_tables in (1, 16):
        lsh = similarity.lsh_topk(
            emb, query_id=0, k=10, bits=8, dim=DIM, n_tables=n_tables
        ).collect()
        assert 0 < len(lsh) <= 10, n_tables
        assert all(np.isfinite(r.cosine) for r in lsh), n_tables


def test_arrow_knn_variant_identical_on_hostile_corpus(spark,
                                                       hostile_emb_dir):
    """The pre-armed Arrow/NumPy brute-force variant (r11) must equal the
    JVM path row-for-row ON THE POISONED CORPUS too: its eligibility
    filter runs before np.stack (a ragged/NaN batch would crash or poison
    the GEMV), and the exact rescore pins values. This is the fallback's
    license to ever be flipped in."""
    from dask_hivemetastore_spark.operators import similarity

    emb = spark.read.parquet(f"{hostile_emb_dir}/embeddings.parquet")
    jvm = [(r.vec_id, r.label, r.cosine) for r in
           similarity.knn_topk(emb, query_id=0, k=10, dim=DIM).collect()]
    arrow = [(r.vec_id, r.label, r.cosine) for r in
             similarity.knn_topk_arrow(emb, query_id=0, k=10,
                                       dim=DIM).collect()]
    assert jvm == arrow


def test_ivf_ingest_keys_on_hostile_corpus_properties(spark,
                                                      hostile_emb_dir):
    """The two r11 IVF ingest keys (knn_ivf_append_probe,
    stream_ivf_ingest) on the poisoned corpus — same contract as
    knn_ivf_topk's property test (full-oracle replay is excluded for the
    same retrained-quantizer recall reason, documented above): the
    append/stream paths must RUN, exclude every corrupt id AT APPEND
    TIME, return only finite cosines, and keep useful recall vs the
    exact brute top-10. They must also agree with EACH OTHER exactly —
    same centroids, same index content, same probe."""
    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.operators import similarity

    emb = spark.read.parquet(f"{hostile_emb_dir}/embeddings.parquet")
    brute = [r.vec_id for r in similarity.knn_topk(
        emb, query_id=0, k=10, dim=DIM).collect()]
    corrupt_ids = {10, 11, 12, 20, 21, 22, 31, 32}
    results = {}
    for key in ("knn_ivf_append_probe", "stream_ivf_ingest"):
        rows = plans.QUERIES[key](spark, hostile_emb_dir).collect()
        assert 0 < len(rows) <= 10, key
        assert all(np.isfinite(r.cosine) for r in rows), key
        assert not corrupt_ids & {r.vec_id for r in rows}, key
        recall = len({r.vec_id for r in rows} & set(brute)) / 10
        assert recall >= 0.5, (key, recall)
        results[key] = [(r.vec_id, r.label, r.cosine) for r in rows]
    assert results["knn_ivf_append_probe"] == results["stream_ivf_ingest"]

def test_ivf_append_replay_idempotent(spark, tmp_path):
    """r12 ADVICE fix pin: foreachBatch is at-least-once, so
    ``stream_ivf_ingest`` keys each micro-batch to its own
    ``ingest_batch=<id>`` subdirectory and writes it with overwrite
    (streaming/pipeline.py append_batch). A REPLAYED batch (same id,
    same rows) must leave the index content-identical — same row count,
    same probe answer — where the r11 plain-append scheme duplicated
    every row. Both arms pinned here."""
    from pyspark.sql import functions as F

    from dask_hivemetastore_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    C = similarity.ivf_train_centroids(
        emb, n_cells=16, cache_key=SF_SMOKE, dim=DIM
    )
    qv = np.asarray(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )
    batch = emb.where(F.col("vec_id") % 7 == 0)

    idx = str(tmp_path / "keyed_index")
    similarity.ivf_append(
        batch, f"{idx}/ingest_batch=0", C, dim=DIM, mode="overwrite"
    )
    n1 = spark.read.parquet(idx).count()
    p1 = [tuple(r) for r in similarity.ivf_probe_indexed(
        spark, idx, C, qv, k=10, nprobe=8, exclude_id=0).collect()]
    # replay the SAME batch id — a retry after a mid-drain failure
    similarity.ivf_append(
        batch, f"{idx}/ingest_batch=0", C, dim=DIM, mode="overwrite"
    )
    assert spark.read.parquet(idx).count() == n1
    p2 = [tuple(r) for r in similarity.ivf_probe_indexed(
        spark, idx, C, qv, k=10, nprobe=8, exclude_id=0).collect()]
    assert p1 == p2

    # contrast arm: the default un-keyed append DOES duplicate on replay
    # — the documented hazard the batch-id keying exists to remove
    plain = str(tmp_path / "plain_index")
    similarity.ivf_append(batch, plain, C, dim=DIM)
    n_plain = spark.read.parquet(plain).count()
    similarity.ivf_append(batch, plain, C, dim=DIM)
    assert spark.read.parquet(plain).count() == 2 * n_plain
    assert n_plain == n1


def test_ivf_append_wrong_dim_batch_excluded(spark, hostile_emb_dir,
                                             tmp_path):
    """Declared-dim eligibility applies at APPEND time (VERDICT r11 next
    #7): a batch carrying wrong-dimension vectors (truncated dim-32 /
    concatenated dim-96 rows — ids 31/32 of the poisoned corpus) appends
    ONLY its conforming rows; an all-wrong-dim batch appends nothing and
    leaves the resident index untouched."""
    from pyspark.sql import functions as F

    from dask_hivemetastore_spark.operators import similarity

    emb = spark.read.parquet(f"{hostile_emb_dir}/embeddings.parquet")
    C = similarity.ivf_train_centroids(
        emb, n_cells=16, cache_key=hostile_emb_dir, dim=DIM
    )
    idx = str(tmp_path / "index")

    resident = emb.where(F.col("vec_id").between(100, 199))
    similarity.ivf_append(
        resident, f"{idx}/ingest_batch=0", C, dim=DIM, mode="overwrite"
    )
    n_resident = spark.read.parquet(idx).count()
    assert n_resident == resident.count()  # ids 100-199 are clean rows

    # all-wrong-dim batch: nothing may land, resident rows untouched
    bad = emb.where(F.col("vec_id").isin(31, 32))
    similarity.ivf_append(
        bad, f"{idx}/ingest_batch=1", C, dim=DIM, mode="overwrite"
    )
    assert spark.read.parquet(idx).count() == n_resident

    # mixed batch: only the conforming rows append
    mixed = emb.where(F.col("vec_id").isin(31, 32, 200, 201))
    similarity.ivf_append(
        mixed, f"{idx}/ingest_batch=2", C, dim=DIM, mode="overwrite"
    )
    grown = spark.read.parquet(idx)
    assert grown.count() == n_resident + 2
    ids = {r.vec_id for r in grown.select("vec_id").collect()}
    assert {200, 201} <= ids and not ({31, 32} & ids)


def test_stream_lsh_ingest_on_hostile_corpus_properties(spark,
                                                        hostile_emb_dir):
    """The r13 stream_lsh_ingest key on the poisoned corpus — same
    contract as the IVF ingest keys' property test: the streaming
    append path must RUN (lsh_bucket_ids -> finite_vectors excludes
    corrupt/wrong-dim vectors at hash time, so no ragged np.stack
    crash inside foreachBatch), the returned exact top-10 must be
    finite and corrupt-free, and the recall verdict column must be a
    0/1 INT (the oracle pin to 1 lives on the clean fixture; on the
    poisoned corpus the floor may legitimately not be met — the
    verdict must still COMPUTE, not crash)."""
    from dask_hivemetastore_spark import plans

    rows = plans.QUERIES["stream_lsh_ingest"](spark, hostile_emb_dir).collect()
    corrupt_ids = {10, 11, 12, 20, 21, 22, 31, 32}
    assert 0 < len(rows) <= 10
    assert all(np.isfinite(r.cosine) for r in rows)
    assert not corrupt_ids & {r.vec_id for r in rows}
    assert {r.lsh_recall_floor_met for r in rows} <= {0, 1}


def test_knn_lsh_join_on_hostile_corpus_properties(spark, hostile_emb_dir):
    """The r13 batched LSH probe key on the poisoned corpus — property
    contract, not oracle replay (the mean-recall floor is a
    clean-fixture pin: the legal norm-8000 vector dominates several
    queries' exact top-5 here, and whether every probe set collides
    with its bucket is a recall outcome, not a correctness bug): the
    key must RUN, return only finite corrupt-free rows (they come from
    the certified exact knn_join twin), keep exactly <=5 rows per
    in-corpus query, and COMPUTE a 0/1 verdict."""
    from dask_hivemetastore_spark import plans

    rows = plans.QUERIES["knn_lsh_join"](spark, hostile_emb_dir).collect()
    corrupt_ids = {10, 11, 12, 20, 21, 22, 31, 32}
    assert rows
    assert all(np.isfinite(r.cosine) for r in rows)
    assert not corrupt_ids & {r.vec_id for r in rows}
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r.q_id] = per_q.get(r.q_id, 0) + 1
    assert all(n <= 5 for n in per_q.values())
    assert {r.lsh_recall_floor_met for r in rows} <= {0, 1}


def test_mmr_rerank_absent_query_empty_schema_stable(spark, sf_dir):
    """MMR on a corrupt/absent query id: empty result with the stable
    output schema (no-answer, never wrong — the knn_topk contract
    propagates through the rerank)."""
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    out = mmr_rerank(emb, query_id=987654321, k=5, dim=64)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "pick", "vec_id", "label", "cosine", "mmr_score"]


def test_rrf_fuse_empty_arm_degrades_to_other_arm(spark):
    """Hybrid fusion with one EMPTY arm (e.g. no document matches any
    query term): the fused ranking degrades to the surviving arm's
    contributions — no crash, no phantom rows, n_arms = 1."""
    from dask_hivemetastore_spark.operators.similarity import rrf_fuse

    dense = spark.createDataFrame(
        [(7, 1), (3, 2)], "id long, rank int")
    empty = spark.createDataFrame([], "id long, rank int")
    out = {r["id"]: (r["rrf_raw"], r["n_arms"])
           for r in rrf_fuse([empty, dense], "id", k0=60).collect()}
    assert out == {7: (1 / 61, 1), 3: (1 / 62, 1)}
