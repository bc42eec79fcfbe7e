"""The q227 fusion (``dedup_and_index_batch``): one ingest step must be
byte-equivalent to the manual ``dedup_batch_against_index`` +
``localCheckpoint`` + ``append_to_dedup_index`` composition, pin its
decisions BEFORE the index mutates, and release its checkpointed
intermediates once the kept set is materialized."""

from __future__ import annotations

import pytest

from etl_opensky_spark.functions.dedup import (
    append_to_dedup_index,
    build_dedup_index,
    dedup_and_index_batch,
    dedup_batch_against_index,
)

BASE = "the quick brown fox jumps over the lazy dog again and again"
CORPUS_ROWS = [
    (1, BASE),
    (2, "completely different corpus text about spark plans"),
    (3, "short"),
]
BATCH1 = [
    (100, BASE + " tail"),  # near-dup of doc 1 -> dropped
    (101, "novel content that matches nothing in the corpus at all"),
]
BATCH2 = [
    (200, "novel content that matches nothing in the corpus at most"),
    # ^ near-dup of KEPT doc 101, caught only if batch-1 survivors were
    #   appended to the index
    (201, "entirely fresh words appearing nowhere else in any document"),
]


def _run(spark, tmp_path, sub, fused: bool):
    corpus = spark.createDataFrame(CORPUS_ROWS, ["doc_id", "text"])
    idx = str(tmp_path / sub)
    build_dedup_index(corpus, "doc_id", "text", idx)
    kept_ids = []
    for rows in (BATCH1, BATCH2):
        batch = spark.createDataFrame(rows, ["doc_id", "text"])
        if fused:
            kept = dedup_and_index_batch(
                spark, batch, corpus, idx, "doc_id", "text"
            )
        else:
            kept = dedup_batch_against_index(
                spark, batch, corpus, idx, "doc_id", "text"
            ).localCheckpoint()
            append_to_dedup_index(kept, "doc_id", "text", idx)
        kept_ids.append(sorted(r["doc_id"] for r in kept.collect()))
        corpus = corpus.unionByName(kept)
    bands = spark.read.parquet(idx)
    band_rows = sorted(
        (r["doc_id"], r["band"], r["bh"]) for r in bands.collect()
    )
    return kept_ids, band_rows


def test_fusion_matches_manual_composition(spark, tmp_path):
    fused_kept, fused_bands = _run(spark, tmp_path, "f", fused=True)
    man_kept, man_bands = _run(spark, tmp_path, "m", fused=False)
    # decisions identical per batch, and batch-2 proves the append
    # LANDED (200 dedups against kept doc 101, not just the corpus)
    assert fused_kept == man_kept == [[101], [201]]
    # index contents byte-identical: same (id, band, band-hash) rows
    assert fused_bands == man_bands


def test_decisions_pinned_before_append(spark, tmp_path):
    """A batch containing its own near-duplicate pair: the kept set must
    be decided against the PRE-APPEND index — if the survivors' bands
    were visible to their own probe, every batch doc would self-match
    and be dropped."""
    corpus = spark.createDataFrame(CORPUS_ROWS, ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, "doc_id", "text", idx)
    novel = "novel content that matches nothing in the corpus at all"
    batch = spark.createDataFrame([(100, novel)], ["doc_id", "text"])
    kept = dedup_and_index_batch(spark, batch, corpus, idx, "doc_id", "text")
    # the survivor is kept even though its own bands are in the index
    # by the time the returned frame is re-collected
    assert [r["doc_id"] for r in kept.collect()] == [100]
    assert [r["doc_id"] for r in kept.collect()] == [100]  # stable re-read


def test_intermediate_checkpoints_released(spark, tmp_path):
    """After one fused step, the probe/candidate/gram checkpoints are
    unpersisted — only the returned kept frame may still hold blocks."""
    sc = spark.sparkContext
    corpus = spark.createDataFrame(CORPUS_ROWS, ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, "doc_id", "text", idx)
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    batch = spark.createDataFrame(BATCH1, ["doc_id", "text"])
    kept = dedup_and_index_batch(spark, batch, corpus, idx, "doc_id", "text")
    after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    # exactly one NEW persisted RDD survives the call: kept's checkpoint
    # (probes + cand + bg + cg were released)
    assert len(after - before) == 1
    assert kept.count() == 1


@pytest.mark.parametrize("fused", [True, False])
def test_short_docs_always_kept(spark, tmp_path, fused):
    corpus = spark.createDataFrame(CORPUS_ROWS, ["doc_id", "text"])
    idx = str(tmp_path / ("s" if fused else "t"))
    build_dedup_index(corpus, "doc_id", "text", idx)
    batch = spark.createDataFrame([(102, "xy")], ["doc_id", "text"])
    if fused:
        kept = dedup_and_index_batch(
            spark, batch, corpus, idx, "doc_id", "text"
        )
    else:
        kept = dedup_batch_against_index(
            spark, batch, corpus, idx, "doc_id", "text"
        )
    assert [r["doc_id"] for r in kept.collect()] == [102]
