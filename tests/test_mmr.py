"""MMR diversified retrieval (functions/mmr.py)."""

from pyspark.sql import functions as F

from etl_opensky_spark.functions.mmr import mmr_topk


def _brute_mmr(rows, query, k):
    """Reference greedy in plain Python over quantized ints."""
    Q = 1_000_000
    qq = [round(x * Q) for x in query]
    vq = {i: [round(x * Q) for x in v] for i, v in rows}

    def d(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    dq = {i: d(v, qq) for i, v in vq.items()}
    picked = []
    for _ in range(k):
        best = None
        for i in sorted(vq):
            if i in picked:
                continue
            score = dq[i] - (
                min(d(vq[i], vq[j]) for j in picked) if picked else 0
            )
            if best is None or (score, i) < best:
                best = (score, i)
        picked.append(best[1])
    return picked


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_matches_reference_greedy(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)]
    query = [rng.uniform(-1, 1) for _ in range(4)]
    got = [
        r["vec_id"]
        for r in mmr_topk(_emb(spark, rows), query, k=6, candidates=40)
        .orderBy("pick_rank")
        .collect()
    ]
    assert got == _brute_mmr(rows, query, 6)


def test_candidate_cut_respected(spark):
    import random

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)]
    query = [0.0, 0.0, 0.0, 0.0]
    got = {
        r["vec_id"]
        for r in mmr_topk(
            _emb(spark, rows), query, k=3, candidates=10
        ).collect()
    }
    top10 = set(_brute_mmr(rows, query, 40)[:1])  # just sanity on shape
    # every pick must come from the 10 most relevant by pure distance
    Q = 1_000_000
    qq = [round(x * Q) for x in query]
    dq = sorted(
        (
            sum(
                (round(x * Q) - a) * (round(x * Q) - a)
                for x, a in zip(v, qq)
            ),
            i,
        )
        for i, v in rows
    )
    allowed = {i for _, i in dq[:10]}
    assert got <= allowed and len(got) == 3
    assert top10  # silence unused warning path


def test_first_pick_is_pure_relevance_and_ties_break_low(spark):
    df = _emb(
        spark, [(7, [1.0, 0.0]), (3, [1.0, 0.0]), (9, [2.0, 0.0])]
    )
    got = mmr_topk(df, [0.0, 0.0], k=1, candidates=3).collect()
    assert got[0]["vec_id"] == 3  # tie with 7 -> lowest id
    assert got[0]["score"] == got[0]["rel_dist"]


def test_partitioning_invariant(spark):
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(30)]
    a = mmr_topk(_emb(spark, rows), [0.1, 0.2, 0.3, 0.4], k=4,
                 candidates=30).collect()
    b = mmr_topk(
        _emb(spark, rows).repartition(7), [0.1, 0.2, 0.3, 0.4], k=4,
        candidates=30,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
