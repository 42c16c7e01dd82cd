"""Text analysis + dedup + similarity operators over the driver's documents /
embeddings tables and hand-built fixtures."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from connected_components_3d_spark.functions import text as T
from connected_components_3d_spark.operators import dedup as D
from connected_components_3d_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tokens_and_counts(spark):
    df = docs_df(spark, ["Hello, World! 42 hello", ""])
    r = df.select(
        T.tokens("text").alias("t"),
        T.token_count_ws("text").alias("ws"),
        T.token_count_bpe("text").alias("bpe"),
    ).collect()
    assert list(r[0]["t"]) == ["hello", "world", "42", "hello"]
    assert r[0]["ws"] == 4
    # hello | , | world | ! | 4 | 2 | hello = 7
    assert r[0]["bpe"] == 7
    assert r[1]["ws"] == 0 and r[1]["bpe"] == 0


def test_lang_id(spark):
    df = docs_df(
        spark,
        [
            "the cat is in the house and it is warm",
            "der hund ist nicht mit der katze auf das",
            "le chat est dans la maison et les oiseaux",
            "zzz qqq",  # no stopword hits → tie → alphabetical min 'de'
            "",
        ],
    )
    got = [r[0] for r in df.select(T.lang_id("text")).collect()]
    assert got == ["en", "de", "fr", "de", "und"]


def test_quality_score_monotonicity(spark):
    good = "the data table is in the store and it is good " * 10
    bad = "!!! ??? ;;; ***"
    df = docs_df(spark, [good, bad])
    scores = [r[0] for r in df.select(T.quality_score("text")).collect()]
    assert scores[0] > scores[1]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_fingerprint_detects_same_content(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    b = a  # identical
    c = "totally different words here none shared with the above at all"
    df = docs_df(spark, [a, b, c])
    fps = [r[0] for r in df.select(T.fingerprint("text")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_exact_dup_groups(spark):
    df = docs_df(spark, ["same text", "same text", "other"])
    rows = {r["canonical_id"]: r for r in D.exact_dup_groups(df).collect()}
    assert rows[0]["group_size"] == 2
    assert rows[2]["group_size"] == 1


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely unrelated content about spark partitions and shuffles"
    df = docs_df(spark, [base, near, far])
    cand = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(df).collect()}
    assert (0, 1) in cand
    nd = D.near_duplicates_minhash(df, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in nd.collect()}
    assert (0, 1) in got and got[(0, 1)] >= 0.5
    assert (0, 2) not in got and (1, 2) not in got


def test_ngram_jaccard_exact_value(spark):
    # bigrams of "a b c d": {a_b, b_c, c_d}; of "a b c e": {a_b, b_c, c_e}
    # intersection 2, union 4 → 0.5
    df = docs_df(spark, ["a b c d", "a b c e"])
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    j = D.ngram_jaccard_pairs(df, pairs).collect()[0]
    assert abs(j["jaccard"] - 0.5) < 1e-9


def test_simhash_near_vs_far(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 2
    near = base + "extra"
    far = "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm lll kkk"
    df = docs_df(spark, [base, near, far])
    h = {r.id: r.simhash for r in D.simhash(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[0], h[1]) <= ham(h[0], h[2])
    assert 0 <= h[0] < (1 << 16)


def _numpy_topk(vecs, ids, k):
    out = {}
    for i, a in zip(ids, vecs):
        cos = []
        for j, b in zip(ids, vecs):
            if i == j:
                continue
            c = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
            cos.append((round(c, 6), -j))
        cos.sort(reverse=True)
        out[i] = [(-nj, c) for c, nj in cos[:k]]
    return out


def test_cosine_topk_brute_vs_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(60)
    rows = emb.collect()
    ids = [r.vec_id for r in rows]
    vecs = [np.array(r.embedding, dtype=np.float64) for r in rows]
    want = _numpy_topk(vecs, ids, 3)
    got_rows = S.cosine_topk_brute(emb, k=3).collect()
    got: dict[int, list] = {}
    for r in sorted(got_rows, key=lambda r: (r.id_a, r.rn)):
        got.setdefault(r.id_a, []).append((r.id_b, r.cos))
    for i in ids:
        assert [x[0] for x in got[i]] == [x[0] for x in want[i]], i
        for (gb, gc), (wb, wc) in zip(got[i], want[i]):
            assert abs(gc - wc) < 2e-6


def test_lsh_ann_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    exact = {
        (r.id_a, r.id_b) for r in S.cosine_topk_brute(emb, k=5).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in S.cosine_topk_lsh(emb, k=5, num_planes=4, num_tables=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random 64-dim vectors are the hard case (neighbors nearly orthogonal);
    # 6 tables x 4 planes must recover a solid fraction of true top-5
    assert recall >= 0.4, recall


def test_embedding_near_dup_pairs_symmetric_threshold(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [[1.0, 0.0], [0.999, 0.01], [0.0, 1.0]],
        }
    )
    emb = spark.createDataFrame(pdf)
    got = {(r.id_a, r.id_b) for r in S.embedding_near_dup_pairs(emb, 0.99).collect()}
    assert got == {(1, 2)}


def test_ivf_full_probe_equals_brute(spark):
    """n_probe == n_cells degenerates IVF to exact brute force — the strong
    correctness property of the inverted-file plumbing."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(120)
    brute = {
        (r.id_a, r.rn): r.id_b for r in S.cosine_topk_brute(emb, k=3).collect()
    }
    ivf = {
        (r.id_a, r.rn): r.id_b
        for r in S.cosine_topk_ivf(emb, k=3, n_cells=8, n_probe=8).collect()
    }
    assert ivf == brute


def test_ivf_partial_probe_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    exact = {
        (r.id_a, r.id_b) for r in S.cosine_topk_brute(emb, k=5).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in S.cosine_topk_ivf(emb, k=5, n_cells=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # probing half the cells of near-orthogonal random vectors: recall well
    # above the ~0.5 expected-cell-coverage floor
    assert recall >= 0.45, recall


def test_ivf_centroids_deterministic_partition_invariant(spark):
    """VERDICT r1 #3: the quantizer must be deterministic and independent of
    the input's partitioning (hash-mod sample + TakeOrderedAndProject, no
    global window)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(300)
    base = sorted(r.cid for r in S.ivf_centroids(emb, n_cells=8).collect())
    assert len(base) == 8
    for parts in (1, 7, 32):
        got = sorted(
            r.cid for r in S.ivf_centroids(emb.repartition(parts), n_cells=8).collect()
        )
        assert got == base, parts


def test_ann_plans_have_no_single_partition_exchange(spark):
    """No ANN plan may funnel the embedding table through one task: global
    windows/sorts show up as 'Exchange SinglePartition' in the physical plan
    (TakeOrderedAndProject and per-key windows do not)."""
    from connected_components_3d_spark.plans.audit import explain_str

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100)
    for df in (
        S.ivf_centroids(emb, n_cells=8),
        S.cosine_topk_ivf(emb, k=3, n_cells=8, n_probe=2),
        S.cosine_topk_lsh(emb, k=3, num_planes=4, num_tables=2),
    ):
        plan = explain_str(df)
        assert "Exchange SinglePartition" not in plan, plan[:2000]


def test_near_dup_groups_transitive(spark):
    """near_dup_groups must place transitively-linked dupes (A≈B, B≈C, A–C
    never candidates) into ONE group keyed by the min doc_id, and leave
    non-dupes as singletons."""
    import pandas as pd

    from connected_components_3d_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    base + "alpha beta gamma delta epsilon",
                    base + "alpha beta gamma delta zeta",     # ≈ doc 0
                    base + "alpha beta gamma eta zeta",       # ≈ doc 1
                    "completely different text about spark engines and graphs",
                ],
            }
        )
    )
    got = {
        r.doc_id: r.group_id
        for r in D.near_dup_groups(spark, docs, jaccard_threshold=0.5).collect()
    }
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == 3


def test_ivf_kmeans_full_probe_equals_brute(spark):
    """Full probe is exact for ANY quantizer — including the Lloyd-refined
    one (cells may shrink below n_cells; probing all of them still covers
    every posting)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(120)
    brute = {
        (r.id_a, r.rn): r.id_b for r in S.cosine_topk_brute(emb, k=3).collect()
    }
    ivf = {
        (r.id_a, r.rn): r.id_b
        for r in S.cosine_topk_ivf(
            emb, k=3, n_cells=8, n_probe=8, refine_iters=2
        ).collect()
    }
    assert ivf == brute


def test_ivf_kmeans_centroids_partition_invariant(spark):
    """Rounded means absorb double-sum reassociation: the refined quantizer
    must produce identical centroids under any input partitioning."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    def snap(df):
        return sorted(
            (r.cid, tuple(r.cvec))
            for r in S.ivf_centroids_kmeans(df, n_cells=8, iters=2).collect()
        )
    base = snap(emb)
    assert snap(emb.repartition(13)) == base
    assert snap(emb.repartition(3)) == base


def test_ivf_kmeans_partial_probe_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    exact = {(r.id_a, r.id_b) for r in S.cosine_topk_brute(emb, k=5).collect()}
    approx = {
        (r.id_a, r.id_b)
        for r in S.cosine_topk_ivf(
            emb, k=5, n_cells=8, n_probe=4, refine_iters=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.45, recall


def test_mutual_nearest_pairs(spark):
    """Hand-built geometry: (1,2) and (3,4) are reciprocal best matches;
    5's best is 1 but 1's best is 2, so 5 pairs with nobody."""
    from connected_components_3d_spark.operators.similarity import (
        mutual_nearest_pairs,
    )

    vecs = [
        (1, [1.0, 0.0, 0.05]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.05]),
        (4, [0.0, 1.0, 0.0]),
        (5, [0.9, 0.1, 0.5]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = sorted(
        (r["id_a"], r["id_b"]) for r in mutual_nearest_pairs(emb).collect()
    )
    assert got == [(1, 2), (3, 4)]


def test_mutual_nearest_pairs_pluggable_topk(spark):
    """The topk= seam: LSH-sourced mutual pairs recover a recall floor of
    the brute mutual pairs (generous tables → near-total recall on this
    fixture), and a k>1 candidate table is re-reduced to top-1 internally."""
    import random

    from connected_components_3d_spark.operators.similarity import (
        cosine_topk_brute,
        cosine_topk_lsh,
        mutual_nearest_pairs,
    )

    rng = random.Random(11)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    brute = {
        (r["id_a"], r["id_b"]) for r in mutual_nearest_pairs(emb).collect()
    }
    lsh_topk = cosine_topk_lsh(emb, k=3, num_planes=3, num_tables=8)
    approx = {
        (r["id_a"], r["id_b"])
        for r in mutual_nearest_pairs(emb, topk=lsh_topk).collect()
    }
    assert brute, "fixture must produce mutual pairs"
    assert len(approx & brute) / len(brute) >= 0.6
    # passing the brute k=3 table reproduces the default exactly (top-1
    # re-derivation inside the seam)
    same = {
        (r["id_a"], r["id_b"])
        for r in mutual_nearest_pairs(
            emb, topk=cosine_topk_brute(emb, k=3)
        ).collect()
    }
    assert same == brute


def test_brute_cosine_guard(spark):
    """The O(n²) baselines refuse oversized inputs unless the threshold is
    raised deliberately (round-5 scale-safety guard)."""
    from connected_components_3d_spark.operators.similarity import (
        cosine_pairs,
        cosine_topk_brute,
        embedding_near_dup_pairs,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    for fn in (
        lambda: cosine_pairs(emb, brute_max_rows=10),
        lambda: cosine_topk_brute(emb, brute_max_rows=10),
        lambda: embedding_near_dup_pairs(emb, brute_max_rows=10),
    ):
        with pytest.raises(ValueError, match="brute_max_rows"):
            fn()
    assert cosine_pairs(emb, brute_max_rows=1000).count() == 30 * 29


def test_lang_id_seven_languages(spark):
    """Round-5 extension: es/it/nl/pt profiles join de/en/fr; alphabetical
    tie-break is preserved across the whole set."""
    df = docs_df(
        spark,
        [
            "la casa de los gatos que se ven en el patio",      # es
            "il cane che corre per una strada con il gatto",    # it
            "ik heb een boek van de man dat op tafel zijn",     # nl
            "o gato do jardim em um dia para a casa com sol",   # pt
            "the cat is in the house and it is warm",           # en
        ],
    )
    got = [r[0] for r in df.select(T.lang_id("text")).collect()]
    assert got == ["es", "it", "nl", "pt", "en"]
