"""BPE training (operators/bpe.py): single-node replay parity, textbook
hand-computed merge sequence, greedy left-to-right overlap handling,
early stop, segmentation round-trip, determinism across partitioning."""

from __future__ import annotations

from connected_components_3d_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    bpe_train_single_node,
)


def docs_df(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)


def test_hand_computed_merges(spark):
    """'low' x5, 'lower' x2: pair (l,o) count 7 wins first; then (lo,w)."""
    texts = ["low " * 5, "lower " * 2]
    res = bpe_train(docs_df(spark, texts), num_merges=3)
    assert res.merges[0] == ("l", "o")
    assert res.merges[1] == ("lo", "w")
    assert res.merges == bpe_train_single_node(texts, num_merges=3)


def test_parity_and_partition_invariance(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quicker they come the quicker they go",
        "pack my box with five dozen liquor jugs",
        "the dog jumps and jumps and jumps again",
    ] * 3
    exp = bpe_train_single_node(texts, num_merges=10)
    for parts in (1, 8):
        res = bpe_train(docs_df(spark, texts, parts), num_merges=10)
        assert res.merges == exp


def test_overlap_left_to_right(spark):
    """'aaaa' under merge (a,a): greedy fold yields [aa, aa] — the pair
    (aa, aa) then exists for the next merge."""
    texts = ["aaaa aaaa aaaa"]
    res = bpe_train(docs_df(spark, texts), num_merges=2)
    assert res.merges == [("a", "a"), ("aa", "aa")]
    assert res.merges == bpe_train_single_node(texts, num_merges=2)


def test_early_stop_and_segment(spark):
    texts = ["a b c"]  # single-char words: no pairs at all
    res = bpe_train(docs_df(spark, texts), num_merges=5)
    assert res.merges == []
    seg = bpe_segment(
        docs_df(spark, ["below lower low"]),
        [("l", "o"), ("lo", "w")],
    ).collect()[0]["subwords"]
    assert seg == ["b", "e", "low", "low", "e", "r", "low"]
