"""DUST parameter-rule mining (operators/dust.py): planted
irrelevant/relevant parameters, group/residual semantics, min_support,
bare tokens, fragment stripping, multi-host isolation, degenerates."""

from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.dust import param_dust_rules


def pages_df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def rules_map(res):
    return {
        (r["host"], r["param"]): (
            r["n_groups"],
            r["n_consistent"],
            r["irrelevant"],
        )
        for r in res.rules.collect()
    }


def test_planted_irrelevant_and_relevant_params(spark):
    rows = []
    # sess is content-irrelevant; page determines the content
    for page in range(3):
        for sess in range(3):
            rows.append(
                (
                    f"https://a.example.com/list?page={page}&sess={sess}",
                    f"content for page {page}",
                )
            )
    got = rules_map(param_dust_rules(pages_df(spark, rows)))
    # sess: 3 groups (one per page), all consistent → irrelevant
    assert got[("a.example.com", "sess")] == (3, 3, True)
    # page: 3 groups (one per sess), content varies → not irrelevant
    assert got[("a.example.com", "page")] == (3, 0, False)


def test_min_support_gates_rule(spark):
    rows = [
        ("https://b.example.com/x?sid=1", "same"),
        ("https://b.example.com/x?sid=2", "same"),
    ]
    lo = rules_map(param_dust_rules(pages_df(spark, rows), min_support=1))
    hi = rules_map(param_dust_rules(pages_df(spark, rows), min_support=2))
    assert lo[("b.example.com", "sid")] == (1, 1, True)
    assert hi[("b.example.com", "sid")] == (1, 1, False)


def test_residual_canonicalization_orders_other_params(spark):
    """The same page reached with other-params in different ORDER still
    lands in one group (residual sorts the surviving tokens)."""
    rows = [
        ("https://c.example.com/p?a=1&b=2&s=x", "T"),
        ("https://c.example.com/p?b=2&a=1&s=y", "T"),
    ]
    got = rules_map(param_dust_rules(pages_df(spark, rows)))
    assert got[("c.example.com", "s")] == (1, 1, False)  # support 1 < 2
    got1 = rules_map(param_dust_rules(pages_df(spark, rows), min_support=1))
    assert got1[("c.example.com", "s")] == (1, 1, True)


def test_fragment_stripped_and_bare_tokens(spark):
    rows = [
        ("https://d.example.com/p?utm&x=1#frag", "A"),
        ("https://d.example.com/p?utm=z&x=1", "A"),
        ("https://d.example.com/p?x=1", "other"),  # no 'utm' key: ignored
    ]
    got = rules_map(param_dust_rules(pages_df(spark, rows), min_support=1))
    # both utm variants (bare and valued) form one group over residual ?x=1
    assert got[("d.example.com", "utm")] == (1, 1, True)


def test_hosts_isolated(spark):
    rows = [
        ("https://e1.example.com/p?s=1", "X"),
        ("https://e1.example.com/p?s=2", "X"),
        ("https://e2.example.com/p?s=1", "Y1"),
        ("https://e2.example.com/p?s=2", "Y2"),
    ]
    got = rules_map(param_dust_rules(pages_df(spark, rows)))
    assert got[("e1.example.com", "s")] == (1, 1, False)
    assert got[("e2.example.com", "s")] == (1, 0, False)


def test_no_query_urls_ignored_and_empty(spark):
    res = param_dust_rules(
        pages_df(spark, [("https://f.example.com/plain", "T")])
    )
    assert res.rules.count() == 0
    assert param_dust_rules(pages_df(spark, [])).rules.count() == 0


def test_validation():
    with pytest.raises(AssertionError):
        param_dust_rules(None, min_support=0)
