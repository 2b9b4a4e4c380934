"""DUST rule mining (stages/dust)."""

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from commoncrawl_ray.stages.dust import (
    alias_rows,
    group_rules,
    mine_dust_rules,
    pair_rule,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pair_rule_basic():
    assert pair_rule("http://a/x", "http://a/x/index.html") == ("", "/index.html")
    assert pair_rule("http://a/x/index.html", "http://a/x?print=1") == (
        "/index.html",
        "?print=1",
    )


def test_pair_rule_suffix_clamp():
    # u1 is a strict prefix of u2 AND u2's tail matches u1's tail
    # ("...1" vs "...1?print=1"): naive LCS would overlap the LCP —
    # the clamp keeps alpha empty
    assert pair_rule("http://a/story/1", "http://a/story/1?print=1") == (
        "",
        "?print=1",
    )


def test_pair_rule_mid_vs_mid():
    # path-vs-query alias: prefix ".../story", suffix = the id digits
    assert pair_rule(
        "http://a/story.php?id=57", "http://a/story/57"
    ) == (".php?id=", "/")


def test_group_rules_cap():
    urls = [f"http://h/{i}" for i in range(10)]
    assert group_rules(urls, max_group=5) is None  # over cap -> skipped
    r = group_rules(urls[:3], max_group=5)
    assert isinstance(r, Counter) and sum(r.values()) == 3  # C(3,2)


def test_cap_applies_to_distinct_urls_not_sightings():
    # 100 sightings of 2 aliases is one pair, not an over-wide group
    urls = ["http://h/a", "http://h/a?print=1"] * 50
    r = group_rules(urls, max_group=8)
    assert r == Counter({("", "?print=1"): 1})


def test_identical_urls_collapse():
    # duplicate sightings of the same URL must not emit empty->empty
    r = group_rules(["http://h/a", "http://h/a"], max_group=8)
    assert r == Counter()


def test_mine_recovers_planted_rules(ray_session):
    import ray.data as rd

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    us, dg = [], []
    for r in t.to_pylist():
        u, d = alias_rows(r["doc_id"], r["text"])
        us.extend(u)
        dg.extend(d)
    ds = rd.from_arrow(
        pa.table({"url": pa.array(us), "digest": pa.array(dg)})
    ).repartition(7)
    got = {
        (r["alpha"], r["beta"]): r["support"]
        for r in mine_dust_rules(ds, min_support=3).take_all()
    }
    n = t.num_rows
    assert got == {
        ("", "/index.html"): n,
        ("", "?print=1"): n,
        (".php?id=", "/"): n,
        ("/index.html", "?print=1"): n,
    }
