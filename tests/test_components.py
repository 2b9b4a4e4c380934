"""connected_components (stages/components.py): known graphs plus a
randomized cross-check against a plain union-find."""

import pytest
import numpy as np
import pyarrow as pa
import ray.data as rd


def _cc(pairs_table, **kw):
    from commoncrawl_ray.stages.components import connected_components

    out = connected_components(rd.from_arrow(pairs_table), **kw)
    return {r["doc_id"]: r["component_id"] for r in out.take_all()}


def test_chain_and_island(ray_session):
    t = pa.table(
        {
            "id_a": pa.array([1, 2, 10], pa.int64()),
            "id_b": pa.array([2, 3, 11], pa.int64()),
        }
    )
    assert _cc(t) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(ray_session):
    """A 40-node path needs many propagation rounds — exercises the
    sum-fixed-point loop, not just one-hop merges."""
    n = 40
    t = pa.table(
        {
            "id_a": pa.array(list(range(n - 1)), pa.int64()),
            "id_b": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    got = _cc(t)
    assert got == {i: 0 for i in range(n)}


def test_random_graph_matches_union_find(ray_session):
    rng = np.random.RandomState(11)
    n_nodes, n_edges = 200, 120
    a = rng.randint(0, n_nodes, n_edges).astype("int64")
    b = rng.randint(0, n_nodes, n_edges).astype("int64")
    keep = a != b
    a, b = a[keep], b[keep]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        parent[find(int(x))] = find(int(y))
    touched = set(map(int, a)) | set(map(int, b))
    want = {}
    roots = {}
    for x in sorted(touched):
        r = find(x)
        roots.setdefault(r, x)  # smallest member = component id
        want[x] = roots[r]

    got = _cc(pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
    assert got == want


# --- pagerank building blocks (stages/pagerank.py) --------------------


def test_extract_host_edges_batch():
    import pyarrow as pa

    from commoncrawl_ray.stages.pagerank import extract_host_edges_batch

    t = pa.table(
        {
            "url": ["http://a.com/x", "http://b.com/y", "http://c.com/z"],
            "anchors": [
                # href\ntext\n pairs (protocol.jr:120 wire format)
                "http://b.com/p\nlink\n/local\nself link\nhttp://a.com/q\ndup host a? no: self\n",
                "rel/path\nrelative\nhttp://B.com/upper\nself after lower\nmailto:x@y\nskip\n",
                None,
            ],
            "base_url": [None, "http://base.org/dir/", None],
        }
    )
    out = extract_host_edges_batch(t)
    pairs = sorted(zip(out.column("src").to_pylist(), out.column("dst").to_pylist()))
    # a.com -> b.com (self-loops a->a dropped); b.com -> base.org via
    # <base>-resolved relative link (B.com lowercases to self, dropped)
    assert pairs == [("a.com", "b.com"), ("b.com", "base.org")]


def test_distinct_sorted_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.stages.pagerank import _distinct_sorted

    t = pa.table(
        {
            "src": ["a", "a", "b", "a", "b"],
            "dst": ["x", "x", "y", "z", "y"],
        }
    )
    out = _distinct_sorted(rd.from_arrow(t), ["src", "dst"])
    pairs = sorted(zip(*[out.to_pandas()[c] for c in ("src", "dst")]))
    assert pairs == [("a", "x"), ("a", "z"), ("b", "y")]


def test_triangle_count_known_graph(ray_session):
    """stages/pagerank.triangle_count on a hand-built graph: K4 has 4
    triangles, plus a disjoint path (0 triangles), duplicate and
    reversed edges and self-loops must not change the count."""
    import ray.data as rd

    from commoncrawl_ray.stages.pagerank import triangle_count

    k4 = ["a", "b", "c", "d"]
    edges = [(u, v) for i, u in enumerate(k4) for v in k4[i + 1 :]]
    edges += [(v, u) for u, v in edges]      # reversed duplicates
    edges += [("x", "y"), ("y", "z")]         # open path
    edges += [("a", "a"), ("b", "b")]         # self loops
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])
    out = triangle_count(ds).to_pandas()
    assert out["n_triangles"].tolist() == [4]


def test_triangle_count_degree_cap(ray_session):
    """A star hub wider than max_degree is skipped (its wedges are
    never enumerated), so the capped count drops to zero."""
    import ray.data as rd

    from commoncrawl_ray.stages.pagerank import triangle_count

    hub = [("h", f"n{i}") for i in range(12)]
    ring = [(f"n{i}", f"n{i+1}") for i in range(11)]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in hub + ring])
    full = triangle_count(ds).to_pandas()["n_triangles"][0]
    assert full == 11  # h-n_i-n_{i+1} triangles
    capped = triangle_count(ds, max_degree=5).to_pandas()["n_triangles"][0]
    assert capped == 0


def test_resolve_links_aligned_positions():
    from commoncrawl_ray.stages.links import resolve_links, resolve_links_aligned

    hrefs = [
        "http://b.com/p",
        "mailto:x@y",
        "/local",
        "",
        "#frag",
        "http://b.com/p",  # repeat kept (no dedup in aligned mode)
    ]
    out = resolve_links_aligned("http://a.com/x", hrefs)
    assert len(out) == len(hrefs)
    assert out[0] == "http://b.com/p"
    assert out[1] is None and out[3] is None and out[4] is None
    assert out[2] == "http://a.com/local"
    assert out[5] == "http://b.com/p"
    # the filtered variant dedups; aligned preserves multiplicity
    assert resolve_links("http://a.com/x", hrefs).count("http://b.com/p") == 1
    # <base> honored identically in both
    assert (
        resolve_links_aligned("http://a.com/d/", ["rel"], "http://base.org/dir/")[0]
        == "http://base.org/dir/rel"
    )


def test_extract_anchor_terms_batch():
    import pyarrow as pa

    from commoncrawl_ray.stages.pagerank import extract_anchor_terms_batch

    t = pa.table(
        {
            "url": ["http://a.com/x", "http://b.com/y", "http://c.com/z"],
            "anchors": [
                # off-host link with two terms; self-host link ignored;
                # empty anchor text ignored
                "http://b.com/p\nGreat Site\nhttp://a.com/q\nself host\n/local\n\n",
                # repeated link -> terms counted per occurrence
                "http://a.com/1\nnews\nhttp://a.com/2\nnews\n",
                None,
            ],
            "base_url": [None, None, None],
        }
    )
    out = extract_anchor_terms_batch(t)
    pairs = sorted(zip(out.column("dst").to_pylist(), out.column("term").to_pylist()))
    assert pairs == [
        ("a.com", "news"),
        ("a.com", "news"),
        ("b.com", "great"),
        ("b.com", "site"),
    ]


def test_trustrank_demotes_spam_farm(ray_session):
    """trustrank_edges on a hand-built graph: a spam farm (clique of
    s1..s4 all linking to spam.com) inflates plain in-degree, but no
    trusted host links into the farm, so its TrustRank is exactly 0 —
    while pages reachable from the seed keep positive trust. Dangling
    mass returns to the seeds (scores stay a distribution over the
    reachable set)."""
    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.stages.pagerank import trustrank_edges

    edges = [
        # trusted neighborhood: seed -> good1 -> good2 (dangling)
        ("seed.org", "good1.com"),
        ("seed.org", "good2.com"),
        ("good1.com", "good2.com"),
        # spam farm: clique + everyone boosting spam.com
        ("s1.com", "spam.com"), ("s2.com", "spam.com"),
        ("s3.com", "spam.com"), ("s4.com", "spam.com"),
        ("s1.com", "s2.com"), ("s2.com", "s3.com"),
        ("s3.com", "s4.com"), ("s4.com", "s1.com"),
        ("spam.com", "s1.com"),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    res = {
        r["host"]: r["trust"]
        for r in trustrank_edges(
            rd.from_arrow(t), seeds={"seed.org"}, iters=20
        ).take_all()
    }
    assert res["seed.org"] > 0
    assert res["good1.com"] > 0
    assert res["good2.com"] > 0
    assert res["spam.com"] == 0.0
    assert res["s1.com"] == 0.0
    # distribution: total mass ~1 over the graph
    assert abs(sum(res.values()) - 1.0) < 1e-4
    # seeds absent from the graph -> empty result, not a crash
    assert (
        trustrank_edges(rd.from_arrow(t), seeds={"nowhere.net"}).count() == 0
    )


def test_spam_mass_flags_farm(ray_session):
    """Relative spam mass (Gyongyi et al. 2006) on the same hand-built
    graph: the farm gets pr>0 from its clique but trust=0, so its mass
    is exactly 1.0; the seed neighborhood keeps most rank from trusted
    flow, so its mass stays well below the farm's."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.stages.joins import merge_join
    from commoncrawl_ray.stages.pagerank import pagerank_edges, trustrank_edges

    edges = [
        ("seed.org", "good1.com"), ("seed.org", "good2.com"),
        ("good1.com", "good2.com"),
        ("s1.com", "spam.com"), ("s2.com", "spam.com"),
        ("s3.com", "spam.com"), ("s4.com", "spam.com"),
        ("s1.com", "s2.com"), ("s2.com", "s3.com"),
        ("s3.com", "s4.com"), ("s4.com", "s1.com"),
        ("spam.com", "s1.com"),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    pr = pagerank_edges(rd.from_arrow(t), iters=20)
    tr = trustrank_edges(rd.from_arrow(t), seeds={"seed.org"}, iters=20)
    joined = merge_join(pr, tr, "host", "host", ["trust"], how="left")
    rows = joined.take_all()
    mass = {}
    for r in rows:
        tv = 0.0 if r["trust"] is None or np.isnan(r["trust"]) else r["trust"]
        mass[r["host"]] = (r["pr"] - tv) / r["pr"] if r["pr"] > 0 else 0.0
    # every host in the farm carries pure spam mass
    for h in ("spam.com", "s1.com", "s2.com", "s3.com", "s4.com"):
        assert mass[h] == 1.0
    # the trusted neighborhood is demoted far below the farm
    assert mass["good1.com"] < 0.5
    assert mass["good2.com"] < 0.5


def test_reciprocal_link_stats(ray_session):
    """Hand-built graph: a 3-host link-exchange ring trading links
    both ways (ratio 1.0), an honest host linking out with nothing
    reciprocated (ratio 0.0), and a self-loop that must be ignored."""
    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.stages.pagerank import reciprocal_link_stats

    edges = [
        # farm: full reciprocity
        ("f1.com", "f2.com"), ("f2.com", "f1.com"),
        ("f2.com", "f3.com"), ("f3.com", "f2.com"),
        ("f1.com", "f3.com"), ("f3.com", "f1.com"),
        # honest: one-way links only
        ("news.org", "f1.com"), ("news.org", "blog.net"),
        # self-loop must not count anywhere
        ("loop.io", "loop.io"),
        # duplicate edge must collapse before counting
        ("news.org", "blog.net"),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    rows = {r["host"]: r for r in reciprocal_link_stats(rd.from_arrow(t)).take_all()}
    assert set(rows) == {"f1.com", "f2.com", "f3.com", "news.org"}
    for h in ("f1.com", "f2.com", "f3.com"):
        assert rows[h]["out_deg"] == 2
        assert rows[h]["recip_deg"] == 2
        assert rows[h]["recip_ratio"] == 1.0
    assert rows["news.org"]["out_deg"] == 2
    assert rows["news.org"]["recip_deg"] == 0
    assert rows["news.org"]["recip_ratio"] == 0.0


def test_label_propagation_matches_sequential(ray_session):
    """Distributed synchronous LPA == the sequential Counter fold with
    identical semantics (min-FNV-label-id tie-break, fixed rounds) on
    two disjoint cliques; labels cannot cross components, so the two
    cliques must end up in different communities."""
    from collections import Counter, defaultdict

    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.functions.minhash import fnv1a_batch
    from commoncrawl_ray.stages.components import label_propagation

    a = [f"a{i}.com" for i in range(1, 5)]
    b = [f"b{i}.com" for i in range(1, 5)]
    edges = (
        [(u, v) for i, u in enumerate(a) for v in a[i + 1 :]]  # K4
        + [(u, v) for i, u in enumerate(b) for v in b[i + 1 :]]  # K4 (disjoint)
        + [("solo.net", "a1.com")]
    )
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    iters = 5
    got = {
        r["host"]: r["community"]
        for r in label_propagation(rd.from_arrow(t), iters=iters).take_all()
    }

    hosts = sorted({h for e in edges for h in e})
    hid = dict(
        zip(hosts, fnv1a_batch(pa.array(hosts)).view("int64").tolist())
    )
    host_of = {v: k for k, v in hid.items()}
    nbrs = defaultdict(set)
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    labels = {h: hid[h] for h in nbrs}
    for _ in range(iters):
        labels = {
            a: min(
                Counter(labels[b] for b in ns).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for a, ns in nbrs.items()
        }
    labels = {h: host_of[v] for h, v in labels.items()}
    assert got == labels
    # the cliques settle on distinct communities
    assert len({got["a1.com"], got["a2.com"]} | {got["b2.com"], got["b3.com"]}) >= 2


def test_mirror_hosts_flags_twins(ray_session):
    """Every m-<host> twin in the simulated shard shares 15 of its
    origin's 20 pages -> Jaccard 0.75, flagged as a mirror; no
    unrelated host pair appears."""
    from commoncrawl_ray.pipelines.queries import q_mirror_hosts

    rows = q_mirror_hosts("/root/testdata/sf0.001").take_all()
    assert len(rows) == 4
    for r in rows:
        a, b = r["host_a"], r["host_b"]
        assert a == "m-" + b or b == "m-" + a
        assert r["n_shared"] == 15
        assert {r["n_a"], r["n_b"]} == {20, 15}
        assert r["jaccard"] == 0.75
        assert r["is_mirror"]


def test_redirect_resolution_semantics(ray_session):
    """Known chains from the deterministic redirect rules: 4->3->2->1
    ->0 resolves in 4 hops; 6->5 in one; id 7 and 8 form a 2-cycle
    (unresolved); 9 chains into the cycle via 8 (unresolved)."""
    from commoncrawl_ray.pipelines.queries import q_redirect_resolution

    rows = {
        r["url_id"]: r
        for r in q_redirect_resolution("/root/testdata/sf0.001").take_all()
    }
    assert rows[4]["final_id"] == 0 and rows[4]["hops"] == 4 and rows[4]["resolved"]
    assert rows[6]["final_id"] == 5 and rows[6]["hops"] == 1
    for cyc in (7, 8, 9):
        assert not rows[cyc]["resolved"]
        assert rows[cyc]["final_id"] == -1 and rows[cyc]["hops"] == -1
    assert 0 not in rows and 5 not in rows  # non-redirecting ids absent


def test_phrase_search_three_terms(ray_session):
    """3-term phrase exercises the chained shifted-key semi joins;
    parity vs a plain Python scan over the same parquet, including
    overlapping-occurrence counting."""
    import pyarrow.parquet as pq

    from commoncrawl_ray.pipelines.queries import q_phrase_search

    sf_dir = "/root/testdata/sf0.001"
    t = pq.read_table(sf_dir + "/documents.parquet", columns=["doc_id", "text"])
    want = {}
    phrase = None
    # pick the first 3-gram that occurs in >= 2 docs so the test is
    # non-trivial yet deterministic
    from collections import Counter

    grams = Counter()
    toks_by_doc = {}
    for d, tx in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = (tx or "").split()
        toks_by_doc[d] = toks
        for i in range(len(toks) - 2):
            grams[tuple(toks[i : i + 3])] += 1
    phrase, _ = max(grams.items(), key=lambda kv: (kv[1], kv[0]))
    for d, toks in toks_by_doc.items():
        n = sum(
            1
            for i in range(len(toks) - 2)
            if tuple(toks[i : i + 3]) == phrase
        )
        if n:
            want[d] = n
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in q_phrase_search(sf_dir, phrase=phrase).take_all()
    }
    assert got == want and len(want) >= 1


def test_kcore_known_graph(ray_session):
    """Hand-built graph: a 4-clique (coreness 3), a pendant hanging
    off it (coreness 1), a triangle (coreness 2), a self-loop and a
    duplicate edge that must be ignored; direction must not matter."""
    from commoncrawl_ray.stages.pagerank import k_core_hosts

    edges = [
        # 4-clique c1..c4 (one direction only — viewed undirected)
        ("c1.com", "c2.com"), ("c1.com", "c3.com"), ("c1.com", "c4.com"),
        ("c2.com", "c3.com"), ("c2.com", "c4.com"), ("c3.com", "c4.com"),
        # pendant off the clique
        ("p.com", "c1.com"),
        # separate triangle
        ("t1.net", "t2.net"), ("t2.net", "t3.net"), ("t3.net", "t1.net"),
        # noise: self-loop and duplicate edge
        ("c1.com", "c1.com"), ("c1.com", "c2.com"),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    rows = {r["host"]: r["core"] for r in k_core_hosts(rd.from_arrow(t)).take_all()}
    assert rows == {
        "c1.com": 3, "c2.com": 3, "c3.com": 3, "c4.com": 3,
        "p.com": 1,
        "t1.net": 2, "t2.net": 2, "t3.net": 2,
    }


def test_kcore_matches_sequential_random(ray_session):
    """Random graph cross-check: distributed h-index fixpoint == the
    sequential Batagelj-Zaversnik peel on the same undirected edge
    set."""
    import heapq

    from commoncrawl_ray.stages.pagerank import k_core_hosts

    rng = np.random.default_rng(7)
    n = 60
    m = 240
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    names = [f"h{i}.com" for i in range(n)]
    t = pa.table(
        {
            "src": pa.array([names[i] for i in src]),
            "dst": pa.array([names[i] for i in dst]),
        }
    )
    # sequential peel
    adj: dict[int, set[int]] = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(dv, v) for v, dv in deg.items()]
    heapq.heapify(heap)
    removed: set[int] = set()
    core: dict[int, int] = {}
    k = 0
    while heap:
        dv, v = heapq.heappop(heap)
        if v in removed or dv != deg[v]:
            continue
        k = max(k, dv)
        core[v] = k
        removed.add(v)
        for w in adj[v]:
            if w not in removed:
                deg[w] -= 1
                heapq.heappush(heap, (deg[w], w))
    expect = {names[v]: c for v, c in core.items()}
    rows = {r["host"]: r["core"] for r in k_core_hosts(rd.from_arrow(t)).take_all()}
    assert rows == expect


def _sequential_ktruss(edges, k):
    """Sequential Cohen support peel (the oracle algorithm) over
    (src, dst) string pairs -> {host: truss_deg}."""
    from collections import Counter, deque

    adj: dict[str, set[str]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = {(u, v) for u, ns in adj.items() for v in ns if u < v}
    sup = {(u, v): len(adj[u] & adj[v]) for (u, v) in alive}
    q = deque(e for e, s in sup.items() if s < k - 2)
    while q:
        e = q.popleft()
        if e not in alive:
            continue
        alive.discard(e)
        u, v = e
        for w in adj[u] & adj[v]:
            for f in ((min(u, w), max(u, w)), (min(v, w), max(v, w))):
                if f in alive:
                    sup[f] -= 1
                    if sup[f] < k - 2:
                        q.append(f)
        adj[u].discard(v)
        adj[v].discard(u)
    deg: Counter = Counter()
    for u, v in alive:
        deg[u] += 1
        deg[v] += 1
    return dict(deg)


def test_ktruss_known_graph(ray_session):
    """Hand-built graph: a 5-clique (every edge closes 3 triangles ->
    survives the 4-truss), a separate triangle (support 1 -> peeled),
    a pendant (support 0 -> peeled), and a diamond (4-cycle + one
    diagonal) whose peel must CASCADE to nothing: removing the
    support-1 rim edges destroys the triangles that supported the
    diagonal. Direction, self-loops and duplicate edges must not
    matter."""
    from commoncrawl_ray.stages.pagerank import k_truss_hosts

    edges = []
    clique = [f"c{i}.com" for i in range(1, 6)]
    for i in range(5):
        for j in range(i + 1, 5):
            edges.append((clique[i], clique[j]))
    edges += [
        ("p.com", "c1.com"),  # pendant
        ("t1.net", "t2.net"), ("t2.net", "t3.net"), ("t3.net", "t1.net"),
        # diamond a-b-c-d with diagonal a-c: two triangles, all
        # support < 2 once the rim starts peeling
        ("a.org", "b.org"), ("b.org", "c.org"), ("c.org", "d.org"),
        ("d.org", "a.org"), ("a.org", "c.org"),
        # noise
        ("c1.com", "c1.com"), ("c2.com", "c1.com"),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    rows = {
        r["host"]: r["truss_deg"]
        for r in k_truss_hosts(rd.from_arrow(t), k=4).take_all()
    }
    assert rows == {h: 4 for h in clique}


def test_ktruss_matches_sequential_random(ray_session):
    """Random graph cross-check at k=3 and k=4: distributed batch
    peeling == the sequential Cohen support peel on the same
    undirected edge set (both converge to the unique maximal
    k-truss)."""
    from commoncrawl_ray.stages.pagerank import k_truss_hosts

    rng = np.random.default_rng(11)
    n = 40
    m = 260
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    names = [f"h{i}.com" for i in range(n)]
    pairs = [(names[i], names[j]) for i, j in zip(src.tolist(), dst.tolist())]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in pairs]),
            "dst": pa.array([e[1] for e in pairs]),
        }
    )
    for k in (3, 4):
        expect = _sequential_ktruss(pairs, k)
        rows = {
            r["host"]: r["truss_deg"]
            for r in k_truss_hosts(rd.from_arrow(t), k=k).take_all()
        }
        assert rows == expect


def _sequential_rwr(pairs, seeds, walks_per_seed, steps, restart_p):
    """Sequential replay sharing the stage's hash kernels — mirrors
    oracle_sketch.oracle_rwr_table but over explicit seed hosts."""
    from collections import Counter

    from commoncrawl_ray.functions.minhash import fnv1a_batch
    from commoncrawl_ray.stages.pagerank import rwr_choice_score, rwr_restarts

    hosts = sorted({h for e in pairs for h in e})
    ids = fnv1a_batch(pa.array(hosts, pa.string())).view(np.int64)
    hid = {h: int(i) for h, i in zip(hosts, ids)}
    id_to_host = {v: k for k, v in hid.items()}
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        if hid[s] == hid[d]:
            continue
        adj.setdefault(hid[s], set()).add(hid[d])
    adj_arr = {u: np.array(sorted(ns), dtype=np.int64) for u, ns in adj.items()}
    visits: Counter = Counter()
    for i, seed_host in enumerate(seeds):
        sid = hid[seed_host]
        for j in range(walks_per_seed):
            w = i * walks_per_seed + j
            cur = sid
            visits[cur] += 1
            for step in range(1, steps + 1):
                restart = bool(
                    rwr_restarts(np.array([w], np.int64), step, restart_p)[0]
                )
                cand = adj_arr.get(cur)
                if restart or cand is None or len(cand) == 0:
                    cur = sid
                else:
                    score = rwr_choice_score(np.array([w], np.int64), step, cand)
                    cur = int(cand[np.lexsort((cand, score))[0]])
                visits[cur] += 1
    return {id_to_host[u]: c for u, c in visits.items()}


def test_rwr_matches_sequential_random(ray_session):
    """Distributed walk == sequential replay on a random directed
    graph with explicit seeds: every restart/choice decision is a
    shared SplitMix64 hash, so visit counts must be IDENTICAL."""
    from commoncrawl_ray.stages.pagerank import random_walk_visits

    rng = np.random.default_rng(23)
    n = 30
    m = 150
    names = [f"w{i}.com" for i in range(n)]
    pairs = [
        (names[i], names[j])
        for i, j in zip(rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist())
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in pairs]),
            "dst": pa.array([e[1] for e in pairs]),
        }
    )
    seeds = [names[0], names[7]]
    expect = _sequential_rwr(pairs, seeds, walks_per_seed=10, steps=6, restart_p=0.2)
    rows = {
        r["host"]: r["visits"]
        for r in random_walk_visits(
            rd.from_arrow(t),
            walks_per_seed=10,
            steps=6,
            restart_p=0.2,
            seeds=seeds,
        ).take_all()
    }
    assert rows == expect
    # total visits = walkers * (steps + 1)
    assert sum(rows.values()) == len(seeds) * 10 * 7


def test_rwr_dead_end_restarts(ray_session):
    """A graph where the only edge leads to a sink: every step from
    the sink must restart to the seed, so only the seed and the sink
    are ever visited and counts are exact."""
    from commoncrawl_ray.stages.pagerank import random_walk_visits

    t = pa.table({"src": pa.array(["a.com"]), "dst": pa.array(["b.com"])})
    rows = {
        r["host"]: r["visits"]
        for r in random_walk_visits(
            rd.from_arrow(t), walks_per_seed=5, steps=4, restart_p=0.0, seeds=["a.com"]
        ).take_all()
    }
    assert set(rows) == {"a.com", "b.com"}
    # each walker: seed visit + 4 steps = 5 visits; 5 walkers -> 25
    assert sum(rows.values()) == 25
    expect = _sequential_rwr(
        [("a.com", "b.com")], ["a.com"], walks_per_seed=5, steps=4, restart_p=0.0
    )
    assert rows == expect


def test_ip_colocation_shared_ip_counts(ray_session):
    """Hosts resolve via the deterministic fingerprint model; the
    census must report, for every host, how many hosts share its IP —
    cross-checked against a sequential Counter over the same set."""
    from collections import Counter

    from commoncrawl_ray.functions.fingerprint import fp64_batch
    from commoncrawl_ray.stages.pagerank import ip_colocation_stats

    hosts = [f"site{i}.example" for i in range(40)]
    # edges: a simple chain so every host appears in the universe
    t = pa.table(
        {
            "src": pa.array(hosts),
            "dst": pa.array(hosts[1:] + hosts[:1]),
        }
    )
    rows = {r["host"]: r for r in ip_colocation_stats(rd.from_arrow(t)).take_all()}
    assert set(rows) == set(hosts)
    fps = fp64_batch(hosts).view(np.uint64)
    ips = (np.uint64(10 << 24) | (fps & np.uint64(0xFFFFFF))).astype(np.int64)
    quads = [
        f"{(v >> 24) & 0xFF}.{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"
        for v in ips.tolist()
    ]
    per_ip = Counter(quads)
    for h, q in zip(hosts, quads):
        assert rows[h]["ip"] == q
        assert rows[h]["n_shared"] == per_ip[q]


def test_hyperball_matches_exact_bfs_on_path(ray_session):
    """Small directed path a->b->c->d: with p=8 (256 registers) and
    only 4 nodes, linear counting is exact, so the HLL 'estimates'
    equal the true ball sizes and harmonic centrality equals the
    exact sum of 1/d over in-paths: harm(d)=1/1+1/2+1/3, etc."""
    from commoncrawl_ray.stages.pagerank import hyperball_harmonic

    t = pa.table(
        {
            "src": pa.array(["a.com", "b.com", "c.com"]),
            "dst": pa.array(["b.com", "c.com", "d.com"]),
        }
    )
    rows = {
        r["host"]: r
        for r in hyperball_harmonic(rd.from_arrow(t), p=8).take_all()
    }
    expect_harm = {
        "a.com": 0.0,
        "b.com": 1.0,
        "c.com": 1.0 + 0.5,
        "d.com": 1.0 + 0.5 + 1.0 / 3.0,
    }
    expect_reach = {"a.com": 1, "b.com": 2, "c.com": 3, "d.com": 4}
    # linear counting is near-exact at this density but not an exact
    # identity (est of 1 item = m*ln(m/(m-1)) ~ 1.002); 2% tolerance
    assert rows["a.com"]["harmonic"] == 0.0
    for h, e in expect_harm.items():
        if e > 0:
            assert abs(rows[h]["harmonic"] - e) / e < 0.02, (h, rows[h])
    for h, e in expect_reach.items():
        assert abs(rows[h]["reach_in"] - e) / e < 0.02, (h, rows[h])


def test_hyperball_estimates_reach_on_star(ray_session):
    """200 leaves all pointing at one hub: reach_in(hub) ~ 201 within
    HLL p=8 error (~6.5% rse); every leaf has reach_in ~ 1 and
    harmonic 0... the hub's harmonic ~ 200 (all at distance 1)."""
    from commoncrawl_ray.stages.pagerank import hyperball_harmonic

    leaves = [f"l{i}.net" for i in range(200)]
    t = pa.table(
        {
            "src": pa.array(leaves),
            "dst": pa.array(["hub.net"] * len(leaves)),
        }
    )
    rows = {
        r["host"]: r
        for r in hyperball_harmonic(rd.from_arrow(t), p=8).take_all()
    }
    hub = rows["hub.net"]
    assert abs(hub["reach_in"] - 201) / 201 < 0.2
    assert abs(hub["harmonic"] - 200) / 200 < 0.2
    for l in leaves[:5]:
        assert rows[l]["harmonic"] == 0.0


def test_degree_assortativity_sign(ray_session):
    """A hub-and-spoke graph is disassortative (r < 0); a uniform
    directed ring has constant degrees (den 0 -> r = 0 by
    convention). Checked through the registry kernel on hand-built
    edge tables via the same stage composition."""
    import math

    from commoncrawl_ray.stages.joins import merge_join
    from commoncrawl_ray.stages.pagerank import _distinct_sorted

    def assort(edge_tbl):
        import pyarrow.compute as pc

        edges = (
            _distinct_sorted(rd.from_arrow(edge_tbl), ["src", "dst"])
            .map_batches(
                lambda t: t.filter(pc.not_equal(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )
            .materialize()
        )

        def deg_of(col, name):
            return edges.groupby(col).count().map_batches(
                lambda t, _c=col, _n=name: pa.table(
                    {"h": t.column(_c), _n: t.column("count()").cast(pa.int64())}
                ),
                batch_format="pyarrow",
            )

        j = merge_join(
            merge_join(edges, deg_of("src", "outd"), "src", "h", ["outd"]),
            deg_of("dst", "ind"), "dst", "h", ["ind"],
        )
        rows = j.take_all()
        x = np.array([r["outd"] for r in rows], dtype=np.int64)
        y = np.array([r["ind"] for r in rows], dtype=np.int64)
        n = len(x)
        num = float(n * (x * y).sum() - x.sum() * y.sum())
        den = math.sqrt(
            float(n * (x * x).sum() - x.sum() ** 2)
            * float(n * (y * y).sum() - y.sum() ** 2)
        )
        return num / den if den > 0 else 0.0

    # star: hub -> 10 leaves, each leaf -> hub
    leaves = [f"l{i}.com" for i in range(10)]
    star = pa.table(
        {
            "src": pa.array(["hub.com"] * 10 + leaves),
            "dst": pa.array(leaves + ["hub.com"] * 10),
        }
    )
    assert assort(star) < 0
    # directed ring: every node outd=ind=1 -> zero variance -> 0
    ring_nodes = [f"r{i}.com" for i in range(6)]
    ring = pa.table(
        {
            "src": pa.array(ring_nodes),
            "dst": pa.array(ring_nodes[1:] + ring_nodes[:1]),
        }
    )
    assert assort(ring) == 0.0


def test_distance_distribution_path_graph(ray_session):
    """Directed 4-path: N(0)=4 self-pairs, N(1)=4+3, N(2)=4+3+2,
    N(3)=4+3+2+1=10 — with p=8 linear counting is near-exact, so the
    per-round fractions are within 2% of the exact neighborhood
    function, monotone, and end at 1.0."""
    from commoncrawl_ray.stages.pagerank import hyperanf_distance_distribution

    t = pa.table(
        {
            "src": pa.array(["a.com", "b.com", "c.com"]),
            "dst": pa.array(["b.com", "c.com", "d.com"]),
        }
    )
    rows = sorted(
        hyperanf_distance_distribution(rd.from_arrow(t), p=8).take_all(),
        key=lambda r: r["t"],
    )
    exact = {0: 4, 1: 7, 2: 9, 3: 10}
    for r in rows:
        if r["t"] in exact:
            assert abs(r["nreach"] - exact[r["t"]]) / exact[r["t"]] < 0.02, r
    assert rows[-1]["frac"] == 1.0
    fr = [r["frac"] for r in rows]
    assert fr == sorted(fr)


def test_clustering_coefficients_known_graph(ray_session):
    """K4 plus a pendant: clique members have C=1 except the one
    carrying the pendant (extra unconnected neighbor), the pendant
    itself has deg 1 -> C=0; direction/duplicates must not matter."""
    from commoncrawl_ray.stages.pagerank import clustering_coefficients

    k4 = ["c1.com", "c2.com", "c3.com", "c4.com"]
    edges = [(u, v) for i, u in enumerate(k4) for v in k4[i + 1 :]]
    edges += [("p.com", "c1.com"), ("c1.com", "c2.com"), ("c3.com", "c3.com")]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    rows = {
        r["host"]: r
        for r in clustering_coefficients(rd.from_arrow(t)).take_all()
    }
    assert rows["p.com"]["deg"] == 1 and rows["p.com"]["clustering"] == 0.0
    # c1: neighbors c2,c3,c4,p -> 3 connected pairs of 6 -> 0.5
    assert rows["c1.com"]["deg"] == 4
    assert rows["c1.com"]["n_tri"] == 3
    assert rows["c1.com"]["clustering"] == 0.5
    for h in ("c2.com", "c3.com", "c4.com"):
        assert rows[h]["deg"] == 3
        assert rows[h]["n_tri"] == 3
        assert rows[h]["clustering"] == 1.0


def test_bowtie_decomposition_known_graph(ray_session):
    """Textbook bow-tie: a 3-cycle core (s1->s2->s3->s1), an IN node
    feeding it, an OUT node fed by it, and a disconnected island.
    The pivot (max in+out degree) lands in the cycle, so labels are
    exact."""
    from commoncrawl_ray.stages.pagerank import bowtie_decomposition

    edges = [
        ("s1.com", "s2.com"), ("s2.com", "s3.com"), ("s3.com", "s1.com"),
        ("in.com", "s1.com"),
        ("s2.com", "out.com"),
        ("isl1.com", "isl2.com"),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    rows = {
        r["host"]: r["bowtie"]
        for r in bowtie_decomposition(rd.from_arrow(t)).take_all()
    }
    assert rows == {
        "s1.com": "SCC", "s2.com": "SCC", "s3.com": "SCC",
        "in.com": "IN", "out.com": "OUT",
        "isl1.com": "OTHER", "isl2.com": "OTHER",
    }


def test_seed_distance_known_graph(ray_session):
    """Chain a->b->c->d plus island x->y; seeds {a, x, ghost.com}:
    a=0, b=1, c=2, d=3, x=0, y=1; ghost absent from the graph."""
    from commoncrawl_ray.stages.pagerank import seed_distance_hosts

    edges = [
        ("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "d.com"),
        ("x.com", "y.com"),
        ("d.com", "b.com"),  # back edge must not lower b's dist
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    rows = {
        r["host"]: r["dist"]
        for r in seed_distance_hosts(
            rd.from_arrow(t), ["a.com", "x.com", "ghost.com"]
        ).take_all()
    }
    assert rows == {
        "a.com": 0, "b.com": 1, "c.com": 2, "d.com": 3,
        "x.com": 0, "y.com": 1,
    }


def test_seed_distance_unreachable(ray_session):
    """No seeds in the graph -> every host dist -1."""
    from commoncrawl_ray.stages.pagerank import seed_distance_hosts

    t = pa.table({"src": pa.array(["p.com"]), "dst": pa.array(["q.com"])})
    rows = {
        r["host"]: r["dist"]
        for r in seed_distance_hosts(rd.from_arrow(t), ["nope.com"]).take_all()
    }
    assert rows == {"p.com": -1, "q.com": -1}


def test_scc_hosts_known_graph(ray_session):
    """Two cycles bridged by a DAG edge plus a sink: SCCs {a,b},
    {c,d,e}, {f} with lexicographic representative hosts."""
    from commoncrawl_ray.stages.pagerank import scc_hosts

    edges = [
        ("a.com", "b.com"), ("b.com", "a.com"),
        ("c.com", "d.com"), ("d.com", "e.com"), ("e.com", "c.com"),
        ("b.com", "c.com"),
        ("a.com", "f.com"),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }
    )
    rows = {
        r["host"]: (r["scc"], r["scc_size"])
        for r in scc_hosts(rd.from_arrow(t)).take_all()
    }
    assert rows == {
        "a.com": ("a.com", 2), "b.com": ("a.com", 2),
        "c.com": ("c.com", 3), "d.com": ("c.com", 3), "e.com": ("c.com", 3),
        "f.com": ("f.com", 1),
    }


def test_scc_hosts_path_graph(ray_session):
    """Pure DAG: every node a singleton SCC (exercises the multi-round
    peel and the edge-free singleton retirement)."""
    from commoncrawl_ray.stages.pagerank import scc_hosts

    t = pa.table(
        {
            "src": pa.array(["p1.com", "p2.com", "p3.com"]),
            "dst": pa.array(["p2.com", "p3.com", "p4.com"]),
        }
    )
    rows = {
        r["host"]: (r["scc"], r["scc_size"])
        for r in scc_hosts(rd.from_arrow(t)).take_all()
    }
    assert rows == {
        f"p{i}.com": (f"p{i}.com", 1) for i in range(1, 5)
    }


def test_salsa_known_graph(ray_session):
    """Star h1,h2 -> a1 plus h1 -> a2: the authority chain's fixed
    point weights a1 twice a2 is NOT the SALSA answer — SALSA's
    stationary authority mass is indeg-proportional within a
    component: a1 = 2/3, a2 = 1/3; hubs split by how much authority
    mass walks back: h1 = 2/3 (reaches both), h2 = 1/3."""
    from commoncrawl_ray.stages.pagerank import salsa_hosts
    import ray.data as rd_

    # build a fake parse-output dataset via the edge extractor's
    # contract: feed the stage pre-extracted edges through a tiny
    # adapter dataset of (url, anchors, base_url) is heavyweight —
    # test the stage's math directly on its edge input instead
    t = pa.table(
        {
            "url": pa.array(
                [
                    "http://h1.com/",
                    "http://h2.com/",
                ]
            ),
            "anchors": pa.array(
                [
                    "http://a1.com/\nx\nhttp://a2.com/\ny",
                    "http://a1.com/\nz",
                ]
            ),
            "base_url": pa.array(["", ""]),
        }
    )
    rows = {
        r["host"]: (r["salsa_authority"], r["salsa_hub"])
        for r in salsa_hosts(rd_.from_arrow(t)).take_all()
    }
    assert rows["a1.com"][0] == pytest.approx(2 / 3, abs=1e-6)
    assert rows["a2.com"][0] == pytest.approx(1 / 3, abs=1e-6)
    assert rows["h1.com"][1] == pytest.approx(2 / 3, abs=1e-6)
    assert rows["h2.com"][1] == pytest.approx(1 / 3, abs=1e-6)
    assert rows["h1.com"][0] == 0.0 and rows["h2.com"][0] == 0.0
    assert rows["a1.com"][1] == 0.0 and rows["a2.com"][1] == 0.0


def test_opic_known_graph(ray_session):
    """h1,h2 -> a1 plus h1 -> a2: OPIC importance from 10 synchronous
    rounds must match an inline numpy reference applying identical
    updates (cash split over outdeg+1, virtual page return, history
    accumulation, normalize, round 6)."""
    from commoncrawl_ray.stages.pagerank import opic_hosts
    import ray.data as rd_

    t = pa.table(
        {
            "url": pa.array(["http://h1.com/", "http://h2.com/"]),
            "anchors": pa.array(
                [
                    "http://a1.com/\nx\nhttp://a2.com/\ny",
                    "http://a1.com/\nz",
                ]
            ),
            "base_url": pa.array(["", ""]),
        }
    )
    rows = {
        r["host"]: r["opic"]
        for r in opic_hosts(rd_.from_arrow(t)).take_all()
    }

    # inline reference over the same 4-node graph (sorted node order:
    # a1, a2, h1, h2), edges h1->a1, h1->a2, h2->a1
    nodes = ["a1.com", "a2.com", "h1.com", "h2.com"]
    src = np.array([2, 2, 3])
    dst = np.array([0, 1, 0])
    n = 4
    deg = np.bincount(src, minlength=n).astype(np.float64)
    cash = np.full(n, 1.0 / n)
    hist = np.zeros(n)
    vc = 0.0
    for _ in range(10):
        w = cash / (deg + 1.0)
        virtual_in = float(w.sum())
        s = np.zeros(n)
        np.add.at(s, dst, w[src])
        hist = hist + cash
        cash = s + vc / n
        vc = virtual_in
    expect = np.round(hist / hist.sum(), 6)
    assert set(rows) == set(nodes)
    for i, h in enumerate(nodes):
        assert rows[h] == pytest.approx(expect[i], abs=1e-9), h
    # a1 has two in-links, a2 one: strictly more important
    assert rows["a1.com"] > rows["a2.com"]
