"""webgraph: href extraction, URL resolution, fixed-point PageRank."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _pages():
    rows = [
        (
            "https://a.example.com/en/idx/1",
            b'<html><a href="https://b.example.com/x">x</a>'
            b'<a href="/root/y">y</a>'
            b'<a href="rel/z#frag">z</a>'
            b'<a href="//cdn.example.net/lib.js">j</a>'
            b'<a href="mailto:a@b.c">m</a>'
            b'<a href="#sec">s</a>'
            b'<a href="broken',  # unterminated -> dropped
        ),
        ("https://c.example.com/p", b"<html>no links here</html>"),
        ("https://d.example.com/q/", b'<a href="">empty</a><a href="javascript:void(0)">v</a>'),
    ]
    t = pa.table(
        {
            "url": [r[0] for r in rows],
            "html": pa.array([r[1] for r in rows], type=pa.binary()),
            "doc_id": pa.array(range(len(rows)), type=pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(2)


def test_extract_links_resolution(ray_session):
    from mismo_ray.webgraph import extract_links

    out = (
        extract_links(_pages(), keep_columns=["doc_id"])
        .to_pandas()
        .sort_values(["doc_id", "link_url"])
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 0, 0, 0]
    assert sorted(out["link_url"]) == [
        "https://a.example.com/en/idx/rel/z",
        "https://a.example.com/root/y",
        "https://b.example.com/x",
        "https://cdn.example.net/lib.js",
    ]
    assert sorted(out["link_host"]) == [
        "a.example.com",
        "a.example.com",
        "b.example.com",
        "cdn.example.net",
    ]


def test_extract_links_unresolved_keeps_all_hrefs(ray_session):
    from mismo_ray.webgraph import extract_links

    out = extract_links(_pages(), resolve=False).to_pandas()
    # every quoted href (incl. mailto/js/fragment/empty), excl. unterminated
    assert len(out) == 8


def _brute_pagerank(edges, iterations=3, num=85, den=100, scale=10**12):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    r0 = scale // n
    base = ((den - num) * r0) // den
    rank = {v: r0 for v in nodes}
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    for _ in range(iterations):
        incoming = {v: 0 for v in nodes}
        for s, d in edges:
            incoming[d] += rank[s] // out_deg[s]
        rank = {v: base + (num * incoming[v]) // den for v in nodes}
    return rank


def test_pagerank_matches_brute_force(ray_session):
    from mismo_ray.webgraph import pagerank

    rng = np.random.default_rng(7)
    edges = [
        (f"h{int(rng.integers(0, 12))}", f"h{int(rng.integers(0, 12))}")
        for _ in range(120)
    ]
    t = pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    ds = ray.data.from_arrow(t).repartition(3)
    got = pagerank(ds, iterations=3).to_pandas()
    want = _brute_pagerank(edges)
    got_m = dict(zip(got["node"], got["rank"]))
    assert got_m == want
    # a hub everyone points at outranks a leaf nobody points at
    hub_edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")]
    t2 = pa.table({"src": [e[0] for e in hub_edges], "dst": [e[1] for e in hub_edges]})
    r2 = pagerank(ray.data.from_arrow(t2), iterations=5).to_pandas()
    m2 = dict(zip(r2["node"], r2["rank"]))
    assert m2["hub"] > m2["b"]


def test_pagerank_deterministic_across_partitioning(ray_session):
    from mismo_ray.webgraph import pagerank

    edges = [(f"s{i % 5}", f"s{(i * 3 + 1) % 7}") for i in range(60)]
    t = pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    a = pagerank(ray.data.from_arrow(t).repartition(1), iterations=2).to_pandas()
    b = pagerank(ray.data.from_arrow(t).repartition(8), iterations=2).to_pandas()
    am = dict(zip(a["node"], a["rank"]))
    bm = dict(zip(b["node"], b["rank"]))
    assert am == bm


def test_extract_links_with_anchor(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.webgraph import extract_links

    html = (
        '<a href="https://t.com/a">plain anchor</a>'      # plain -> kept
        '<a href="/x"><b>bold</b></a>'                    # nested -> null
        '<a href="/y" class="c">attr ok</a>'              # attrs fine
        '<a href="/empty"></a>'                           # empty anchor ""
        '<a href="/wrong">text</span>'                    # wrong close -> null
        '<a href="/nogt"'                                 # quote closed, no '>' -> link kept, anchor null
        '<a href="untermin'                               # no closing quote -> dropped
    )
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": ["https://t.com/page"],
                "html": pa.array([html], type=pa.string()).cast(pa.binary()),
            }
        )
    )
    out = (
        extract_links(pages, resolve=False, with_anchor=True)
        .to_pandas()
    )
    got = list(zip(out["href"], [a if isinstance(a, str) else None for a in out["anchor"]]))
    assert got == [
        ("https://t.com/a", "plain anchor"),
        ("/x", None),
        ("/y", "attr ok"),
        ("/empty", ""),
        ("/wrong", None),
        ("/nogt", None),
        # 'untermin' has no closing quote -> dropped entirely
    ]


def test_anchor_stats_edge_cases(ray_session):
    """Sentinel-group correctness: a target with both null anchors and a
    REAL empty-string anchor counts only the real one; pure-null targets
    get a null top_anchor; ties break to the smaller anchor string."""
    import pyarrow as pa
    import ray.data

    from mismo_ray.webgraph import anchor_stats

    rows = [
        # target A: "x" twice, "b" twice -> tie, top = "b"
        ("A", "x"), ("A", "x"), ("A", "b"), ("A", "b"),
        # target B: three nulls + one real "" -> top "", count 1, n_links 4
        ("B", None), ("B", None), ("B", None), ("B", ""),
        # target C: all null -> top null
        ("C", None), ("C", None),
    ]
    links = ray.data.from_arrow(
        pa.table(
            {
                "link_url": pa.array([r[0] for r in rows]),
                "anchor": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    ).repartition(3)
    out = anchor_stats(links).to_pandas().set_index("link_url").sort_index()
    assert out.loc["A", "n_links"] == 4 and out.loc["A", "n_anchored"] == 4
    assert out.loc["A", "top_anchor"] == "b" and out.loc["A", "top_anchor_count"] == 2
    assert out.loc["B", "n_links"] == 4 and out.loc["B", "n_anchored"] == 1
    assert out.loc["B", "top_anchor"] == "" and out.loc["B", "top_anchor_count"] == 1
    assert out.loc["C", "n_links"] == 2 and out.loc["C", "n_anchored"] == 0
    assert out.loc["C", "top_anchor"] is None or out.loc["C", "top_anchor"] != out.loc["C", "top_anchor"]


def test_resolve_hrefs_keeps_port_and_filters_bad_base(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.webgraph import resolve_hrefs

    links = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [
                        "http://example.com:8080/a/b",
                        "not a url",
                        "https://ok.example/x",
                    ]
                ),
                "href": pa.array(["/x", "/y", "page2"]),
            }
        )
    )
    out = resolve_hrefs(links).to_pandas()
    got = dict(zip(out["url"], out["link_url"]))
    # explicit port survives root-relative resolution (port 80 is a
    # DIFFERENT server)
    assert got["http://example.com:8080/a/b"] == "http://example.com:8080/x"
    # unparseable base -> empty link host -> row filtered (no '' node)
    assert "not a url" not in got
    assert got["https://ok.example/x"] == "https://ok.example/page2"
    assert (out["link_host"] != "").all()


def test_extract_links_non_utf8_binary_html(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.webgraph import extract_links

    html_ok = b'<a href="https://a.example/p">x</a>'
    html_bad = b'\xff\xfe<a href="https://b.example/q">y</a>'
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    ["https://s.example/1", "https://s.example/2"]
                ),
                "html": pa.array([html_ok, html_bad], pa.binary()),
            }
        )
    )
    out = extract_links(ds, html_column="html").to_pandas()
    # the malformed byte is lossy-decoded, both pages' links survive
    assert sorted(out["href"]) == ["https://a.example/p", "https://b.example/q"]


def test_pagerank_null_endpoint_edges(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.webgraph import pagerank

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(["a", "a", None], pa.string()),
                "dst": pa.array(["b", None, "b"], pa.string()),
            }
        )
    )
    out = pagerank(edges, iterations=2).to_pandas()
    # only the real a->b edge counts; no crash, no null node
    assert set(out["node"]) == {"a", "b"}
    assert out["rank"].notna().all()


def test_drop_blocked_hosts_mixed_case_entries(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.lib.url import drop_blocked_hosts

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "url": pa.array(
                    ["https://example.com/a", "https://keep.example/b"]
                ),
            }
        )
    )
    out = drop_blocked_hosts(ds, ["Example.COM"]).to_pandas()
    assert out["doc_id"].tolist() == [2]


def test_quantiles_int64_beyond_2_53(ray_session):
    import pyarrow as pa
    import ray.data

    from mismo_ray.util_ops import quantiles

    vals = [2**53 + 1, 2**53 + 3, 2**53 + 5, -(2**53) - 7]
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    got = quantiles(ds, "x", [0.0, 0.5, 1.0])
    # exact elements of the column, bit-exact at any magnitude
    assert got[0.0] == -(2**53) - 7
    assert got[0.5] == 2**53 + 1
    assert got[1.0] == 2**53 + 5
