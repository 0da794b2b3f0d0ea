"""URL parsing + canonicalization (lib/url.py)."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from mismo_ray.lib.url import canonical_url_batch, parse_url_batch


def _canon(urls):
    return canonical_url_batch(pa.array(urls, type=pa.string())).to_pylist()


def test_canonical_rules():
    assert _canon(["HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag"]) == [
        "http://example.com/a/b?a=1&b=2"
    ]
    assert _canon(["https://example.com:443/"]) == ["https://example.com/"]
    # non-default port is kept, even :80 on https
    assert _canon(["https://example.com:80/path"]) == ["https://example.com:80/path"]
    # userinfo dropped, path case preserved, params sorted
    assert _canon(["http://user:pw@Sub.Site.org:8080/P/Q?z=9&fbclid=abc&a=2"]) == [
        "http://sub.site.org:8080/P/Q?a=2&z=9"
    ]
    # empty path -> /, all-tracking query dropped entirely
    assert _canon(["https://example.com", "https://example.com/?utm_a=1&utm_b=2"]) == [
        "https://example.com/",
        "https://example.com/",
    ]
    # unknown scheme: no default port to drop
    assert _canon(["ftp://files.example.com/x/"]) == ["ftp://files.example.com/x"]
    assert _canon(["https://example.com/a//"]) == ["https://example.com/a"]
    # empty params dropped, duplicates kept and sorted
    assert _canon(["https://example.com/?a=1&&a=0"]) == [
        "https://example.com/?a=0&a=1"
    ]
    assert _canon(["not a url", None]) == [None, None]


def test_parse_url_batch():
    t = parse_url_batch(
        pa.array(
            [
                "https://User@WWW.Ex.COM:8443/p/q?a=1#top",
                "nope",
                None,
            ]
        )
    )
    d = t.to_pydict()
    assert d["scheme"] == ["https", None, None]
    assert d["host"] == ["www.ex.com", None, None]
    assert d["port"] == ["8443", None, None]
    assert d["path"] == ["/p/q", None, None]
    assert d["query"] == ["a=1", None, None]
    assert d["fragment"] == ["top", None, None]


def test_add_canonical_url_dataset(ray_session):
    from mismo_ray.lib.url import add_canonical_url, add_url_parts

    t = pa.table(
        {
            "record_id": pa.array([0, 1], type=pa.int64()),
            "url": pa.array(
                ["HTTPS://WWW.A.com/x/?b=2&a=1", "http://b.org:80/y"],
                type=pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(t).materialize()
    out = add_canonical_url(add_url_parts(ds), "url").to_pandas()
    assert list(out["url_canon"]) == [
        "https://a.com/x?a=1&b=2",
        "http://b.org/y",
    ]
    assert list(out["url_host"]) == ["www.a.com", "b.org"]


def test_drop_blocked_hosts_broadcast_and_join_paths(ray_session):
    """Both paths (broadcast frozenset / suffix-explode anti-join) agree,
    subdomains blocked per UT1 semantics, unparseable urls kept."""
    import pyarrow as pa
    import ray.data

    from mismo_ray.lib.url import drop_blocked_hosts

    urls = [
        "https://ok.example.com/a",          # kept
        "https://bad.org/x",                 # blocked exact
        "https://ads.bad.org/y",             # blocked subdomain
        "https://deep.ads.bad.org/z",        # blocked deeper subdomain
        "https://notbad.org/w",              # kept (no dot boundary)
        "not a url at all",                  # unparseable -> kept
        "https://bad.org.evil.com/q",        # kept (suffix is evil.com)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": pa.array(range(len(urls)), type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
            }
        )
    ).repartition(2)

    kept = drop_blocked_hosts(ds, ["bad.org"]).to_pandas()
    assert sorted(kept["record_id"]) == [0, 4, 5, 6]

    # audit mode
    hits = drop_blocked_hosts(ds, ["bad.org"], invert=True).to_pandas()
    assert sorted(hits["record_id"]) == [1, 2, 3]

    # Dataset blocklist, forced join path (max_broadcast=0)
    bl = ray.data.from_arrow(pa.table({"host": ["bad.org"]}))
    kept_join = drop_blocked_hosts(ds, bl, max_broadcast=0).to_pandas()
    assert sorted(kept_join["record_id"]) == sorted(kept["record_id"])

    # Dataset blocklist, broadcast path
    kept_bc = drop_blocked_hosts(ds, bl).to_pandas()
    assert sorted(kept_bc["record_id"]) == sorted(kept["record_id"])

    # include_subdomains=False blocks only the exact host
    exact = drop_blocked_hosts(ds, ["bad.org"], include_subdomains=False).to_pandas()
    assert sorted(exact["record_id"]) == [0, 2, 3, 4, 5, 6]


def test_registered_domain_rules():
    import pyarrow as pa

    from mismo_ray.lib.url import registered_domain_batch

    hosts = pa.array(
        [
            "www.example.com",        # default rule -> example.com
            "a.b.example.co.uk",      # listed suffix -> example.co.uk
            "example.co.uk",          # 3 labels, listed -> itself
            "co.uk",                  # bare suffix (2 labels) -> itself
            "localhost",              # single label -> itself
            "10.0.0.7",               # IPv4 -> itself
            "deep.sub.tree.site.org", # default -> site.org
            None,
        ]
    )
    got = registered_domain_batch(hosts).to_pylist()
    assert got == [
        "example.com",
        "example.co.uk",
        "example.co.uk",
        "co.uk",
        "localhost",
        "10.0.0.7",
        "site.org",
        None,
    ]


def test_registered_domain_full_psl_rules():
    """3-label exact entries and '*.X' wildcard rules (full-PSL shapes)
    are honored ahead of the 2-label fallback."""
    import pyarrow as pa

    from mismo_ray.lib.url import PUBLIC_SUFFIXES_2LABEL, registered_domain_batch

    sfx = frozenset(PUBLIC_SUFFIXES_2LABEL | {"pref.hokkaido.jp", "*.ck"})
    hosts = pa.array(
        [
            "city.pref.hokkaido.jp",      # 3-label suffix -> last 4 labels
            "a.city.pref.hokkaido.jp",    # deeper -> still city.pref...
            "pref.hokkaido.jp",           # host == 3-label suffix -> itself
            "www.example.ck",             # wildcard *.ck: example.ck is a
                                          # public suffix -> last 3 labels
            "example.ck",                 # host == wildcard suffix -> itself
            "b.example.co.uk",            # 2-label listed still works
            "www.example.com",            # default rule untouched
        ]
    )
    got = registered_domain_batch(hosts, suffixes=sfx).to_pylist()
    assert got == [
        "city.pref.hokkaido.jp",
        "city.pref.hokkaido.jp",
        "pref.hokkaido.jp",
        "www.example.ck",
        "example.ck",
        "example.co.uk",
        "example.com",
    ]


def test_drop_blocked_hosts_tld_entry(ray_session):
    """A single-label blocklist entry (a whole TLD) matches per the
    'equals or ends with .entry' contract — regression for the suffix
    chain omitting the bare last label."""
    import pyarrow as pa
    import ray.data

    from mismo_ray.lib.url import drop_blocked_hosts

    urls = ["https://video.xxx/a", "https://a.video.xxx/b", "https://ok.org/c"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": pa.array(range(3), type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
            }
        )
    )
    kept = drop_blocked_hosts(ds, ["xxx"]).to_pandas()
    assert sorted(kept["record_id"]) == [2]
    # join path agrees
    bl = ray.data.from_arrow(pa.table({"host": ["xxx"]}))
    kept_j = drop_blocked_hosts(ds, bl, max_broadcast=0).to_pandas()
    assert sorted(kept_j["record_id"]) == [2]
