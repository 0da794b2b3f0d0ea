from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mismo_ray.lib.robots import (
    apply_robots,
    is_allowed,
    parse_robots_txt,
)

ROBOTS_A = (
    "# comments are stripped\n"
    "User-agent: googlebot\n"
    "Disallow: /g/\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/open\n"
    "Disallow: /tmp/*.log\n"
    "Disallow: /exact$\n"
    "Sitemap: https://a.example.com/sitemap.xml\n"
)
ROBOTS_BLOCK_ALL = "User-agent: *\nDisallow: /\n"
ROBOTS_ALLOW_ALL = "User-agent: *\nDisallow:\n"


def test_parse_groups_and_agent_selection():
    star = parse_robots_txt(ROBOTS_A)
    assert star == [
        (False, "/private/"),
        (True, "/private/open"),
        (False, "/tmp/*.log"),
        (False, "/exact$"),
    ]
    # case-insensitive exact agent match beats the * group
    assert parse_robots_txt(ROBOTS_A, agent="GoogleBot") == [(False, "/g/")]
    # unknown agent falls back to *
    assert parse_robots_txt(ROBOTS_A, agent="bingbot") == star
    # multiple user-agent lines share one rule block
    multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt(multi, agent="b") == [(False, "/x")]
    # same-agent groups merge
    merged = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    assert parse_robots_txt(merged) == [(False, "/a"), (False, "/b")]
    assert parse_robots_txt(None) == []
    assert parse_robots_txt("") == []
    assert parse_robots_txt(ROBOTS_ALLOW_ALL) == []


def test_longest_match_and_wildcards():
    rules = parse_robots_txt(ROBOTS_A)
    assert not is_allowed("/private/x", rules)
    assert is_allowed("/private/open/deep", rules)  # longer Allow wins
    assert not is_allowed("/tmp/a.log", rules)  # * wildcard
    assert is_allowed("/tmp/a.txt", rules)
    assert not is_allowed("/exact", rules)  # $ anchor
    assert is_allowed("/exactly", rules)
    assert is_allowed("/anything", rules)  # no match -> allowed
    # equal-length tie goes to Allow
    tie = [(False, "/p/"), (True, "/p/")]
    assert is_allowed("/p/x", tie)
    # empty path treated as "/"
    assert not is_allowed("", parse_robots_txt(ROBOTS_BLOCK_ALL))


def _pages():
    rows = []
    for i in range(40):
        host = f"h{i % 4}.example.com"
        path = ["/ok/", "/private/", "/tmp/x.log", "/private/open/"][i % 4] + str(i)
        rows.append({"record_id": i, "url": f"https://{host}{path}"})
    rows.append({"record_id": 100, "url": None})
    rows.append({"record_id": 101, "url": "not a url"})
    rows.append({"record_id": 102, "url": "https://unlisted.example.com/private/x"})
    return rows


_ROBOTS_MAP = {
    "h0.example.com": ROBOTS_A,
    "h1.example.com": ROBOTS_BLOCK_ALL,
    "h2.example.com": ROBOTS_ALLOW_ALL,
    # h3: no robots entry at all
}


def _expected_kept():
    kept = set()
    for r in _pages():
        i, url = r["record_id"], r["url"]
        if url is None or "://" not in url:
            kept.add(i)
            continue
        host = url.split("://")[1].split("/")[0]
        path = "/" + url.split("://")[1].split("/", 1)[1]
        txt = _ROBOTS_MAP.get(host)
        if txt is None:
            kept.add(i)
            continue
        if is_allowed(path, parse_robots_txt(txt)):
            kept.add(i)
    return kept


def test_apply_robots_broadcast(ray_session):
    ds = ray.data.from_items(_pages())
    out = apply_robots(ds, _ROBOTS_MAP)
    got = {r["record_id"] for r in out.take_all()}
    assert got == _expected_kept()
    # audit mode is the exact complement over rows with a parseable verdict
    audit = {r["record_id"] for r in apply_robots(ds, _ROBOTS_MAP, invert=True).take_all()}
    assert audit == {r["record_id"] for r in _pages()} - got


def test_apply_robots_join_path_parity(ray_session):
    ds = ray.data.from_items(_pages())
    robots_ds = ray.data.from_items(
        [{"host": h, "robots_txt": t} for h, t in _ROBOTS_MAP.items()]
    )
    broadcast = {
        r["record_id"] for r in apply_robots(ds, robots_ds).take_all()
    }
    joined = {
        r["record_id"]
        for r in apply_robots(ds, robots_ds, max_broadcast_bytes=0).take_all()
    }
    assert broadcast == joined == _expected_kept()


def test_mixed_case_robots_hosts_match(ray_session):
    # page hosts come out of the URL parser lowercased; a mixed-case robots
    # entry must still match on both paths
    ds = ray.data.from_items(
        [{"record_id": 0, "url": "https://h0.example.com/private/x"}]
    )
    entry = {"H0.Example.COM": ROBOTS_BLOCK_ALL}
    assert apply_robots(ds, entry).count() == 0
    robots_ds = ray.data.from_items(
        [{"host": "H0.Example.COM", "robots_txt": ROBOTS_BLOCK_ALL}]
    )
    assert apply_robots(ds, robots_ds, max_broadcast_bytes=0).count() == 0


def test_unknown_field_does_not_split_agent_run():
    txt = (
        "User-agent: a\nCrawl-delay: 10\nUser-agent: b\nDisallow: /private/\n"
    )
    assert parse_robots_txt(txt, agent="a") == [(False, "/private/")]
    assert parse_robots_txt(txt, agent="b") == [(False, "/private/")]
    # but a rule line DOES close the run: a later User-agent is a new group
    txt2 = "User-agent: a\nDisallow: /a\nUser-agent: b\nDisallow: /b\n"
    assert parse_robots_txt(txt2, agent="a") == [(False, "/a")]
    assert parse_robots_txt(txt2, agent="b") == [(False, "/b")]


def test_duplicate_host_rows_merge_on_both_paths(ray_session):
    # two robots rows for one host: rules must UNION (like same-agent group
    # merge) identically on the broadcast and join paths
    ds = ray.data.from_items(
        [
            {"record_id": 0, "url": "https://h.example.com/a/x"},
            {"record_id": 1, "url": "https://h.example.com/b/x"},
            {"record_id": 2, "url": "https://h.example.com/c/x"},
        ]
    )
    rows = [
        {"host": "h.example.com", "robots_txt": "User-agent: *\nDisallow: /a\n"},
        {"host": "h.example.com", "robots_txt": "User-agent: *\nDisallow: /b\n"},
    ]
    robots_ds = ray.data.from_items(rows)
    broadcast = {r["record_id"] for r in apply_robots(ds, robots_ds).take_all()}
    joined = {
        r["record_id"]
        for r in apply_robots(ds, robots_ds, max_broadcast_bytes=0).take_all()
    }
    assert broadcast == joined == {2}


def test_apply_robots_agent_specific(ray_session):
    ds = ray.data.from_items(
        [
            {"record_id": 0, "url": "https://h0.example.com/g/page"},
            {"record_id": 1, "url": "https://h0.example.com/private/page"},
        ]
    )
    # googlebot group blocks /g/ but has no /private/ rule
    got = {
        r["record_id"]
        for r in apply_robots(ds, _ROBOTS_MAP, agent="googlebot").take_all()
    }
    assert got == {1}


def test_load_robots_dir(tmp_path):
    import gzip

    from mismo_ray.lib.robots import load_robots_dir

    (tmp_path / "a.example.com").write_text(ROBOTS_BLOCK_ALL)
    (tmp_path / "B.Example.com.txt").write_text(ROBOTS_A)
    with gzip.open(tmp_path / "c.example.com.txt.gz", "wt") as f:
        f.write(ROBOTS_ALLOW_ALL)
    # duplicate host via differing suffixes merges by concatenation
    (tmp_path / "a.example.com.txt").write_text(
        "User-agent: *\nAllow: /open\n"
    )
    (tmp_path / "subdir").mkdir()  # non-files skipped
    m = load_robots_dir(str(tmp_path))
    assert set(m) == {"a.example.com", "b.example.com", "c.example.com"}
    rules_a = parse_robots_txt(m["a.example.com"])
    assert (False, "/") in rules_a and (True, "/open") in rules_a
    assert parse_robots_txt(m["c.example.com"]) == []
    assert parse_robots_txt(m["b.example.com"], agent="googlebot") == [
        (False, "/g/")
    ]


def test_apply_robots_empty_corpus(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": pa.array([], type=pa.int64()),
                "url": pa.array([], type=pa.string()),
            }
        )
    )
    assert apply_robots(ds, _ROBOTS_MAP).count() == 0
