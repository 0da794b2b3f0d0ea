"""crawl_clean: the webtext cleaning chain end to end at toy scale.

Invariants are exact (the synthesized corpus is deterministic):
every record carries exactly one email + one IP, every record survives
the quality gate, replicas stay distinct through exact dedupe (replica-
tagged head line), and C4-style line dedup removes the lion's share of
the replicated body text.
"""

from __future__ import annotations

import pyarrow.compute as pc
import ray.data


def _docs(n: int = 40) -> ray.data.Dataset:
    texts = [
        f"alpha bravo charlie value delta echo doc{i % 7} foxtrot golf value "
        f"hotel india juliet kilo lima" for i in range(n)
    ]
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(n)), "text": texts})
    ).repartition(4)


def test_crawl_clean_counters(ray_session):
    from mismo_ray.pipelines import crawl_clean

    n, mult = 40, 5
    out = crawl_clean(_docs(n), multiplier=mult)
    assert out["n_records"] == n * mult  # everything passes the gate
    assert out["n_emails"] == n * mult  # exactly one email per record
    assert out["n_ips"] == n * mult  # exactly one IP per record
    # replica-tagged head lines keep all records distinct post-clean
    assert out["n_distinct_clean"] == n * mult
    # line dedup removed most of the replicated body (body lines repeat
    # across all 5 replicas and across the doc{i%7} text groups)
    assert out["n_chars_out"] < out["n_chars_in"] / 2


def test_crawl_clean_robots_gate(ray_session):
    """Opt-in robots stage: blocking one synthesized host drops exactly
    that host's records before any downstream compute; robots=None stays
    bit-identical to the recorded counters."""
    from mismo_ray.pipelines import crawl_clean

    n, mult = 40, 5
    base = crawl_clean(_docs(n), multiplier=mult)
    # synth urls: HTTPS://WWW.crawl{doc_id % 50}.Example.COM/... — with
    # n=40, host crawl7 carries exactly doc_id 7 (mult replicas); the
    # mixed-case robots key must still match the parsed lowercase host
    robots = {
        "WWW.crawl7.Example.COM": "User-agent: *\nDisallow: /\n",
    }
    gated = crawl_clean(_docs(n), multiplier=mult, robots=robots)
    assert gated["n_records"] == base["n_records"] - mult
    assert gated["n_emails"] == base["n_emails"] - mult
    assert gated["n_distinct_clean"] == base["n_distinct_clean"] - mult
    # a path-scoped rule blocks nothing here (paths are /d/<id>/r/<rep>/)
    unrelated = crawl_clean(
        _docs(n), multiplier=mult,
        robots={"www.crawl7.example.com": "User-agent: *\nDisallow: /private/\n"},
    )
    assert unrelated["n_records"] == base["n_records"]


def test_synth_crawl_stage_semantics(ray_session):
    """Spot-check the intermediate stages on one synthesized record."""
    from mismo_ray.lib.url import add_canonical_url
    from mismo_ray.pipelines import synth_crawl
    from mismo_ray.textstats import redact_pii

    crawl = synth_crawl(_docs(3), multiplier=2)
    crawl = add_canonical_url(crawl, "url")
    crawl = redact_pii(crawl, "text", out_column="text")
    rows = crawl.take_all()
    assert len(rows) == 6
    by_id = {r["record_id"]: r for r in rows}
    r0 = by_id[0]
    # canonicalization: lowercased host, tracking params stripped
    assert "HTTPS" not in r0["url_canon"] and "utm_source" not in r0["url_canon"]
    assert "crawl0.example.com" in r0["url_canon"]
    # PII gone, typed tokens in place
    assert "@mail" not in r0["text"] and "<EMAIL>" in r0["text"]
    assert "<IP>" in r0["text"] and r0["n_emails"] == 1 and r0["n_ips"] == 1
    # the ' value ' marker became line structure
    assert "\n" in r0["text"]
    # replicas differ in head line and record id, share body lines
    r1 = by_id[1]
    assert r0["text"] != r1["text"]
    assert r0["text"].split("\n", 1)[1] == r1["text"].split("\n", 1)[1]
