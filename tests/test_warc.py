"""WARC source: writer/parser round-trip, gzip, truncation, Ray read path."""

from __future__ import annotations

import datetime
import gzip

import pytest


def _pages(n=5):
    return [
        {
            "url": f"https://site-{i}.example.org/p/{i}",
            "warc_ts": datetime.datetime(2024, 3, 1, 12, 0, i),
            "html": f"<html><body>doc {i} body</body></html>".encode(),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("suffix", ["warc", "warc.gz"])
def test_write_read_roundtrip(tmp_path, suffix):
    from mismo_ray.sources.warc import parse_warc_bytes, write_warc

    path = str(tmp_path / f"seg.{suffix}")
    pages = _pages()
    assert write_warc(path, pages) == 5
    recs = parse_warc_bytes(open(path, "rb").read())
    assert [r["record_type"] for r in recs] == ["warcinfo"] + ["response"] * 5
    resp = [r for r in recs if r["record_type"] == "response"]
    for got, want in zip(resp, pages):
        assert got["url"] == want["url"]
        assert got["warc_ts"] == want["warc_ts"]
        assert got["html"] == want["html"]
        assert got["content_type"].startswith("text/html")


def test_truncated_tail_tolerated(tmp_path):
    from mismo_ray.sources.warc import parse_warc_bytes, write_warc

    path = str(tmp_path / "seg.warc")
    write_warc(path, _pages(3))
    data = open(path, "rb").read()
    recs = parse_warc_bytes(data[: len(data) - 30])  # cut into last record
    assert [r["record_type"] for r in recs] == ["warcinfo", "response", "response"]


def test_read_warc_dataset(ray_session, tmp_path):
    import ray.data

    from mismo_ray.sources.warc import read_warc, write_warc

    pages = _pages(8)
    write_warc(str(tmp_path / "a.warc.gz"), pages[:4])
    write_warc(str(tmp_path / "b.warc"), pages[4:])
    ds = read_warc([str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc")])
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 8  # warcinfo records filtered
    assert set(df.columns) == {
        "url", "warc_ts", "html", "record_type", "content_type",
    }
    assert df["html"][0] == pages[0]["html"]
    assert df["warc_ts"][0] == pages[0]["warc_ts"]

    # the canonical page table feeds the existing pipelines unchanged
    from mismo_ray.pipelines._webpages import extract_text_bytes

    assert extract_text_bytes(df["html"][0]) == ""  # no <main> wrapper


def test_gzip_multi_member(tmp_path):
    """Common Crawl concatenates per-record gzip members; gzip.decompress
    handles member concatenation."""
    from mismo_ray.sources.warc import parse_warc_bytes, write_warc

    p1 = str(tmp_path / "m1.warc")
    p2 = str(tmp_path / "m2.warc")
    write_warc(p1, _pages(2))
    write_warc(p2, _pages(2)[::-1])
    blob = gzip.compress(open(p1, "rb").read()) + gzip.compress(
        open(p2, "rb").read()
    )
    recs = parse_warc_bytes(blob)
    assert sum(r["record_type"] == "response" for r in recs) == 4


def test_warc_feeds_flagship_er_byte_identical(ray_session, tmp_path):
    """The ingest contract end to end: pages written as WARC, read back via
    read_warc, extracted — per-url text byte-identical to the parquet path
    (BASELINE.json input_hint invariant)."""
    import ray.data

    from mismo_ray.pipelines._webpages import (
        add_extracted_text,
        synth_pages,
    )
    from mismo_ray.sources.warc import read_warc, write_warc

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    ).limit(40)
    pages = synth_pages(docs).to_pandas()

    seg = str(tmp_path / "crawl.warc.gz")
    write_warc(
        seg,
        [
            {"url": r.url, "warc_ts": r.warc_ts.to_pydatetime(), "html": r.html}
            for r in pages.itertuples()
        ],
    )
    got = add_extracted_text(read_warc(seg)).to_pandas()
    want = dict(zip(pages["url"], pages["text"]))
    assert len(got) == len(pages)
    for r in got.itertuples():
        assert r.extracted_text == want[r.url]  # byte-identical per url
