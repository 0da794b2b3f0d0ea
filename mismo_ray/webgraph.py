"""Web-graph construction over a crawl: href extraction, URL resolution,
and a distributed fixed-point PageRank over the host graph.

A Common-Crawl-style corpus is a graph as much as it is text: the links
between pages drive crawl frontier ranking, per-host quality priors
(spam/link-farm demotion), and seed selection for training-data mixtures.
This module keeps the whole path Ray-Data-native:

- ``extract_links``: one ``map_batches`` over zero-copy Arrow — the html
  bytes are split on the ``href="`` delimiter with the vectorized
  ``split_pattern`` kernel, attribute values recovered with a second
  ``max_splits=1`` split (no per-row regex loop; the html column never
  crosses a shuffle).
- ``resolve_hrefs``: Arrow-native masked string kernels resolving each
  href against its page URL (absolute / protocol-relative / root-relative
  / relative; mailto:/javascript:/fragment-only dropped as nulls).
- ``pagerank``: iterative PageRank over (src, dst) edges in *fixed-point
  int64 arithmetic* — each node's rank is an integer share of a global
  ``scale``; per-iteration shares are ``rank // out_degree`` and the damping
  update is ``((den-num)*r0)//den + (num*incoming)//den``. Integer sums are
  associative, so the result is bit-identical regardless of block order or
  parallelism — and exactly reproducible by a SQL oracle (driver query
  ``host_pagerank``). Dangling-node mass is dropped, the standard
  simplification (Page et al. 1999 §2.6 handles it by renormalizing; at
  fixed iteration count the ordering of hosts is unaffected for crawl-prior
  use).

Scale notes (100 TB): extract_links is embarrassingly parallel; the only
shuffles in pagerank are one groupby per iteration over (dst) plus one
hash-join of the compact (node, rank) table onto edges — both keyed the
same way, ~24 B/edge. Edges dominate; ranks are |hosts| rows. No driver
materialization except the scalar node count.

No reference analog (mismo has no graph ops beyond connected components);
this is webtext-tier infrastructure alongside lib/url.py.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["extract_links", "resolve_hrefs", "pagerank", "anchor_stats"]

_SKIP_PREFIXES = ("mailto:", "javascript:", "tel:", "data:")


def extract_links(
    ds: ray.data.Dataset,
    *,
    html_column: str = "html",
    url_column: str = "url",
    resolve: bool = True,
    keep_columns: Sequence[str] = (),
    with_anchor: bool = False,
) -> ray.data.Dataset:
    """Explode each page into one row per ``href="..."`` occurrence.

    Output: ``(url, href[, link_url, link_host], *keep_columns)`` — one row
    per extracted attribute value, in document order. With ``resolve=True``
    each href is resolved against the page URL into ``link_url`` (absolute,
    fragment dropped) and ``link_host``; unresolvable hrefs (mailto:,
    javascript:, fragment-only, empty) are dropped.

    ``with_anchor=True`` adds a nullable ``anchor`` column — the visible
    link text, a classic ER/ranking signal (anchor text describes the
    TARGET page). Byte-exact contract, mirrored 1:1 by string functions in
    the SQL oracle: after the href's closing quote, skip to the first
    ``>``; the anchor is the run of non-``<`` characters that follows,
    valid only when terminated by a literal ``</a>`` (nested markup inside
    the anchor, a missing ``>``, or a different closing tag -> null; the
    link row itself is still emitted).

    Vectorized: two Arrow ``split_pattern`` passes, zero per-row regex
    (anchor extraction adds two more bounded ``max_splits=1`` passes).
    Byte-exact contract: an href is everything between ``href="`` and the
    next ``"`` (unterminated attributes at end-of-document are dropped),
    matching the SQL oracle's ``regexp_extract_all(html, 'href="([^"]*)"')``.
    """
    keep_columns = list(keep_columns)

    def emit(t: pa.Table) -> pa.Table:
        html = t[html_column].combine_chunks()
        if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
            try:
                html = html.cast(pa.string())
            except pa.ArrowInvalid:
                # real crawls carry non-UTF-8 pages; one must not kill the
                # job — lossy-decode the rare bad batch instead of the
                # validating cast (vectorized path stays the common case)
                html = pa.array(
                    [
                        None if v is None else v.decode("utf-8", "replace")
                        for v in html.to_pylist()
                    ],
                    type=pa.string(),
                )
        segs = pc.split_pattern(html, pattern='href="')
        offsets = np.asarray(segs.offsets, dtype=np.int64)
        flat = segs.values
        counts = np.diff(offsets)
        # position of each flat segment within its document; segment 0 is
        # the prefix before the first href
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], counts)
        is_href = idx > 0
        # value = text before the closing quote; max_splits=1 keeps it O(n)
        closed = pc.split_pattern(flat, pattern='"', max_splits=1)
        # segments with no closing quote (unterminated attr) yield a
        # 1-element list -> exclude them
        has_close = np.asarray(pc.list_value_length(closed)) == 2
        take = is_href & has_close
        href = pc.list_element(closed, 0).filter(pa.array(take))
        doc_pos = np.nonzero(take)[0]
        doc_idx = np.searchsorted(offsets[1:], doc_pos, side="right")
        cols = {
            url_column: t[url_column].combine_chunks().take(pa.array(doc_idx)),
            "href": href,
        }
        if with_anchor:
            # remainder after the closing quote -> skip to first '>', take
            # the non-'<' run, require a literal '</a>' terminator. A
            # sentinel '>'/'<' appended per row guarantees both max_splits=1
            # splits always yield 2 elements (rows where only the sentinel
            # matched end with tail '' and fail the '</a>' check -> null).
            # filter FIRST (kept rows are guaranteed a closing quote, i.e.
            # a 2-element split), THEN take element 1
            rest = pc.list_element(closed.filter(pa.array(take)), 1)
            gt = pc.split_pattern(
                pc.binary_join_element_wise(rest, ">", ""),
                pattern=">",
                max_splits=1,
            )
            after_gt = pc.list_element(gt, 1)
            lt = pc.split_pattern(
                pc.binary_join_element_wise(after_gt, "<", ""),
                pattern="<",
                max_splits=1,
            )
            candidate = pc.list_element(lt, 0)
            ok = pc.starts_with(pc.list_element(lt, 1), "/a>")
            cols["anchor"] = pc.if_else(
                ok, candidate, pa.scalar(None, pa.string())
            )
        for c in keep_columns:
            cols[c] = t[c].combine_chunks().take(pa.array(doc_idx))
        return pa.table(cols)

    links = ds.map_batches(emit, batch_format="pyarrow")
    if resolve:
        links = resolve_hrefs(links, url_column=url_column)
    return links


def resolve_hrefs(
    links: ray.data.Dataset,
    *,
    url_column: str = "url",
    href_column: str = "href",
) -> ray.data.Dataset:
    """Add ``link_url`` (href resolved against the page URL, fragment
    dropped) and ``link_host``; rows whose href cannot become a fetchable
    http(s) URL are filtered out.

    Resolution rules (the practical subset of RFC 3986 §5 a crawler needs,
    mirrored exactly by the host_pagerank/extract_links SQL oracles):

    - ``http://`` / ``https://``-absolute: used as-is
    - ``//host/path``: page scheme prepended
    - ``/path``: page ``scheme://host`` prepended
    - anything else: joined to the page URL's directory (path up to the
      last ``/``)
    - empty, fragment-only, and ``mailto:/javascript:/tel:/data:`` dropped
    """
    from mismo_ray.lib.url import parse_url_batch

    def fn(t: pa.Table) -> pa.Table:
        base = parse_url_batch(t[url_column].combine_chunks())
        href = t[href_column].combine_chunks().fill_null("")
        # strip fragments from the href itself first
        href = pc.list_element(pc.split_pattern(href, "#", max_splits=1), 0)
        scheme = base["scheme"].combine_chunks().fill_null("https")
        host = base["host"].combine_chunks().fill_null("")
        # keep the base's explicit port: rebuilding from host alone would
        # resolve '/x' on example.com:8080 to port-80 example.com — a
        # different server — and merge the two hosts in the link graph
        port = base["port"].combine_chunks()
        host = pc.if_else(
            port.is_valid(),
            pc.binary_join_element_wise(host, ":", pc.fill_null(port, ""), ""),
            host,
        )
        path = base["path"].combine_chunks().fill_null("/")
        # directory of the page path: everything up to (and incl.) the last
        # '/'; a non-empty path always starts with '/', empty path -> '/'
        path = pc.if_else(pc.equal(path, ""), pa.scalar("/", pa.string()), path)
        pdir = pc.replace_substring_regex(path, r"[^/]*$", "")

        low = pc.utf8_lower(href)
        absolute = pc.or_(
            pc.starts_with(low, "http://"), pc.starts_with(low, "https://")
        )
        not_abs = pc.invert(absolute)
        proto_rel = pc.and_(pc.starts_with(href, "//"), not_abs)
        root_rel = pc.and_(
            pc.starts_with(href, "/"), pc.invert(pc.or_(proto_rel, absolute))
        )
        skip = pc.equal(href, "")
        for p in _SKIP_PREFIXES:
            skip = pc.or_(skip, pc.starts_with(low, p))
        skip = pc.or_(
            skip,
            pc.and_(
                pc.match_substring_regex(low, r"^[a-z][a-z0-9+.\-]*:"), not_abs
            ),
        )

        j = pc.binary_join_element_wise
        out = pc.if_else(
            absolute,
            href,
            pc.if_else(
                proto_rel,
                j(scheme, ":", href, ""),
                pc.if_else(
                    root_rel,
                    j(scheme, "://", host, href, ""),
                    j(scheme, "://", host, pdir, href, ""),
                ),
            ),
        )
        resolved = pc.if_else(skip, pa.scalar(None, pa.string()), out)
        lhost = parse_url_batch(resolved)["host"].combine_chunks()
        # an unparseable BASE url (host "") resolves relative hrefs to
        # 'https:///x' with an empty link host — those rows would pool into
        # a spurious '' node in the host graph; the contract says
        # unfetchable rows are filtered
        keep_mask = pc.and_(
            resolved.is_valid(),
            pc.and_(
                lhost.is_valid(), pc.invert(pc.equal(pc.fill_null(lhost, ""), ""))
            ),
        )
        t = t.append_column("link_url", resolved).append_column(
            "link_host", lhost
        )
        return t.filter(keep_mask)

    return links.map_batches(fn, batch_format="pyarrow")


def pagerank(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Fixed-point PageRank over (src, dst) edges -> (node, rank) with
    integer ranks summing to <= ``scale``.

    Exact integer semantics (bit-identical at any parallelism, SQL-oracle
    reproducible):

    - ``n`` = distinct nodes (union of src and dst); ``r0 = scale // n``
    - each iteration: every node sends ``rank // out_degree`` along each
      outgoing edge (multigraph: parallel edges each carry a share);
      ``rank' = ((den - num) * r0) // den + (num * incoming_sum) // den``
      (TWO floor divisions, exactly as the SQL oracle computes — a single
      combined ``(a + b) // den`` differs by one whenever the remainders
      sum past den)
    - nodes with no incoming edges hold the teleport share
      ``((den - num) * r0) // den``; dangling mass is dropped (see module
      docstring); edges with a null endpoint are dropped (not edges).

    ``edges`` is materialized once up front (it is consumed every
    iteration) with the out-degree pre-attached, so each iteration is one
    hash-join of the compact (node, rank) table onto edges by ``src``, one
    groupby-sum over ``dst``, and one left-join back onto the node table.
    Ranks are materialized each round to keep the plan depth bounded (same
    pattern as cluster/_connected_components).
    """
    from mismo_ray._joins import default_num_partitions, distinct, hash_join

    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    num, den = damping
    B = num_partitions or default_num_partitions()

    def project_edges(t: pa.Table) -> pa.Table:
        # an edge with a null endpoint is not an edge: null dst would
        # reach the incoming-sum groupby (Ray's sort groupby rejects None
        # keys — the repo pitfall) and null src can route nothing
        out = pa.table({"src": t[src], "dst": t[dst]})
        return out.filter(
            pc.and_(out["src"].is_valid(), out["dst"].is_valid())
        )

    edges = edges.map_batches(project_edges, batch_format="pyarrow").materialize()
    src, dst = "src", "dst"
    # Effective partition count tracks the DATA, capped by the caller's B:
    # every iteration unions/shuffles these datasets and block counts
    # compound through union+groupby chains — iterating a 40-node graph
    # over 64/96 tiny blocks measured 13-40x slower than over right-sized
    # blocks (fixed per-block scheduling cost dominates). ~64k edges per
    # partition keeps shuffle payloads ~1 MB; at corpus scale P == B.
    n_edges = edges.count()
    P = min(B, max(1, -(-n_edges // 65536)))
    if edges.num_blocks() > P:
        edges = edges.repartition(P).materialize()
    srcs = edges.map_batches(
        lambda t: pa.table({"node": t[src]}), batch_format="pyarrow"
    )
    dsts = edges.map_batches(
        lambda t: pa.table({"node": t[dst]}), batch_format="pyarrow"
    )
    nodes = distinct(srcs.union(dsts), "node").materialize()
    if nodes.num_blocks() > P:
        nodes = nodes.repartition(P).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "rank": pa.array([], type=pa.int64())}
            ),
            batch_format="pyarrow",
        )
    r0 = scale // n
    base = ((den - num) * r0) // den

    from ray.data.aggregate import Count, Sum

    out_deg = (
        edges.map_batches(lambda t: pa.table({"node": t[src]}), batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="out_deg"))
    )
    _ns = nodes.schema(fetch_if_missing=True)
    if _ns is None:
        # empty graph: no nodes, empty rank table
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()), "rank": pa.array([], pa.int64())}
            )
        )
    node_schema = _ns.base_schema
    node_type = node_schema.field("node").type
    deg_schema = pa.schema(
        [pa.field("node", node_type), pa.field("out_deg", pa.int64())]
    )
    # (src, dst, out_deg): consumed every iteration -> join + pin once
    edges_deg = hash_join(
        edges,
        out_deg,
        on=src,
        right_on="node",
        how="inner",
        num_partitions=P,
        left_schema=pa.schema(
            [pa.field(src, node_type), pa.field(dst, node_type)]
        ),
        right_schema=deg_schema,
    ).materialize()
    _es = edges_deg.schema(fetch_if_missing=True)
    edges_deg_schema = _es.base_schema if _es is not None else pa.schema(
        [  # no surviving edges: layout known by construction
            pa.field(src, node_type),
            pa.field(dst, node_type),
            pa.field("out_deg", pa.int64()),
        ]
    )

    def with_rank(rank_val: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"],
                    "rank": pa.array(
                        np.full(len(t), rank_val, dtype=np.int64)
                    ),
                }
            )

        return fn

    ranks = nodes.map_batches(with_rank(r0), batch_format="pyarrow").materialize()
    rank_schema = pa.schema([pa.field("node", node_type), pa.field("rank", pa.int64())])

    for _ in range(iterations):
        # per-edge share = src rank // src out-degree, summed over dst
        incoming = (
            hash_join(
                edges_deg,
                ranks,
                on=src,
                right_on="node",
                how="inner",
                num_partitions=P,
                left_schema=edges_deg_schema,
                right_schema=rank_schema,
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t[dst],
                        "share": pa.array(
                            np.asarray(t["rank"], dtype=np.int64)
                            // np.asarray(t["out_deg"], dtype=np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Sum("share", alias_name="incoming"))
        )
        incoming_schema = pa.schema(
            [pa.field("node", node_type), pa.field("incoming", pa.int64())]
        )
        ranks = (
            hash_join(
                nodes,
                incoming,
                on="node",
                how="left_outer",
                num_partitions=P,
                left_schema=node_schema,
                right_schema=incoming_schema,
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"],
                        "rank": pa.array(
                            base
                            + (
                                np.uint64(num)
                                * np.asarray(
                                    pc.fill_null(t["incoming"], 0), dtype=np.int64
                                ).astype(np.uint64)
                            ).astype(np.int64)
                            // den
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return ranks


def anchor_stats(
    links: ray.data.Dataset,
    *,
    target_column: str = "link_url",
    anchor_column: str = "anchor",
) -> ray.data.Dataset:
    """Inbound anchor-text profile per target URL: ``(link_url, n_links,
    n_anchored, top_anchor, top_anchor_count)``.

    Anchor text is how OTHER pages describe a target — the classic ER /
    ranking signal (compare a page's own title against its inbound
    anchors). ``top_anchor`` is the most frequent non-null anchor string
    (ties broken by the lexicographically smallest anchor, so the result
    is deterministic and SQL-reproducible).

    Scale shape: one pre-aggregating count shuffle over (target, anchor)
    — the anchor strings cross once, already deduplicated per batch by the
    pandas value_counts combiner — then a top-1-per-target pass via the
    bucketed ``top_k_per_group`` and one join against the per-target
    totals. The counted table is materialized once (both the totals and
    the top branch read it; it is the compact post-combine table, not the
    links). No full-text columns move; payload is (url, anchor, int).

    Rows with a null target are dropped up front (a link without a
    resolvable target has no profile to contribute to); the count of
    dropped rows is not surfaced — filter beforehand if it matters.
    """
    from ray.data.aggregate import Sum

    from mismo_ray._joins import hash_join
    from mismo_ray.util_ops import top_k_per_group

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t[target_column].combine_chunks().is_valid())
        tgt = pd.Series(t[target_column].to_pylist(), dtype="object")
        anc = pd.Series(t[anchor_column].to_pylist(), dtype="object")
        n_anchored = anc.notna()
        df = pd.DataFrame(
            {"t": tgt, "a": anc.where(n_anchored, "")}
        )
        df["anchored"] = n_anchored.astype("int64")
        g = (
            df.groupby(["t", "a"], sort=False)
            .agg(c=("a", "size"), anchored=("anchored", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                target_column: pa.array(g["t"], type=pa.string()),
                "__anchor__": pa.array(g["a"], type=pa.string()),
                "__c__": pa.array(g["c"].to_numpy(dtype=np.int64)),
                "__anchored__": pa.array(g["anchored"].to_numpy(dtype=np.int64)),
            }
        )

    counts = (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby([target_column, "__anchor__"])
        .aggregate(
            Sum("__c__", alias_name="__c__"),
            Sum("__anchored__", alias_name="__anchored__"),
        )
        # consumed by BOTH the totals and the top branch: materialize the
        # compact post-combine table so the links lineage runs once
        .materialize()
    )

    def totals_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                target_column: t[target_column],
                "n_links": t["__c__"],
                "n_anchored": t["__anchored__"],
            }
        )

    totals = (
        counts.map_batches(totals_partial, batch_format="pyarrow")
        .groupby(target_column)
        .aggregate(
            Sum("n_links", alias_name="n_links"),
            Sum("n_anchored", alias_name="n_anchored"),
        )
    )

    # top non-null anchor. Null anchors share the "" sentinel group with
    # any REAL empty-string anchors, so the true non-null count of a group
    # is __anchored__ (== __c__ for every group except the sentinel one);
    # rank by it and groups that are pure-null sentinels (__anchored__ = 0)
    # drop out.
    real = counts.filter(expr="__anchored__ > 0")
    top = top_k_per_group(
        real.select_columns([target_column, "__anchor__", "__anchored__"]),
        target_column,
        [("__anchored__", "desc"), ("__anchor__", "asc")],
        1,
    )

    def rename_top(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                target_column: t[target_column],
                "top_anchor": t["__anchor__"],
                "top_anchor_count": t["__anchored__"],
            }
        )

    # explicit schemas: both sides are lazy groupby/top-k lineages, and
    # hash_join's schema inference would EXECUTE each once just to learn
    # the column set, then again for the join (its docstring's warning)
    return hash_join(
        totals,
        top.map_batches(rename_top, batch_format="pyarrow"),
        on=[target_column],
        how="left_outer",
        left_schema=pa.schema(
            [
                pa.field(target_column, pa.string()),
                pa.field("n_links", pa.int64()),
                pa.field("n_anchored", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [
                pa.field(target_column, pa.string()),
                pa.field("top_anchor", pa.string()),
                pa.field("top_anchor_count", pa.int64()),
            ]
        ),
    )
