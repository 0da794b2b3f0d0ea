"""URL parsing + canonicalization for Common-Crawl-style web tables.

No reference analog (mismo's lib/ covers email/phone/name/address/geo —
see SURVEY §2.2); URLs are this graft's payload axis: the canonical URL is
the natural exact-dedup and blocking key for a crawl (one groupby over
``url_canon`` or ``host``), the same role the cleaned email/phone play in
the reference's person-record pipelines.

Everything is vectorized: one compiled regex per batch via pandas
``str.extract`` (C-speed loop), explode → filter → sort → rejoin for the
query-param canonicalization. No per-row Python in the hot path.

Canonicalization rules (applied by ``canonical_url_batch``):

- scheme and host lowercased; leading ``www.`` dropped from the host;
  ``user:pass@`` userinfo dropped;
- default ports dropped (``:80`` for http, ``:443`` for https — a
  non-default port, even ``:80`` on https, is kept);
- empty path becomes ``/``; trailing slashes stripped (but ``/`` stays);
- fragment dropped;
- tracking query params dropped (names starting ``utm_`` or in
  ``TRACKING_PARAMS``), survivors sorted bytewise and rejoined; an empty
  survivor set drops the ``?`` entirely;
- inputs that do not look like ``scheme://authority...`` canonicalize to
  null.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_URL_PATTERN = (
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)
_HOSTPORT_PATTERN = r"^(.*?)(?::(\d+))?$"

TRACKING_PARAMS = frozenset(
    {"fbclid", "gclid", "msclkid", "ref", "ref_src", "igshid", "mc_cid", "mc_eid"}
)
TRACKING_PREFIX = "utm_"
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def parse_url_batch(arr: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Split a string array of URLs into (scheme, host, port, path, query,
    fragment) columns; non-URL rows are all-null. Host is lowercased with
    userinfo removed; everything else is byte-preserved."""
    s = arr.to_pandas().astype("object")
    parts = pd.Series(s).str.extract(_URL_PATTERN)
    parts.columns = ["scheme", "authority", "path", "query", "fragment"]
    # strip userinfo, then split host:port
    hostport = parts["authority"].str.split("@").str[-1]
    hp = hostport.str.extract(_HOSTPORT_PATTERN)
    host = hp[0].str.lower()
    return pa.table(
        {
            "scheme": pa.array(parts["scheme"].str.lower(), type=pa.string()),
            "host": pa.array(host, type=pa.string()),
            "port": pa.array(hp[1], type=pa.string()),
            "path": pa.array(parts["path"], type=pa.string()),
            "query": pa.array(parts["query"], type=pa.string()),
            "fragment": pa.array(parts["fragment"], type=pa.string()),
        }
    )


def _canonical_query(query: pd.Series) -> pd.Series:
    """Drop tracking params, sort survivors bytewise, rejoin with '&'.
    Null/empty input -> null output; all-params-dropped -> null too."""
    idx = np.arange(len(query))
    df = pd.DataFrame({"i": idx, "q": query.to_numpy()})
    df = df[df["q"].notna() & (df["q"] != "")]
    if not len(df):
        return pd.Series([None] * len(query), dtype="object")
    ex = df.assign(p=df["q"].str.split("&")).explode("p")
    ex = ex[ex["p"] != ""]
    name = ex["p"].str.split("=").str[0]
    keep = ~(name.str.startswith(TRACKING_PREFIX) | name.isin(TRACKING_PARAMS))
    ex = ex[keep]
    agg = ex.sort_values(["i", "p"], kind="mergesort").groupby("i")["p"].agg("&".join)
    out = pd.Series([None] * len(query), dtype="object")
    out.iloc[agg.index.to_numpy()] = agg.to_numpy()
    return out


def canonical_url_batch(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical form of a string array of URLs (rules in module
    docstring); rows that don't parse canonicalize to null."""
    parts = parse_url_batch(arr)
    scheme = parts["scheme"].to_pandas()
    host = parts["host"].to_pandas().str.replace(r"^www\.", "", regex=True)
    port = parts["port"].to_pandas()
    path = parts["path"].to_pandas()
    q = _canonical_query(parts["query"].to_pandas())

    default = scheme.map(_DEFAULT_PORTS)
    keep_port = port.notna() & (port != default)
    path2 = path.fillna("").str.rstrip("/")
    path2 = path2.where(path2 != "", "/")

    out = (
        scheme
        + "://"
        + host
        + np.where(keep_port, ":" + port.fillna(""), "")
        + path2
        + np.where(q.notna(), "?" + q.fillna(""), "")
    )
    out = out.where(scheme.notna() & host.notna() & (host != ""), None)
    return pa.array(out, type=pa.string())


def add_url_parts(
    ds: ray.data.Dataset, column: str = "url", *, prefix: str = "url_"
) -> ray.data.Dataset:
    """Add ``{prefix}scheme/host/port/path/query/fragment`` columns
    (vectorized map_batches; see parse_url_batch)."""

    def fn(t: pa.Table) -> pa.Table:
        parts = parse_url_batch(t[column].combine_chunks())
        for name in parts.column_names:
            t = t.append_column(f"{prefix}{name}", parts[name])
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def add_canonical_url(
    ds: ray.data.Dataset, column: str = "url", *, out_column: str = "url_canon"
) -> ray.data.Dataset:
    """Add the canonical URL column (see canonical_url_batch)."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            out_column, canonical_url_batch(t[column].combine_chunks())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def drop_blocked_hosts(
    ds: ray.data.Dataset,
    blocklist,
    *,
    url_column: str = "url",
    id_column: str = "record_id",
    include_subdomains: bool = True,
    invert: bool = False,
    max_broadcast: int = 5_000_000,
) -> ray.data.Dataset:
    """Filter rows whose URL host is on a blocklist — the standard
    C4/RefinedWeb curation gate (UT1-style category lists, spam domains).

    ``blocklist``: an iterable of hostnames, or a Dataset with a ``host``
    column. ``include_subdomains=True`` (UT1 semantics) also blocks any
    host that ends with ``"." + blocked`` — ``ads.example.com`` matches an
    ``example.com`` entry. ``invert=True`` KEEPS only blocked rows (audit
    mode). Rows whose URL has no parseable host are kept.

    Scale shape: a list blocklist (or a Dataset one that fits
    ``max_broadcast``) ships once via ``ray.put`` as a frozenset; each
    batch probes the set once per UNIQUE host (hosts repeat heavily in a
    crawl) over every suffix of the host's label chain (<= ~10 probes).
    A Dataset blocklist above the threshold takes the join path instead
    (needs unique ``id_column``): each row's host explodes into its
    label-chain suffixes (bounded fan-out, only (id, suffix) moves), one
    semi join finds blocked ids, one anti join keeps the rest — no driver
    collect of either side.
    """
    from mismo_ray._joins import distinct, hash_join

    def _host_suffixes(host: str) -> list:
        # EVERY tail of the label chain, including the bare last label —
        # a single-label blocklist entry (a whole TLD) must match, per the
        # documented "host equals or ends with '.' + blocked" contract
        parts = host.split(".")
        if not include_subdomains:
            return [host]
        return [".".join(parts[i:]) for i in range(len(parts))]

    def _hosts_of(t: pa.Table) -> pd.Series:
        return pd.Series(
            np.asarray(parse_url_batch(t[url_column])["host"].to_pylist(), dtype=object)
        )

    if isinstance(blocklist, ray.data.Dataset):
        n = blocklist.count()
        if n > max_broadcast:
            if invert:
                raise ValueError(
                    "invert=True needs the broadcast path; raise max_broadcast"
                )

            def explode(t: pa.Table) -> pa.Table:
                hosts = _hosts_of(t)
                ids = t[id_column].combine_chunks()
                rows, sufs = [], []
                for i, h in enumerate(hosts):
                    if h is None:
                        continue
                    for s in _host_suffixes(h):
                        rows.append(i)
                        sufs.append(s)
                return pa.table(
                    {
                        id_column: ids.take(pa.array(rows, type=pa.int64())),
                        "__suffix__": pa.array(sufs, type=pa.string()),
                    }
                )

            exploded = ds.map_batches(explode, batch_format="pyarrow")
            blocked_ids = distinct(
                hash_join(
                    exploded,
                    blocklist.select_columns(["host"]),
                    on=["__suffix__"],
                    right_on=["host"],
                    how="left_semi",
                ).select_columns([id_column]),
                [id_column],
            )
            return hash_join(ds, blocked_ids, on=[id_column], how="left_anti")
        blocked = frozenset(
            r["host"] for r in blocklist.select_columns(["host"]).take_all()
        )
    else:
        blocked = frozenset(blocklist)
    ref = ray.put(blocked)

    def fn(t: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        hosts = _hosts_of(t)
        uniq = hosts.dropna().unique()
        bad = {h for h in uniq if any(s in bl for s in _host_suffixes(h))}
        mask = ~hosts.isin(bad).to_numpy()
        if invert:
            mask = ~mask
        return t.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


# A deliberately SMALL bundled subset of the Mozilla Public Suffix List:
# the multi-label suffixes common in web crawls. The full PSL is ~10k
# entries and updates monthly — at production scale, load it and pass via
# ``suffixes=``. Single-label TLDs need no listing (the default rule takes
# the last two labels).
PUBLIC_SUFFIXES_2LABEL = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
        "com.br", "net.br", "org.br", "gov.br",
        "com.cn", "net.cn", "org.cn", "gov.cn",
        "com.mx", "org.mx", "gob.mx",
        "co.in", "net.in", "org.in", "gov.in",
        "co.kr", "or.kr", "go.kr",
        "com.tr", "org.tr", "gov.tr",
        "com.ar", "org.ar", "gob.ar",
        "co.za", "org.za", "gov.za",
        "com.sg", "org.sg", "gov.sg",
        "com.hk", "org.hk", "gov.hk",
        "co.nz", "org.nz", "govt.nz",
        "com.tw", "org.tw", "gov.tw",
        "co.il", "org.il", "gov.il",
        "com.my", "org.my", "gov.my",
        "co.th", "or.th", "go.th",
        "com.vn", "org.vn", "gov.vn",
        "com.ph", "org.ph", "gov.ph",
        "com.eg", "org.eg", "gov.eg",
        "com.sa", "org.sa", "gov.sa",
        "co.id", "or.id", "go.id",
        "com.pk", "org.pk", "gov.pk",
        "com.ng", "org.ng", "gov.ng",
    }
)

_IPV4_RE = r"^\d+\.\d+\.\d+\.\d+$"


def registered_domain_batch(
    hosts: pa.Array | pa.ChunkedArray | pd.Series,
    *,
    suffixes: frozenset = PUBLIC_SUFFIXES_2LABEL,
) -> pa.Array:
    """eTLD+1 ("registered domain") per host — the right grouping key for
    per-site curation (a quota or blocklist keyed on raw host treats
    blog1.example.co.uk and blog2.example.co.uk as different sites).

    Rules (vectorized, SQL-mirrorable):
    - IPv4 literals and single-label hosts return unchanged;
    - if the last TWO labels are a listed public suffix, the registered
      domain is the last THREE labels (host itself if it has only two);
    - otherwise the last two labels.

    ``suffixes`` defaults to the bundled subset (see its note); nulls pass
    through.
    """
    if isinstance(hosts, (pa.Array, pa.ChunkedArray)):
        s = pd.Series(hosts.to_pylist(), dtype="object")
    else:
        s = hosts.astype("object")
    last2 = s.str.extract(r"([^.]+\.[^.]+)$")[0]
    last3 = s.str.extract(r"([^.]+\.[^.]+\.[^.]+)$")[0]
    is_ip = s.str.match(_IPV4_RE, na=False)
    on_list = last2.isin(suffixes)  # NaN -> False, no downcast warning
    out = last2.where(~on_list, last3.fillna(s))  # 2-label host == suffix
    out = out.fillna(s)  # single-label hosts
    out = out.where(~is_ip, s)
    return pa.array(out.to_numpy(), type=pa.string())


def add_registered_domain(
    ds: ray.data.Dataset,
    host_column: str = "host",
    *,
    out_column: str = "domain",
    suffixes: frozenset = PUBLIC_SUFFIXES_2LABEL,
) -> ray.data.Dataset:
    """Append the eTLD+1 column (see :func:`registered_domain_batch`)."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            out_column, registered_domain_batch(t[host_column], suffixes=suffixes)
        )

    return ds.map_batches(fn, batch_format="pyarrow")
