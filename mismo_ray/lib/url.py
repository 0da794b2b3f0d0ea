"""URL parsing + canonicalization for Common-Crawl-style web tables.

No reference analog (mismo's lib/ covers email/phone/name/address/geo —
see SURVEY §2.2); URLs are this graft's payload axis: the canonical URL is
the natural exact-dedup and blocking key for a crawl (one groupby over
``url_canon`` or ``host``), the same role the cleaned email/phone play in
the reference's person-record pipelines.

Everything is Arrow-native: compiled-RE2 ``pc.extract_regex`` /
``pc.split_pattern`` kernels over zero-copy batches — no pandas
object-dtype detour, no per-row Python. The query-param canonicalization
is flatten → filter → one table sort → list-rebuild → ``pc.binary_join``.

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
import pyarrow.compute as pc
import ray.data

# RE2 named-group patterns (pc.extract_regex). Two steps like RFC 3986
# splitting: greedy authority first, then host:port within it — a single
# combined pattern would let a lazy host group collapse to "" and the path
# group swallow the authority.
_URL_PATTERN = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<authority>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
)
# greedy "(?:.*@)?" strips userinfo to the LAST '@'; lazy host + anchored
# optional ":digits" splits the port
_HOSTPORT_PATTERN = r"^(?:.*@)?(?P<host>.*?)(?::(?P<port>\d+))?$"

TRACKING_PARAMS = frozenset(
    {"fbclid", "gclid", "msclkid", "ref", "ref_src", "igshid", "mc_cid", "mc_eid"}
)
TRACKING_PREFIX = "utm_"
_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_SET = pa.array(sorted(TRACKING_PARAMS), type=pa.string())


def _chunked(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _empty_to_null(arr: pa.Array) -> pa.Array:
    return pc.if_else(pc.equal(arr, ""), pa.scalar(None, pa.string()), arr)


def parse_url_batch(arr: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Split a string array of URLs into (scheme, host, port, path, query,
    fragment) columns; non-URL rows are all-null. Host is lowercased with
    userinfo removed; scheme lowercased; port/query/fragment are null when
    absent OR empty (an empty component is semantically absent for every
    downstream rule); path is byte-preserved ("" when the URL has none)."""
    arr = _chunked(arr)
    m = pc.extract_regex(arr, _URL_PATTERN)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    hp = pc.extract_regex(pc.struct_field(m, "authority"), _HOSTPORT_PATTERN)
    return pa.table(
        {
            "scheme": scheme,
            "host": pc.utf8_lower(pc.struct_field(hp, "host")),
            "port": _empty_to_null(pc.struct_field(hp, "port")),
            "path": pc.struct_field(m, "path"),
            "query": _empty_to_null(pc.struct_field(m, "query")),
            "fragment": _empty_to_null(pc.struct_field(m, "fragment")),
        }
    )


def _canonical_query(query: pa.Array) -> pa.Array:
    """Drop tracking params, sort survivors bytewise, rejoin with '&'.
    Null/empty input -> null output; all-params-dropped -> null too.

    Arrow shape: split -> flatten with parent indices -> boolean-mask the
    tracking params -> one (parent, param) table sort (UTF-8 byte order ==
    code-point order, so the sort matches any engine's bytewise ORDER BY)
    -> rebuild the list layout from bincount offsets -> binary_join.
    """
    n = len(query)
    parts = pc.split_pattern(query, "&")
    flat = pc.list_flatten(parts)
    parent = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
    nonempty = pc.not_equal(flat, "")
    name = pc.list_element(pc.split_pattern(flat, "=", max_splits=1), 0)
    keep = pc.and_(
        nonempty,
        pc.and_(
            pc.invert(pc.starts_with(name, TRACKING_PREFIX)),
            pc.invert(pc.is_in(name, value_set=_TRACKING_SET)),
        ),
    )
    keep_np = np.asarray(keep.fill_null(False))
    flat = flat.filter(keep)
    parent = parent[keep_np]
    order = pa.table({"i": parent, "p": flat}).sort_by(
        [("i", "ascending"), ("p", "ascending")]
    )
    counts = np.bincount(parent, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), order["p"].combine_chunks()
    )
    joined = pc.binary_join(lists, "&")
    return pc.if_else(
        pa.array(counts > 0), joined, pa.scalar(None, pa.string())
    )


def canonical_url_batch(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical form of a string array of URLs (rules in module
    docstring); rows that don't parse canonicalize to null."""
    parts = parse_url_batch(arr)
    scheme = parts["scheme"].combine_chunks()
    host = pc.replace_substring_regex(
        parts["host"].combine_chunks(), r"^www\.", "", max_replacements=1
    )
    port = parts["port"].combine_chunks()
    path = parts["path"].combine_chunks()
    q = _canonical_query(parts["query"].combine_chunks())

    default = pc.if_else(
        pc.equal(scheme, "http"),
        pa.scalar("80", pa.string()),
        pc.if_else(
            pc.equal(scheme, "https"),
            pa.scalar("443", pa.string()),
            pa.scalar(None, pa.string()),
        ),
    )
    # keep a present port unless it equals the scheme default (unknown
    # scheme -> no default -> kept)
    keep_port = pc.and_(
        port.is_valid(),
        pc.fill_null(pc.not_equal(port, default), True),
    )
    path2 = pc.replace_substring_regex(path.fill_null(""), r"/+$", "")
    path2 = pc.if_else(pc.equal(path2, ""), pa.scalar("/", pa.string()), path2)

    null_s = pa.scalar(None, pa.string())
    port_part = pc.if_else(
        keep_port,
        pc.binary_join_element_wise(":", port.fill_null(""), ""),
        "",
    )
    query_part = pc.fill_null(
        pc.binary_join_element_wise("?", q, ""), ""
    )
    out = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path2, query_part, ""
    )
    ok = pc.and_(
        pc.and_(scheme.is_valid(), host.is_valid()),
        pc.fill_null(pc.not_equal(host, ""), False),
    )
    return pc.if_else(ok, out, null_s)


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
            # lowercase the blocklist side too (probed suffixes are derived
            # from parse_url_batch's lowercased hosts)
            bl_norm = blocklist.select_columns(["host"]).map_batches(
                lambda t: pa.table(
                    {"host": pc.utf8_lower(t["host"].combine_chunks())}
                ),
                batch_format="pyarrow",
            )
            blocked_ids = distinct(
                hash_join(
                    exploded,
                    bl_norm,
                    on=["__suffix__"],
                    right_on=["host"],
                    how="left_semi",
                ).select_columns([id_column]),
                [id_column],
            )
            return hash_join(ds, blocked_ids, on=[id_column], how="left_anti")
        blocked = frozenset(
            r["host"].lower()
            for r in blocklist.select_columns(["host"]).take_all()
            if r["host"] is not None
        )
    else:
        # lowercase: probed hosts are lowercased by parse_url_batch, so a
        # mixed-case entry ('Example.COM') would silently never match
        blocked = frozenset(h.lower() for h in blocklist if h is not None)
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
# ``suffixes=``; exact entries of 2 or 3 labels and wildcard rules
# (``*.X``) are honored (PSL exception rules ``!host`` are not — the
# handful of ``!`` entries need a pre-pass if they matter). Single-label
# TLDs need no listing (the default rule takes the last two labels).
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

    Rules (vectorized Arrow kernels, SQL-mirrorable), longest match first:
    - IPv4 literals and single-label hosts return unchanged;
    - if the last THREE labels are a listed suffix, or ``"*." + last-two``
      is a listed wildcard rule, the registered domain is the last FOUR
      labels (host itself when it has only three);
    - else if the last TWO labels are listed, or ``"*." + last-one`` is a
      listed wildcard, the registered domain is the last THREE labels
      (host itself when it has only two);
    - otherwise the last two labels.

    ``suffixes`` defaults to the bundled subset (see its note) and accepts
    full-PSL exact entries of 2-3 labels plus ``*.X`` wildcard rules; PSL
    ``!`` exception rules are not interpreted. Nulls pass through.
    """
    if isinstance(hosts, pd.Series):
        arr = pa.array(hosts.astype("object"), type=pa.string())
    else:
        arr = _chunked(hosts)
    suffix_set = pa.array(sorted(suffixes), type=pa.string())

    def last_n(n: int) -> pa.Array:
        pat = r"(?P<d>" + r"\.".join([r"[^.]+"] * n) + r")$"
        return pc.struct_field(pc.extract_regex(arr, pat), "d")

    last1, last2, last3, last4 = last_n(1), last_n(2), last_n(3), last_n(4)
    is_ip = pc.fill_null(pc.match_substring_regex(arr, _IPV4_RE), False)

    def listed(a: pa.Array) -> pa.Array:
        return pc.is_in(a, value_set=suffix_set)

    def wild(a: pa.Array) -> pa.Array:
        # "*." + a matches a PSL wildcard rule (null a -> "" -> no match)
        return pc.is_in(
            pc.binary_join_element_wise("*.", pc.fill_null(a, ""), ""),
            value_set=suffix_set,
        )

    sfx3 = pc.or_(listed(last3), wild(last2))
    sfx2 = pc.or_(listed(last2), wild(last1))
    out = pc.if_else(
        sfx3,
        pc.coalesce(last4, arr),
        pc.if_else(sfx2, pc.coalesce(last3, arr), pc.coalesce(last2, arr)),
    )
    return pc.if_else(is_ip, arr, out)


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


def load_public_suffix_list(path: str) -> frozenset:
    """Parse a file in the Mozilla Public Suffix List format into the
    ``suffixes=`` set :func:`registered_domain_batch` consumes, so a real
    deployment drops in the full, current ``public_suffix_list.dat``
    without code changes.

    Format handled (publicsuffix.org/list spec): one rule per line;
    ``//`` comments and blank lines skipped; rules lowercased; a leading
    ``.`` stripped (some mirrors ship dotted rules); wildcard rules
    (``*.X``) kept verbatim.  PSL EXCEPTION rules (``!host``) are dropped
    with the same caveat registered_domain_batch documents — the engine's
    vectorized kernel does not interpret them.  Entries survive whatever
    their label count; the kernel consults the 1-3-label ones.
    """
    rules = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip().lower()
            if not line or line.startswith("//"):
                continue
            # spec: everything after the first whitespace is ignored
            line = line.split()[0]
            if line.startswith("!"):
                continue  # exception rules: not interpreted (documented)
            rules.add(line.lstrip("."))
    return frozenset(rules)


def load_ut1_blocklist(
    root: str, categories: "Sequence[str] | None" = None
) -> frozenset:
    """Load UT1-style blocklists (the université Toulouse 1 'blacklists'
    layout C4/RefinedWeb curation uses): ``root/<category>/domains`` text
    files, one hostname per line, ``#`` comments allowed; ``domains.gz``
    accepted too.  Returns the host set for
    :func:`drop_blocked_hosts(..., blocklist=...)`.

    ``categories=None`` loads every subdirectory that has a ``domains``
    file.  Raises FileNotFoundError when an EXPLICITLY requested category
    is missing (a typo should not silently unblock a category).
    """
    import gzip
    import os

    if categories is None:
        categories = sorted(
            d
            for d in os.listdir(root)
            if os.path.isfile(os.path.join(root, d, "domains"))
            or os.path.isfile(os.path.join(root, d, "domains.gz"))
        )
    hosts = set()
    for cat in categories:
        plain = os.path.join(root, cat, "domains")
        gz = os.path.join(root, cat, "domains.gz")
        if os.path.isfile(plain):
            fh = open(plain, encoding="utf-8", errors="replace")
        elif os.path.isfile(gz):
            fh = gzip.open(gz, "rt", encoding="utf-8", errors="replace")
        else:
            raise FileNotFoundError(
                f"UT1 category {cat!r} has no domains file under {root}"
            )
        with fh:
            for line in fh:
                line = line.strip().lower()
                if line and not line.startswith("#"):
                    hosts.add(line)
    return frozenset(hosts)
