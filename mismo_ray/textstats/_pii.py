"""PII detection + redaction — the pre-release scrubbing stage of a
web-crawl training-data pipeline (emails, phone numbers, IP addresses
replaced by typed placeholder tokens, as in refined-web/ROOTS-style
pipelines).

No reference analog: mismo PARSES contact fields that are already columns
(lib/email, lib/phone); this finds and removes them INSIDE free text.

One stateless ``map_batches`` pass; patterns are module-level compiled
regexes (compiled once per worker process at import, not per batch). The
three patterns are applied in a fixed order — email, then IP, then phone —
so overlapping matches resolve deterministically (an email's digits can no
longer be claimed by the phone pattern, an IP's octets are consumed before
the phone pattern sees them). Patterns are intentionally RE2-compatible
(no backrefs/lookaround) so the same expressions run under DuckDB for the
SQL oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IP_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PATTERN = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

_EMAIL_RE = re.compile(EMAIL_PATTERN)
_IP_RE = re.compile(IP_PATTERN)
_PHONE_RE = re.compile(PHONE_PATTERN)


def redact_pii_batch(arr: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Redact emails, IPv4 addresses and phone-like digit runs from a
    string array. Returns (text_redacted, n_emails, n_ips, n_phones);
    null text stays null with zero counts."""
    s = pd.Series(arr.to_pandas(), dtype="object")
    n_emails = s.str.count(EMAIL_PATTERN)
    red = s.str.replace(_EMAIL_RE, EMAIL_TOKEN, regex=True)
    n_ips = red.str.count(IP_PATTERN)
    red = red.str.replace(_IP_RE, IP_TOKEN, regex=True)
    n_phones = red.str.count(PHONE_PATTERN)
    red = red.str.replace(_PHONE_RE, PHONE_TOKEN, regex=True)
    return pa.table(
        {
            "text_redacted": pa.array(red, type=pa.string()),
            "n_emails": pa.array(
                n_emails.fillna(0).to_numpy(dtype=np.int64)
            ),
            "n_ips": pa.array(n_ips.fillna(0).to_numpy(dtype=np.int64)),
            "n_phones": pa.array(
                n_phones.fillna(0).to_numpy(dtype=np.int64)
            ),
        }
    )


def redact_pii(
    ds: ray.data.Dataset,
    column: str = "text",
    *,
    out_column: str | None = None,
) -> ray.data.Dataset:
    """Add PII counts and the redacted text (``out_column`` defaults to
    ``{column}_redacted``; pass ``out_column=column`` to rewrite in
    place)."""
    out_column = out_column or f"{column}_redacted"

    def fn(t: pa.Table) -> pa.Table:
        r = redact_pii_batch(t[column].combine_chunks())
        idx = t.schema.get_field_index(out_column)
        if idx == -1:
            t = t.append_column(out_column, r["text_redacted"])
        else:
            t = t.set_column(idx, out_column, r["text_redacted"].combine_chunks())
        for c in ("n_emails", "n_ips", "n_phones"):
            t = t.append_column(c, r[c])
        return t

    return ds.map_batches(fn, batch_format="pyarrow")
