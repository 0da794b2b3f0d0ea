"""PII detection + redaction (textstats/_pii.py)."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from mismo_ray.textstats import redact_pii_batch


def _r(texts):
    return redact_pii_batch(pa.array(texts, type=pa.string())).to_pylist()


def test_redact_email_ip_phone():
    [row] = _r(["write to bob.smith+x@mail.example.com or at 10.0.255.3 today"])
    assert row == {
        "text_redacted": "write to <EMAIL> or at <IP> today",
        "n_emails": 1,
        "n_ips": 1,
        "n_phones": 0,
    }
    [row] = _r(["call +1 (555) 012-3456 now"])
    assert row["text_redacted"] == "call <PHONE> now" and row["n_phones"] == 1


def test_redact_ordering_and_counts():
    # email digits / IP octets are consumed before the phone pattern runs
    [row] = _r(["two mails a@b.io c@d.org and 1.2.3.4.5 and 192.168.0.1"])
    assert row["text_redacted"] == "two mails <EMAIL> <EMAIL> and <IP>.5 and <IP>"
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (2, 2, 0)


def test_redact_passthrough_and_null():
    rows = _r(["no pii here at all", None])
    assert rows[0]["text_redacted"] == "no pii here at all"
    assert rows[1] == {
        "text_redacted": None,
        "n_emails": 0,
        "n_ips": 0,
        "n_phones": 0,
    }


def test_redact_pii_dataset(ray_session):
    from mismo_ray.textstats import redact_pii

    t = pa.table(
        {
            "record_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(
                ["mail me: x@y.zz", "plain text"], type=pa.string()
            ),
        }
    )
    out = (
        redact_pii(ray.data.from_arrow(t).materialize(), "text")
        .to_pandas()
        .sort_values("record_id")
    )
    assert list(out["text_redacted"]) == ["mail me: <EMAIL>", "plain text"]
    assert list(out["n_emails"]) == [1, 0]
    assert list(out["text"]) == ["mail me: x@y.zz", "plain text"]
