"""lib.html: generic tag strip + entity decode + whitespace collapse."""

import pyarrow as pa
import ray.data

from mismo_ray.lib.html import add_text_from_html, strip_tags_batch


def test_strip_tags_contract():
    arr = pa.array(
        [
            "<p>Hello <b>world</b></p>",
            "a<br/>b",
            "Fish &amp; Chips &amp;lt;once&amp;gt;",   # single-pass decode
            "&lt;kept&gt; after strip",                # decodes to literal <kept>
            "unterminated <tag stays",
            "  lots\t of \n space  ",
            None,
            "",
        ]
    )
    got = strip_tags_batch(arr).to_pylist()
    assert got == [
        "Hello world",
        "ab",
        "Fish & Chips &lt;once&gt;",
        "<kept> after strip",
        "unterminated <tag stays",
        "lots of space",
        None,
        "",
    ]


def test_strip_tags_flags():
    arr = pa.array(["<i>a</i> &amp;  b"])
    assert strip_tags_batch(arr, entities=False).to_pylist() == ["a &amp; b"]
    assert strip_tags_batch(arr, norm_space=False).to_pylist() == ["a &  b"]


def test_add_text_from_html_binary_column(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "html": pa.array(
                    [b"<h1>Title</h1> body", b"x &gt; y"], type=pa.binary()
                ),
            }
        )
    )
    out = add_text_from_html(ds).to_pandas().sort_values("doc_id")
    assert list(out["text"]) == ["Title body", "x > y"]
