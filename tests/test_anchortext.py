"""Anchor-text extraction contract (ANCHOR_TEXT_VERSION=1) + index semantics."""

import pandas as pd
import pyarrow as pa
import ray.data

from graphlite_ray.functions.html import clean_anchor_text, extract_anchors
from graphlite_ray.pipelines.anchortext import anchor_text_index


def test_extract_anchors_contract():
    html = (
        '<p><a href="https://a.example/x#frag">  Click \t here </a>'
        '<a href="mailto:x@y.z">mail</a>'  # non-http: dropped
        '<A HREF="http://b.example/y">R &amp; D &lt;lab&gt;</a>'  # case + entities
        '<a href="https://a.example/x">Click here</a>'  # duplicate pair kept
        '<a href="https://c.example/">with <b>nested</b> tags</a>'  # skipped (v1)
        '<a href="https://d.example/img"></a>'  # empty body kept
        "</p>"
    )
    got = extract_anchors(html)
    assert got == [
        ("https://a.example/x", "Click here"),
        ("http://b.example/y", 'R & D <lab>'),
        ("https://a.example/x", "Click here"),
        ("https://d.example/img", ""),
    ]


def test_clean_anchor_text_entity_chain_order():
    # '&amp;lt;' must come out as '&lt;' (single-pass unescape semantics,
    # which the replace chain reproduces because &amp; is replaced LAST)
    assert clean_anchor_text("&amp;lt;") == "&lt;"
    assert clean_anchor_text(" a\n\tb  c ") == "a b c"


def test_anchor_text_index_counts():
    rows = [
        # p1 links to t twice with the same text (parallel anchors)
        ("https://s.example/p1",
         b'<a href="https://t.example/">home</a> <a href="https://t.example/">home</a>'),
        # p2 links once with the same text, once with another
        ("https://s.example/p2",
         b'<a href="https://t.example/">home</a> <a href="https://t.example/">start</a>'),
    ]
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "html": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
    )
    df = anchor_text_index(pages, B=4).to_pandas().sort_values(
        ["dst_url", "anchor_text"], ignore_index=True
    )
    want = pd.DataFrame(
        {
            "dst_url": ["https://t.example/", "https://t.example/"],
            "anchor_text": ["home", "start"],
            "n_refs": [3, 1],
            "n_src_pages": [2, 1],
        }
    )
    pd.testing.assert_frame_equal(df[want.columns], want)
