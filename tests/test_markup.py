"""Markup-extraction laws (functions/text.py::markup_extract): a
pure-Python re-module replay of the exact spec on messy real-shaped
HTML (comments containing tags, script with '<' and '&&', CDATA,
entities, nav/footer chrome, unclosed tags), plus the boilerplate- and
density-bound laws. Java regex and Python re agree on every construct
the spec uses (non-greedy, inline (?is), char classes), so the replay
is an independent second implementation."""

from __future__ import annotations

import re

from adtech_log_data_pipeline_spark.functions.text import (
    MARKUP_BOILER_TAGS,
    MARKUP_COMMENT,
    MARKUP_ENTITIES,
    MARKUP_LINK,
    MARKUP_SCRIPT,
    MARKUP_STYLE,
    MARKUP_TAG,
    markup_extract,
)

MESSY = [
    # comments holding tags + entities; script with < && quotes; style
    (
        0,
        '<html><head><style>h1 { font-size: 2em; }</style>'
        '<script type="text/js">for (var i = 0; i < 9 && ok; i++) { x("</p>"); }</script>'
        "</head><body><!-- hidden <b>bold</b> & friends -->"
        "<nav>a | b | c</nav><h1>Title</h1>"
        "<p>plain &amp; simple &lt;escaped&gt; &quot;quoted&quot;&nbsp;text</p>"
        "<a href='/x'>x</a><A HREF='/y'>y</A>"
        "<footer>fine print</footer></body></html>",
    ),
    # CDATA with angle brackets; double-encoded entity single-pass law
    (
        1,
        "<div><![CDATA[raw <kept-as-markup> & data]]>"
        "&amp;lt; stays literal</div>",
    ),
    # unclosed trailing tag stays literal; nested same-name blocks
    (2, "<p>text before <em>emph</em> trailing <p unclosed"),
    # boilerplate-only page
    (3, "<nav>only chrome here</nav>"),
    # no markup at all
    (4, "just   plain\n\ttext with   spaces"),
    # empty
    (5, ""),
]


def _py_extract(html: str) -> dict:
    """The spec, independently in Python re."""
    h = re.sub(MARKUP_COMMENT, " ", html)
    h = re.sub(MARKUP_SCRIPT, " ", h)
    h = re.sub(MARKUP_STYLE, " ", h)
    h = re.sub(r"(?s)<!\[CDATA\[(.*?)\]\]>", r"\1", h)

    def clean(s: str) -> str:
        t = re.sub(MARKUP_TAG, " ", s)
        for ent, ch in MARKUP_ENTITIES:
            t = t.replace(ent, ch)
        return re.sub(r"\s+", " ", t).strip()

    boiler_raw = " ".join(
        " ".join(re.findall(rf"(?is)<{t}[^>]*>.*?</{t}>", h))
        for t in MARKUP_BOILER_TAGS
    )
    text = clean(h)
    return {
        "html_len": len(html),
        "n_tags": len(re.findall(MARKUP_TAG, h)),
        "n_links": len(re.findall(MARKUP_LINK, h)),
        "n_comments": len(re.findall(MARKUP_COMMENT, html)),
        "text": text,
        "text_len": len(text),
        "text_density_ppm": len(text) * 1_000_000 // max(len(html), 1),
        "boiler_ppm": len(clean(boiler_raw)) * 1_000_000 // max(len(text), 1),
    }


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, html string")
    return {r["doc_id"]: r.asDict() for r in markup_extract(df).collect()}


def test_messy_html_matches_python_replay(spark):
    got = _run(spark, MESSY)
    for doc_id, html in MESSY:
        want = _py_extract(html)
        g = got[doc_id]
        for k, v in want.items():
            assert g[k] == v, (doc_id, k, g[k], v)


def test_entity_decode_is_single_pass(spark):
    """'&amp;lt;' must decode to the literal '&lt;', never '<' —
    the &amp;-last rule."""
    got = _run(spark, [(0, "<p>&amp;lt; and &amp;amp;</p>")])
    assert got[0]["text"] == "&lt; and &amp;"


def test_cdata_unwraps_before_tag_strip(spark):
    got = _run(spark, [(0, "<![CDATA[a <b> c]]>")])
    assert got[0]["text"] == "a c"  # inner <b> treated as markup (spec)
    assert got[0]["n_tags"] == 1


def test_boiler_and_density_bounds(spark):
    got = _run(spark, MESSY)
    for doc_id, _ in MESSY:
        g = got[doc_id]
        assert 0 <= g["text_density_ppm"] <= 1_000_000
        assert 0 <= g["boiler_ppm"] <= 1_000_000
    assert got[3]["boiler_ppm"] == 1_000_000  # chrome-only page
    assert got[4]["boiler_ppm"] == 0
    assert got[4]["n_tags"] == 0
    # tagless text collapses whitespace but keeps every word
    assert got[4]["text"] == "just plain text with spaces"
    assert got[5]["text"] == "" and got[5]["text_density_ppm"] == 0


def test_script_style_content_removed_entirely(spark):
    got = _run(spark, MESSY)
    assert "font-size" not in got[0]["text"]
    assert "var i" not in got[0]["text"]
    assert "hidden" not in got[0]["text"]  # comment content gone
    assert got[0]["n_comments"] == 1
    assert got[0]["n_links"] == 2  # case-insensitive <a / <A
