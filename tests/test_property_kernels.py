"""Hypothesis property tests for the extraction kernels: invariants that
must hold for arbitrary inputs (robustness at 10^12-doc scale, where every
weird input exists)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from extract_ocr_spark.kernels.extract import extract_doc
from extract_ocr_spark.kernels.htmlkit import html_to_markdown, html_to_text
from extract_ocr_spark.kernels.ocrkit import normalize_ocr_text
from extract_ocr_spark.kernels.pdfkit import extract_pdf_text
from extract_ocr_spark.kernels.textops import pretty_json, pretty_xml, truncate_text
from extract_ocr_spark.kernels.urlkit import normalize_url

TEXTISH = st.text(max_size=400)


@given(TEXTISH)
@settings(max_examples=80, deadline=None)
def test_html_kernels_never_crash_and_terminate(s):
    md = html_to_markdown(s)
    txt = html_to_text(s)
    assert md.endswith("\n") and txt.endswith("\n")


@given(TEXTISH)
@settings(max_examples=80, deadline=None)
def test_ocr_normalize_idempotent(s):
    once = normalize_ocr_text(s)
    assert normalize_ocr_text(once) == once
    assert "\n\n\n" not in once


@given(TEXTISH)
@settings(max_examples=80, deadline=None)
def test_pdf_extract_total(s):
    out = extract_pdf_text(s)
    assert out.endswith("\n")


@given(TEXTISH, st.integers(min_value=1, max_value=200))
@settings(max_examples=80, deadline=None)
def test_truncate_bounds(s, cap):
    out, flag = truncate_text(s, max_chars=cap)
    if flag:
        assert out.endswith("[TRUNCATED]\n")
        assert len(out) <= cap + len("\n\n[TRUNCATED]\n")
    else:
        assert out == s


@given(TEXTISH)
@settings(max_examples=80, deadline=None)
def test_pretty_printers_total(s):
    pretty_json(s)
    assert pretty_xml(s).strip() or not s.strip()


@given(st.text(alphabet="abcXYZ:/?#._-%0123456789", max_size=100))
@settings(max_examples=80, deadline=None)
def test_normalize_url_idempotent(u):
    once = normalize_url(u)
    assert normalize_url(once) == once
    assert "#" not in once.rsplit("#", 1)[-1] or "#" not in once


@given(st.lists(
    st.fixed_dictionaries({
        "kind": st.sampled_from(["html", "pdf", "ocr", "json", "xml",
                                 "text", "media", "weird"]),
        "text": st.one_of(st.none(), st.text(max_size=100)),
        "media_ref": st.one_of(st.none(), st.text(max_size=12)),
        "offset": st.integers(min_value=0, max_value=50),
    }), max_size=8))
@settings(max_examples=60, deadline=None)
def test_extract_doc_invariants(spans):
    out = extract_doc("d", spans)
    # orders are 0..n-1
    assert [o["order"] for o in out] == list(range(len(out)))
    # shuffle invariance
    assert extract_doc("d", list(reversed(spans))) == out
    for o in out:
        if o["kind"] == "media":
            assert o["text"] is None
        else:
            assert o["text"] is None or o["text"].endswith("\n")


@given(st.text(max_size=300), st.text(max_size=80))
def test_rewrite_markdown_links_preserves_unmapped(md, page_url):
    """With an empty corpus map, the rewriter is the identity (every
    target is unmapped or mailto) — on arbitrary junk input."""
    from extract_ocr_spark.kernels.urlkit import rewrite_markdown_links

    assert rewrite_markdown_links(md, page_url, {}) == md


@given(st.lists(st.sampled_from(
    ["a.html", "b.html#frag", "<c.html>", "mailto:x@y.z",
     "https://ext.example/q", "#only-frag", ""]), min_size=1, max_size=6))
def test_rewrite_markdown_links_per_target_semantics(targets):
    from extract_ocr_spark.kernels.urlkit import rewrite_markdown_links

    page = "https://corp.example/dir/page.html"
    mapping = {
        "https://corp.example/dir/a.html": "out/a.md",
        "https://corp.example/dir/b.html": "out/b.md",
        "https://corp.example/dir/c.html": "out/c.md",
        "https://corp.example/dir/page.html": "out/page.md",
    }
    md = " ".join(f"[t{i}]({t})" for i, t in enumerate(targets))
    out = rewrite_markdown_links(md, page, mapping)
    expected = {
        "a.html": "out/a.md", "b.html#frag": "out/b.md#frag",
        "<c.html>": "out/c.md", "mailto:x@y.z": "mailto:x@y.z",
        "https://ext.example/q": "https://ext.example/q",
        "#only-frag": "out/page.md#only-frag",
    }
    for i, t in enumerate(targets):
        if t == "":
            continue  # empty target: regex requires a non-empty group
        assert f"[t{i}]({expected[t]})" in out
