"""Unit tests for the HTML kernel (no Spark needed)."""

from extract_ocr_spark.kernels.htmlkit import (
    clean_tree,
    extract_links,
    extract_links_multi,
    extract_title,
    get_text,
    html_to_markdown,
    html_to_text,
    parse_html,
    pick_main_content,
)

PAGE = """
<!doctype html>
<html><head><title>Doc Title</title>
<script>var x = 1;</script><style>.a{color:red}</style></head>
<body>
<nav><a href="/a">A</a><a href="/b">B</a></nav>
<main>
  <h1>Main Heading</h1>
  <p>First <strong>bold</strong> paragraph with a
     <a href="https://example.com/x">link</a>.</p>
  <ul><li>one</li><li>two</li></ul>
</main>
<footer>© footer</footer>
</body></html>
"""


def test_clean_drops_script_style():
    root = clean_tree(parse_html(PAGE))
    text = get_text(root, " ", strip=True)
    assert "var x" not in text
    assert "color:red" not in text
    assert "Main Heading" in text


def test_pick_main_selector_priority():
    root = clean_tree(parse_html(PAGE))
    main = pick_main_content(root)
    text = get_text(main, " ", strip=True)
    assert "Main Heading" in text
    assert "footer" not in text


def test_pick_main_largest_div_fallback():
    html = """<html><body>
    <div id="small">tiny</div>
    <div id="big">this div has a lot more text content than the small one
    and should win the largest-div-by-text-length fallback</div>
    </body></html>"""
    root = clean_tree(parse_html(html))
    main = pick_main_content(root)
    assert main.attrs.get("id") == "big"


def test_pick_main_body_fallback_when_no_divs():
    html = "<html><body><p>just a paragraph</p></body></html>"
    root = clean_tree(parse_html(html))
    main = pick_main_content(root)
    assert main.tag == "body"


def test_density_mode_penalizes_link_farms():
    nav_links = "".join(
        f'<a href="/{i}">menu entry number {i} with padding text</a> ' for i in range(8)
    )
    html = f"""<html><body>
    <div id="nav">{nav_links}</div>
    <div id="content">real content prose that is a little shorter than the
      nav text but has no links at all in it anywhere</div>
    </body></html>"""
    root = clean_tree(parse_html(html))
    assert pick_main_content(root, mode="reference").attrs.get("id") == "nav"
    assert pick_main_content(root, mode="density").attrs.get("id") == "content"


def test_extract_title_h1_then_title_then_untitled():
    assert extract_title(PAGE) == "Main Heading"
    assert extract_title("<html><head><title>T2</title></head><body></body></html>") == "T2"
    assert extract_title("<html><body><p>x</p></body></html>") == "Untitled"


def test_markdown_atx_and_source_header():
    md = html_to_markdown(PAGE, source_url="doc://d1/0")
    assert md.startswith("Source: doc://d1/0\n\n")
    assert "# Main Heading" in md
    assert "**bold**" in md
    assert "[link](https://example.com/x)" in md
    assert "* one" in md and "* two" in md
    assert md.endswith("\n")
    assert "\n\n\n" not in md


def test_markdown_no_source_header():
    md = html_to_markdown("<html><body><main><h2>H</h2></main></body></html>")
    assert md == "## H\n"


def test_nested_lists_and_ordered():
    html = "<main><ol><li>a<ul><li>a1</li></ul></li><li>b</li></ol></main>"
    md = html_to_markdown(html)
    assert "1. a" in md
    assert "* a1" in md
    assert "2. b" in md


def test_html_to_text_blank_run_collapse():
    html = "<html><body><p>line1</p><p></p><p></p><p>line2</p></body></html>"
    txt = html_to_text(html)
    assert "line1" in txt and "line2" in txt
    assert "\n\n\n" not in txt
    assert txt.endswith("\n")


def test_extract_links_base_href_and_filters():
    html = """<html><head><base href="https://ex.com/sub/"></head><body>
    <a href="page.html">p</a>
    <a href="#frag">skip</a>
    <a href="mailto:a@b.c">skip</a>
    <a href="/abs">abs</a>
    <a href="HTTPS://EX.COM/UP#x">up</a>
    </body></html>"""
    links = extract_links(html, page_url="https://ex.com/start")
    assert links == [
        "https://ex.com/sub/page.html",
        "https://ex.com/abs",
        "https://ex.com/UP",
    ]


def test_extract_links_multi_attributes():
    html = """<html><body>
    <img src="i.png"><script src="s.js"></script>
    <form action="/post"></form>
    <meta http-equiv="refresh" content="0; url=/next">
    <a href="javascript:void(0)">skip</a>
    </body></html>"""
    links = extract_links_multi(html, page_url="https://ex.com/p/")
    assert "https://ex.com/p/i.png" in links
    assert "https://ex.com/p/s.js" in links
    assert "https://ex.com/post" in links
    assert "https://ex.com/next" in links
    assert not any("javascript" in ln for ln in links)


def test_table_rendering():
    html = "<main><table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table></main>"
    md = html_to_markdown(html)
    assert "| A | B |" in md
    assert "| --- | --- |" in md
    assert "| 1 | 2 |" in md


def test_pre_code_block():
    html = "<main><pre>x = 1\ny = 2</pre></main>"
    md = html_to_markdown(html)
    assert "```\nx = 1\ny = 2\n```" in md


def test_deterministic():
    a = html_to_markdown(PAGE, source_url="u")
    b = html_to_markdown(PAGE, source_url="u")
    assert a == b


def test_extract_anchors_text_and_hygiene():
    from extract_ocr_spark.kernels.htmlkit import extract_anchors

    html = (
        "<html><head><base href='https://EX.com/Sub/'></head><body>"
        "<a href='page-5.html'><b>Guide</b>\n  g2</a>"       # nested + ws
        "<a href='/shared'>Home</a>"
        "<a href='/shared'><img src='x.png'/></a>"           # no text: skip
        "<a href='#frag'>skip</a>"                           # fragment: skip
        "<a href='mailto:a@b.c'>skip</a>"                    # mailto: skip
        "<a href='HTTPS://Other.COM/Top#x'>Top   1</a>"      # normalize url
        "<a href=''>empty href</a>"                          # empty: skip
        "</body></html>")
    got = extract_anchors(html, page_url="https://ex.com/start/1")
    assert got == [
        ("https://ex.com/Sub/page-5.html", "Guide g2"),
        ("https://ex.com/shared", "Home"),
        ("https://other.com/Top", "Top 1"),
    ]


# -- r6 fast-path tokenizer parity -------------------------------------------

def _stdlib_tree(html):
    from extract_ocr_spark.kernels.htmlkit import _TreeBuilder

    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass
    return b.root


def _tree_repr(node):
    return (node.tag, node.text, tuple(sorted(node.attrs.items())),
            tuple(_tree_repr(c) for c in node.children))


def test_fast_parse_differential_fuzz():
    """The r6 fast-path tokenizer must either bail (None) or produce a
    tree structurally identical to the stdlib html.parser builder —
    seeded random soup over constructs both inside and outside the
    fast path's grammar."""
    import random

    from extract_ocr_spark.kernels.htmlkit import _fast_parse

    pieces = [
        "<div>", "</div>", "<p>", "<a href='x.html'>", '<a href="y y">',
        "<a href=plain>", "<br/>", "<br />", "<img src=a alt='b'>", "text ",
        "&amp;", "&lt;", "&#65;", "&unknown;", "&amp", "& plain ", "</b>",
        "<script>var x=1;</script>", "<style>.a{}</style>",
        "<script>a<b</script>", "<li>", "<ul>", "</ul>", "<td>", "<tr>",
        "<DIV CLASS='Q'>", "</DIV>", "<input value=''>", "<em a=1 b=2>",
        "<span data-x='1' data-x='2'>", "</span>", " ", "\n", "<p/>",
        "<a b = 'c'>", "<a  b  =  c  >", "<a b>", "</a >", "</ a>", "<hr>",
        "<title>T</title>",
        # constructs that must bail to the stdlib parser:
        "<!-- c -->", "<!DOCTYPE html>", "<?pi?>", "a < b", "<", "<1>",
        "<a b==c>", "<a =c>", "<a b=>", "<a 'q'>", "</weird-name>", "<a-b>",
        "<script>never closed", "<a b=c\"d>",
    ]
    rng = random.Random(7)
    checked = 0
    for _ in range(4000):
        doc = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 12)))
        fast = _fast_parse(doc)
        if fast is None:
            continue
        checked += 1
        assert _tree_repr(fast) == _tree_repr(_stdlib_tree(doc)), repr(doc)
    assert checked > 500  # the fast path must actually cover real inputs


def test_fast_parse_handles_bench_shapes_without_bail():
    from extract_ocr_spark.datagen import gen_doc
    from extract_ocr_spark.kernels.htmlkit import _fast_parse

    for i in (0, 1, 2, 3, 4, 5, 6, 13):  # all seven html variants + WAF
        spans = gen_doc(i)["spans"]
        html = next(s["text"] for s in spans if s["kind"] == "html")
        fast = _fast_parse(html)
        assert fast is not None
        assert _tree_repr(fast) == _tree_repr(_stdlib_tree(html))


def test_fast_parse_bails_on_out_of_grammar_constructs():
    from extract_ocr_spark.kernels.htmlkit import _fast_parse

    for doc in ("<!DOCTYPE html><p>x</p>", "<!-- c --><p>x</p>",
                "a < b", "<a b==c>", "<script>open", "<?pi?>"):
        assert _fast_parse(doc) is None
