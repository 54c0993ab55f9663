"""Real-PDF-bytes extraction (E8 at full strength): the from-scratch
Tj/TJ + Td/TD/Tm reader over synthesized *valid PDF files* (built
byte-by-byte here — no PDF library exists in the container to write them
either, which keeps the fixture honest)."""

from __future__ import annotations

import re
import zlib

from extract_ocr_spark.kernels.pdfkit import (
    NO_TEXT_SENTINEL,
    PARSE_FAIL_SENTINEL,
    extract_pdf_text,
)


def _build_pdf(pages: list[bytes], *, flate: bool = False,
               kids_order: list[int] | None = None) -> bytes:
    """Minimal but structurally valid PDF: catalog(1) → pages(2) →
    page objects (3..) → content streams. ``kids_order`` permutes the
    /Kids array relative to object-number order."""
    n_pages = len(pages)
    page_nums = list(range(3, 3 + n_pages))
    content_nums = list(range(3 + n_pages, 3 + 2 * n_pages))
    order = kids_order or list(range(n_pages))
    kids = " ".join(f"{page_nums[i]} 0 R" for i in order)

    objs: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()),
    ]
    for i in range(n_pages):
        objs.append((
            page_nums[i],
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Contents {content_nums[i]} 0 R >>").encode()))
    for i, content in enumerate(pages):
        data = zlib.compress(content) if flate else content
        filt = b"/Filter /FlateDecode " if flate else b""
        objs.append((
            content_nums[i],
            b"<< " + filt + b"/Length " + str(len(data)).encode()
            + b" >>\nstream\n" + data + b"\nendstream"))
    return _assemble(objs)


def _assemble(objs: list[tuple[int, bytes]],
              trailer_extra: bytes = b"") -> bytes:
    """Object list → full PDF file with a correct xref table + trailer.
    Objects must be numbered 1..n consecutively (the xref subsection is
    written as one 0..n block in list order). ``trailer_extra`` lands
    inside the trailer dict (e.g. /Encrypt + /ID for encrypted files)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for num, _ in objs:
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R " + trailer_extra
            + b">>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


def _as_text(pdf: bytes) -> str:
    # the span channel carries strings; real bytes ride latin-1
    return pdf.decode("latin-1")


def test_uncompressed_tj_reading_order():
    # painted bottom line first — reading order must resort by y (top
    # of page = larger PDF y first)
    content = (b"BT /F1 12 Tf 72 100 Td (bottom line) Tj ET\n"
               b"BT 72 700 Td (top line) Tj ET\n"
               b"BT 300 700 Td (top right) Tj ET")
    got = extract_pdf_text(_as_text(_build_pdf([content])))
    assert got == "top line top right\nbottom line\n"


def test_flate_tj_array_hex_escapes_and_td_lines():
    # TJ array with kerning numbers, hex string, escaped parens/octal,
    # and TD line advance
    content = (
        b"BT 72 700 TD [(Hel) -20 (lo,) ] TJ ET\n"
        b"BT 72 686 Td <576f726c64> Tj ET\n"          # 'World'
        b"BT 72 672 Td (par\\(en\\) \\101BC) Tj ET"   # 'par(en) ABC'
    )
    got = extract_pdf_text(_as_text(_build_pdf([content], flate=True)))
    assert got == "Hello,\nWorld\npar(en) ABC\n"


def test_multi_page_kids_order_and_t_star():
    p1 = (b"BT 12 TL 72 700 Td (page one line one) Tj T* "
          b"(page one line two) Tj ET")
    p2 = b"BT 72 700 Td (page two) Tj ET"
    # object order p1,p2 but Kids reversed: /Kids order must win
    pdf = _build_pdf([p2, p1], kids_order=[1, 0])
    got = extract_pdf_text(_as_text(pdf))
    assert got == "page one line one\npage one line two\n\npage two\n"


def test_quote_operator_and_utf16():
    content = (b"BT 10 TL 72 700 Td (first) Tj (second) ' ET\n"
               b"BT 72 600 Td (\xfe\xff\x00S\x00n\x00o\x00w) Tj ET")
    got = extract_pdf_text(_as_text(_build_pdf([content])))
    assert got == "first\nsecond\nSnow\n"


def test_textless_and_garbage_pdfs():
    empty = _build_pdf([b"0 0 m 100 100 l S"])  # vector-only page
    assert extract_pdf_text(_as_text(empty)) == NO_TEXT_SENTINEL
    # %PDF header but unparseable body: parse-fail sentinel, no raise —
    # note bytes that are invalid as a PDF, not an empty object set
    assert extract_pdf_text("%PDF-1.4\n\x00\x01garbage") in (
        NO_TEXT_SENTINEL, PARSE_FAIL_SENTINEL)


def test_real_pdf_through_spark_pipeline(spark):
    """A pdf span carrying real PDF bytes flows through extract_df and
    comes out as ordered text spans."""
    from extract_ocr_spark.pipeline import extract_df

    pdf_text = _as_text(_build_pdf(
        [b"BT 72 700 Td (spark sees real pdf bytes) Tj ET"], flate=True))
    docs = spark.createDataFrame(
        [("pdfdoc", [("pdf", pdf_text, None, 0)])],
        schema="doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>",
    )
    out = extract_df(docs, with_stats=True).collect()
    assert len(out) == 1 and out[0]["error"] is None
    spans = out[0]["out_spans"]
    texts = [s["text"] for s in spans]
    assert any("spark sees real pdf bytes" in t for t in texts), texts


def _pdf_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def test_roundtrip_property_random_lines():
    """Property: any page of printable-ASCII lines written top-to-bottom
    as escaped literal strings round-trips through build → parse →
    reading-order exactly (Hypothesis over content incl. parens,
    backslashes, brackets, slashes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzABC0123456789 ()\\[]<>/.,-_'\""))
    line = st.text(alphabet, min_size=0, max_size=40)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(line, min_size=1, max_size=10))
    def check(lines):
        content = b"BT " + b" ".join(
            f"1 0 0 1 72 {700 - 12 * i} Tm ({_pdf_escape(t)}) Tj".encode(
                "latin-1")
            for i, t in enumerate(lines)) + b" ET"
        got = extract_pdf_text(_as_text(_build_pdf([content], flate=True)))
        kept = [t.strip() for t in lines if t.strip()]
        expected = ("\n".join(kept) + "\n") if kept else NO_TEXT_SENTINEL
        assert got == expected, (lines, got)

    check()


def test_formfeed_in_string_does_not_split_pages():
    # a \f (octal \014) inside a shown string must not create phantom pages
    content = b"BT 72 700 Td (before\\014after) Tj ET"
    got = extract_pdf_text(_as_text(_build_pdf([content])))
    assert got == "before after\n"


def test_tj_array_with_bracket_strings():
    # decoded strings whose VALUE is '[' or ']' are text, not array markers
    content = b"BT 72 700 Td [ (\\133) (x) (\\135) ] TJ ET"  # '[', 'x', ']'
    got = extract_pdf_text(_as_text(_build_pdf([content])))
    assert got == "[x]\n"


def _append_update(base: bytes, obj_num: int, new_content: bytes) -> bytes:
    """A proper incremental-update section: the new object, a one-entry
    xref table, and a trailer whose /Prev chains to the base revision's
    xref (located via the base's own startxref)."""
    import re as _re

    prev_at = int(_re.search(rb"startxref\s+(\d+)", base).group(1))
    out = bytearray(base)
    obj_at = len(out)
    out += (f"{obj_num} 0 obj\n".encode() + b"<< /Length "
            + str(len(new_content)).encode() + b" >>\nstream\n"
            + new_content + b"\nendstream\nendobj\n")
    xref_at = len(out)
    out += (f"xref\n{obj_num} 1\n{obj_at:010d} 00000 n \n".encode()
            + b"trailer\n<< /Size 99 /Root 1 0 R /Prev "
            + str(prev_at).encode() + b" >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


def test_incremental_update_newest_object_wins():
    """Incrementally-updated PDFs append the newer version of an object
    plus a new xref section chaining to the old one via /Prev; resolution
    must extract the NEW content (newest revision wins along the chain)."""
    base = _build_pdf([b"BT 72 700 Td (stale content) Tj ET"])
    new = b"BT 72 700 Td (fresh content) Tj ET"
    got = extract_pdf_text(_as_text(_append_update(base, 4, new)))
    assert got == "fresh content\n"


def test_incremental_update_without_xref_uses_scan_fallback():
    """A damaged update (appended object, no new xref section): the valid
    base xref no longer describes the file's newest state and real
    readers disagree on it; our recovery scan applies its post-%%EOF
    override so the appended (newest) object still wins."""
    base = _build_pdf([b"BT 72 700 Td (stale content) Tj ET"])
    # corrupt the base startxref so the xref path falls back to the scan
    base = base.replace(b"startxref", b"startxrEF")
    new = b"BT 72 700 Td (fresh content) Tj ET"
    update = (b"4 0 obj\n<< /Length " + str(len(new)).encode()
              + b" >>\nstream\n" + new + b"\nendstream\nendobj\n"
              + b"%%EOF\n")
    got = extract_pdf_text(_as_text(base + update))
    assert got == "fresh content\n"


def test_stale_content_stream_offset_falls_back_to_scan():
    """A parseable xref whose page tree resolves but whose CONTENT-STREAM
    entry is stale (bytes inserted before the stream object without
    regenerating its xref entry): trusting the xref alone would emit a
    textless page, while the `N G obj` recovery scan still finds the
    stream. The xref path must yield to the scan when its extraction
    comes back empty."""
    base = _build_pdf([b"BT 72 700 Td (recovered by scan) Tj ET"])
    marker = b"4 0 obj\n"
    junk = b"% incremental-edit padding not described by the xref\n" * 3
    at = base.index(marker)
    # shift only the xref table location; object 4's entry goes stale
    data = base[:at] + junk + base[at:]
    data = re.sub(rb"(?<=startxref\n)\d+",
                  lambda m: str(int(m.group(0)) + len(junk)).encode(), data)
    from extract_ocr_spark.kernels.pdfkit import _xref_objects
    xref_objs = _xref_objects(data)
    assert xref_objs is not None and 4 not in xref_objs  # gate precondition
    assert extract_pdf_text(_as_text(data)) == "recovered by scan\n"


def test_partially_stale_content_offsets_recover_all_pages():
    """Incremental-edit shape: bytes inserted before ONE page's content
    stream of a two-page file. The xref still resolves the page tree and
    the other page's text, so an all-or-nothing emptiness gate would keep
    the partial result; the unresolved-/Contents signal must trigger the
    scan, which recovers both pages."""
    base = _build_pdf([b"BT 72 700 Td (page one text) Tj ET",
                       b"BT 72 700 Td (page two text) Tj ET"])
    # two pages: objs 3,4 = pages; 5,6 = content streams. Go stale on 6.
    marker = b"6 0 obj\n"
    junk = b"% unrecorded edit padding\n" * 3
    at = base.index(marker)
    data = base[:at] + junk + base[at:]
    data = re.sub(rb"(?<=startxref\n)\d+",
                  lambda m: str(int(m.group(0)) + len(junk)).encode(), data)
    from extract_ocr_spark.kernels.pdfkit import _xref_objects
    xref_objs = _xref_objects(data)
    assert xref_objs is not None and 6 not in xref_objs and 5 in xref_objs
    assert extract_pdf_text(_as_text(data)) == "page one text\n\npage two text\n"


def test_textless_complete_xref_does_not_run_recovery_scan(monkeypatch):
    """A structurally complete xref whose pages legitimately have no text
    runs (image-only shape) must return empty WITHOUT invoking the
    recovery scan — the scan could attribute embedded PDF-like bytes to
    the document as phantom text, and doubles parse cost at corpus
    scale."""
    import extract_ocr_spark.kernels.pdfkit as pk
    # drawing operators only — a valid, resolvable, textless content stream
    pdf = _build_pdf([b"0 0 612 792 re f"])

    def boom(data):
        raise AssertionError("recovery scan must not run")

    monkeypatch.setattr(pk, "_scan_objects", boom)
    assert extract_pdf_text(_as_text(pdf)) == NO_TEXT_SENTINEL


def test_stale_page_object_offset_recovers_via_scan():
    """Staleness in the PAGE TREE itself: junk inserted before the page
    object (not the content stream) drops the page from the xref map —
    /Pages resolves but its kid is missing, no /Contents ref is ever
    seen, so a contents-only signal would read 'complete'. The
    missing-kids signal must trigger the scan, which recovers the page."""
    base = _build_pdf([b"BT 72 700 Td (page body recovered) Tj ET"])
    marker = b"3 0 obj\n"  # the /Type /Page object
    junk = b"% unrecorded edit padding\n" * 3
    at = base.index(marker)
    data = base[:at] + junk + base[at:]
    data = re.sub(rb"(?<=startxref\n)\d+",
                  lambda m: str(int(m.group(0)) + len(junk)).encode(), data)
    from extract_ocr_spark.kernels.pdfkit import _xref_objects
    xref_objs = _xref_objects(data)
    assert xref_objs is not None and 3 not in xref_objs and 2 in xref_objs
    assert extract_pdf_text(_as_text(data)) == "page body recovered\n"


def test_contents_array_indirection_resolves():
    """/Contents may point at an ARRAY OBJECT of stream refs (legal per
    spec). The ref resolves but has no stream keyword; the reader must
    follow the indirection, not count it stale."""
    base = _build_pdf([b"BT 72 700 Td (via array indirection) Tj ET"])
    # retarget page 3's /Contents from 4 0 R to a new array object 5 0 R
    data = base.replace(b"/Contents 4 0 R", b"/Contents 5 0 R")
    arr = b"5 0 obj\n[ 4 0 R ]\nendobj\n"
    at = data.index(b"xref\n")
    data = data[:at] + arr + data[at:]
    data = re.sub(rb"(?<=startxref\n)\d+",
                  lambda m: str(int(m.group(0)) + len(arr)).encode(), data)
    # object 5 is absent from the xref table — resolved by the scan path
    assert extract_pdf_text(_as_text(data)) == "via array indirection\n"


def test_unsupported_filter_does_not_trigger_recovery_scan(monkeypatch):
    """A content stream whose object RESOLVES but whose filter we cannot
    decode (DCT — an image codec) is a decode limitation, not a stale
    offset: the recovery scan must not run (it could adopt phantom
    text), and the result is the no-text sentinel."""
    import extract_ocr_spark.kernels.pdfkit as pk
    content = b"\xff\xd8\xff\xe0"  # JPEG magic posing as a content stream
    pdf = _build_pdf([content])
    pdf = pdf.replace(b"<< /Length " + str(len(content)).encode(),
                      b"<< /Filter /DCTDecode /Length "
                      + str(len(content)).encode())
    # the /Filter insertion shifts the xref offsets of the content obj?
    # no: the content object is LAST, so only the xref table moves
    shift = len(b"/Filter /DCTDecode ")
    pdf = re.sub(rb"(?<=startxref\n)\d+",
                 lambda m: str(int(m.group(0)) + shift).encode(), pdf)

    def boom(data):
        raise AssertionError("recovery scan must not run")

    monkeypatch.setattr(pk, "_scan_objects", boom)
    assert extract_pdf_text(_as_text(pdf)) == NO_TEXT_SENTINEL


def test_trailer_mention_in_content_is_not_encryption():
    """Content text discussing PDF internals — including the words
    'trailer' and '/Encrypt N 0 R' adjacent — must not be refused as
    encrypted: detection anchors on a real xref-table-adjacent trailer."""
    pdf = _build_pdf(
        [b"BT 72 700 Td (the trailer has /Encrypt 9 0 R sometimes) Tj ET"])
    got = extract_pdf_text(_as_text(pdf))
    assert "the trailer has /Encrypt 9 0 R sometimes" in got


def test_encrypted_pdf_yields_parse_fail_sentinel():
    """/Encrypt in the trailer means string/stream bytes are ciphertext;
    with no decryption support the reader must refuse loudly (parse-fail
    sentinel) rather than emit garbage — the reference's pypdf path
    equally refuses without a password. A document whose CONTENT merely
    mentions /Encrypt must still extract."""
    base = _build_pdf([b"BT 72 700 Td (secret) Tj ET"])
    enc = base.replace(b"trailer\n<< /Size",
                       b"trailer\n<< /Encrypt 9 0 R /Size")
    assert extract_pdf_text(_as_text(enc)) == PARSE_FAIL_SENTINEL
    mentions = _build_pdf([b"BT 72 700 Td (uses /Encrypt 9 0 R inside) Tj ET"])
    assert "uses /Encrypt 9 0 R inside" in extract_pdf_text(_as_text(mentions))


def test_xref_beats_scan_order_on_reused_object_number():
    """The verdict-r4 stale-object case: a decoy `4 0 obj` appears EARLIER
    in the file than the real object 4 (freed-and-reused number; the real
    definition is the one the xref table points to). Scan order would pick
    the decoy (first occurrence in the original body wins there); xref
    resolution must pick the real one."""
    base = _build_pdf([b"BT 72 700 Td (real xref content) Tj ET"])
    decoy = (b"4 0 obj\n<< /Length 30 >>\nstream\n"
             b"BT 72 700 Td (decoy) Tj ET\nendstream\nendobj\n")
    # insert the decoy BEFORE all real objects (right after the header);
    # every real offset shifts by len(decoy), so patch the xref table and
    # startxref accordingly to keep the file structurally valid
    head = b"%PDF-1.4\n"
    body = base[len(head):]
    shift = len(decoy)

    def bump(m):
        return b"%010d" % (int(m.group(0)) + shift)

    body = re.sub(rb"(?<=\n)\d{10}(?= 00000 n)", bump, body)
    body = re.sub(rb"(?<=startxref\n)\d+",
                  lambda m: str(int(m.group(0)) + shift).encode(), body)
    # object 0's free entry (65535 f) must stay zero
    data = head + decoy + body
    from extract_ocr_spark.kernels.pdfkit import _xref_objects
    assert _xref_objects(data) is not None  # xref path engaged, not scan
    assert extract_pdf_text(_as_text(data)) == "real xref content\n"


def test_malformed_operand_contained_per_page():
    """A name/string operand where Td/TL expect numbers (malformed
    producer) must degrade only the affected operator, never turn the
    whole document into PARSE_FAIL."""
    bad = (b"BT (oops) 5 Td (never positioned) Tj "
           b"/Name TL 72 700 Td (good line) Tj ET")
    ok = b"BT 72 700 Td (second page fine) Tj ET"
    got = extract_pdf_text(_as_text(_build_pdf([bad, ok])))
    assert "second page fine" in got
    assert "good line" in got
    assert PARSE_FAIL_SENTINEL not in got


def test_spurious_obj_inside_original_body_does_not_clobber():
    """A stray `4 0 obj` byte sequence WITHIN the original body (e.g. an
    uncompressed embedded-file stream carrying another PDF) must not
    override the real object 4 — only matches past the first %%EOF (a
    genuine incremental-update section) get override rights."""
    base = _build_pdf([b"BT 72 700 Td (real content) Tj ET"])
    evil = (b"4 0 obj\n<< /Length 29 >>\nstream\n"
            b"BT 72 700 Td (evil) Tj ET\nendstream\nendobj\n")
    # inject at top level before the trailer (still before %%EOF)
    doctored = base.replace(b"xref\n", evil + b"xref\n", 1)
    got = extract_pdf_text(_as_text(doctored))
    assert got == "real content\n"


def test_objstm_packed_page_tree():
    """PDF 1.5+ object streams: catalog/page-tree/page dicts packed inside
    one FlateDecode /Type /ObjStm (how modern producers write PDFs) must
    be unpacked so their pages are reachable — the bare `N G obj` scan
    cannot see them."""
    bodies = {
        2: b"<< /Type /Catalog /Pages 3 0 R >>",
        3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: (b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R >>"),
    }
    header = b""
    payload = b""
    for num, b in bodies.items():
        header += f"{num} {len(payload)} ".encode()
        payload += b + b" "
    first = len(header)
    objstm_data = zlib.compress(header + payload)
    content = b"BT 72 700 Td (from an object stream) Tj ET"

    out = bytearray(b"%PDF-1.5\n")
    out += (b"1 0 obj\n<< /Type /ObjStm /Filter /FlateDecode /N "
            + str(len(bodies)).encode() + b" /First " + str(first).encode()
            + b" /Length " + str(len(objstm_data)).encode()
            + b" >>\nstream\n" + objstm_data + b"\nendstream\nendobj\n")
    out += (b"5 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    out += b"trailer\n<< /Root 2 0 R >>\n%%EOF\n"

    got = extract_pdf_text(_as_text(bytes(out)))
    assert got == "from an object stream\n"


def test_asciihex_ascii85_and_filter_chain():
    """ASCIIHexDecode, ASCII85Decode, and a decode-order filter chain
    ([/ASCII85Decode /FlateDecode] = flate-compressed then a85-armored)
    all extract; an unsupported filter skips the stream, not the doc."""
    import base64

    hexed = (b"BT 72 700 Td (hex page) Tj ET".hex().upper().encode()
             + b">")
    pdf_hex = _build_pdf_raw_filter(hexed, b"/ASCIIHexDecode")
    assert extract_pdf_text(_as_text(pdf_hex)) == "hex page\n"

    a85 = base64.a85encode(b"BT 72 700 Td (a85 page) Tj ET") + b"~>"
    pdf_a85 = _build_pdf_raw_filter(a85, b"/ASCII85Decode")
    assert extract_pdf_text(_as_text(pdf_a85)) == "a85 page\n"

    chained = base64.a85encode(
        zlib.compress(b"BT 72 700 Td (chained page) Tj ET")) + b"~>"
    pdf_chain = _build_pdf_raw_filter(
        chained, b"[/ASCII85Decode /FlateDecode]")
    assert extract_pdf_text(_as_text(pdf_chain)) == "chained page\n"

    pdf_bad = _build_pdf_raw_filter(b"\xff\xd8\xff", b"/DCTDecode")
    assert extract_pdf_text(_as_text(pdf_bad)) in (
        NO_TEXT_SENTINEL, PARSE_FAIL_SENTINEL)


def _build_pdf_raw_filter(data: bytes, filt: bytes) -> bytes:
    """One-page PDF whose content stream carries pre-encoded ``data``
    with an explicit /Filter entry."""
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        (4, b"<< /Filter " + filt + b" /Length " + str(len(data)).encode()
            + b" >>\nstream\n" + data + b"\nendstream"),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for num, body in objs:
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def test_objstm_incremental_update_overrides_packed_objects():
    """An appended incremental update whose new ObjStm repacks the page
    (Acrobat save/annotate shape) must win over the original packed
    version — the post-%%EOF override rule applies to packed objects
    exactly as to direct ones."""
    def objstm(num, bodies):
        header = b""
        payload = b""
        for onum, b in bodies.items():
            header += f"{onum} {len(payload)} ".encode()
            payload += b + b" "
        data = zlib.compress(header + payload)
        return (f"{num} 0 obj\n".encode()
                + b"<< /Type /ObjStm /Filter /FlateDecode /N "
                + str(len(bodies)).encode() + b" /First "
                + str(len(header)).encode() + b" /Length "
                + str(len(data)).encode() + b" >>\nstream\n" + data
                + b"\nendstream\nendobj\n")

    def content_obj(num, text):
        c = b"BT 72 700 Td (" + text + b") Tj ET"
        return (f"{num} 0 obj\n".encode() + b"<< /Length "
                + str(len(c)).encode() + b" >>\nstream\n" + c
                + b"\nendstream\nendobj\n")

    page = (b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R >>")
    original = (b"%PDF-1.5\n"
                + objstm(1, {2: b"<< /Type /Catalog /Pages 3 0 R >>",
                             3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
                             4: page % 5})
                + content_obj(5, b"old")
                + b"trailer\n<< /Root 2 0 R >>\n%%EOF\n")
    update = (objstm(6, {4: page % 7})  # repacked page -> new contents
              + content_obj(7, b"new")
              + b"trailer\n<< /Root 2 0 R >>\n%%EOF\n")

    assert extract_pdf_text(_as_text(original)) == "old\n"
    assert extract_pdf_text(_as_text(original + update)) == "new\n"


def test_xref_stream_png_predictor_and_type2_entries():
    """Fully modern layout (PDF 1.5+, what Acrobat writes today): the xref
    is itself a Flate + PNG-Up-predicted /Type /XRef stream whose type-2
    entries point into a /Type /ObjStm — NO classic table, NO trailer
    keyword. Resolution must go: startxref → xref stream → unpredict →
    type-2 entries → ObjStm unpack → page tree."""
    bodies = {
        2: b"<< /Type /Catalog /Pages 3 0 R >>",
        3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: (b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R >>"),
    }
    header = b""
    payload = b""
    for num, b in bodies.items():
        header += f"{num} {len(payload)} ".encode()
        payload += b + b" "
    objstm_data = zlib.compress(header + payload)
    content = b"BT 72 700 Td (xref stream resolved) Tj ET"

    out = bytearray(b"%PDF-1.5\n")
    off1 = len(out)
    out += (b"1 0 obj\n<< /Type /ObjStm /Filter /FlateDecode /N "
            + str(len(bodies)).encode() + b" /First "
            + str(len(header)).encode() + b" /Length "
            + str(len(objstm_data)).encode() + b" >>\nstream\n"
            + objstm_data + b"\nendstream\nendobj\n")
    off5 = len(out)
    out += (b"5 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    off6 = len(out)

    # /W [1 2 1] rows: (type, field2, field3)
    rows = [
        (0, 0, 0xFF),       # 0: free
        (1, off1, 0),       # 1: the ObjStm itself
        (2, 1, 0),          # 2: packed in ObjStm 1, index 0
        (2, 1, 1),          # 3: index 1
        (2, 1, 2),          # 4: index 2
        (1, off5, 0),       # 5: direct content stream
        (1, off6, 0),       # 6: this xref stream
    ]
    raw_rows = [t.to_bytes(1, "big") + f2.to_bytes(2, "big")
                + f3.to_bytes(1, "big") for t, f2, f3 in rows]
    # PNG Up (filter type 2) prediction: stored = cur - prev per column
    pred = bytearray()
    prev = b"\x00" * 4
    for r in raw_rows:
        pred += b"\x02" + bytes((r[j] - prev[j]) & 0xFF for j in range(4))
        prev = r
    xref_data = zlib.compress(bytes(pred))
    out += (b"6 0 obj\n<< /Type /XRef /Size 7 /Index [0 7] /W [1 2 1] "
            b"/Root 2 0 R /Filter /FlateDecode "
            b"/DecodeParms << /Predictor 12 /Columns 4 >> /Length "
            + str(len(xref_data)).encode() + b" >>\nstream\n" + xref_data
            + b"\nendstream\nendobj\n")
    out += b"startxref\n" + str(off6).encode() + b"\n%%EOF\n"

    from extract_ocr_spark.kernels.pdfkit import _xref_objects
    objs = _xref_objects(bytes(out))
    assert objs is not None and 4 in objs  # resolved via the stream path
    assert extract_pdf_text(_as_text(bytes(out))) == "xref stream resolved\n"


def test_linearized_early_eof_is_not_the_override_boundary():
    """Linearized (web-optimized) files put a %%EOF near the START. The
    scan fallback's incremental-update boundary must skip it: a spurious
    `4 0 obj` later in the MAIN body (e.g. inside an uncompressed
    embedded-file stream) must not gain override rights just because it
    sits past the early first-page %%EOF."""
    real = b"BT 72 700 Td (real linearized content) Tj ET"
    out = bytearray(b"%PDF-1.4\n")
    out += b"9 0 obj\n<< /Linearized 1 /L 9999 >>\nendobj\n"
    out += b"%%EOF\n"  # end of the first-page section (no usable xref)
    for num, body in [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        (4, b"<< /Length " + str(len(real)).encode() + b" >>\nstream\n"
            + real + b"\nendstream"),
    ]:
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    # decoy AFTER the real object 4, still in the main body
    out += (b"4 0 obj\n<< /Length 30 >>\nstream\n"
            b"BT 72 700 Td (decoy) Tj ET\nendstream\nendobj\n")
    out += b"%%EOF\n"  # real end of file; no startxref -> scan fallback
    got = extract_pdf_text(_as_text(bytes(out)))
    assert got == "real linearized content\n"


def test_ascii85_adobe_opening_frame():
    """Some producers emit the optional Adobe '<~' opening frame;
    a85decode raises on '<' so it must be stripped, not lose the page."""
    import base64

    a85 = b"<~" + base64.a85encode(b"BT 72 700 Td (framed a85) Tj ET") + b"~>"
    pdf = _build_pdf_raw_filter(a85, b"/ASCII85Decode")
    assert extract_pdf_text(_as_text(pdf)) == "framed a85\n"


# --- LZWDecode / RunLengthDecode (ISO 32000-1 §7.4.4 / §7.4.5) ---

def _lzw_encode(data: bytes) -> bytes:
    """From-scratch PDF LZW encoder (EarlyChange=1) used only to build
    fixtures; its width schedule mirrors the decoder's exactly."""
    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    codes = [256]
    w = b""
    for byte in data:
        wb = w + bytes([byte])
        if wb in table:
            w = wb
        else:
            codes.append(table[w])
            if nxt < 4096:
                table[wb] = nxt
                nxt += 1
            else:  # dictionary full: emit clear, start over
                codes.append(256)
                table = {bytes([i]): i for i in range(256)}
                nxt = 258
            w = bytes([byte])
    if w:
        codes.append(table[w])
    codes.append(257)
    out = bytearray()
    buf = nbits = 0
    width, tsize, prev_emitted = 9, 258, False
    for code in codes:
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
            buf &= (1 << nbits) - 1
        if code == 256:
            width, tsize, prev_emitted = 9, 258, False
        elif code != 257:
            if prev_emitted:
                tsize += 1
            prev_emitted = True
            if tsize + 1 >= (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_spec_vector():
    """The ISO 32000-1 §7.4.4.2 worked example decodes exactly."""
    from extract_ocr_spark.kernels.pdfkit import _lzw_decode
    enc = bytes([0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01])
    assert _lzw_decode(enc) == b"-" * 5 + b"A" + b"-" * 3 + b"B"


def test_lzw_roundtrip_crosses_width_transitions():
    """A payload large enough to grow the code width 9→10→11 bits
    round-trips byte-exactly (also pins the EarlyChange=1 schedule —
    an off-by-one in the width bump corrupts everything after entry
    510)."""
    from extract_ocr_spark.kernels.pdfkit import _lzw_decode
    payload = bytes((i * 7 + i // 3) % 256 for i in range(4000))
    assert _lzw_decode(_lzw_encode(payload)) == payload


def test_lzw_corrupt_code_raises():
    from extract_ocr_spark.kernels.pdfkit import _lzw_decode
    import pytest
    # clear(256) then code 300 with an empty table: beyond-table ⇒ corrupt
    bits = (256 << 9) | 300  # two 9-bit codes, MSB-first
    data = bytes([(bits >> 10) & 0xFF, (bits >> 2) & 0xFF,
                  (bits & 0x3) << 6])
    with pytest.raises(ValueError):
        _lzw_decode(data)


def test_lzw_roundtrip_past_full_dictionary():
    """A low-entropy payload that fills the 4096-entry dictionary forces
    the fixture encoder to emit a mid-stream clear code; the decoder
    must resynchronize and round-trip byte-exactly. Also serves as the
    linear-time check: this decodes in milliseconds, not minutes (the
    unmasked-accumulator bug made decode quadratic in stream length)."""
    from extract_ocr_spark.kernels.pdfkit import _lzw_decode
    payload = bytes((i // 7) % 17 for i in range(120_000))
    assert _lzw_decode(_lzw_encode(payload)) == payload


def test_runlength_decode_vectors():
    import pytest
    from extract_ocr_spark.kernels.pdfkit import _rle_decode
    assert _rle_decode(bytes([2]) + b"abc" + bytes([254]) + b"x"
                       + bytes([128])) == b"abc" + b"x" * 3
    assert _rle_decode(bytes([128])) == b""  # immediate EOD
    with pytest.raises(ValueError):  # header claims 11 bytes, 2 present
        _rle_decode(bytes([10]) + b"ab")


def _rle_encode_literal(data: bytes) -> bytes:
    """Literal-runs-only RunLength encoding (always valid, never shorter)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)
    return bytes(out)


def _with_filter(pdf: bytes, encoded: bytes, filt: bytes) -> bytes:
    """Swap the (last-object) content stream's dict to declare ``filt``;
    only the xref table itself moves, so just startxref shifts."""
    patched = pdf.replace(b"<< /Length " + str(len(encoded)).encode(),
                          b"<< /Filter " + filt + b" /Length "
                          + str(len(encoded)).encode())
    shift = len(b"/Filter " + filt + b" ")
    return re.sub(rb"(?<=startxref\n)\d+",
                  lambda m: str(int(m.group(0)) + shift).encode(), patched)


def test_lzw_content_stream_extracts():
    content = b"BT 72 700 Td (lzw page text) Tj ET"
    enc = _lzw_encode(content)
    pdf = _with_filter(_build_pdf([enc]), enc, b"/LZWDecode")
    assert extract_pdf_text(_as_text(pdf)) == "lzw page text\n"


def test_runlength_content_stream_extracts():
    content = b"BT 72 700 Td (rle page text) Tj ET"
    enc = _rle_encode_literal(content)
    pdf = _with_filter(_build_pdf([enc]), enc, b"/RunLengthDecode")
    assert extract_pdf_text(_as_text(pdf)) == "rle page text\n"


def test_filter_chain_hex_then_lzw():
    """/Filter [/ASCIIHexDecode /LZWDecode] — filters apply in decode
    order, so the stored bytes are hex(lzw(content))."""
    import binascii
    content = b"BT 72 700 Td (chained filters) Tj ET"
    enc = binascii.hexlify(_lzw_encode(content)) + b">"
    pdf = _with_filter(_build_pdf([enc]), enc,
                       b"[/ASCIIHexDecode /LZWDecode]")
    assert extract_pdf_text(_as_text(pdf)) == "chained filters\n"


# --- /ToUnicode CMaps (ISO 32000-1 §9.10.3): CID/Type0 and custom-encoded
# fonts whose shown bytes are codes, not text ---

_CMAP_2BYTE = (b"/CIDInit /ProcSet findresource begin\n"
               b"begincmap\n"
               b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
               b"3 beginbfchar\n"
               b"<0001> <0048>\n<0002> <0069>\n<0003> <0021>\n"  # H i !
               b"endbfchar\n"
               b"1 beginbfrange\n<0010> <0012> <0041>\nendbfrange\n"  # A-C
               b"endcmap\nend")


def _build_pdf_with_fonts(content: bytes, cmap: bytes, *,
                          res_on_pages: bool = False) -> bytes:
    """One page, /F1 = Type0 font with the given /ToUnicode stream,
    /F2 = a plain font without one. ``res_on_pages`` moves /Resources
    to the parent /Pages node (inheritance path)."""
    res = b" /Resources << /Font << /F1 5 0 R /F2 7 0 R >> >>"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
            + (res if res_on_pages else b"") + b" >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 4 0 R" + (b"" if res_on_pages else res) + b" >>"),
        (4, b"<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream"),
        (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake"
            b" /ToUnicode 6 0 R >>"),
        (6, b"<< /Length " + str(len(cmap)).encode()
            + b" >>\nstream\n" + cmap + b"\nendstream"),
        (7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    return _assemble(objs)


def test_tounicode_bfchar_and_bfrange():
    content = (b"BT /F1 12 Tf 72 700 Td <000100020003> Tj ET\n"
               b"BT /F1 12 Tf 72 686 Td <001000110012> Tj ET")
    pdf = _build_pdf_with_fonts(content, _CMAP_2BYTE)
    assert extract_pdf_text(_as_text(pdf)) == "Hi!\nABC\n"


def test_tounicode_font_switch_and_tj_array():
    """Tf switches mid-page: /F1 strings go through the CMap (incl. each
    TJ array item individually), /F2 strings keep latin-1."""
    content = (b"BT /F1 12 Tf 72 700 Td [<0001> -20 <00020003>] TJ ET\n"
               b"BT /F2 12 Tf 72 686 Td (plain latin) Tj ET")
    pdf = _build_pdf_with_fonts(content, _CMAP_2BYTE)
    assert extract_pdf_text(_as_text(pdf)) == "Hi!\nplain latin\n"


def test_tounicode_resources_inherited_from_pages_node():
    content = b"BT /F1 12 Tf 72 700 Td <000100020003> Tj ET"
    pdf = _build_pdf_with_fonts(content, _CMAP_2BYTE, res_on_pages=True)
    assert extract_pdf_text(_as_text(pdf)) == "Hi!\n"


def test_parse_tounicode_units():
    from extract_ocr_spark.kernels.pdfkit import (_apply_cmap,
                                                  _parse_tounicode)
    nbytes, cmap = _parse_tounicode(_CMAP_2BYTE)
    assert nbytes == 2
    assert cmap[1] == "H" and cmap[0x12] == "C"
    assert _apply_cmap(b"\x00\x01\x00\x02", 2, cmap) == "Hi"
    # unmapped code falls back to the code point; trailing partial dropped
    assert _apply_cmap(b"\x00\x41\x00", 2, cmap) == "A"

    # 1-byte simple-font map with a multi-char (ligature) destination
    # and the array form of bfrange
    simple = (b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
              b"1 beginbfchar\n<61> <006600660069>\nendbfchar\n"  # a -> ffi
              b"1 beginbfrange\n<62> <63> [<0058> <0059>]\nendbfrange\n")
    nb, cm = _parse_tounicode(simple)
    assert nb == 1
    assert _apply_cmap(b"abc", 1, cm) == "ffiXY"

    # hostile range size is ignored, bounded memory
    nb2, cm2 = _parse_tounicode(
        b"1 beginbfrange\n<0000> <FFFFFF> <0041>\nendbfrange\n")
    assert cm2 == {}


def test_dict_value_deep_nested():
    from extract_ocr_spark.kernels.pdfkit import (_dict_value,
                                                  _dict_value_deep)
    body = b"<< /Resources << /Font << /F1 5 0 R >> /XObject << >> >> >>"
    deep = _dict_value_deep(body, b"Resources")
    assert deep == b"<< /Font << /F1 5 0 R >> /XObject << >> >>"
    # the generic helper truncates at the first '>>' (why deep exists)
    assert _dict_value(body, b"Resources") != deep
    # non-dict values fall through identically
    assert _dict_value_deep(b"<< /Parent 2 0 R >>", b"Parent") == b"2 0 R"


def test_tounicode_state_spans_contents_array():
    """A /Contents ARRAY is one logical stream: a Tf (and Td) in part
    one applies to strings shown in part two."""
    part1 = b"BT /F1 12 Tf 72 700 Td "
    part2 = b"<000100020003> Tj ET"
    res = b" /Resources << /Font << /F1 6 0 R >> >>"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents [4 0 R 5 0 R]" + res + b" >>"),
        (4, b"<< /Length " + str(len(part1)).encode()
            + b" >>\nstream\n" + part1 + b"\nendstream"),
        (5, b"<< /Length " + str(len(part2)).encode()
            + b" >>\nstream\n" + part2 + b"\nendstream"),
        (6, b"<< /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >>"),
        (7, b"<< /Length " + str(len(_CMAP_2BYTE)).encode()
            + b" >>\nstream\n" + _CMAP_2BYTE + b"\nendstream"),
    ]
    assert extract_pdf_text(_as_text(_assemble(objs))) == "Hi!\n"


def test_tounicode_inline_font_dict():
    """/Font entries may be direct (inline) dictionaries, not refs."""
    content = b"BT /F1 12 Tf 72 700 Td <000100020003> Tj ET"
    res = (b" /Resources << /Font << /F1 << /Type /Font /Subtype /Type0"
           b" /ToUnicode 5 0 R >> >> >>")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 4 0 R" + res + b" >>"),
        (4, b"<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream"),
        (5, b"<< /Length " + str(len(_CMAP_2BYTE)).encode()
            + b" >>\nstream\n" + _CMAP_2BYTE + b"\nendstream"),
    ]
    assert extract_pdf_text(_as_text(_assemble(objs))) == "Hi!\n"


def test_bfrange_into_surrogates_yields_replacement():
    """A bfrange whose increment steps into the UTF-16 surrogate block
    must emit U+FFFD, never a lone surrogate (the first downstream
    UTF-8 encode — Spark/Arrow — would raise on one)."""
    from extract_ocr_spark.kernels.pdfkit import _parse_tounicode
    _, cmap = _parse_tounicode(
        b"1 beginbfrange\n<0001> <0010> <D7F8>\nendbfrange\n")
    assert cmap[0x0001] == "ퟸ"
    assert cmap[0x000F] == "�"          # D7F8 + E = D806: surrogate
    for v in cmap.values():
        v.encode("utf-8")               # every value survives encoding


def test_tounicode_indirect_font_dict():
    """/Font itself may be an indirect reference; the resolved object
    BODY leads with whitespace and must still parse (regression: the
    inline-dict guard rejected it and silently dropped every CMap)."""
    content = b"BT /F1 12 Tf 72 700 Td <000100020003> Tj ET"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 4 0 R /Resources << /Font 7 0 R >> >>"),
        (4, b"<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream"),
        (5, b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>"),
        (6, b"<< /Length " + str(len(_CMAP_2BYTE)).encode()
            + b" >>\nstream\n" + _CMAP_2BYTE + b"\nendstream"),
        (7, b"<< /F1 5 0 R >>"),
    ]
    assert extract_pdf_text(_as_text(_assemble(objs))) == "Hi!\n"


def test_differences_encoding_remap():
    """A simple font's /Encoding /Differences remaps codes to glyph
    names: code 65 ('A') shows as '0', 66 as '1' (named glyphs), 67 via
    the algorithmic uniXXXX form; unmapped codes keep their code point.
    ToUnicode, when present, wins (not exercised here — see CMap tests)."""
    content = b"BT /F1 12 Tf 72 700 Td (ABCD) Tj ET"
    res = b" /Resources << /Font << /F1 5 0 R >> >>"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 4 0 R" + res + b" >>"),
        (4, b"<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom"
            b" /Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding"
            b" /Differences [ 65 /zero /one /uni20AC ] >> >>"),
    ]
    # 65->'0', 66->'1', 67->'€' (uni20AC), 68 unmapped -> 'D'
    assert extract_pdf_text(_as_text(_assemble(objs))) == "01€D\n"


def test_glyph_name_resolution_units():
    from extract_ocr_spark.kernels.pdfkit import _glyph_to_unicode
    assert _glyph_to_unicode("A") == "A"
    assert _glyph_to_unicode("comma") == ","
    assert _glyph_to_unicode("emdash") == "—"
    assert _glyph_to_unicode("uni0041") == "A"
    assert _glyph_to_unicode("uni00660066") == "ff"  # two code units
    assert _glyph_to_unicode("u1F600") == "😀"
    assert _glyph_to_unicode("uD800") is None        # surrogate refused
    assert _glyph_to_unicode("notaglyph") is None
    assert _glyph_to_unicode("unixyzw") is None      # bad hex


def test_inline_image_binary_does_not_garble_text():
    """BI..ID <binary> EI payloads are not PDF syntax: binary bytes that
    happen to contain '(' and 'Tj' must not emit phantom text or swallow
    the real text after the image; 'BI' inside a shown string is text."""
    binary = b"\x89\x00(fake) Tj \xff\x01BT 9 9 Td (ghost) Tj ET\x02"
    content = (b"BT 72 700 Td (before image) Tj ET\n"
               b"BI /W 2 /H 2 /BPC 8 /CS /RGB ID " + binary + b" EI\n"
               b"BT 72 686 Td (after image) Tj ET\n"
               b"BT 72 672 Td (BI is not an image here) Tj ET")
    got = extract_pdf_text(_as_text(_build_pdf([content])))
    assert got == ("before image\nafter image\n"
                   "BI is not an image here\n")


def _png_up_encode(data: bytes, columns: int) -> bytes:
    """Forward PNG Up (filter type 2) prediction per row of `columns`
    bytes; data must be a row multiple."""
    assert len(data) % columns == 0
    out = bytearray()
    prev = b"\x00" * columns
    for r0 in range(0, len(data), columns):
        row = data[r0:r0 + columns]
        out += b"\x02" + bytes((row[j] - prev[j]) & 0xFF
                               for j in range(columns))
        prev = row
    return bytes(out)


def _tiff2_encode(data: bytes, columns: int) -> bytes:
    """Forward TIFF predictor 2 (colors=1 bpc=8): horizontal byte diffs
    per row of `columns` bytes."""
    out = bytearray()
    for r0 in range(0, len(data), columns):
        row = data[r0:r0 + columns]
        out += bytes([row[0]]) + bytes((row[j] - row[j - 1]) & 0xFF
                                       for j in range(1, len(row)))
    return bytes(out)


def _predictor_pdf(stream_dict: bytes, payload: bytes) -> bytes:
    """catalog → pages → page → one content stream with a caller-built
    stream dict (filters/parms) around `payload`."""
    return _assemble([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        (4, b"<< " + stream_dict + b" /Length "
            + str(len(payload)).encode() + b" >>\nstream\n" + payload
            + b"\nendstream"),
    ])


def test_flate_png_predictor_on_content_stream():
    """Predictors are legal on ANY LZW/Flate stream, not just xref
    streams — a PNG-predicted Flate content stream must decode."""
    import zlib as _z

    content = b"BT 72 700 Td (png predicted body) Tj ET"
    cols = 10
    content += b" " * (-len(content) % cols)  # pad to a row multiple
    payload = _z.compress(_png_up_encode(content, cols))
    pdf = _predictor_pdf(
        b"/Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 10 >>", payload)
    assert extract_pdf_text(_as_text(pdf)) == "png predicted body\n"


def test_tiff_predictor2_on_content_stream():
    import zlib as _z

    content = b"BT 72 700 Td (tiff predicted body) Tj ET"
    cols = 8
    content += b" " * (-len(content) % cols)
    payload = _z.compress(_tiff2_encode(content, cols))
    pdf = _predictor_pdf(
        b"/Filter /FlateDecode "
        b"/DecodeParms << /Predictor 2 /Columns 8 >>", payload)
    assert extract_pdf_text(_as_text(pdf)) == "tiff predicted body\n"


def test_decodeparms_array_aligns_with_filter_chain():
    """/Filter [/ASCII85Decode /FlateDecode] with /DecodeParms
    [null <<...>>]: the predictor belongs to the SECOND filter."""
    import base64
    import zlib as _z

    content = b"BT 72 700 Td (chained parms body) Tj ET"
    cols = 7
    content += b" " * (-len(content) % cols)
    payload = base64.a85encode(
        _z.compress(_png_up_encode(content, cols))) + b"~>"
    pdf = _predictor_pdf(
        b"/Filter [/ASCII85Decode /FlateDecode] "
        b"/DecodeParms [null << /Predictor 12 /Columns 7 >>]", payload)
    assert extract_pdf_text(_as_text(pdf)) == "chained parms body\n"


def test_png_predictor_multibyte_pixels():
    """bpp = Colors×BPC/8 > 1: the Sub filter references bpp bytes back,
    not the previous byte."""
    from extract_ocr_spark.kernels.pdfkit import (_apply_predictor,
                                                  _unpredict_png)

    # 2 rows × 2 pixels × 3 components, Sub filter (type 1)
    row1 = bytes([10, 20, 30, 15, 27, 41])
    row2 = bytes([5, 6, 7, 8, 9, 10])

    def sub_encode(row, bpp):
        return bytes(
            [b if j < bpp else (b - row[j - bpp]) & 0xFF
             for j, b in enumerate(row)])

    raw = b"\x01" + sub_encode(row1, 3) + b"\x01" + sub_encode(row2, 3)
    assert _unpredict_png(raw, 6, 3) == row1 + row2
    parms = b"<< /Predictor 11 /Colors 3 /BitsPerComponent 8 /Columns 2 >>"
    assert _apply_predictor(raw, parms) == row1 + row2


def test_unknown_predictor_skips_stream_not_garbage():
    import zlib as _z

    content = b"BT 72 700 Td (never seen) Tj ET"
    payload = _z.compress(content)
    pdf = _predictor_pdf(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 99 >>", payload)
    got = extract_pdf_text(_as_text(pdf))
    assert "never seen" not in got  # stream skipped, not misdecoded


def test_indirect_decodeparms_resolves():
    """/DecodeParms as an indirect reference must resolve through the
    object map — dropping it would leave the stream predicted and emit
    garbled bytes as page text."""
    import zlib as _z

    content = b"BT 72 700 Td (indirect parms body) Tj ET"
    cols = 9
    content += b" " * (-len(content) % cols)
    payload = _z.compress(_png_up_encode(content, cols))
    pdf = _assemble([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        (4, b"<< /Filter /FlateDecode /DecodeParms 5 0 R /Length "
            + str(len(payload)).encode() + b" >>\nstream\n" + payload
            + b"\nendstream"),
        (5, b"<< /Predictor 12 /Columns 9 >>"),
    ])
    assert extract_pdf_text(_as_text(pdf)) == "indirect parms body\n"


def test_single_decodeparms_dict_broadcasts_over_filter_array():
    """A single /DecodeParms dict next to a /Filter ARRAY applies to
    every filter (pypdf's reading of this malformed-but-common shape) —
    assigning it only to the first filter silently loses the predictor
    and with it the page text."""
    import base64
    import zlib as _z

    content = b"BT 72 700 Td (broadcast parms body) Tj ET"
    cols = 7
    content += b" " * (-len(content) % cols)
    payload = base64.a85encode(
        _z.compress(_png_up_encode(content, cols))) + b"~>"
    pdf = _predictor_pdf(
        b"/Filter [/ASCII85Decode /FlateDecode] "
        b"/DecodeParms << /Predictor 12 /Columns 7 >>", payload)
    assert extract_pdf_text(_as_text(pdf)) == "broadcast parms body\n"


def test_indirect_filter_resolves():
    """/Filter stored as an indirect reference must resolve — otherwise
    the raw compressed bytes come back as the 'decoded' stream and the
    page silently extracts empty."""
    import zlib as _z

    content = b"BT 72 700 Td (indirect filter body) Tj ET"
    payload = _z.compress(content)
    pdf = _assemble([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        (4, b"<< /Filter 5 0 R /Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream"),
        (5, b"/FlateDecode"),
    ])
    assert extract_pdf_text(_as_text(pdf)) == "indirect filter body\n"
