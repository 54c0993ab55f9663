"""Layout-aware PDF text extraction with reading-order reconstruction.

The container ships no PDF library (reference used pypdf — crawl.py:98-124),
and the input spans table carries *pre-decoded layout text* for pdf spans,
so the kernel operates on a deterministic synthetic layout encoding:

- pages are separated by form-feed (``\\f``), mirroring per-page extraction
- a page whose first non-blank line starts with ``%%ERR`` models a page
  whose ``extract_text()`` raises → the page is skipped
  (reference: crawl.py:113-118 skip-bad-pages)
- positioned lines are encoded ``@<y>,<x>:<text>``; reading order is
  reconstructed by clustering lines into rows by ``y`` (tolerance) and
  sorting each row by ``x`` — this reproduces layout-aware reading-order
  reconstruction without binary PDF parsing
- unpositioned lines keep their textual order
- non-empty pages are joined with a blank line (``\\n\\n``)
  (reference: crawl.py:120-121)
- no extractable text → the reference's sentinel string
  (crawl.py:122-124)
"""

from __future__ import annotations

import re
from operator import itemgetter

NO_TEXT_SENTINEL = "(No extractable text found in PDF.)\n"
PARSE_FAIL_SENTINEL = "(PDF captured, but failed to parse it.)\n"

_POS_LINE_RE = re.compile(r"^@(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?):(.*)$")
_Y_TOLERANCE = 2.0


def _extract_page(page: str) -> str | None:
    """Extract one page's text in reading order; None = failing page."""
    lines = page.splitlines()
    first_non_blank = next((ln for ln in lines if ln.strip()), "")
    if first_non_blank.startswith("%%ERR"):
        return None

    positioned: list[tuple[float, float, int, str]] = []
    plain: list[str] = []
    any_positioned = False
    for i, ln in enumerate(lines):
        m = _POS_LINE_RE.match(ln)
        if m:
            any_positioned = True
            positioned.append((float(m.group(1)), float(m.group(2)), i, m.group(3)))
        elif ln.strip():
            plain.append(ln.rstrip())

    if not any_positioned:
        return "\n".join(plain).strip()

    # Reading order: cluster by y (rows), sort rows top-to-bottom, cells
    # left-to-right; same-row cells joined by a single space.
    positioned.sort(key=itemgetter(0, 1, 2))  # C-level key: hot path
    rows: list[list[tuple[float, float, int, str]]] = []
    for item in positioned:
        if rows and abs(item[0] - rows[-1][0][0]) <= _Y_TOLERANCE:
            rows[-1].append(item)
        else:
            rows.append([item])
    out_lines: list[str] = []
    for row in rows:
        row.sort(key=itemgetter(1, 2))
        joined = " ".join(cell[3].strip() for cell in row if cell[3].strip())
        # a row whose every cell is whitespace-only (e.g. a real-PDF show
        # of " ") contributes no output line, not a phantom blank line
        if joined:
            out_lines.append(joined)
    # Plain lines (page headers etc. without coordinates) come first, in
    # textual order — deterministic and documented.
    return "\n".join([*plain, *out_lines]).strip()


def extract_pdf_text(layout_text: str | None) -> str:
    """Per-page extraction, skip failing pages, join non-empty pages with
    a blank line; sentinel when nothing is extractable.

    Accepts either the synthetic layout encoding (module docstring) or —
    when the input starts with ``%PDF-`` — real PDF bytes passed through
    the string channel (latin-1), which are parsed by the from-scratch
    reader below and funneled into the same reading-order kernel."""
    if layout_text is None:
        return PARSE_FAIL_SENTINEL
    if layout_text.startswith("%PDF-"):
        try:
            layout_text = _pdf_bytes_to_layout(
                layout_text.encode("latin-1", errors="replace"))
        except Exception:
            return PARSE_FAIL_SENTINEL
    pages = layout_text.split("\f")
    parts: list[str] = []
    for page in pages:
        page_text = _extract_page(page)
        if page_text:
            parts.append(page_text)
    text = "\n\n".join(parts).strip() + "\n"
    if text.strip():
        return text
    return NO_TEXT_SENTINEL


# -- real PDF bytes (E8 at full strength, minimal from-scratch reader) ----------
#
# The reference extracts per-page text with pypdf (crawl.py:98-124); no PDF
# library ships in this container and every reference PDF is a git-lfs
# pointer stub, so this is a from-scratch reader for the common subset:
# uncompressed or FlateDecode content streams, literal/hex strings, the
# Tj/TJ/'/" text-showing operators and Td/TD/Tm/T* positioning. Parsed
# (x, y, text) runs are re-encoded into the synthetic layout lines
# (`@<y>,<x>:<text>`, y negated because PDF y grows upward) so reading-order
# reconstruction, failing-page skips, and page joining reuse the one tested
# kernel above. Object streams (/Type /ObjStm) are unpacked so PDF 1.5+
# packed page trees resolve; stream filters Flate / ASCIIHex / ASCII85
# (and decode-order chains of them) are applied. Out of scope
# (documented): CMap/Type0 font decoding, LZW / DCT filters, encrypted
# files, xref-stream *tables* (objects are recovered by scanning
# `N G obj ... endobj` plus ObjStm unpacking, which also survives mild
# corruption).

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")


def _dict_value(body: bytes, key: bytes) -> bytes | None:
    """The raw token(s) following /key in an object body (first match)."""
    m = re.search(rb"/" + key + rb"\s*(\[[^\]]*\]|<<.*?>>|[^/>\s][^/>]*)",
                  body, re.S)
    return m.group(1).strip() if m else None


def _decode_pdf_string(tok: bytes) -> str:
    """Literal `(...)` (escapes, octal, nested parens already balanced by
    the tokenizer) or hex `<...>` string → text. UTF-16BE BOM honored;
    otherwise latin-1 (≈ PDFDocEncoding for the printable range)."""
    if tok.startswith(b"<"):
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        raw = bytes.fromhex(hx.decode("ascii"))
    else:
        body = tok[1:-1]
        out = bytearray()
        i = 0
        while i < len(body):
            c = body[i]
            if c == 0x5C and i + 1 < len(body):  # backslash
                n = body[i + 1]
                i += 2
                if n in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[n])
                elif n in b"()\\":
                    out.append(n)
                elif 0x30 <= n <= 0x37:  # octal \ddd (1-3 digits)
                    digits = chr(n)
                    while (i < len(body) and len(digits) < 3
                           and 0x30 <= body[i] <= 0x37):
                        digits += chr(body[i])
                        i += 1
                    out.append(int(digits, 8) & 0xFF)
                elif n in (10, 13):  # line continuation
                    if n == 13 and i < len(body) and body[i] == 10:
                        i += 1
                else:
                    out.append(n)
            else:
                out.append(c)
                i += 1
        raw = bytes(out)
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


# Sentinel markers for TJ array delimiters: decoded literal strings whose
# VALUE is "[" or "]" must not be mistaken for the array tokens.
class _ArrayMark:
    __slots__ = ("open",)

    def __init__(self, open_: bool):
        self.open = open_


_LBRACK = _ArrayMark(True)
_RBRACK = _ArrayMark(False)


_CONTENT_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\([^()]*\))*\)"   # literal string (1 nesting level)
    rb"|<[0-9A-Fa-f\s]*>"                  # hex string
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"
    rb"|/[^\s/\[\]()<>]*"
    rb"|[A-Za-z'\"*]+")


def _content_runs(content: bytes) -> list[tuple[float, float, str]]:
    """Scan one content stream for text runs → [(y, x, text)] in paint
    order. Tracks the text line matrix translation only (no scaling/font
    metrics — enough for reading-order text extraction)."""
    runs: list[tuple[float, float, str]] = []
    tx = ty = 0.0
    leading = 12.0
    stack: list[object] = []  # operand stack: floats and decoded strings

    def show(s: str) -> None:
        if s:
            runs.append((ty, tx, s))

    def _nums(n: int) -> bool:
        # Operand-type guard (hoisted out of the token loop — defining a
        # closure per token was measurable on the hot path): a name or
        # string where a number is expected skips that single operator,
        # never raises.
        return len(stack) >= n and all(
            isinstance(v, float) for v in stack[-n:])

    for m in _CONTENT_TOKEN_RE.finditer(content):
        tok = m.group(0)
        c0 = tok[:1]
        if c0 in b"(<":
            stack.append(_decode_pdf_string(tok))
        elif c0 == b"[":
            stack.append(_LBRACK)
        elif c0 == b"]":
            stack.append(_RBRACK)
        elif c0 in b"/":
            stack.append(tok.decode("latin-1"))
        elif _NUM_RE.fullmatch(tok):
            stack.append(float(tok))
        else:
            op = tok.decode("latin-1")
            if op == "Td" and _nums(2):
                tx += stack[-2]; ty += stack[-1]
            elif op == "TD" and _nums(2):
                tx += stack[-2]; ty += stack[-1]
                leading = -stack[-1] or leading
            elif op == "Tm" and len(stack) >= 6 and _nums(2):
                tx, ty = stack[-2], stack[-1]
            elif op == "T*":
                ty -= leading
            elif op == "TL" and _nums(1):
                leading = stack[-1] or leading
            elif op == "Tj" and stack and isinstance(stack[-1], str):
                show(stack[-1])
            elif op == "TJ":
                # concatenate the string items since the matching '['
                parts = []
                for item in reversed(stack):
                    if item is _LBRACK:
                        break
                    if isinstance(item, str):
                        parts.append(item)
                show("".join(reversed(parts)))
            elif op in ("'", '"') and stack and isinstance(stack[-1], str):
                ty -= leading
                show(stack[-1])
            elif op == "BT":
                tx = ty = 0.0
            stack.clear()
    return runs


def _pdf_bytes_to_layout(data: bytes) -> str:
    """Real PDF bytes → the synthetic layout encoding consumed by
    ``extract_pdf_text`` (pages joined with \\f, runs as `@<-y>,<x>:`
    positioned lines so top-of-page sorts first)."""
    import base64
    import binascii
    import zlib

    # Incremental updates: a revision section appended AFTER the original
    # body's `%%EOF` carries the newest version of an object, so matches
    # beyond the first %%EOF override earlier ones (approximating xref
    # resolution, which the reference's pypdf path does). Matches WITHIN
    # the original body never override — a spurious `N G obj` inside an
    # uncompressed embedded-file stream must not clobber a real object.
    first_eof = data.find(b"%%EOF")
    objs: dict[int, bytes] = {}
    objstms: list[tuple[int, bytes]] = []  # (match start, body), file order
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        if num not in objs or (first_eof != -1 and m.start() > first_eof):
            objs[num] = m.group(3)
        if re.search(rb"/Type\s*/ObjStm\b", m.group(3)):
            objstms.append((m.start(), m.group(3)))

    def stream_of(body: bytes) -> bytes | None:
        sm = re.search(rb"stream\r?\n", body)
        if sm is None:
            return None
        start = sm.end()
        # Honor /Length when present — the endstream-scan fallback can eat
        # a trailing 0x0D of binary data (it is indistinguishable from the
        # optional \r of the EOL before `endstream`).
        raw = None
        ln = _dict_value(body, b"Length")
        if ln is not None:
            ref = _REF_RE.fullmatch(ln.strip())
            if ref is not None:  # indirect length object
                ln = objs.get(int(ref.group(1)), b"").strip()
            try:
                raw = body[start:start + int(ln)]
            except ValueError:
                raw = None
        if raw is None:
            em = re.search(rb"\r?\nendstream", body[start:])
            if em is None:
                return None
            raw = body[start:start + em.start()]
        # /Filter may be a single name or an array of filters listed in
        # DECODE order (data was encoded in reverse): apply each in turn.
        # Supported: FlateDecode, ASCIIHexDecode, ASCII85Decode — the
        # text-stream filters pypdf handles in practice; LZW/DCT/crypt
        # stay documented out of scope (None ⇒ stream skipped).
        m = re.search(rb"/Filter\s*(\[[^\]]*\]|/\w+)", body[:sm.start()])
        for name in re.findall(rb"/(\w+)", m.group(1)) if m else []:
            try:
                if name == b"FlateDecode":
                    raw = zlib.decompress(raw)
                elif name == b"ASCIIHexDecode":
                    hx = re.sub(rb"[^0-9A-Fa-f]", b"",
                                raw.split(b">", 1)[0])
                    raw = binascii.unhexlify(
                        hx + b"0" if len(hx) % 2 else hx)
                elif name == b"ASCII85Decode":
                    raw = base64.a85decode(
                        re.sub(rb"\s", b"", raw.partition(b"~>")[0]))
                else:
                    return None  # unsupported filter (LZW, DCT, ...)
            except Exception:
                return None
        return raw

    # Object streams (/Type /ObjStm, PDF 1.5+): modern producers pack
    # non-stream objects — catalog, page tree, page dicts — inside one
    # compressed stream; without unpacking, those pages are invisible to
    # the `N G obj` scan. Layout: /N pairs of "objnum offset" ints, then
    # the object bodies starting at /First. Packed objects follow the
    # SAME override rule as direct ones: an ObjStm that lives in an
    # incremental-update section (past the first %%EOF) carries newer
    # versions and overrides; an original-body ObjStm never clobbers an
    # already-seen object (Acrobat save/annotate/sign appends repack the
    # page tree in a new ObjStm — xref semantics pick the newest).
    for start, body in objstms:
        try:
            s = stream_of(body)
            n = int(_dict_value(body, b"N"))
            first = int(_dict_value(body, b"First"))
            header = s[:first].split()
            pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                     for i in range(n)]
        except (TypeError, ValueError, IndexError):
            continue  # malformed ObjStm degrades only its own objects
        update_section = first_eof != -1 and start > first_eof
        for i, (onum, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < len(pairs) else len(s)
            if update_section or onum not in objs:
                objs[onum] = s[first + off:end]

    # Page order: walk /Kids arrays of /Type /Pages nodes (document
    # order), falling back to file-appearance order of /Type /Page objects.
    page_ids: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64 or num not in objs:
            return
        body = objs[num]
        if re.search(rb"/Type\s*/Pages\b", body):
            kids = _dict_value(body, b"Kids") or b""
            for r in _REF_RE.finditer(kids):
                walk(int(r.group(1)), depth + 1)
        elif re.search(rb"/Type\s*/Page\b", body):
            page_ids.append(num)

    roots = [n for n, b in objs.items()
             if re.search(rb"/Type\s*/Pages\b", b)
             and not any(rb"/Kids" in ob and re.search(
                 rb"\b%d\s+\d+\s+R" % n, _dict_value(ob, b"Kids") or b"")
                 for on, ob in objs.items() if on != n)]
    for r in roots:
        walk(r)
    if not page_ids:
        page_ids = [n for n, b in objs.items()
                    if re.search(rb"/Type\s*/Page\b", b)]

    page_layouts: list[str] = []
    for pid in page_ids:
        body = objs[pid]
        contents = _dict_value(body, b"Contents") or b""
        streams: list[bytes] = []
        for r in _REF_RE.finditer(contents):
            ref = int(r.group(1))
            if ref in objs:
                s = stream_of(objs[ref])
                if s is not None:
                    streams.append(s)
        if not streams:  # inline content stream on the page object itself
            s = stream_of(body)
            if s is not None:
                streams.append(s)
        lines: list[str] = []
        for s in streams:
            try:
                runs = _content_runs(s)
            except Exception:
                continue  # one malformed stream degrades only this page
            for y, x, text in runs:
                # \f too: layout pages are form-feed-delimited, so a form
                # feed inside a shown string would split phantom pages
                clean = (text.replace("\n", " ").replace("\r", " ")
                         .replace("\f", " "))
                lines.append(f"@{-y:g},{x:g}:{clean}")
        page_layouts.append("\n".join(lines))
    return "\f".join(page_layouts)
