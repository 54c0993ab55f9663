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


def _is_coord(s: str) -> bool:
    """Exact mirror of the regex piece ``-?\\d+(?:\\.\\d+)?``:
    ``str.isdecimal()`` is true for precisely the characters ``\\d``
    matches (Unicode category Nd), so this equals a regex match without
    the per-line ``re`` overhead on the hot path."""
    if s.startswith("-"):
        s = s[1:]
    head, dot, frac = s.partition(".")
    if dot:
        return head.isdecimal() and frac.isdecimal()
    return s.isdecimal()


def _extract_page(page: str) -> str | None:
    """Extract one page's text in reading order; None = failing page."""
    lines = page.splitlines()
    first_non_blank = next((ln for ln in lines if ln.strip()), "")
    if first_non_blank.startswith("%%ERR"):
        return None

    positioned: list[tuple[float, float, int, str]] = []
    plain: list[str] = []
    pos_append = positioned.append
    plain_append = plain.append
    for i, ln in enumerate(lines):
        # Fast path for the positioned-line format "@y,x:text" — string
        # partition + isdecimal validation is ~5× cheaper than the regex
        # and accepts exactly the same lines (the isdecimal shortcut covers
        # plain non-negative integers; _is_coord ≡ the full \d pattern).
        if ln and ln[0] == "@":
            coords, colon, text = ln[1:].partition(":")
            if colon:
                y_s, comma, x_s = coords.partition(",")
                if comma and (y_s.isdecimal() or _is_coord(y_s)) \
                        and (x_s.isdecimal() or _is_coord(x_s)):
                    pos_append((float(y_s), float(x_s), i, text))
                    continue
        if ln.strip():
            plain_append(ln.rstrip())

    if not positioned:
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
        if len(row) > 1:
            row.sort(key=itemgetter(1, 2))
        joined = " ".join(
            [s for cell in row if (s := cell[3].strip())])
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
# packed page trees resolve; stream filters Flate / LZW / RunLength /
# ASCIIHex / ASCII85 (and decode-order chains of them) are applied. Object offsets are
# resolved the way pypdf does — `startxref` → classic xref table or xref
# stream (incl. PNG-predicted /W columns) → trailer `/Prev` (+ hybrid
# `/XRefStm`) chain, newest revision first — falling back to scanning
# `N G obj ... endobj` (plus ObjStm unpacking) when the xref machinery is
# damaged or absent, which also survives mild corruption. Encrypted
# files (standard security handler: RC4 R2-R4, AES-128 /AESV2, AES-256
# R5/R6) open with the empty user/owner password the way pypdf does;
# /DecodeParms predictors apply to any Flate/LZW stream. Out of scope
# (documented): image filters (DCT/JPX/CCITT), predefined non-Identity
# CMaps, non-Standard security handlers, genuinely password-locked
# files (parse-fail sentinel, never garbled output).

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")


def _dict_value(body: bytes, key: bytes) -> bytes | None:
    """The raw token(s) following /key in an object body (first match)."""
    m = re.search(rb"/" + key + rb"\s*(\[[^\]]*\]|<<.*?>>|[^/>\s][^/>]*)",
                  body, re.S)
    return m.group(1).strip() if m else None


def _dict_value_deep(body: bytes, key: bytes) -> bytes | None:
    """Like _dict_value, but when the value is a dictionary returns the
    FULLY BALANCED `<< ... >>` token (the generic helper's non-greedy
    match stops at the first `>>`, truncating nested dicts such as
    `/Resources << /Font << ... >> >>`)."""
    m = re.search(rb"/" + key + rb"\s*", body)
    if m is None:
        return None
    i = m.end()
    if body[i:i + 2] != b"<<":
        return _dict_value(body, key)
    return _balanced_dict(body, i)


# -- /ToUnicode CMaps (ISO 32000-1 §9.10.3): code → unicode for fonts
# whose shown bytes are glyph/CID codes rather than text (Type0/CID and
# custom-encoded simple fonts). Without this, such strings decode as raw
# byte soup — the most common real-world failure of naive extractors.

def _parse_tounicode(data: bytes) -> tuple[int, dict[int, str]]:
    """CMap stream → (code byte-width, {code: unicode}). Width comes from
    codespacerange (2-byte for CID fonts, 1-byte for simple fonts);
    bfchar and bfrange sections (incl. the array form) fill the map."""

    def u16(h: bytes) -> str:
        if len(h) % 2:
            h += b"0"
        raw = bytes.fromhex(h.decode("ascii"))
        if len(raw) == 1:  # 1-byte dst: direct char code
            return chr(raw[0])
        return raw.decode("utf-16-be", errors="replace")

    nbytes = 1
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", data, re.S)
    if m:
        h = re.search(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if h:
            nbytes = max(1, min(4, len(h.group(1)) // 2))
    cmap: dict[int, str] = {}
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec.group(1)):
            cmap[int(src, 16)] = u16(dst)
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for lo, hi, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                rb"(\[[^\]]*\]|<[0-9A-Fa-f]+>)", sec.group(1)):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if not 0 <= hi_i - lo_i <= 0xFFFF:
                continue  # hostile/corrupt range: bounded memory
            if dst.startswith(b"["):
                for off, d in enumerate(
                        re.findall(rb"<([0-9A-Fa-f]+)>",
                                   dst)[:hi_i - lo_i + 1]):
                    cmap[lo_i + off] = u16(d)
            else:
                base = u16(dst[1:-1])
                last = ord(base[-1]) if base else 0
                for off in range(hi_i - lo_i + 1):
                    # the increment applies to the LAST UTF-16 code unit;
                    # a step into the surrogate range (or past the
                    # codepoint ceiling) maps to U+FFFD — lone surrogates
                    # would blow up the first downstream UTF-8 encode
                    cp = last + off
                    if base and cp <= 0x10FFFF \
                            and not 0xD800 <= cp <= 0xDFFF:
                        cmap[lo_i + off] = base[:-1] + chr(cp)
                    else:
                        cmap[lo_i + off] = "�" if base else ""
    return nbytes, cmap


# Standard glyph names (Adobe Glyph List subset: ASCII punctuation +
# digits + the common typographic extras); single-char names (A-Z, a-z)
# and the algorithmic uniXXXX / uXXXX(XX) forms are handled in code.
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ",
    "germandbls": "ß", "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "adieresis": "ä", "odieresis": "ö",
    "udieresis": "ü", "ntilde": "ñ", "degree": "°", "copyright": "©",
    "registered": "®", "trademark": "™", "Euro": "€",
    "sterling": "£", "yen": "¥", "cent": "¢", "section": "§",
    "paragraph": "¶", "dagger": "†", "daggerdbl": "‡",
    "nbspace": " ", "minus": "−", "multiply": "×",
    "divide": "÷", "plusminus": "±",
}


def _glyph_to_unicode(name: str) -> str | None:
    """Glyph name → unicode: single-char names are themselves, uniXXXX /
    uXXXX(XX) are algorithmic (Adobe Glyph List rules), the rest via
    the standard-name table; None = unknown (code stays unmapped)."""
    if len(name) == 1:
        return name
    if name.startswith("uni") and len(name) >= 7 \
            and (len(name) - 3) % 4 == 0:
        try:  # uniXXXX[XXXX...]: sequence of UTF-16 code units
            units = [int(name[i:i + 4], 16)
                     for i in range(3, len(name) - 3, 4)]
            raw = b"".join(u.to_bytes(2, "big") for u in units)
            return raw.decode("utf-16-be", errors="replace")
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            cp = int(name[1:], 16)
            if cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
                return chr(cp)
        except ValueError:
            return None
        return None
    return _GLYPH_NAMES.get(name)


def _differences_cmap(font_body: bytes, objs: dict[int, bytes]
                      ) -> tuple[int, dict[int, str]] | None:
    """A 1-byte code map from a simple font's /Encoding /Differences
    array (codes interleaved with glyph names; each name assigns the
    current code and increments it). Unknown glyph names leave their
    code unmapped, falling back to the code point itself."""
    enc = _dict_value_deep(font_body, b"Encoding")
    if enc is None:
        return None
    ref = _REF_RE.fullmatch(enc) if not enc.startswith(b"<<") else None
    if ref is not None:
        enc = objs.get(int(ref.group(1)), b"").strip()
    if not enc.startswith(b"<<"):
        return None  # a base-encoding name alone: default decode is fine
    diffs = _dict_value(enc, b"Differences")
    if diffs is None:
        return None
    cmap: dict[int, str] = {}
    code = 0
    for m in re.finditer(rb"(\d+)|/([^\s/\[\]()<>]+)", diffs):
        if m.group(1) is not None:
            code = int(m.group(1))
        else:
            u = _glyph_to_unicode(m.group(2).decode("latin-1"))
            if u is not None and 0 <= code <= 0xFF:
                cmap[code] = u  # out-of-range codes skipped, never wrapped
            code += 1
    return (1, cmap) if cmap else None


def _font_cmaps(page_body: bytes, objs: dict[int, bytes],
                cache: dict[int, tuple[int, dict[int, str]] | None]
                | None = None,
                ) -> dict[str, tuple[int, dict[int, str]]]:
    """Resolve the page's /Resources /Font dict (following /Parent
    inheritance, indirect refs, and inline font dicts) → {font name:
    parsed /ToUnicode}. Fonts without a ToUnicode stream are simply
    absent — their strings keep the default latin-1/UTF-16 decoding.
    ``cache`` memoizes parsed CMaps by ToUnicode object number: fonts
    are shared document-wide, so without it a 1000-page file would
    decompress and re-parse the same CMap stream 1000 times."""
    body, res = page_body, None
    for _ in range(8):  # /Resources may be inherited from /Pages nodes
        res = _dict_value_deep(body, b"Resources")
        if res is not None:
            break
        par = _dict_value(body, b"Parent")
        ref = _REF_RE.fullmatch(par.strip()) if par else None
        if ref is None or int(ref.group(1)) not in objs:
            return {}
        body = objs[int(ref.group(1))]
    if res is None:
        return {}
    ref = _REF_RE.fullmatch(res) if not res.startswith(b"<<") else None
    if ref is not None:
        res = objs.get(int(ref.group(1)), b"")
    fonts_tok = _dict_value_deep(res, b"Font") or b""
    ref = (_REF_RE.fullmatch(fonts_tok)
           if not fonts_tok.startswith(b"<<") else None)
    if ref is not None:
        # an object BODY (between `obj` and `endobj`) leads with the
        # newline after the keyword — strip it or the dict guard fails
        fonts_tok = objs.get(int(ref.group(1)), b"").strip()
    out: dict[str, tuple[int, dict[int, str]]] = {}
    for name, font_body in _iter_font_entries(fonts_tok, objs):
        tu = _dict_value(font_body, b"ToUnicode")
        tref = _REF_RE.fullmatch(tu.strip()) if tu else None
        if tref is None:
            # no ToUnicode: a simple font may still remap codes via
            # /Encoding /Differences (no stream decompress — uncached)
            diff = _differences_cmap(font_body, objs)
            if diff is not None:
                out[name] = diff
            continue
        tnum = int(tref.group(1))
        if cache is not None and tnum in cache:
            parsed = cache[tnum]
        else:
            parsed = None
            if tnum in objs:
                stream = _stream_of(objs[tnum], objs)
                if stream is not None:
                    try:
                        parsed = _parse_tounicode(stream)
                    except (ValueError, IndexError):
                        parsed = None  # malformed CMap: only this font
            if cache is not None:
                cache[tnum] = parsed
        if parsed is not None:
            out[name] = parsed
    return out


def _iter_font_entries(fonts_tok: bytes, objs: dict[int, bytes]
                       ) -> list[tuple[str, bytes]]:
    """Entries of a /Font dict token: (name, font dict body) for both
    indirect refs (`/F1 5 0 R`) and legal inline dicts
    (`/F1 << ... >>`), skipping names nested inside inline values."""
    entries: list[tuple[str, bytes]] = []
    if not fonts_tok.startswith(b"<<"):
        return entries
    name_re = re.compile(rb"/([^\s/\[\]()<>]+)\s*")
    i = 2
    while i < len(fonts_tok) - 2:
        m = name_re.match(fonts_tok, i)
        if m is None:
            i += 1
            continue
        name, j = m.group(1).decode("latin-1"), m.end()
        if fonts_tok[j:j + 2] == b"<<":
            val = _balanced_dict(fonts_tok, j)
            if val is None:
                break
            entries.append((name, val))
            i = j + len(val)
        else:
            rm = _REF_RE.match(fonts_tok, j)
            if rm is not None:
                body = objs.get(int(rm.group(1)))
                if body is not None:
                    entries.append((name, body))
                i = rm.end()
            else:
                i = j
    return entries


def _apply_cmap(raw: bytes, nbytes: int, cmap: dict[int, str]) -> str:
    """Shown-string bytes → unicode through a ToUnicode map. Unmapped
    codes fall back to the code point itself (pypdf-compatible
    leniency); a trailing partial code is dropped."""
    out = []
    for i in range(0, len(raw) - len(raw) % nbytes, nbytes):
        code = int.from_bytes(raw[i:i + nbytes], "big")
        out.append(cmap.get(
            code, chr(code) if code < 0xD800 else "�"))
    return "".join(out)


class _Str(str):
    """A decoded PDF string operand that still remembers its raw bytes —
    a /ToUnicode CMap (when the active font has one) maps CODES, so the
    show operators must be able to re-decode from bytes, not text."""

    __slots__ = ("raw",)
    raw: bytes

    def __new__(cls, text: str, raw: bytes) -> "_Str":
        s = super().__new__(cls, text)
        s.raw = raw
        return s


def _decode_pdf_string(tok: bytes) -> _Str:
    """Literal `(...)` (escapes, octal, nested parens already balanced by
    the tokenizer) or hex `<...>` string → text. UTF-16BE BOM honored;
    otherwise latin-1 (≈ PDFDocEncoding for the printable range). The
    raw bytes ride along on the result for CMap-aware re-decoding."""
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
        return _Str(raw[2:].decode("utf-16-be", errors="replace"), raw)
    return _Str(raw.decode("latin-1"), raw)


# Sentinel markers for TJ array delimiters: decoded literal strings whose
# VALUE is "[" or "]" must not be mistaken for the array tokens.
class _ArrayMark:
    __slots__ = ("open",)

    def __init__(self, open_: bool):
        self.open = open_


_LBRACK = _ArrayMark(True)
_RBRACK = _ArrayMark(False)


# Inline images (ISO 32000-1 §8.9.7): `BI <dict> ID <binary> EI`. The
# binary payload is NOT PDF syntax — a stray '(' or 'Tj' inside it would
# garble the tokenizer's view of everything after — so when BI appears
# as an OPERATOR token (never inside a string: the tokenizer consumes
# strings atomically) the scan jumps past ID..EI. EI is the first
# whitespace-delimited occurrence after ID — pypdf's heuristic.
_INLINE_ID_RE = re.compile(rb"\bID[ \t\r\n]")
_INLINE_EI_RE = re.compile(rb"\sEI(?![0-9A-Za-z])")

_CONTENT_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\([^()]*\))*\)"   # literal string (1 nesting level)
    rb"|<[0-9A-Fa-f\s]*>"                  # hex string
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"
    rb"|/[^\s/\[\]()<>]*"
    rb"|[A-Za-z'\"*]+")


def _content_runs(
    content: bytes,
    fonts: dict[str, tuple[int, dict[int, str]]] | None = None,
) -> list[tuple[float, float, str]]:
    """Scan one content stream for text runs → [(y, x, text)] in paint
    order. Tracks the text line matrix translation only (no scaling/font
    metrics — enough for reading-order text extraction). ``fonts`` maps
    font resource names to parsed /ToUnicode CMaps; Tf selects the
    active one and shown strings re-decode through it."""
    runs: list[tuple[float, float, str]] = []
    tx = ty = 0.0
    leading = 12.0
    cur_cmap: tuple[int, dict[int, str]] | None = None
    stack: list[object] = []  # operand stack: floats and decoded strings

    def mapped(s: str) -> str:
        if cur_cmap is not None and isinstance(s, _Str):
            return _apply_cmap(s.raw, cur_cmap[0], cur_cmap[1])
        return s

    def show(s: str) -> None:
        s = mapped(s)
        if s:
            runs.append((ty, tx, s))

    def _nums(n: int) -> bool:
        # Operand-type guard (hoisted out of the token loop — defining a
        # closure per token was measurable on the hot path): a name or
        # string where a number is expected skips that single operator,
        # never raises.
        return len(stack) >= n and all(
            isinstance(v, float) for v in stack[-n:])

    pos = 0
    while True:
        m = _CONTENT_TOKEN_RE.search(content, pos)
        if m is None:
            break
        pos = m.end()
        tok = m.group(0)
        if tok == b"BI":  # inline image: skip the binary payload
            idm = _INLINE_ID_RE.search(content, pos)
            eim = (_INLINE_EI_RE.search(content, idm.end())
                   if idm else None)
            pos = eim.end() if eim else len(content)
            stack.clear()
            continue
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
                # (each mapped individually — joining first would lose
                # the raw bytes the CMap needs)
                parts = []
                for item in reversed(stack):
                    if item is _LBRACK:
                        break
                    if isinstance(item, str):
                        parts.append(mapped(item))
                show("".join(reversed(parts)))
            elif op in ("'", '"') and stack and isinstance(stack[-1], str):
                ty -= leading
                show(stack[-1])
            elif op == "Tf" and len(stack) >= 2 \
                    and isinstance(stack[-2], str) \
                    and not isinstance(stack[-2], _Str) \
                    and stack[-2].startswith("/"):
                # font selection persists across BT/ET (graphics state)
                cur_cmap = (fonts or {}).get(stack[-2][1:])
            elif op == "BT":
                tx = ty = 0.0
            stack.clear()
    return runs


def _stream_of(body: bytes, objs: dict[int, bytes]) -> bytes | None:
    """Decoded stream payload of an object body (None = no stream or an
    unsupported/undecodable filter — the stream is skipped, not fatal)."""
    import base64
    import binascii
    import zlib

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
    # Supported: FlateDecode, LZWDecode, RunLengthDecode, ASCIIHexDecode,
    # ASCII85Decode — the text-stream filters pypdf handles in practice —
    # each with its /DecodeParms /Predictor (TIFF 2 and PNG 10-15)
    # applied after the filter's decode; image filters (DCT/JPX/CCITT)
    # and crypt stay documented out of scope (None ⇒ stream skipped).
    head = body[:sm.start()]
    m = re.search(rb"/Filter\s*(\[[^\]]*\]|/\w+|\d+\s+\d+\s+R)", head)
    ftok = m.group(1) if m else b""
    fref = _REF_RE.fullmatch(ftok.strip())
    if fref is not None:
        # indirect /Filter — unresolved it would hand back the raw
        # compressed bytes as "decoded" (silent text loss)
        ftok = objs.get(int(fref.group(1)), b"").strip()
    names = re.findall(rb"/(\w+)", ftok)
    parms_list = _decode_parms_list(head, len(names), objs)
    for name, parms in zip(names, parms_list):
        try:
            if name == b"FlateDecode":
                raw = _apply_predictor(zlib.decompress(raw), parms)
            elif name == b"LZWDecode":
                # /EarlyChange defaults to 1; an indirect parms dict is
                # rare enough to fall back on.
                ec = _dict_value(parms, b"EarlyChange") if parms else None
                raw = _apply_predictor(_lzw_decode(
                    raw, early=int(ec.split()[0]) if ec else 1), parms)
            elif name == b"RunLengthDecode":
                raw = _rle_decode(raw)
            elif name == b"ASCIIHexDecode":
                hx = re.sub(rb"[^0-9A-Fa-f]", b"",
                            raw.split(b">", 1)[0])
                raw = binascii.unhexlify(
                    hx + b"0" if len(hx) % 2 else hx)
            elif name == b"ASCII85Decode":
                a85 = re.sub(rb"\s", b"", raw.partition(b"~>")[0])
                # optional Adobe '<~' opening frame (a85decode raises
                # on '<'; without the strip the page text is lost)
                if a85.startswith(b"<~"):
                    a85 = a85[2:]
                raw = base64.a85decode(a85)
            else:
                return None  # unsupported filter (DCT, JPX, CCITT, ...)
        except Exception:
            return None
    return raw


def _decode_parms_list(head: bytes, n: int,
                       objs: dict[int, bytes]) -> list[bytes | None]:
    """Per-filter /DecodeParms from a stream dict head: a single dict
    applies to the (first) filter; the array form holds one element per
    filter in decode order, ``null`` meaning none. Indirect refs resolve
    through ``objs`` (dropping a ref would silently skip a predictor
    and emit garbled bytes as page text)."""

    def _resolve(tok: bytes) -> bytes | None:
        ref = _REF_RE.fullmatch(tok.strip())
        if ref is None:
            return None
        # object bodies keep their leading EOL — strip before the guard
        b = objs.get(int(ref.group(1)), b"").strip()
        return b if b.startswith(b"<<") else None

    m = re.search(rb"/DecodeParms\s*", head)
    if m is None:
        return [None] * n
    i = m.end()
    if head[i:i + 2] == b"<<":
        # a single dict with a /Filter array broadcasts to every filter
        # (pypdf's behavior for this malformed-but-common producer
        # shape) — only Flate/LZW consult the predictor anyway
        return [_balanced_dict(head, i)] * n
    if head[i:i + 1] != b"[":
        ref_m = re.compile(rb"\d+\s+\d+\s+R").match(head, i)
        if ref_m is not None:
            return [_resolve(ref_m.group(0))] * n
        return [None] * n
    out: list[bytes | None] = []
    i += 1
    while i < len(head) and len(out) < n:
        while i < len(head) and head[i] in b" \t\r\n":
            i += 1
        if head[i:i + 1] == b"]":
            break
        if head[i:i + 2] == b"<<":
            d = _balanced_dict(head, i)
            if d is None:
                break
            out.append(d)
            i += len(d)
        else:
            ref_m = re.compile(rb"\d+\s+\d+\s+R").match(head, i)
            if ref_m is not None:
                out.append(_resolve(ref_m.group(0)))
                i = ref_m.end()
                continue
            # null / number / name — no parms for this filter
            out.append(None)
            nm = re.compile(rb"[^\s\]<]+").match(head, i)
            i = nm.end() if nm else i + 1
    return out + [None] * (n - len(out))


def _apply_predictor(raw: bytes, parms: bytes | None) -> bytes:
    """Reverse the /Predictor a Flate/LZW stream was encoded with
    (ISO 32000-1 §7.4.4.4): 1 = none, 2 = TIFF horizontal differencing,
    10-15 = PNG row filters. Raises on unsupported shapes (sub-byte TIFF
    components) so the filter chain skips the stream instead of emitting
    garbage."""
    if not parms:
        return raw

    def _int(key: bytes, default: int) -> int:
        tok = _dict_value(parms, key)
        return int(tok.split()[0]) if tok else default

    pred = _int(b"Predictor", 1)
    if pred <= 1:
        return raw
    colors = _int(b"Colors", 1)
    bpc = _int(b"BitsPerComponent", 8)
    columns = _int(b"Columns", 1)
    if pred == 2:
        if bpc != 8:
            raise ValueError("TIFF predictor with sub-byte components")
        return _unpredict_tiff(raw, columns, colors)
    if 10 <= pred <= 15:
        bpp = max(1, (colors * bpc + 7) // 8)
        rowlen = (columns * colors * bpc + 7) // 8
        return _unpredict_png(raw, rowlen, bpp)
    raise ValueError(f"unknown predictor {pred}")


def _unpredict_tiff(raw: bytes, columns: int, colors: int) -> bytes:
    """Reverse TIFF predictor 2 (8-bit components): each byte was stored
    as the difference from the same component one pixel to the left,
    per row of ``columns`` pixels."""
    rowlen = columns * colors
    out = bytearray(raw)
    for r0 in range(0, len(out), rowlen):
        for j in range(r0 + colors, min(r0 + rowlen, len(out))):
            out[j] = (out[j] + out[j - colors]) & 0xFF
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (ISO 32000-1 §7.4.4): MSB-first variable-width codes,
    9→12 bits, 256 = clear-table, 257 = EOD, /EarlyChange 1 by default
    (code width grows one code earlier than the table strictly requires).
    Raises on codes beyond the table (corrupt data) so the filter chain
    skips the stream instead of emitting garbage; a missing EOD at
    end-of-data is tolerated (some producers omit it)."""
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    width, buf, nbits = 9, 0, 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            buf &= (1 << nbits) - 1  # keep the accumulator small (O(n))
            if code == 256:
                del table[258:]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise ValueError("LZW: literal expected after clear")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW: code beyond table")
            out += entry
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """PDF RunLengthDecode (ISO 32000-1 §7.4.5): length byte 0-127 copies
    the next length+1 bytes, 129-255 repeats the next byte 257-length
    times, 128 = EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:
            break
        if n < 128:
            if i + 1 + n >= len(data):
                raise ValueError("RunLength: truncated literal run")
            out += data[i + 1:i + 2 + n]
            i += 2 + n
        else:
            if i + 1 >= len(data):
                raise ValueError("RunLength: truncated run")
            out += data[i + 1:i + 2] * (257 - n)
            i += 2
    return bytes(out)


def _unpack_objstm(body: bytes, objs: dict[int, bytes]
                   ) -> list[tuple[int, bytes]] | None:
    """/Type /ObjStm payload → [(objnum, body)] in packed order. Layout:
    /N pairs of "objnum offset" ints, then object bodies at /First."""
    try:
        s = _stream_of(body, objs)
        n = int(_dict_value(body, b"N"))
        first = int(_dict_value(body, b"First"))
        header = s[:first].split()
        pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                 for i in range(n)]
    except (TypeError, ValueError, IndexError):
        return None  # malformed ObjStm degrades only its own objects
    out: list[tuple[int, bytes]] = []
    for i, (onum, off) in enumerate(pairs):
        end = first + pairs[i + 1][1] if i + 1 < len(pairs) else len(s)
        out.append((onum, s[first + off:end]))
    return out


# ---- xref resolution (the pypdf-parity path) ----------------------------------

_OBJ_AT_RE = re.compile(rb"\s*(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_OBJSTM_TYPE_RE = re.compile(rb"/Type\s*/ObjStm\b")
_XREF_ENTRY_RE = re.compile(rb"\s*(\d{10})\s+(\d{5})\s+([nf])")

# entry shapes in the object map:  ("d", offset) = direct `N G obj` at a
# byte offset;  ("s", stm, idx) = packed at index idx of ObjStm #stm;
# ("f",) = free (blocks older revisions from resurrecting the number).
_FREE = ("f",)


def _balanced_dict(data: bytes, start: int) -> bytes | None:
    """The `<< ... >>` dict starting at/after ``start`` (nesting-aware)."""
    open_at = data.find(b"<<", start)
    if open_at == -1:
        return None
    depth, i = 0, open_at
    while i < len(data) - 1:
        pair = data[i:i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[open_at:i]
        else:
            i += 1
    return None


def _unpredict_png(raw: bytes, rowlen: int, bpp: int = 1) -> bytes:
    """Reverse PNG row filters (predictors 10-15): one filter-type byte
    per row of ``rowlen`` bytes; the "left" reference is ``bpp`` bytes
    back (bytes per pixel — 1 for xref /W byte fields, colors×bpc/8 for
    multi-component streams)."""
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i + 1 + rowlen <= len(raw) + rowlen and i < len(raw):
        ft = raw[i]
        row = bytearray(raw[i + 1:i + 1 + rowlen])
        if len(row) < rowlen:
            break  # truncated final row: drop it
        i += 1 + rowlen
        if ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _parse_classic_xref(data: bytes, off: int,
                        entries: dict[int, tuple]) -> list[int]:
    """Classic `xref` table section at byte ``off``: subsection headers
    `start count` followed by 20-byte `offset gen n|f` entries, then the
    trailer dict. Returns the next offsets to walk (/XRefStm before /Prev
    — hybrid files put newer ObjStm entries in the stream)."""
    m = re.compile(rb"\s*xref\b").match(data, off)
    pos = m.end()
    sub_re = re.compile(rb"\s*(\d+)\s+(\d+)\s*")
    while True:
        sm = sub_re.match(data, pos)
        if sm is None:
            break
        start_num, count = int(sm.group(1)), int(sm.group(2))
        pos = sm.end()
        for k in range(count):
            em = _XREF_ENTRY_RE.match(data, pos)
            if em is None:
                raise ValueError("short xref subsection")
            num = start_num + k
            if num not in entries:
                entries[num] = (_FREE if em.group(3) == b"f"
                                else ("d", int(em.group(1))))
            pos = em.end()
        # skip trailing spaces/EOLs of the 20-byte records
        while pos < len(data) and data[pos] in b" \r\n":
            pos += 1
    tm = re.compile(rb"\s*trailer\b").match(data, pos)
    if tm is None:
        raise ValueError("xref table without trailer")
    tdict = _balanced_dict(data, tm.end())
    if tdict is None:
        raise ValueError("unparseable trailer dict")
    nxt: list[int] = []
    for key in (b"XRefStm", b"Prev"):
        v = _dict_value(tdict, key)
        if v is not None and v.split():
            try:
                nxt.append(int(v.split()[0]))
            except ValueError:
                pass
    return nxt


def _parse_xref_stream(data: bytes, off: int,
                       entries: dict[int, tuple]) -> list[int]:
    """Xref *stream* (/Type /XRef) at byte ``off``: /W-column binary
    entries (optionally Flate + PNG-predicted), /Index subsections.
    Returns [/Prev] if present."""
    m = _OBJ_AT_RE.match(data, off)
    if m is None:
        raise ValueError("no object at xref-stream offset")
    body = m.group(3)
    if not re.search(rb"/Type\s*/XRef\b", body):
        raise ValueError("object at startxref is not an XRef stream")
    # /DecodeParms predictors (PNG 10-15 on xref streams in practice)
    # are applied inside _stream_of along with the filter chain.
    raw = _stream_of(body, {})
    if raw is None:
        raise ValueError("undecodable xref stream")
    w_tok = _dict_value(body, b"W") or b""
    widths = [int(x) for x in _NUM_RE.findall(w_tok)]
    if len(widths) != 3:
        raise ValueError("bad /W")
    w1, w2, w3 = widths
    rec = w1 + w2 + w3
    idx_tok = _dict_value(body, b"Index")
    if idx_tok is not None:
        nums = [int(x) for x in _NUM_RE.findall(idx_tok)]
        index = list(zip(nums[0::2], nums[1::2]))
    else:
        size_tok = _dict_value(body, b"Size") or b"0"
        index = [(0, int(size_tok.split()[0]))]
    pos = 0
    for start_num, count in index:
        for k in range(count):
            if pos + rec > len(raw):
                raise ValueError("short xref stream")
            f1 = int.from_bytes(raw[pos:pos + w1], "big") if w1 else 1
            f2 = int.from_bytes(raw[pos + w1:pos + w1 + w2], "big")
            f3 = int.from_bytes(raw[pos + w1 + w2:pos + rec], "big")
            pos += rec
            num = start_num + k
            if num not in entries:
                if f1 == 1:
                    entries[num] = ("d", f2)
                elif f1 == 2:
                    entries[num] = ("s", f2, f3)
                else:
                    entries[num] = _FREE
    v = _dict_value(body, b"Prev")
    if v is not None and v.split():
        return [int(v.split()[0])]
    return []


def _xref_objects(data: bytes, crypt=None) -> dict[int, bytes] | None:
    """Resolve objects via the xref machinery (the way the reference's
    pypdf path does — crawl.py:98-124): last `startxref` → table/stream →
    /Prev chain, newest revision first, already-seen object numbers never
    overridden (so stale pre-update bodies and freed-then-reused numbers
    resolve per xref, not per scan order). None = xref absent/damaged →
    caller falls back to the scan. ``crypt`` decrypts direct objects'
    stream payloads BEFORE ObjStm unpacking (packed objects emerge from
    their decrypted container in plaintext)."""
    tail = data[-2048:]
    last = None
    for last in re.finditer(rb"startxref\s+(\d+)", tail):
        pass
    if last is None:
        return None
    entries: dict[int, tuple] = {}
    queue = [int(last.group(1))]
    seen: set[int] = set()
    while queue:
        off = queue.pop(0)
        if off in seen or not (0 <= off < len(data)):
            continue
        seen.add(off)
        if re.compile(rb"\s*xref\b").match(data, off):
            queue.extend(_parse_classic_xref(data, off, entries))
        else:
            queue.extend(_parse_xref_stream(data, off, entries))
    objs: dict[int, bytes] = {}
    gens: dict[int, int] = {}
    for num, ent in entries.items():
        if ent[0] == "d":
            m = _OBJ_AT_RE.match(data, ent[1])
            if m is not None and int(m.group(1)) == num:
                objs[num] = m.group(3)
                gens[num] = int(m.group(2))
    if crypt is not None:
        objs = _decrypt_objs(objs, gens, crypt)
    by_stm: dict[int, list[tuple[int, int]]] = {}
    for num, ent in entries.items():
        if ent[0] == "s":
            by_stm.setdefault(ent[1], []).append((num, ent[2]))
    for stm, wanted in by_stm.items():
        if stm not in objs:
            continue
        packed = _unpack_objstm(objs[stm], objs)
        if packed is None:
            continue
        for num, idx in wanted:
            if idx < len(packed) and packed[idx][0] == num:
                objs[num] = packed[idx][1]
    return objs or None


def _scan_objects(data: bytes, crypt=None) -> dict[int, bytes]:
    """Object recovery by scanning `N G obj ... endobj` — the fallback
    when the xref machinery is absent or damaged.

    Incremental updates: a revision section appended AFTER the original
    body's `%%EOF` carries the newest version of an object, so matches
    beyond the boundary %%EOF override earlier ones (approximating xref
    resolution). Matches WITHIN the original body never override — a
    spurious `N G obj` inside an uncompressed embedded-file stream must
    not clobber a real object. Linearized (web-optimized) files place a
    %%EOF near the START (the first-page xref section); using it as the
    boundary would grant override rights to nearly the whole main body,
    so for /Linearized files the boundary is the NEXT %%EOF."""
    first_eof = data.find(b"%%EOF")
    if first_eof != -1 and re.search(rb"/Linearized\b", data[:4096]):
        nxt = data.find(b"%%EOF", first_eof + 5)
        if nxt != -1:
            first_eof = nxt
    # spans, not bodies: superseded revisions of large objects would
    # otherwise all be materialized for the whole call
    occurrences = [(m.start(), int(m.group(1)), int(m.group(2)),
                    m.span(3)) for m in _OBJ_RE.finditer(data)]
    objs: dict[int, bytes] = {}
    gens: dict[int, int] = {}
    winner_at: dict[int, int] = {}
    for start, num, gen, span in occurrences:
        if num not in objs or (first_eof != -1 and start > first_eof):
            objs[num] = data[span[0]:span[1]]
            gens[num] = gen
            winner_at[num] = start
    if crypt is not None:
        # one full-map pass (indirect /Length refs resolve against it)
        objs = _decrypt_objs(objs, gens, crypt)
    objstms: list[tuple[int, bytes]] = []  # (match start, body), file order
    for start, num, gen, span in occurrences:
        if not _OBJSTM_TYPE_RE.search(data, span[0], span[1]):
            continue
        if winner_at.get(num) == start:
            body = objs[num]
        elif crypt is not None:
            # a superseded ObjStm occurrence still gets unpacked (its
            # packed objects only land where not already seen), so its
            # payload needs its own decryption pass
            body = _decrypt_objs({num: data[span[0]:span[1]]},
                                 {num: gen}, crypt, lookup=objs)[num]
        else:
            body = data[span[0]:span[1]]
        objstms.append((start, body))

    # Object streams (/Type /ObjStm, PDF 1.5+): modern producers pack
    # non-stream objects — catalog, page tree, page dicts — inside one
    # compressed stream; without unpacking, those pages are invisible to
    # the `N G obj` scan. Packed objects follow the SAME override rule as
    # direct ones: an ObjStm in an incremental-update section carries
    # newer versions and overrides; an original-body ObjStm never
    # clobbers an already-seen object (Acrobat save/annotate/sign appends
    # repack the page tree in a new ObjStm — xref semantics pick the
    # newest).
    for start, body in objstms:
        packed = _unpack_objstm(body, objs)
        if packed is None:
            continue
        update_section = first_eof != -1 and start > first_eof
        for onum, obody in packed:
            if update_section or onum not in objs:
                objs[onum] = obody
    return objs


_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+\d+\s+\d+\s+R|/Encrypt\s*<<")


def _trailer_heads(data: bytes) -> list[bytes]:
    """Balanced dict bytes of every REAL trailer section in file order —
    a classic ``trailer <<`` that directly follows an xref-table entry,
    or a ``/Type /XRef`` stream dict inside an object header. The
    anchoring keeps content text that merely mentions these tokens from
    false-positive-ing; ONE shared implementation serves both the
    encryption gate and the decryptor's /Encrypt + /ID lookup."""
    found: list[tuple[int, bytes]] = []
    for m in re.finditer(rb"trailer\s*<<", data):
        before = data[max(0, m.start() - 64):m.start()]
        # a classic trailer keyword sits right after the last 20-byte
        # xref table entry; a content-string mention does not
        if not re.search(rb"\d{10} \d{5} [nf]\s*$", before):
            continue
        d = _balanced_dict(data, m.start())
        # unbalanced dict (truncated download): keep a raw window so
        # the encryption GATE still fires (the decryptor then fails to
        # parse it and the file refuses loudly — never ciphertext-as-text)
        found.append((m.start(), d or data[m.start():m.start() + 2048]))
    for m in re.finditer(rb"/Type\s*/XRef\b", data):
        w0 = max(0, m.start() - 2048)
        om = None
        for om in re.finditer(rb"\d+\s+\d+\s+obj\b", data[w0:m.start()]):
            pass
        if om is None or data.find(b"stream", m.end(),
                                   m.end() + 2048) == -1:
            continue
        d = _balanced_dict(data, w0 + om.end())
        found.append((w0 + om.end(), d or data[w0 + om.end():
                                               w0 + om.end() + 2048]))
    # byte order = revision order: "last wins" must see the NEWEST
    # trailer last even in hybrid classic/xref-stream files
    return [d for _, d in sorted(found, key=lambda t: t[0])]


def _heads_encrypted(heads: list[bytes]) -> bool:
    """The encryption gate: any real trailer section carries /Encrypt.
    (`_pdf_bytes_to_layout` is the single caller — it also applies the
    truncated-file backstop below.)"""
    return any(_ENCRYPT_REF_RE.search(h) for h in heads)


def _string_token_at(body: bytes, i: int) -> bytes | None:
    """The hex `<...>` or balanced literal `(...)` string token starting
    at ``i`` (escape-aware), or None."""
    if body[i:i + 1] == b"<":
        j = body.find(b">", i)
        return body[i:j + 1] if j != -1 else None
    if body[i:i + 1] == b"(":
        depth, j = 0, i
        while j < len(body):
            c = body[j]
            if c == 0x5C:  # backslash escape
                j += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return body[i:j + 1]
            j += 1
    return None


def _string_value(body: bytes, key: bytes,
                  scrub: bytes | None = None) -> bytes | None:
    """Raw BYTES of the /key string entry. `_dict_value`'s generic token
    regex truncates string values at '/', '>' or whitespace, so strings
    get their own balanced parser. With ``scrub`` (the same-length
    string-scrubbed copy) the KEY is located on the scrubbed bytes —
    immune to key-shaped bytes inside earlier binary strings — and the
    value is read from the original at that offset."""
    m = re.search(rb"/" + key + rb"(?![A-Za-z0-9])\s*",
                  scrub if scrub is not None else body)
    if m is None:
        return None
    tok = _string_token_at(body, m.end())
    return _decode_pdf_string(tok).raw if tok else None


def _scrub_strings(b: bytes) -> bytes:
    """Same-length copy with every string token's INTERIOR replaced by
    '0' bytes. /O /U /OE /UE hold effectively random binary: a raw regex
    for /V, /R, /P, /ID ... can land INSIDE that ciphertext (dict key
    order is arbitrary — Acrobat commonly writes /O /U first). All key
    lookups run on the scrubbed copy; string VALUES are then read from
    the original at the same offsets."""
    out = bytearray(b)
    i = 0
    while i < len(b):
        c = b[i]
        if c == 0x3C and b[i + 1:i + 2] == b"<":  # '<<' dict open
            i += 2
            continue
        if c in (0x28, 0x3C):  # '(' or '<'
            tok = _string_token_at(b, i)
            if tok:
                for j in range(i + 1, i + len(tok) - 1):
                    out[j] = 0x30
                i += len(tok)
                continue
        i += 1
    return bytes(out)


def _find_encrypt_context(
        data: bytes,
        heads: list[bytes] | None = None) -> tuple[bytes, bytes] | None:
    """(encrypt dict bytes, first /ID string) from the real trailer
    sections (`_trailer_heads` — shared with `_is_encrypted`). The LAST
    match in file order wins (newest revision)."""
    found: tuple[bytes, bytes] | None = None
    for td in (heads if heads is not None else _trailer_heads(data)):
        tds = _scrub_strings(td)
        ev = _dict_value_deep(tds, b"Encrypt")
        if ev is None:
            continue
        ed = None
        if ev.startswith(b"<<"):
            # inline dict: re-read from the unscrubbed trailer bytes
            m = re.search(rb"/Encrypt\s*<<", tds)
            ed = _balanced_dict(td, m.start()) if m else None
        else:
            ref = _REF_RE.fullmatch(ev.strip())
            if ref is not None:
                om = None
                for om in re.finditer(
                        rb"(?<![0-9])" + ref.group(1)
                        + rb"\s+\d+\s+obj\b(.*?)endobj", data, re.S):
                    pass
                if om is not None:
                    ed = _balanced_dict(om.group(1), 0)
        if ed is None:
            continue
        id0 = b""
        idm = re.search(rb"/ID(?![A-Za-z0-9])\s*\[", tds)
        if idm is not None:
            # first string element of the /ID array, hex or literal —
            # token located on the scrubbed copy (strings are blanked,
            # so ']' inside them cannot fake the array end), bytes read
            # from the original at the same offset; the search is
            # BOUNDED by the array close so an empty /ID [] cannot
            # adopt bytes from a later token
            arr_end = tds.find(b"]", idm.end())
            sm2 = re.compile(rb"[<(]").search(
                tds, idm.end(), arr_end if arr_end != -1 else idm.end())
            if sm2 is not None:
                tok = _string_token_at(td, sm2.start())
                if tok is not None:
                    id0 = _decode_pdf_string(tok).raw
        found = (ed, id0)
    return found


def _build_decryptor(data: bytes, heads: list[bytes] | None = None):
    """Standard-security-handler decryptor for a file whose trailer
    carries /Encrypt, tried with the EMPTY user and owner passwords (the
    ubiquitous "owner-locked, blank user password" shape pypdf opens
    transparently — crawl.py:98-124 never passes a password either).
    Returns ``crypt(num, gen, payload) -> bytes`` or None when the file
    is genuinely password-locked or uses an unsupported handler."""
    from .cryptokit import (aes_cbc_decrypt, authenticate_owner_password,
                            authenticate_r6, authenticate_user_password,
                            object_key, rc4)

    ctx = _find_encrypt_context(data, heads)
    if ctx is None:
        return None
    ed, id0 = ctx
    # key lookups run on a string-scrubbed copy: /O /U /OE /UE hold
    # random binary that a raw regex for /V, /R, /P ... can land inside
    eds = _scrub_strings(ed)
    # ... and TOP-LEVEL scalars additionally blank the /CF subtree: its
    # nested /CFM /V2 and per-filter /Length would otherwise shadow /V
    # and /Length when a producer writes /CF first (alphabetical order)
    eds_top = eds
    cfm_pos = re.search(rb"/CF(?![A-Za-z0-9])\s*", eds)
    cfv = _dict_value_deep(eds, b"CF")
    if cfm_pos is not None and cfv is not None and cfv.startswith(b"<<"):
        s0 = eds.find(cfv, cfm_pos.end())
        if s0 != -1:
            eds_top = eds[:s0] + b" " * len(cfv) + eds[s0 + len(cfv):]
    fm = re.search(rb"/Filter(?![A-Za-z0-9])\s*/(\w+)", eds_top)
    if fm is None or fm.group(1) != b"Standard":
        return None

    def _int_of(key: bytes, default: int | None = None) -> int | None:
        m = re.search(rb"/" + key + rb"(?![A-Za-z0-9])\s*([^/>\s][^/>]*)",
                      eds_top)
        if m is None:
            return default
        try:
            return int(m.group(1).split()[0])
        except (ValueError, IndexError):
            return default

    v = _int_of(b"V", 0)
    r = _int_of(b"R", 2)
    p = _int_of(b"P", -1)
    if p >= 2 ** 31:  # some producers write /P unsigned
        p -= 2 ** 32
    length_bits = _int_of(b"Length", 40)
    o = _string_value(ed, b"O", eds)
    u = _string_value(ed, b"U", eds)
    if o is None or u is None:
        return None
    enc_meta = not re.search(
        rb"/EncryptMetadata(?![A-Za-z0-9])\s*false", eds_top)

    # /StmF names the stream crypt filter for BOTH V4 and V5; absent
    # means Identity (spec default) = streams not encrypted at all
    stmf_name = b"Identity"
    cfm = None
    if v in (4, 5):
        stmf = re.search(rb"/StmF(?![A-Za-z0-9])\s*/(\w+)", eds_top)
        if stmf is not None:
            stmf_name = stmf.group(1)
        if stmf_name == b"Identity":
            return lambda num, gen, payload: payload
        cfd = _dict_value_deep(cfv, stmf_name) if cfv else None
        cm = re.search(
            rb"/CFM(?![A-Za-z0-9])\s*/(\w+)", cfd) if cfd else None
        # a named filter with no /CFM defaults to /None = not encrypted
        cfm = cm.group(1) if cm else b"None"

    if v == 5 and r in (5, 6):
        if cfm == b"None":
            return lambda num, gen, payload: payload
        if cfm != b"AESV3":
            return None
        oe = _string_value(ed, b"OE", eds)
        ue = _string_value(ed, b"UE", eds)
        if oe is None or ue is None:
            return None
        key = authenticate_r6(b"", o, u, oe, ue, r)
        if key is None:
            return None

        def crypt(num: int, gen: int, payload: bytes) -> bytes:
            if len(payload) < 16:
                return payload
            return aes_cbc_decrypt(key, payload[:16], payload[16:])

        return crypt

    if v == 4:
        if cfm == b"None":
            return lambda num, gen, payload: payload
        if cfm not in (b"V2", b"AESV2"):
            return None
        if cfm == b"AESV2":
            length_bits = 128  # AESV2 is fixed-width by definition
        else:
            cl = None
            if cfd is not None:
                clm = re.search(rb"/Length\s+(\d+)", cfd)
                if clm is not None:
                    cl = int(clm.group(1))
            if cl is not None:
                # crypt-filter /Length is in BYTES per spec, but some
                # producers write bits — normalize like pypdf does
                length_bits = cl * 8 if cl <= 16 else cl
    elif v in (1, 2) and r in (2, 3, 4):
        cfm = b"V2"  # RC4 with the file key — the V1/V2 behavior
    else:
        return None

    key = authenticate_user_password(b"", o, u, p, id0, r, length_bits,
                                     enc_meta)
    if key is None:
        key = authenticate_owner_password(b"", o, u, p, id0, r,
                                          length_bits, enc_meta)
    if key is None:
        return None

    if cfm == b"AESV2":
        def crypt(num: int, gen: int, payload: bytes) -> bytes:
            ok = object_key(key, num, gen, aes=True)
            if len(payload) < 16:
                return payload
            return aes_cbc_decrypt(ok, payload[:16], payload[16:])
    else:
        def crypt(num: int, gen: int, payload: bytes) -> bytes:
            return rc4(object_key(key, num, gen), payload)

    return crypt


def _decrypt_objs(objs: dict[int, bytes], gens: dict[int, int],
                  crypt, lookup: dict[int, bytes] | None = None
                  ) -> dict[int, bytes]:
    """Decrypt every object's STREAM payload in place (strings outside
    streams are not consumed by this reader). Runs on the resolved
    object map BEFORE ObjStm unpacking, so packed objects come out of
    their (decrypted) container already in plaintext — matching the
    spec: ObjStm contents are never doubly encrypted. /Type /XRef
    streams are skipped (never encrypted). Indirect /Length refs
    resolve against ``lookup`` (defaults to ``objs`` itself)."""
    if lookup is None:
        lookup = objs
    out: dict[int, bytes] = {}
    for num, body in objs.items():
        sm = re.search(rb"stream\r?\n", body)
        if sm is None or re.search(rb"/Type\s*/XRef\b", body[:sm.start()]):
            out[num] = body
            continue
        start = sm.end()
        raw = None
        ln = _dict_value(body[:sm.start()], b"Length")
        if ln is not None:
            ref = _REF_RE.fullmatch(ln.strip())
            if ref is not None:
                ln = lookup.get(int(ref.group(1)), b"").strip()
            try:
                raw = body[start:start + int(ln)]
            except ValueError:
                raw = None
        if raw is None:
            em = re.search(rb"\r?\nendstream", body[start:])
            if em is None:
                out[num] = body
                continue
            raw = body[start:start + em.start()]
        try:
            dec = crypt(num, gens.get(num, 0), raw)
        except Exception:
            out[num] = body  # undecryptable stream: leave as-is (skipped)
            continue
        head = body[:sm.start()]
        if len(dec) != len(raw):  # AES shrinks: keep /Length consistent
            head = re.sub(
                rb"/Length\s+\d+\s+\d+\s+R|/Length\s+\d+",
                b"/Length " + str(len(dec)).encode(), head, count=1)
        out[num] = head + b"stream\n" + dec + b"\nendstream"
    return out


def _pdf_bytes_to_layout(data: bytes) -> str:
    """Real PDF bytes → the synthetic layout encoding consumed by
    ``extract_pdf_text`` (pages joined with \\f, runs as `@<-y>,<x>:`
    positioned lines so top-of-page sorts first)."""
    crypt = None
    heads = _trailer_heads(data)
    if not _heads_encrypted(heads) and not data.rstrip().endswith(b"%%EOF") \
            and _ENCRYPT_REF_RE.search(data[-4096:]):
        # Truncated download (no final %%EOF) whose tail mentions
        # /Encrypt: the anchored trailer parse may have lost the
        # /Encrypt entry with the cut-off dict (classic OR xref-stream
        # flavor) — refuse loudly rather than flow ciphertext into
        # extraction. Complete files never take this branch, so the
        # anchoring that protects content-text mentions still holds.
        raise ValueError("encrypted PDF (truncated trailer)")
    if _heads_encrypted(heads):
        # Standard security handler, tried with empty user/owner
        # passwords (the reference's pypdf path opens those the same
        # way). Genuinely locked or non-standard files still fail
        # loudly into the parse-fail sentinel — never garbled output.
        crypt = _build_decryptor(data, heads)
        if crypt is None:
            raise ValueError("encrypted PDF (password or unsupported)")
    xref_objs: dict[int, bytes] | None
    try:
        xref_objs = _xref_objects(data, crypt)
    except Exception:
        xref_objs = None
    # The xref path must actually reach a page tree to be trusted —
    # otherwise (damaged offsets, truncated tables) fall back to the scan.
    if xref_objs and any(
            re.search(rb"/Type\s*/(Page|Pages)\b", b)
            for b in xref_objs.values()):
        xref_pages, tree_missing = _pages_from_objs(xref_objs)
        if not tree_missing and not any(u for _, _, u in xref_pages):
            # Structurally complete: every page-tree kid and every page's
            # /Contents reference resolved. A textless result here is
            # genuine (image-only/scanned pages) — do NOT run the
            # recovery scan, which could both double the parse cost and
            # attribute embedded-attachment bytes as phantom text.
            return "\f".join(lay for _, lay, _ in xref_pages)
        # A parseable xref can still carry stale offsets (bytes inserted
        # by an edit without regenerating entries): affected objects are
        # missing from the xref map — possibly only SOME pages. The
        # `N G obj` scan survives that kind of mild corruption. Merge
        # PER PAGE so intact pages keep the xref's (freed-object-safe)
        # text and only the stale ones adopt the scan's recovery.
        scan_pages, _ = _pages_from_objs(_scan_objects(data, crypt))
        if tree_missing and len(scan_pages) > len(xref_pages):
            # the page tree itself lost members: the scan's walk carries
            # the full page order — prefer xref's version per page where
            # it resolved cleanly
            xref_by_id = {n: (lay, u) for n, lay, u in xref_pages}
            out = []
            for n, lay, _ in scan_pages:
                alt = xref_by_id.get(n)
                if alt and alt[1] == 0 and len(alt[0]) >= len(lay):
                    lay = alt[0]
                out.append(lay)
            return "\f".join(out)
        scan_by_id = {n: lay for n, lay, _ in scan_pages}
        out = []
        for n, lay, u in xref_pages:
            alt = scan_by_id.get(n)
            if u and alt is not None and len(alt) > len(lay):
                lay = alt  # stale /Contents: adopt the scan's recovery
            out.append(lay)
        return "\f".join(out)
    pages, _ = _pages_from_objs(_scan_objects(data, crypt))
    return "\f".join(lay for _, lay, _ in pages)


def _pages_from_objs(
        objs: dict[int, bytes]) -> tuple[list[tuple[int, str, int]], int]:
    """Page-tree walk + content-stream extraction over a resolved object
    map (from either the xref path or the recovery scan). Returns
    ``([(page_obj_num, page_layout, unresolved_refs)], missing_kids)``
    where ``unresolved_refs`` counts /Contents references to objects
    ABSENT from the map and ``missing_kids`` counts page-tree /Kids
    references to absent objects — the caller's staleness signals.
    Objects that are present but carry no readable stream (unsupported
    filter, image-only page) do NOT count: that is a decode limitation,
    not a stale offset."""

    def stream_of(body: bytes) -> bytes | None:
        return _stream_of(body, objs)

    # Page order: walk /Kids arrays of /Type /Pages nodes (document
    # order), falling back to file-appearance order of /Type /Page objects.
    page_ids: list[int] = []
    missing_kids = 0

    def walk(num: int, depth: int = 0) -> None:
        nonlocal missing_kids
        if depth > 64:
            return
        if num not in objs:
            missing_kids += 1
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

    pages: list[tuple[int, str, int]] = []
    cmap_cache: dict[int, tuple[int, dict[int, str]] | None] = {}
    for pid in page_ids:
        body = objs[pid]
        contents = _dict_value(body, b"Contents") or b""
        streams: list[bytes] = []
        unresolved = 0

        def add_ref(ref: int, depth: int = 0) -> None:
            nonlocal unresolved
            if ref not in objs:
                unresolved += 1  # stale offset: object absent from map
                return
            s = stream_of(objs[ref])
            if s is not None:
                streams.append(s)
            elif depth == 0 and b"stream" not in objs[ref]:
                # legal indirection: /Contents → array OBJECT of refs
                for rr in _REF_RE.finditer(objs[ref]):
                    add_ref(int(rr.group(1)), 1)

        for r in _REF_RE.finditer(contents):
            add_ref(int(r.group(1)))
        if not streams:  # inline content stream on the page object itself
            s = stream_of(body)
            if s is not None:
                streams.append(s)
        try:
            fonts = _font_cmaps(body, objs, cmap_cache)
        except Exception:
            fonts = {}  # malformed resources never cost the page text
        lines: list[str] = []
        # A /Contents array is ONE logical stream (ISO 32000-1 §7.8.2) —
        # producers split it at arbitrary points, even mid-BT — so text
        # state (Tf font selection, tx/ty, leading) must carry across
        # the parts: join before one parse.
        try:
            runs = _content_runs(b"\n".join(streams), fonts)
        except Exception:
            runs = []  # a malformed stream degrades only this page
        for y, x, text in runs:
            # \f too: layout pages are form-feed-delimited, so a form
            # feed inside a shown string would split phantom pages
            clean = (text.replace("\n", " ").replace("\r", " ")
                     .replace("\f", " "))
            lines.append(f"@{-y:g},{x:g}:{clean}")
        pages.append((pid, "\n".join(lines), unresolved))
    return pages, missing_kids
