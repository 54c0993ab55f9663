"""Encrypted-PDF extraction: the standard security handler with empty
user/owner passwords (ISO 32000-1 §7.6.3 / 32000-2 §7.6.4) — the
ubiquitous "owner-locked, blank user password" documents the
reference's pypdf path opens transparently (crawl.py:98-124 passes no
password). Fixtures are built with the same from-scratch cipher
primitives, which are themselves pinned by published FIPS-197 / RC4
test vectors in test_cryptokit_vectors below — the decrypt side is
validated against those vectors, not merely against our own encryptor.
"""

from __future__ import annotations

import zlib

from extract_ocr_spark.kernels import cryptokit as ck
from extract_ocr_spark.kernels.pdfkit import (
    PARSE_FAIL_SENTINEL,
    extract_pdf_text,
)

from test_pdfkit_real import _as_text, _assemble

_ID0 = bytes(range(16))
_ID_HEX = _ID0.hex().encode()
_P = -44


def test_cryptokit_vectors():
    """Published vectors pin the primitives: FIPS-197 appendix C block
    vectors, the classic RC4 'Plaintext'/'pedia' vectors."""
    key128 = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert ck.aes_encrypt_block(key128, pt).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert ck.aes_decrypt_block(
        key128, bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")) == pt
    key256 = bytes(range(32))
    assert ck.aes_encrypt_block(key256, pt).hex() == \
        "8ea2b7ca516745bfeafc49904b496089"
    assert ck.aes_decrypt_block(key256, ck.aes_encrypt_block(key256, pt)) \
        == pt
    assert ck.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert ck.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    data = b"cbc round trip, uneven length."
    iv = bytes(range(16))
    assert ck.aes_cbc_decrypt(
        key128, iv, ck.aes_cbc_encrypt(key128, iv, data)) == data


def _hex_str(b: bytes) -> bytes:
    return b"<" + b.hex().encode() + b">"


def _rc4_variant(r: int, v: int, bits: int, user_pw: bytes = b"",
                 owner_pw: bytes = b"owner"):
    """(encrypt-dict bytes, enc(num, gen, data)) for an RC4 revision."""
    o = ck.compute_o_value(owner_pw, user_pw, r, bits)
    key = ck.compute_key_r2_r4(user_pw, o, _P, _ID0, r, bits)
    u = ck.compute_u_value(key, _ID0, r)
    ed = (b"<< /Filter /Standard /V " + str(v).encode()
          + b" /R " + str(r).encode()
          + b" /Length " + str(bits).encode()
          + b" /O " + _hex_str(o) + b" /U " + _hex_str(u)
          + b" /P " + str(_P).encode() + b" >>")

    def enc(num: int, gen: int, data: bytes) -> bytes:
        return ck.rc4(ck.object_key(key, num, gen), data)

    return ed, enc


def _aesv2_variant(user_pw: bytes = b"", owner_pw: bytes = b"owner"):
    o = ck.compute_o_value(owner_pw, user_pw, 4, 128)
    key = ck.compute_key_r2_r4(user_pw, o, _P, _ID0, 4, 128)
    u = ck.compute_u_value(key, _ID0, 3)  # R4 uses the R3 U algorithm
    ed = (b"<< /Filter /Standard /V 4 /R 4 /Length 128"
          b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
          b" /StmF /StdCF /StrF /StdCF"
          b" /O " + _hex_str(o) + b" /U " + _hex_str(u)
          + b" /P " + str(_P).encode() + b" >>")

    def enc(num: int, gen: int, data: bytes) -> bytes:
        ok = ck.object_key(key, num, gen, aes=True)
        iv = bytes((i * 7 + 3) & 0xFF for i in range(16))
        return iv + ck.aes_cbc_encrypt(ok, iv, data)

    return ed, enc


def _r6_variant(user_pw: bytes = b"", owner_pw: bytes = b"opw"):
    fk = bytes(range(32))[::-1]  # the file key UE/OE wrap
    u = ck._hash_2b(user_pw, b"VALSALT1", b"") + b"VALSALT1KEYSALT2"
    ue = ck.aes_cbc_encrypt(ck._hash_2b(user_pw, b"KEYSALT2", b""),
                            b"\x00" * 16, fk, add_padding=False)
    o = ck._hash_2b(owner_pw, b"OVALSLT1", u) + b"OVALSLT1OKEYSLT2"
    oe = ck.aes_cbc_encrypt(ck._hash_2b(owner_pw, b"OKEYSLT2", u),
                            b"\x00" * 16, fk, add_padding=False)
    ed = (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
          b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
          b" /StmF /StdCF /StrF /StdCF"
          b" /O " + _hex_str(o) + b" /U " + _hex_str(u)
          + b" /OE " + _hex_str(oe) + b" /UE " + _hex_str(ue)
          + b" /P " + str(_P).encode() + b" >>")

    def enc(num: int, gen: int, data: bytes) -> bytes:
        iv = bytes((i * 11 + 5) & 0xFF for i in range(16))
        return iv + ck.aes_cbc_encrypt(fk, iv, data)

    return ed, enc


def _encrypted_pdf(ed: bytes, enc, content: bytes) -> bytes:
    payload = enc(4, 0, zlib.compress(content))
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        (4, b"<< /Filter /FlateDecode /Length "
            + str(len(payload)).encode() + b" >>\nstream\n" + payload
            + b"\nendstream"),
        (5, ed),  # the encrypt dict itself is never encrypted
    ]
    extra = (b"/Encrypt 5 0 R /ID [<" + _ID_HEX + b"> <" + _ID_HEX
             + b">] ")
    return _assemble(objs, trailer_extra=extra)


CONTENT = b"BT 72 700 Td (blank user password text) Tj ET"


def test_rc4_r3_128_empty_user_password():
    ed, enc = _rc4_variant(r=3, v=2, bits=128)
    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == "blank user password text\n"


def test_rc4_r2_40bit_empty_user_password():
    ed, enc = _rc4_variant(r=2, v=1, bits=40)
    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == "blank user password text\n"


def test_aesv2_r4_empty_user_password():
    ed, enc = _aesv2_variant()
    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == "blank user password text\n"


def test_aes256_r6_empty_user_password():
    ed, enc = _r6_variant()
    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == "blank user password text\n"


def test_empty_owner_password_opens_user_locked_file():
    """Algorithm 7: when the USER password is set but the owner password
    is empty, the owner path unwraps /O and still opens the file."""
    ed, enc = _rc4_variant(r=3, v=2, bits=128,
                           user_pw=b"userpw", owner_pw=b"")
    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == "blank user password text\n"


def test_truly_locked_file_refuses_loudly():
    """Both passwords set → neither empty-password attempt validates →
    parse-fail sentinel, never RC4 ciphertext soup as 'text'."""
    ed, enc = _rc4_variant(r=3, v=2, bits=128,
                           user_pw=b"realpw", owner_pw=b"alsoset")
    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == PARSE_FAIL_SENTINEL
    assert "blank user password" not in got


def test_identity_stmf_passthrough():
    """/StmF /Identity: streams are NOT encrypted even though the file
    carries /Encrypt (strings-only encryption)."""
    ed = (b"<< /Filter /Standard /V 4 /R 4 /Length 128"
          b" /CF << /StdCF << /CFM /AESV2 >> >> /StmF /Identity"
          b" /O <" + b"00" * 32 + b"> /U <" + b"00" * 32 + b">"
          b" /P " + str(_P).encode() + b" >>")
    got = extract_pdf_text(_as_text(
        _encrypted_pdf(ed, lambda n, g, d: d, CONTENT)))
    assert got == "blank user password text\n"


def test_encrypted_objstm_via_xref_stream():
    """Modern shape: xref STREAM file (no classic trailer), page tree
    packed in an RC4-encrypted ObjStm, RC4-encrypted content stream.
    /Encrypt + /ID live in the XRef stream dict; the XRef stream itself
    is never encrypted; packed objects come out of the decrypted
    container in plaintext (no double decryption)."""
    ed, enc = _rc4_variant(r=3, v=2, bits=128)

    bodies = {
        2: b"<< /Type /Catalog /Pages 3 0 R >>",
        3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: b"<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>",
    }
    header = b""
    payload = b""
    for num, b in bodies.items():
        header += f"{num} {len(payload)} ".encode()
        payload += b + b" "
    objstm_data = enc(1, 0, zlib.compress(header + payload))
    content = b"BT 72 700 Td (encrypted objstm resolved) Tj ET"
    content_data = enc(5, 0, content)

    out = bytearray(b"%PDF-1.6\n")
    off1 = len(out)
    out += (b"1 0 obj\n<< /Type /ObjStm /Filter /FlateDecode /N "
            + str(len(bodies)).encode() + b" /First "
            + str(len(header)).encode() + b" /Length "
            + str(len(objstm_data)).encode() + b" >>\nstream\n"
            + objstm_data + b"\nendstream\nendobj\n")
    off5 = len(out)
    out += (b"5 0 obj\n<< /Length " + str(len(content_data)).encode()
            + b" >>\nstream\n" + content_data + b"\nendstream\nendobj\n")
    off7 = len(out)
    out += b"7 0 obj\n" + ed + b"\nendobj\n"
    off6 = len(out)

    rows = [
        (0, 0, 0xFF),       # 0: free
        (1, off1, 0),       # 1: the ObjStm itself
        (2, 1, 0),          # 2-4: packed in ObjStm 1
        (2, 1, 1),
        (2, 1, 2),
        (1, off5, 0),       # 5: encrypted content stream
        (1, off6, 0),       # 6: this xref stream
        (1, off7, 0),       # 7: the encrypt dict (plaintext)
    ]
    xref_data = zlib.compress(b"".join(
        t.to_bytes(1, "big") + f2.to_bytes(3, "big") + f3.to_bytes(1, "big")
        for t, f2, f3 in rows))
    out += (b"6 0 obj\n<< /Type /XRef /Size 8 /Index [0 8] /W [1 3 1] "
            b"/Root 2 0 R /Encrypt 7 0 R /ID [<" + _ID_HEX + b"> <"
            + _ID_HEX + b">] /Filter /FlateDecode /Length "
            + str(len(xref_data)).encode() + b" >>\nstream\n" + xref_data
            + b"\nendstream\nendobj\n")
    out += b"startxref\n" + str(off6).encode() + b"\n%%EOF\n"

    got = extract_pdf_text(_as_text(bytes(out)))
    assert got == "encrypted objstm resolved\n"


def test_v5_stmf_identity_streams_stay_plaintext():
    """V5 files can also declare /StmF /Identity (strings-only
    encryption): streams must pass through untouched, not be
    AES-'decrypted' into garbage."""
    ed = (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
          b" /CF << /StdCF << /CFM /AESV3 >> >> /StmF /Identity"
          b" /O <" + b"00" * 48 + b"> /U <" + b"00" * 48 + b">"
          b" /OE <" + b"00" * 32 + b"> /UE <" + b"00" * 32 + b">"
          b" /P " + str(_P).encode() + b" >>")
    got = extract_pdf_text(_as_text(
        _encrypted_pdf(ed, lambda n, g, d: d, CONTENT)))
    assert got == "blank user password text\n"


def test_v4_missing_cfm_defaults_to_none_not_rc4():
    """A named crypt filter whose dict omits /CFM defaults to /None
    (spec) = data NOT encrypted — RC4-'decrypting' plaintext streams
    would silently destroy every page."""
    ed = (b"<< /Filter /Standard /V 4 /R 4 /Length 128"
          b" /CF << /StdCF << /AuthEvent /DocOpen >> >> /StmF /StdCF"
          b" /O <" + b"00" * 32 + b"> /U <" + b"00" * 32 + b">"
          b" /P " + str(_P).encode() + b" >>")
    got = extract_pdf_text(_as_text(
        _encrypted_pdf(ed, lambda n, g, d: d, CONTENT)))
    assert got == "blank user password text\n"


def test_aesv2_without_length_still_derives_128():
    """/AESV2 is fixed 128-bit by definition: a file with no /Length
    anywhere must not fall back to a 40-bit key (which would fail /U
    validation and falsely refuse a blank-password file)."""
    o = ck.compute_o_value(b"owner", b"", 4, 128)
    key = ck.compute_key_r2_r4(b"", o, _P, _ID0, 4, 128)
    u = ck.compute_u_value(key, _ID0, 3)
    ed = (b"<< /Filter /Standard /V 4 /R 4"
          b" /CF << /StdCF << /CFM /AESV2 >> >> /StmF /StdCF"
          b" /O " + _hex_str(o) + b" /U " + _hex_str(u)
          + b" /P " + str(_P).encode() + b" >>")

    def enc(num, gen, data):
        ok = ck.object_key(key, num, gen, aes=True)
        iv = bytes((i * 7 + 3) & 0xFF for i in range(16))
        return iv + ck.aes_cbc_encrypt(ok, iv, data)

    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == "blank user password text\n"


def test_binary_o_u_strings_cannot_shadow_scalar_keys():
    """/O and /U written as LITERAL strings whose random bytes contain
    key-shaped sequences (' /V 9', ' /P ') placed BEFORE the real /V:
    scalar parsing must skip string interiors or it reads V=9 and
    falsely refuses a blank-password file."""
    o = ck.compute_o_value(b"owner", b"", 3, 128)
    key = ck.compute_key_r2_r4(b"", o, _P, _ID0, 3, 128)
    u = ck.compute_u_value(key, _ID0, 3)

    def lit(b: bytes) -> bytes:
        out = bytearray(b"(")
        for byte in b:
            if byte in b"()\\\r":
                out += b"\\" + bytes([byte])
            else:
                out.append(byte)
        return bytes(out) + b")"

    decoy = lit(b" /V 9 /P 1 /R 9 " + o)  # key-shaped bytes INSIDE
    ed = (b"<< /Filter /Standard /Decoy " + decoy
          + b" /V 2 /R 3 /Length 128"
          b" /O " + lit(o) + b" /U " + lit(u[:32])
          + b" /P " + str(_P).encode() + b" >>")

    def enc(num, gen, data):
        return ck.rc4(ck.object_key(key, num, gen), data)

    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == "blank user password text\n"


def test_truncated_encrypted_trailer_still_refuses():
    """A partial download cut before the trailer's '>>' must still trip
    the encryption gate (raw-window fallback) and refuse loudly — not
    proceed and emit ciphertext as text."""
    ed, enc = _rc4_variant(r=3, v=2, bits=128,
                           user_pw=b"locked", owner_pw=b"locked")
    pdf = _encrypted_pdf(ed, enc, CONTENT)
    cut = pdf[:pdf.rfind(b">>")]  # drop the trailer close + startxref
    assert extract_pdf_text(_as_text(cut)) == PARSE_FAIL_SENTINEL


def test_cf_dict_first_does_not_shadow_top_level_scalars():
    """Producers emitting keys alphabetically put /CF (with its nested
    /CFM /V2 and per-filter /Length 16) BEFORE /V and /Length: the
    top-level scalar parse must not read the nested values."""
    o = ck.compute_o_value(b"owner", b"", 4, 128)
    key = ck.compute_key_r2_r4(b"", o, _P, _ID0, 4, 128)
    u = ck.compute_u_value(key, _ID0, 3)
    ed = (b"<< /CF << /StdCF << /CFM /V2 /Length 16 >> >>"
          b" /Filter /Standard"
          b" /Length 128"
          b" /O " + _hex_str(o) + b" /P " + str(_P).encode()
          + b" /R 4 /StmF /StdCF /U " + _hex_str(u) + b" /V 4 >>")

    def enc(num, gen, data):
        return ck.rc4(ck.object_key(key, num, gen), data)

    got = extract_pdf_text(_as_text(_encrypted_pdf(ed, enc, CONTENT)))
    assert got == "blank user password text\n"


def test_empty_id_array_yields_empty_id0():
    """/ID [] (or missing) must derive with id0=b'' — not adopt bytes
    from whatever token follows the array."""
    o = ck.compute_o_value(b"owner", b"", 3, 128)
    key = ck.compute_key_r2_r4(b"", o, _P, b"", 3, 128)  # id0 = b""
    u = ck.compute_u_value(key, b"", 3)
    ed = (b"<< /Filter /Standard /V 2 /R 3 /Length 128"
          b" /O " + _hex_str(o) + b" /U " + _hex_str(u)
          + b" /P " + str(_P).encode() + b" >>")

    def enc(num, gen, data):
        return ck.rc4(ck.object_key(key, num, gen), data)

    payload = enc(4, 0, zlib.compress(CONTENT))
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        (4, b"<< /Filter /FlateDecode /Length "
            + str(len(payload)).encode() + b" >>\nstream\n" + payload
            + b"\nendstream"),
        (5, ed),
    ]
    pdf = _assemble(objs, trailer_extra=b"/ID [] /Encrypt 5 0 R "
                    b"/Info (meta) ")
    assert extract_pdf_text(_as_text(pdf)) == "blank user password text\n"


def test_truncated_xref_stream_trailer_still_refuses():
    """xref-STREAM flavor of the truncation gate: the file is cut inside
    the XRef dict after /Encrypt but before the `stream` keyword, so no
    anchored head exists — the no-%%EOF backstop must refuse."""
    ed, enc = _rc4_variant(r=3, v=2, bits=128,
                           user_pw=b"locked", owner_pw=b"locked")
    out = bytearray(b"%PDF-1.6\n")
    payload = enc(5, 0, zlib.compress(CONTENT))
    out += (b"5 0 obj\n<< /Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n")
    out += (b"6 0 obj\n<< /Type /XRef /Size 8 /W [1 3 1] /Root 2 0 R "
            b"/Encrypt 7 0 R /ID [<" + _ID_HEX + b">")  # cut mid-dict
    assert extract_pdf_text(_as_text(bytes(out))) == PARSE_FAIL_SENTINEL
