"""From-scratch ciphers + the PDF standard security handler's key
derivation (public algorithms: FIPS-197 AES, the classic RC4 stream
cipher, ISO 32000-1 §7.6.3 / 32000-2 §7.6.4 password algorithms).

No crypto library ships in this container, and the reference's pypdf
path transparently opens the very common "owner-locked, blank user
password" PDFs — so the primitives are implemented here from the
public specifications. AES S-boxes are *generated* (GF(2^8) inverse +
affine transform) rather than pasted as literal tables; test vectors
from FIPS-197 appendix C pin the implementation.

Used by pdfkit for /Encrypt /Filter /Standard documents:
  - R2/R3 and R4 /V2 crypt filters: RC4 (40-128 bit)
  - R4 /AESV2: AES-128-CBC (16-byte IV prefix, PKCS#7)
  - R6 /AESV3: AES-256-CBC, ISO 32000-2 Algorithm 2.A/2.B derivation
"""

from __future__ import annotations

import hashlib
import struct

# -- RC4 ----------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = byte ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# -- AES (FIPS-197) -----------------------------------------------------

def _generate_sbox() -> tuple[bytes, bytes]:
    """Forward and inverse S-box from first principles: multiplicative
    inverse in GF(2^8) (Rijndael polynomial 0x11B) + the affine map."""
    # discrete log tables via generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for v in range(256):
        inv = 0 if v == 0 else exp[255 - log[v]]
        b = inv
        r = inv
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            r ^= b
        sbox[v] = r ^ 0x63
    inv_sbox = bytearray(256)
    for v, s in enumerate(sbox):
        inv_sbox[s] = v
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _generate_sbox()


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


# MixColumns coefficients precomputed as 256-entry tables at import —
# the per-byte _gmul loop dominates pure-Python AES cost otherwise
# (measured: ~10x on the R6 Algorithm-2.B derivation)
_MUL = {c: bytes(_gmul(x, c) for x in range(256))
        for c in (1, 2, 3, 9, 11, 13, 14)}


def _expand_key(key: bytes) -> list[bytes]:
    """Key schedule → list of 16-byte round keys (11 for AES-128,
    15 for AES-256)."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 16 or 32 bytes")
    nr = nk + 6
    words = [key[4 * i:4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ rcon, t[1], t[2], t[3]])
            rcon = _xtime(rcon)
        elif nk == 8 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r:4 * r + 4]) for r in range(nr + 1)]


def _add_round_key(state: bytearray, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


# state is column-major (FIPS-197): byte index = 4*col + row

def _shift_rows(s: bytearray, inv: bool = False) -> None:
    for row in range(1, 4):
        picks = [(4 * ((col + (-row if inv else row)) % 4)) + row
                 for col in range(4)]
        vals = [s[p] for p in picks]
        for col in range(4):
            s[4 * col + row] = vals[col]


def _mix_columns(s: bytearray, inv: bool = False) -> None:
    m = ((14, 11, 13, 9) if inv else (2, 3, 1, 1))
    t0, t1, t2, t3 = (_MUL[m[0]], _MUL[m[1]], _MUL[m[2]], _MUL[m[3]])
    for c in range(4):
        a0, a1, a2, a3 = s[4 * c:4 * c + 4]
        s[4 * c] = t0[a0] ^ t1[a1] ^ t2[a2] ^ t3[a3]
        s[4 * c + 1] = t3[a0] ^ t0[a1] ^ t1[a2] ^ t2[a3]
        s[4 * c + 2] = t2[a0] ^ t3[a1] ^ t0[a2] ^ t1[a3]
        s[4 * c + 3] = t1[a0] ^ t2[a1] ^ t3[a2] ^ t0[a3]


def _encrypt_block(rks: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_round_key(s, rks[0])
    for rnd in range(1, len(rks)):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        _shift_rows(s)
        if rnd != len(rks) - 1:
            _mix_columns(s)
        _add_round_key(s, rks[rnd])
    return bytes(s)


def _decrypt_block(rks: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_round_key(s, rks[-1])
    for rnd in range(len(rks) - 2, -1, -1):
        _shift_rows(s, inv=True)
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
        _add_round_key(s, rks[rnd])
        if rnd != 0:
            _mix_columns(s, inv=True)
    return bytes(s)


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    return _encrypt_block(_expand_key(key), block)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    return _decrypt_block(_expand_key(key), block)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                    strip_padding: bool = True) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC data not a block multiple")
    rks = _expand_key(key)  # one key schedule for the whole message
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        dec = _decrypt_block(rks, blk)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    if strip_padding and out:
        pad = out[-1]
        if not 1 <= pad <= 16 or len(out) < pad:
            raise ValueError("bad CBC padding")
        del out[-pad:]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                    add_padding: bool = True) -> bytes:
    if add_padding:
        pad = 16 - (len(data) % 16)
        data = data + bytes([pad]) * pad
    elif len(data) % 16:
        raise ValueError("CBC data not a block multiple")
    rks = _expand_key(key)  # one key schedule for the whole message
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        enc = _encrypt_block(rks, blk)
        out += enc
        prev = enc
    return bytes(out)


# -- PDF standard security handler (ISO 32000-1 §7.6.3) -----------------

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_key_r2_r4(password: bytes, o: bytes, p: int, id0: bytes,
                      r: int, length_bits: int,
                      encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: file encryption key from a (user) password."""
    n = 5 if r == 2 else length_bits // 8
    h = hashlib.md5(_pad_password(password) + o[:32]
                    + struct.pack("<i", p) + id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o_value(owner_pw: bytes, user_pw: bytes, r: int,
                    length_bits: int) -> bytes:
    """Algorithm 3: the /O entry (needed to BUILD fixture files)."""
    n = 5 if r == 2 else length_bits // 8
    key = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u_value(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U entry for a derived key."""
    if r == 2:
        return rc4(key, PAD)
    u = hashlib.md5(PAD + id0).digest()
    u = rc4(key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # arbitrary 16-byte pad per spec


def authenticate_user_password(password: bytes, o: bytes, u: bytes,
                               p: int, id0: bytes, r: int,
                               length_bits: int,
                               encrypt_metadata: bool = True
                               ) -> bytes | None:
    """Algorithms 6/4/5: derived key iff `password` validates against
    /U, else None."""
    key = compute_key_r2_r4(password, o, p, id0, r, length_bits,
                            encrypt_metadata)
    expect = compute_u_value(key, id0, r)
    got = u[:32] if r == 2 else u[:16]
    want = expect[:32] if r == 2 else expect[:16]
    return key if got == want else None


def authenticate_owner_password(password: bytes, o: bytes, u: bytes,
                                p: int, id0: bytes, r: int,
                                length_bits: int,
                                encrypt_metadata: bool = True
                                ) -> bytes | None:
    """Algorithm 7: RC4-unwrap /O with the owner key to recover the
    padded user password, then authenticate that."""
    n = 5 if r == 2 else length_bits // 8
    key = hashlib.md5(_pad_password(password)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    user_padded = o[:32]
    if r == 2:
        user_padded = rc4(key, user_padded)
    else:
        for i in range(19, -1, -1):
            user_padded = rc4(bytes(b ^ i for b in key), user_padded)
    return authenticate_user_password(user_padded, o, u, p, id0, r,
                                      length_bits, encrypt_metadata)


def object_key(file_key: bytes, num: int, gen: int,
               aes: bool = False) -> bytes:
    """Algorithm 1: the per-object RC4/AES-128 key (R ≤ 4)."""
    h = hashlib.md5(file_key + struct.pack("<i", num)[:3]
                    + struct.pack("<i", gen)[:2]
                    + (b"sAlT" if aes else b"")).digest()
    return h[:min(len(file_key) + 5, 16)]


# -- ISO 32000-2 (PDF 2.0) R6 / AES-256 ---------------------------------

def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B: the iterated SHA-256/384/512 + AES-128-CBC hash."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, add_padding=False)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def authenticate_r6(password: bytes, o: bytes, u: bytes, oe: bytes,
                    ue: bytes, r: int = 6) -> bytes | None:
    """R6 (and deprecated Adobe R5) user+owner authentication
    (Algorithms 2.A / 8 / 9): returns the 32-byte file key, or None.
    /U and /O are 48 bytes: hash(32) + validation salt(8) + key
    salt(8). R5 uses a single SHA-256 instead of the 2.B iteration."""
    def h(pw: bytes, salt: bytes, udata: bytes) -> bytes:
        if r == 5:
            return hashlib.sha256(pw + salt + udata).digest()
        return _hash_2b(pw, salt, udata)

    pw = password[:127]
    # user password check
    if h(pw, u[32:40], b"") == u[:32]:
        ik = h(pw, u[40:48], b"")
        return aes_cbc_decrypt(ik, b"\x00" * 16, ue[:32],
                               strip_padding=False)
    # owner password check (udata = full 48-byte /U)
    if h(pw, o[32:40], u[:48]) == o[:32]:
        ik = h(pw, o[40:48], u[:48])
        return aes_cbc_decrypt(ik, b"\x00" * 16, oe[:32],
                               strip_padding=False)
    return None
