#!/usr/bin/env python
"""Real-PDF-bytes extraction throughput: documents whose pdf spans carry
actual PDF files (xref table, flate-compressed content streams, a
/ToUnicode CMap page and a plain page) through the same digest-mode
extraction path bench.py times for the synthetic corpus. This is the
wall number for the from-scratch PDF reader — the synthetic headline
never enters it (synthetic layout spans fail the %PDF- sniff).

Corpus: N docs cycling over K distinct 2-page PDFs built byte-by-byte
here (same fixture technique as tests/test_pdfkit_real.py); page one
shows CID-coded text through a ToUnicode CMap, page two shows plain
flate-compressed text, so xref resolution, stream decode, font
resolution, and reading order are all on the measured path.

Prints ONE JSON line mirroring bench.py's format; timing discipline is
shared (min-of-N, per-run [wall, steal, foreign_busy, idle_ok] tuples).

Every ENC_EVERY-th template (default 5 -> 20% of docs) is additionally
RC4-R3-encrypted with a blank user password, putting the standard
security handler's key derivation + stream decryption on the measured
path alongside plaintext parsing.

Env: SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_REALPDF_DOCS (default 20000),
     SPARK_GRAFT_REALPDF_TEMPLATES (default 50),
     SPARK_GRAFT_REALPDF_ENC_EVERY (default 5; 0 = no encrypted docs).
"""

from __future__ import annotations

import json
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BUSY_CLEAN, timed  # noqa: E402
from bench_scaling import STEAL_CLEAN  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_REALPDF_DOCS", "20000"))
K_TPL = int(os.environ.get("SPARK_GRAFT_REALPDF_TEMPLATES", "50"))
ENC_EVERY = int(os.environ.get("SPARK_GRAFT_REALPDF_ENC_EVERY", "5"))

_CMAP = (b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
         b"3 beginbfchar\n<0001> <0052>\n<0002> <0065>\n<0003> <0061>\n"
         b"endbfchar\n"  # R e a
         b"1 beginbfrange\n<0010> <0019> <0030>\nendbfrange\n")  # 0-9


def _assemble(objs: list[tuple[int, bytes]],
              trailer_extra: bytes = b"") -> bytes:
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


_ENC_ID0 = bytes(range(16))
_ENC_P = -44


def _encrypt_setup():
    """(encrypt-dict obj body, enc(num, data)) — RC4 /V 2 /R 3, blank
    user password, owner password set (the common owner-locked shape)."""
    from extract_ocr_spark.kernels import cryptokit as ck

    o = ck.compute_o_value(b"owner", b"", 3, 128)
    key = ck.compute_key_r2_r4(b"", o, _ENC_P, _ENC_ID0, 3, 128)
    u = ck.compute_u_value(key, _ENC_ID0, 3)
    ed = (b"<< /Filter /Standard /V 2 /R 3 /Length 128 /O <"
          + o.hex().encode() + b"> /U <" + u.hex().encode()
          + b"> /P " + str(_ENC_P).encode() + b" >>")

    def enc(num: int, data: bytes) -> bytes:
        return ck.rc4(ck.object_key(key, num, 0), data)

    return ed, enc


def _stream_obj(num: int, content: bytes, extra: bytes = b"") -> tuple:
    data = zlib.compress(content)
    return (num, b"<< /Filter /FlateDecode " + extra + b"/Length "
            + str(len(data)).encode() + b" >>\nstream\n" + data
            + b"\nendstream")


def _template(k: int, encrypt: bool = False) -> str:
    """A 2-page PDF: page 1 = CID codes through the CMap font (digits of
    ``k`` via the bfrange), page 2 = 15 plain text lines. With
    ``encrypt``, all stream payloads are RC4-encrypted (blank user
    password) and the trailer carries /Encrypt + /ID."""
    cid = b"".join((0x10 + int(d)).to_bytes(2, "big") for d in str(k))
    hexstr = b"<000100020003" + cid.hex().encode() + b">"
    p1 = (b"BT /F1 12 Tf 72 700 Td " + hexstr + b" Tj ET")
    lines = b" ".join(
        b"1 0 0 1 72 %d Tm (real pdf doc %d line %d) Tj"
        % (700 - 14 * j, k, j) for j in range(15))
    p2 = b"BT " + lines + b" ET"
    res = b" /Resources << /Font << /F1 7 0 R >> >>"
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 5 0 R" + res + b" >>"),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 6 0 R >>"),
        _stream_obj(5, p1),
        _stream_obj(6, p2),
        (7, b"<< /Type /Font /Subtype /Type0 /ToUnicode 8 0 R >>"),
        _stream_obj(8, _CMAP),
    ]
    if not encrypt:
        return _assemble(objs).decode("latin-1")
    ed, enc = _encrypt_setup()
    sealed = []
    for num, body in objs:
        m = body.find(b"stream\n")
        if m != -1:
            head, payload = body[:m], body[m + 7:-len(b"\nendstream")]
            payload = enc(num, payload)  # RC4: length unchanged
            body = head + b"stream\n" + payload + b"\nendstream"
        sealed.append((num, body))
    sealed.append((9, ed))
    extra = (b"/Encrypt 9 0 R /ID [<" + _ENC_ID0.hex().encode()
             + b"> <" + _ENC_ID0.hex().encode() + b">] ")
    return _assemble(sealed, trailer_extra=extra).decode("latin-1")


def main() -> None:
    from pyspark.sql import functions as F

    from extract_ocr_spark.pipeline import extract_digest_df
    from extract_ocr_spark.session import get_spark
    from bench import force_extraction

    spark = get_spark(f"local[{CPUS}]", app_name="bench_realpdf",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    n_enc = sum(1 for k in range(K_TPL)
                if ENC_EVERY and k % ENC_EVERY == 0)
    tdf = spark.createDataFrame(
        [(k, _template(k, encrypt=bool(ENC_EVERY and k % ENC_EVERY == 0)))
         for k in range(K_TPL)], "tid int, pdf string")
    docs = (
        spark.range(N_DOCS)
        .select(F.col("id").cast("string").alias("doc_id"),
                (F.col("id") % K_TPL).cast("int").alias("tid"))
        .join(F.broadcast(tdf), "tid")
        .select("doc_id", F.array(F.struct(
            F.lit("pdf").alias("kind"),
            F.col("pdf").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"))).alias("spans"))
        .repartition(4 * max(8, CPUS))
        .persist())
    n = docs.count()

    parts = 4 * max(8, CPUS)
    force_extraction(extract_digest_df(docs, partitions=parts))  # warm-up
    best, runs = timed(
        lambda: force_extraction(extract_digest_df(docs, partitions=parts)))

    print(json.dumps({
        "metric": "realpdf_extraction_wall_sec",
        "value": round(best, 3),
        "unit": "sec",
        "queries": {"extract_realpdf": round(best, 3)},
        "docs": n,
        "pages": 2 * n,
        "docs_per_sec": round(n / best, 1),
        "templates": K_TPL,
        "encrypted_templates": n_enc,
        "encrypted_fraction": round(n_enc / K_TPL, 3),
        "runs_sec_steal": {"extract_realpdf": runs},
        "steal_clean_threshold": STEAL_CLEAN,
        "busy_clean_threshold": BUSY_CLEAN,
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
