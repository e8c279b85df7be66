"""Pure-stdlib PDF codec: writer + text extractor (zlib + re, no pypdf).

The reference's PDF surface is ``PdfMiner.predict(bytes) -> positioned words``
(/root/reference/deepdoctection/extern/pdftext.py and
utils/pdf_utils.py:121-227, which shells out to pdfplumber/poppler). This
module puts a REAL PDF codec on the in-sandbox oracle-checked path, the same
move as the stdlib PNG codec (operators/codecs.py:76-213):

- :func:`pdf_encode` writes genuine PDF 1.4 bytes — object table, page tree,
  FlateDecode content streams, classic xref + trailer — from positioned text
  runs. The content streams deliberately rotate across the text-showing
  operator surface (``Tj``, ``TJ`` arrays with kerning numbers, ``'`` with
  ``T*``/``TL``) and across positioning forms (``Td``, ``TD``, ``Tm``) so a
  round trip exercises the whole text machine, not one happy path.
- :func:`pdf_decode` parses PDF bytes back to per-page positioned runs:
  object scan, indirect-/Length resolution, FlateDecode, page-tree walk
  (/Root → /Pages → /Kids, recursive), and a content-stream tokenizer +
  text-object interpreter (BT/ET, Tf, TL, Td, TD, Tm, T*, Tj, TJ, ', ").
- :func:`pdf_page_text` flattens runs to reading-order plain text (y-down
  line sort, x within line) — the SerializerPdfDoc page-per-row contract.

Scope (declared, quarantine-on-miss like png_decode): classic xref AND
PDF 1.5 xref-stream documents (round 4: /Type /ObjStm compressed object
streams are inflated and their members parsed; the writer can emit the
same layout via ``pdf_encode(..., object_streams=True)`` — /XRef stream
with binary /W rows included), FlateDecode or plain streams, simple fonts
with latin-1-ish byte strings AND composite Type0/Identity-H CID fonts
whose /ToUnicode CMap is honored (bfchar + bfrange, UTF-16BE targets incl.
surrogate pairs; the writer emits the layout via ``pdf_encode(...,
cid_font=True)`` with a deliberately non-identity code assignment so the
CMap is load-bearing), AND the FULL standard-security-handler encryption
matrix with an empty user password — RC4-40 /R 2, RC4-128 /R 3, AES-128
/V 4 /R 4 /AESV2, and PDF 2.0 AES-256 /V 5 /R 6 /AESV3 (kernels/aes.py,
pinned to the FIPS-197 C.1 + C.3 vectors): R2-R4 derive the file key from
/O + /P + /ID and authenticate against /U with per-object keys; R6 runs
the Algorithm 2.B hardening hash, unwraps the file key from /UE, and
validates /Perms. The writer emits all four via ``pdf_encode(...,
encrypt_bits=40|128|256, cipher="rc4"|"aes")`` — the "owner-locked but
opens everywhere" shape. Out of scope → ValueError → the callers' row
quarantine turns it into an `error` column: non-empty user passwords and
Type0 fonts WITHOUT /ToUnicode (text unrecoverable without glyph tables).
"""

from __future__ import annotations

import functools
import hashlib
import re
import struct
import zlib

# ---------------------------------------------------------------------------
# standard security handler (PDF 32000-1 §7.6.3): RC4-40 (R2) / RC4-128 (R3)
# ---------------------------------------------------------------------------

# the spec's 32-byte password padding string (Table 3.2 / Algorithm 2 step a)
_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (the spec's symmetric cipher for V 1-2 handlers)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _std_key_OU(id0: bytes, revision: int, n: int,
                ) -> tuple[bytes, bytes, bytes]:
    """Empty-user/empty-owner standard handler: returns (file key, /O, /U).
    Algorithm 3 (O), Algorithm 2 (key), Algorithms 4/5 (U)."""
    oh = hashlib.md5(_PAD).digest()
    if revision >= 3:
        for _ in range(50):
            oh = hashlib.md5(oh[:n]).digest()
    o_entry = _rc4(oh[:n], _PAD)
    h = hashlib.md5(_PAD + o_entry + struct.pack("<i", -1) + id0).digest()
    if revision >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    if revision == 2:
        u_entry = _rc4(key, _PAD)
    else:
        u = _rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u_entry = u + b"\x00" * 16  # 16 arbitrary padding bytes per spec
    return key, o_entry, u_entry


@functools.lru_cache(maxsize=64)
def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """PDF 2.0 Algorithm 2.B (the R6 password-hardening KDF): an iterated
    SHA-256/384/512 chain keyed by AES-128-CBC rounds — ≥64 rounds, then
    stop when the last AES byte ≤ round-32. Deliberately expensive (that is
    its anti-brute-force job: ~2s in pure Python); lru_cached because a
    corpus written with process-constant salts re-derives the same hash for
    every document — the cache turns the per-doc cost into per-process."""
    from deepdoctection_spark.kernels.aes import cbc_encrypt_nopad

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt_nopad(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _r6_entries(id0: bytes) -> tuple[bytes, bytes, bytes, bytes, bytes, bytes]:
    """Empty-password R6 credential set → (file_key, U, UE, O, OE, Perms).
    The FILE KEY is per-document (sha256 of /ID[0]); the four salts are
    process constants (spec-legal — salts guard the password hash, and the
    password is empty) so Algorithm 2.B's multi-second hardening cost is
    paid once per process, not once per document.
    U/O = 2.B validation hash ‖ validation salt ‖ key salt (48 bytes);
    UE/OE = AES-256-CBC-nopad(intermediate key, iv=0, file key);
    Perms = AES-256-ECB(file key, P ‖ 0xFFFFFFFF ‖ 'T' ‖ 'adb' ‖ 4 bytes)."""
    from deepdoctection_spark.kernels.aes import cbc_encrypt_nopad, ecb_encrypt

    file_key = hashlib.sha256(b"filekey" + id0).digest()
    uvs, uks = b"ddsprkUV", b"ddsprkUK"
    ovs, oks = b"ddsprkOV", b"ddsprkOK"
    u_entry = _hash_2b(b"", uvs) + uvs + uks
    ue = cbc_encrypt_nopad(_hash_2b(b"", uks), bytes(16), file_key)
    o_entry = _hash_2b(b"", ovs, u_entry) + ovs + oks
    oe = cbc_encrypt_nopad(_hash_2b(b"", oks, u_entry), bytes(16), file_key)
    perms_plain = (struct.pack("<i", -1) + b"\xff\xff\xff\xff" + b"T"
                   + b"adb" + hashlib.sha256(b"rnd" + id0).digest()[:4])
    perms = ecb_encrypt(file_key, perms_plain)
    return file_key, u_entry, ue, o_entry, oe, perms


def _obj_key(key: bytes, num: int, gen: int = 0, aes: bool = False) -> bytes:
    """Algorithm 1: per-object key = MD5(file key + 3 LE bytes of the
    object number + 2 LE bytes of the generation [+ the AESV2 salt
    b'sAlT']), truncated to n+5 ≤ 16."""
    h = hashlib.md5(key + struct.pack("<i", num)[:3]
                    + struct.pack("<i", gen)[:2]
                    + (b"sAlT" if aes else b"")).digest()
    return h[:min(len(key) + 5, 16)]


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_ESC = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\",
        10: b"\\n", 13: b"\\r", 9: b"\\t", 8: b"\\b", 12: b"\\f"}


def _pdf_bytes_literal(bs: bytes) -> bytes:
    """Raw bytes → (…) literal PDF string token with escapes; bytes outside
    printable ASCII get octal escapes."""
    out = bytearray(b"(")
    for b in bs:
        esc = _ESC.get(b)
        if esc is not None:
            out += esc
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += b"\\%03o" % b
    out += b")"
    return bytes(out)


def _pdf_string(s: str) -> bytes:
    """Literal PDF string from text via latin-1 (chars outside latin-1 are
    replaced — the declared simple-font scope)."""
    return _pdf_bytes_literal(s.encode("latin-1", errors="replace"))


def _run_ops(i: int, x: float, y: float, size: float, text: str,
             enc=_pdf_string) -> bytes:
    """One text run, rotating operator forms by run index so every encoded
    page exercises Td/Tm/TD positioning and Tj/TJ/' showing. ``enc`` turns
    python text into a PDF string token (literal for simple fonts, 2-byte
    hex codes for the CID layout)."""
    form = i % 3
    if form == 0:  # absolute matrix + plain Tj
        return b"BT /F1 %.2f Tf 1 0 0 1 %.2f %.2f Tm %s Tj ET" % (
            size, x, y, enc(text))
    if form == 1:  # TD positioning + TJ array split with kerning numbers
        mid = max(1, len(text) // 2)
        return (b"BT /F1 %.2f Tf %.2f %.2f TD [%s -20 %s] TJ ET" % (
            size, x, y, enc(text[:mid]), enc(text[mid:])))
    # TL + Td one line up, then ' (T* + show) — the next-line-show operator
    return (b"BT /F1 %.2f Tf %.2f TL %.2f %.2f Td %s ' ET" % (
        size, size, x, y + size, enc(text)))


def _cid_code_table(pages) -> dict[str, int]:
    """Subset-font code assignment: distinct characters in first-encounter
    order get codes from 1 (0 = .notdef) — like a real subsetting writer,
    and deliberately NOT unicode-ordered, so decoding the text requires the
    /ToUnicode CMap rather than an identity guess."""
    codes: dict[str, int] = {}
    for runs in pages:
        for _x, _y, _size, text in runs:
            for ch in text:
                if ch not in codes:
                    codes[ch] = len(codes) + 1
    return codes


def _tounicode_cmap(codes: dict[str, int]) -> bytes:
    """The /ToUnicode CMap stream: code → UTF-16BE. Contiguous stretches
    where code and unicode advance in lockstep become bfrange rows; the
    rest are bfchar rows chunked at the spec's 100-per-block limit — so a
    round trip exercises BOTH CMap section kinds. Non-BMP characters emit
    surrogate pairs (multi-unit bfchar dst)."""
    by_code = sorted((c, ch) for ch, c in codes.items())
    ranges: list[tuple[int, int, str]] = []     # (lo_code, hi_code, lo_char)
    chars: list[tuple[int, str]] = []           # (code, char)
    i = 0
    while i < len(by_code):
        j = i
        c0, ch0 = by_code[i]
        while (j + 1 < len(by_code)
               and by_code[j + 1][0] == by_code[j][0] + 1
               and len(by_code[j][1]) == 1 and len(by_code[j + 1][1]) == 1
               and ord(by_code[j + 1][1]) == ord(by_code[j][1]) + 1
               and ord(by_code[j + 1][1]) <= 0xFFFF):
            j += 1
        if j - i >= 2:  # a range row is worth it
            ranges.append((c0, by_code[j][0], ch0))
        else:
            chars.extend(by_code[i:j + 1])
        i = j + 1
    out = bytearray(
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        b"/Supplement 0 >> def\n/CMapName /Adobe-Identity-UCS def\n"
        b"/CMapType 2 def\n1 begincodespacerange\n<0000> <FFFF>\n"
        b"endcodespacerange\n")
    for k in range(0, len(ranges), 100):
        block = ranges[k:k + 100]
        out += b"%d beginbfrange\n" % len(block)
        for lo, hi, ch in block:
            out += b"<%04X> <%04X> <%04X>\n" % (lo, hi, ord(ch))
        out += b"endbfrange\n"
    for k in range(0, len(chars), 100):
        block = chars[k:k + 100]
        out += b"%d beginbfchar\n" % len(block)
        for code, ch in block:
            dst = ch.encode("utf-16-be").hex().upper().encode("ascii")
            out += b"<%04X> <%s>\n" % (code, dst)
        out += b"endbfchar\n"
    out += (b"endcmap\nCMapName currentdict /CMap defineresource pop\n"
            b"end\nend")
    return bytes(out)


def pdf_encode(pages: list[list[tuple[float, float, float, str]]],
               compress: bool = True, object_streams: bool = False,
               cid_font: bool = False,
               encrypt_bits: int | None = None,
               cipher: str = "rc4") -> bytes:
    """pages = list of pages; each page = list of (x, y, size, text) runs
    (PDF user space, y-up). Returns a complete classic-xref PDF — or, with
    ``object_streams``, a PDF 1.5 file whose non-stream objects (catalog,
    page tree, page dicts, font) live inside ONE FlateDecode /ObjStm and
    whose cross-reference table is a /Type /XRef stream (/W [1 4 2],
    PNG Up predictor /Predictor 12, type-2 entries pointing into the
    object stream) — the layout every
    modern writer emits. ``cid_font`` swaps the simple Type1 font for a
    composite Type0/Identity-H font (CIDFontType2 descendant + /ToUnicode
    CMap) and shows text as 2-byte-code hex strings under a subset-order
    (non-identity) code table — the layout every embedded-subset writer
    emits; both flags compose. ``encrypt_bits`` (40 or 128, classic layout
    only) applies the standard security handler with EMPTY user and owner
    passwords — RC4-40 /R 2 or RC4-128 /R 3, per-object keys, /O //U
    entries, deterministic /ID — the "owner-locked but opens everywhere"
    shape most encrypted PDFs in the wild have."""
    if encrypt_bits is not None:
        if object_streams:
            raise ValueError(
                "writer scope: encryption composes with the classic xref "
                "layout only (parse side is layout-general)")
        if encrypt_bits not in (40, 128, 256):
            raise ValueError(
                "encrypt_bits must be 40 (R2), 128 (R3/R4) or 256 (R6)")
        if cipher not in ("rc4", "aes"):
            raise ValueError("cipher must be 'rc4' or 'aes'")
        if cipher == "aes" and encrypt_bits not in (128, 256):
            raise ValueError("AES is 128 (AESV2) or 256 (AESV3) bit")
        if cipher == "rc4" and encrypt_bits == 256:
            raise ValueError("256-bit is AES-only (R6)")
        id0 = hashlib.md5(
            repr(pages).encode("utf-8", "backslashreplace")).digest()
        if encrypt_bits == 256:
            revision = 6
            ekey, u_entry, ue_entry, o_entry, oe_entry, perms_entry = \
                _r6_entries(id0)

            def enc_data(num: int, data: bytes) -> bytes:
                # V5: ONE file key for every object, AES-256-CBC
                from deepdoctection_spark.kernels.aes import aes_cbc_encrypt
                iv = hashlib.md5(b"iv%d:%d" % (num, len(data))).digest()
                return aes_cbc_encrypt(ekey, iv, data)
        else:
            revision = 4 if cipher == "aes" else (
                2 if encrypt_bits == 40 else 3)
            ekey, o_entry, u_entry = _std_key_OU(
                id0, revision, encrypt_bits // 8)

            def enc_data(num: int, data: bytes) -> bytes:
                if cipher == "aes":
                    from deepdoctection_spark.kernels.aes import (
                        aes_cbc_encrypt,
                    )
                    iv = hashlib.md5(b"iv%d:%d" % (num, len(data))).digest()
                    return aes_cbc_encrypt(
                        _obj_key(ekey, num, aes=True), iv, data)
                return _rc4(_obj_key(ekey, num), data)
    else:
        ekey = None
        enc_data = None
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_id = 3 + 2 * n_pages
    kid_ids = [3 + 2 * i for i in range(n_pages)]
    compressed_ids = {1, 2, font_id} | set(kid_ids)  # non-stream objects
    if cid_font:
        codes = _cid_code_table(pages)
        if len(codes) > 0xFFFF:
            raise ValueError("CID subset exceeds 2-byte code space")

        def enc(s: str) -> bytes:
            return b"<" + b"".join(b"%04X" % codes[c] for c in s) + b">"
    else:
        enc = _pdf_string
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (b"<< /Type /Pages /Count %d /Kids [%s] >>" % (
        n_pages, b" ".join(b"%d 0 R" % k for k in kid_ids)))
    for i, runs in enumerate(pages):
        pid, cid = kid_ids[i], kid_ids[i] + 1
        body = b"\n".join(
            _run_ops(j, x, y, size, text, enc)
            for j, (x, y, size, text) in enumerate(runs))
        if compress and not object_streams:
            data = zlib.compress(body)
            if ekey is not None:  # encrypt AFTER filters-on-write (spec order)
                data = enc_data(cid, data)
            # /Length as an INDIRECT reference (a length object after the
            # stream) — the shape real writers emit, so the parser's
            # indirect-length resolution is exercised by every payload.
            len_id = font_id + 1 + i
            stream = (b"<< /Length %d 0 R /Filter /FlateDecode >>\nstream\n"
                      % len_id) + data + b"\nendstream"
            objs[len_id] = b"%d" % len(data)
        elif compress:
            # direct /Length inside the object-stream layout (length objects
            # would be more compressed members; keep the container minimal)
            data = zlib.compress(body)
            stream = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                      % len(data)) + data + b"\nendstream"
        else:
            data = body if ekey is None else enc_data(cid, body)
            stream = (b"<< /Length %d >>\nstream\n" % len(data)
                      ) + data + b"\nendstream"
        objs[cid] = stream
        objs[pid] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                     b"/Resources << /Font << /F1 %d 0 R >> >> "
                     b"/Contents %d 0 R >>" % (font_id, cid))
    if cid_font:
        desc_id = font_id + n_pages + 1
        cmap_id = font_id + n_pages + 2
        objs[font_id] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_id, cmap_id))
        # literal strings inside object bodies are encrypted with THEIR
        # object's key (spec: all strings outside the /Encrypt dict)
        def lit(s: bytes, num: int) -> bytes:
            return _pdf_bytes_literal(s if ekey is None else enc_data(num, s))
        objs[desc_id] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Helvetica "
            b"/CIDSystemInfo << /Registry %s /Ordering %s "
            b"/Supplement 0 >> /CIDToGIDMap /Identity /DW 500 >>"
            % (lit(b"Adobe", desc_id), lit(b"Identity", desc_id)))
        compressed_ids.add(desc_id)
        cmap = _tounicode_cmap(codes)
        cdata = zlib.compress(cmap) if compress else cmap
        if ekey is not None:
            cdata = enc_data(cmap_id, cdata)
        filt = b" /Filter /FlateDecode" if compress else b""
        objs[cmap_id] = (b"<< /Length %d%s >>\nstream\n" % (len(cdata), filt)
                         ) + cdata + b"\nendstream"
    else:
        objs[font_id] = (b"<< /Type /Font /Subtype /Type1 "
                         b"/BaseFont /Helvetica >>")

    if object_streams:
        return _write_15(objs, compressed_ids)

    trailer_extra = b""
    if ekey is not None:
        enc_id = max(objs) + 1
        ohex = o_entry.hex().upper().encode("ascii")
        uhex = u_entry.hex().upper().encode("ascii")
        # the /Encrypt dict itself is NEVER encrypted (spec §7.6.2)
        if revision == 6:  # PDF 2.0 AES-256 crypt-filter layout
            objs[enc_id] = (
                b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
                b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                b"/StmF /StdCF /StrF /StdCF /O <%s> /U <%s> /OE <%s> "
                b"/UE <%s> /Perms <%s> /P -1 >>"
                % (ohex, uhex,
                   oe_entry.hex().upper().encode("ascii"),
                   ue_entry.hex().upper().encode("ascii"),
                   perms_entry.hex().upper().encode("ascii")))
        elif revision == 4:  # crypt-filter layout: /AESV2 for streams+strings
            objs[enc_id] = (
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                b"/StmF /StdCF /StrF /StdCF /O <%s> /U <%s> /P -1 >>"
                % (ohex, uhex))
        else:
            v = 1 if revision == 2 else 2
            objs[enc_id] = (
                b"<< /Filter /Standard /V %d /R %d /Length %d /O <%s> "
                b"/U <%s> /P -1 >>" % (v, revision, encrypt_bits, ohex, uhex))
        idhex = id0.hex().upper().encode("ascii")
        trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
            enc_id, idhex, idhex)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    max_id = max(objs)
    out += b"xref\n0 %d\n" % (max_id + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_id + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (max_id + 1, trailer_extra, xref_pos))
    return bytes(out)


def _write_15(objs: dict[int, bytes], compressed_ids: set[int]) -> bytes:
    """Assemble the PDF 1.5 object-stream layout: members packed into one
    /ObjStm, stream objects top-level, one /Type /XRef cross-reference
    stream (binary /W [1 4 2] rows, PNG Up predictor /Predictor 12)."""
    max_id = max(objs)
    objstm_id = max_id + 1
    xref_id = max_id + 2
    member_ids = sorted(compressed_ids)
    bodies = [objs[n] for n in member_ids]
    offs: list[int] = []
    acc = 0
    for b in bodies:
        offs.append(acc)
        acc += len(b) + 1  # '\n' separator
    header = b" ".join(
        b"%d %d" % (n, o) for n, o in zip(member_ids, offs)
    ) + b"\n"
    payload = header + b"\n".join(bodies) + b"\n"
    data = zlib.compress(payload)
    objstm = (b"<< /Type /ObjStm /N %d /First %d /Length %d "
              b"/Filter /FlateDecode >>\nstream\n"
              % (len(member_ids), len(header), len(data))
              ) + data + b"\nendstream"

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    # entry tuples per object id: (type, field2, field3)
    entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}
    for idx, n in enumerate(member_ids):
        entries[n] = (2, objstm_id, idx)
    for n in sorted(objs):
        if n in compressed_ids:
            continue
        entries[n] = (1, len(out), 0)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    entries[objstm_id] = (1, len(out), 0)
    out += b"%d 0 obj\n" % objstm_id + objstm + b"\nendobj\n"
    xref_pos = len(out)
    size = xref_id + 1
    entries[xref_id] = (1, xref_pos, 0)
    # /W [1 4 2]: 4-byte offsets (PDFs beyond 64KB), 2-byte field3.
    # Rows go through the PNG Up predictor (/Predictor 12) before Flate —
    # the shape every real writer emits (near-identical consecutive rows
    # delta to runs of zeros).
    rowlen = 7
    rows = bytearray()
    prev = bytes(rowlen)
    for n in range(size):
        t, f2, f3 = entries.get(n, (0, 0, 0))
        raw_row = struct.pack(">BIH", t, f2, f3)
        rows.append(2)  # PNG filter type: Up
        rows += bytes((raw_row[i] - prev[i]) & 0xFF for i in range(rowlen))
        prev = raw_row
    xdata = zlib.compress(bytes(rows))
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
            b"/DecodeParms << /Predictor 12 /Columns %d >> "
            b"/Length %d /Filter /FlateDecode >>\nstream\n"
            % (xref_id, size, rowlen, len(xdata))) + xdata + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


def _serialize_value(v) -> bytes:
    """Parsed object model → PDF syntax (for incremental-update rewrites of
    existing dicts)."""
    if isinstance(v, _Ref):
        return b"%d 0 R" % v.num
    if isinstance(v, dict):
        return (b"<< " + b" ".join(
            b"/%s %s" % (k.encode("latin-1"), _serialize_value(x))
            for k, x in v.items()) + b" >>")
    if isinstance(v, list):
        return b"[ " + b" ".join(_serialize_value(x) for x in v) + b" ]"
    if isinstance(v, str) and v.startswith("/"):
        return v.encode("latin-1")
    if isinstance(v, bytes):
        return _pdf_bytes_literal(v)
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if v is None:
        return b"null"
    if isinstance(v, float):
        return b"%.4f" % v
    return b"%d" % v


def pdf_update(raw: bytes, page_idx: int,
               runs: list[tuple[float, float, float, str]]) -> bytes:
    """Append an INCREMENTAL UPDATE section replacing one page's content —
    the shape every interactive editor saves: the original bytes stay
    untouched (byte-identical prefix), a new content stream + rewritten
    page dict follow, then a new xref section whose trailer carries /Prev.
    The parser's later-wins object scan (and real readers' xref chains)
    must prefer the update. Writer scope: classic unencrypted input."""
    doc = _Doc(raw)
    if doc._key is not None:
        raise ValueError("pdf_update scope: unencrypted input only")
    pid = doc.catalog_pages()[page_idx]
    if any(dec is not None for dec in doc.page_fonts(pid).values()):
        # the update writes simple-font literal strings; against a Type0
        # page font they would decode through the CMap into garbage codes
        # (quarantined, but the writer should refuse up front)
        raise ValueError("pdf_update scope: simple-font bases only "
                         "(page uses a composite Type0 font)")
    page = dict(doc.objs[pid][0])
    new_cid = max(doc.objs) + 1
    body = b"\n".join(_run_ops(j, x, y, size, text)
                      for j, (x, y, size, text) in enumerate(runs))
    data = zlib.compress(body)
    page["Contents"] = _Ref(new_cid)
    out = bytearray(raw)
    if not out.endswith(b"\n"):
        out += b"\n"
    offsets = {}
    for num, obj_bytes in (
        (pid, _serialize_value(page)),
        (new_cid, (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                   % len(data)) + data + b"\nendstream"),
    ):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + obj_bytes + b"\nendobj\n"
    xref_pos = len(out)
    prev_start = raw.rfind(b"startxref")
    prev = int(raw[prev_start + 9:].split()[0]) if prev_start >= 0 else 0
    out += b"xref\n"
    for num in sorted(offsets):
        out += b"%d 1\n%010d 00000 n \n" % (num, offsets[num])
    out += (b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\nstartxref\n"
            b"%d\n%%%%EOF\n" % (new_cid + 1, prev, xref_pos))
    return bytes(out)


# ---------------------------------------------------------------------------
# parser: object model
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_NAME_RE = re.compile(rb"/([^\s/<>\[\]()]+)")
_NUM_RE = re.compile(rb"[+-]?\d*\.?\d+")
_WS = b"\x00\t\n\x0c\r "


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n:
        c = buf[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            while i < n and buf[i] not in (10, 13):
                i += 1
        else:
            break
    return i


def _parse_value(buf: bytes, i: int):
    """Parse one PDF object value at i → (value, next_i)."""
    i = _skip_ws(buf, i)
    c = buf[i:i + 1]
    if buf[i:i + 2] == b"<<":
        d = {}
        i += 2
        while True:
            i = _skip_ws(buf, i)
            if buf[i:i + 2] == b">>":
                return d, i + 2
            m = _NAME_RE.match(buf, i)
            if not m:
                raise ValueError(f"bad dict key at {i}")
            key = m.group(1).decode("latin-1")
            v, i = _parse_value(buf, m.end())
            d[key] = v
    if c == b"[":
        arr = []
        i += 1
        while True:
            i = _skip_ws(buf, i)
            if buf[i:i + 1] == b"]":
                return arr, i + 1
            v, i = _parse_value(buf, i)
            arr.append(v)
    if c == b"/":
        m = _NAME_RE.match(buf, i)
        return "/" + m.group(1).decode("latin-1"), m.end()
    if c == b"(":
        return _parse_literal_string(buf, i)
    if c == b"<":
        j = buf.index(b">", i)
        hx = re.sub(rb"\s", b"", buf[i + 1:j])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii")), j + 1
    # number, or "N 0 R" indirect reference
    m = _NUM_RE.match(buf, i)
    if m:
        ref = re.match(rb"(\d+)\s+\d+\s+R\b", buf[i:i + 32])
        if ref:
            return _Ref(int(ref.group(1))), i + ref.end()
        tok = m.group(0)
        return (float(tok) if b"." in tok else int(tok)), m.end()
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if buf.startswith(lit, i):
            return val, i + len(lit)
    raise ValueError(f"unparseable PDF value at offset {i}: {buf[i:i+20]!r}")


def _parse_literal_string(buf: bytes, i: int) -> tuple[bytes, int]:
    """(…) literal with \\-escapes, octal, and balanced nested parens."""
    assert buf[i:i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            nxt = buf[i + 1]
            if 0x30 <= nxt <= 0x37:  # octal, 1-3 digits
                j = i + 1
                oct_digits = bytearray()
                while j < n and len(oct_digits) < 3 and 0x30 <= buf[j] <= 0x37:
                    oct_digits.append(buf[j])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            mapped = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                      0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}.get(nxt)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
            if nxt in (10, 13):  # line continuation
                i += 2
                if nxt == 13 and i < n and buf[i] == 10:
                    i += 1
                continue
            out.append(nxt)
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out.append(c)
        i += 1
    raise ValueError("unterminated PDF string")


def _scan_objects(raw: bytes) -> dict[int, tuple[object, bytes | None]]:
    """All `N G obj` bodies → {num: (value, raw_stream_bytes_or_None)}.
    Offset-scan rather than xref-walk: robust to incremental updates and
    mild corruption (later definitions win, matching xref-update semantics)."""
    objs: dict[int, tuple[object, bytes | None]] = {}
    for m in _OBJ_RE.finditer(raw):
        num = int(m.group(1))
        try:
            val, i = _parse_value(raw, m.end())
        except (ValueError, IndexError, AssertionError):
            continue
        stream = None
        i = _skip_ws(raw, i)
        if raw.startswith(b"stream", i):
            i += 6
            if raw[i:i + 2] == b"\r\n":
                i += 2
            elif raw[i:i + 1] == b"\n":
                i += 1
            # /Length may be an indirect ref (resolved later); grab the
            # conservative extent now, trim after resolution.
            end = raw.find(b"endstream", i)
            if end < 0:
                raise ValueError(f"obj {num}: stream without endstream")
            stream = raw[i:end]
        objs[num] = (val, stream)
    if not objs:
        raise ValueError("no PDF objects found (encrypted or xref-stream-only?)")
    return objs


class _Doc:
    def __init__(self, raw: bytes) -> None:
        if not raw.lstrip()[:5].startswith(b"%PDF-"):
            raise ValueError("missing %PDF header")
        self.objs = _scan_objects(raw)
        self._key: bytes | None = None
        self._enc_num: int | None = None
        self._aes = False
        self._v5 = False
        self._setup_decryption(raw)
        self._expand_object_streams()

    def _trailer(self, raw: bytes) -> dict:
        """Merged trailer dict: every classic `trailer <<…>>` plus every
        /Type /XRef stream dict, later definitions winning (incremental-
        update semantics). Only /Encrypt and /ID are consumed here — page
        discovery stays on the robust offset scan."""
        merged: dict = {}
        for val, _ in self.objs.values():
            if isinstance(val, dict) and val.get("Type") == "/XRef":
                merged.update(val)
        for m in re.finditer(rb"trailer\b", raw):
            try:
                d, _ = _parse_value(raw, m.end())
            except (ValueError, IndexError):
                continue
            if isinstance(d, dict):
                merged.update(d)
        return merged

    def _setup_decryption(self, raw: bytes) -> None:
        """Standard security handler (§7.6.3), empty user password: derive
        the file key from /O, /P and /ID[0] (Algorithm 2), authenticate it
        against /U (Algorithms 4/5), then decrypt every top-level string
        with its object's key. Stream decryption happens lazily in
        stream_data. A non-empty user password or a non-Standard filter is
        out of scope → ValueError → row quarantine."""
        trailer = self._trailer(raw)
        enc_ref = trailer.get("Encrypt")
        if enc_ref is None:
            return
        self._enc_num = enc_ref.num if isinstance(enc_ref, _Ref) else None
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict) or enc.get("Filter") != "/Standard":
            raise ValueError("unsupported encryption filter (not /Standard)")
        v, r = self.resolve(enc.get("V")), self.resolve(enc.get("R"))
        if v not in (1, 2, 4, 5) or r not in (2, 3, 4, 5, 6):
            raise ValueError(f"unsupported security handler V={v} R={r} "
                             "(RC4 R2/R3, AESV2 R4, AESV3 R6 is the scope)")
        self._aes = False
        if v in (4, 5):
            cf = self.resolve(enc.get("CF"))
            stdcf = self.resolve(cf.get("StdCF")) if isinstance(cf, dict) \
                else None
            cfm = self.resolve(stdcf.get("CFM")) if isinstance(stdcf, dict) \
                else None
            for which in ("StmF", "StrF"):
                sel = self.resolve(enc.get(which, "/Identity"))
                if sel != "/StdCF":
                    raise ValueError(
                        f"V{v} {which}={sel}: only /StdCF is in scope")
            if cfm in ("/AESV2", "/AESV3"):
                self._aes = True
            elif cfm != "/V2":  # /V2 = RC4 under the crypt-filter layout
                raise ValueError(f"unsupported crypt filter method {cfm}")
        if v == 5:
            self._setup_v5(enc)
            return
        n = int(self.resolve(enc.get("Length", 40))) // 8
        o_entry, u_entry = enc.get("O"), enc.get("U")
        p = int(self.resolve(enc.get("P", -1)))
        ids = trailer.get("ID")
        id0 = ids[0] if isinstance(ids, list) and ids else b""
        if not isinstance(o_entry, bytes) or not isinstance(u_entry, bytes):
            raise ValueError("encrypt dict missing /O or /U strings")
        p_le = struct.pack("<i", ((p + 2**31) % 2**32) - 2**31)
        h = hashlib.md5(_PAD + o_entry + p_le + id0).digest()
        if r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:n]).digest()
        key = h[:n]
        if r == 2:
            ok = _rc4(key, _PAD) == u_entry[:32]
        else:
            u = _rc4(key, hashlib.md5(_PAD + id0).digest())
            for i in range(1, 20):
                u = _rc4(bytes(b ^ i for b in key), u)
            ok = u == u_entry[:16]
        if not ok:
            raise ValueError("password-protected PDF (user password is not "
                             "empty) — cannot decrypt")
        self._key = key
        self._decrypt_all_strings()

    def _setup_v5(self, enc: dict) -> None:
        """R5/R6 (AES-256 /AESV3): authenticate the empty user password via
        the Algorithm 2.B hash of /U's validation salt, unwrap the file key
        from /UE with the key-salt intermediate key, verify /Perms ('adb'
        marker) when present. One file key for all objects — no per-object
        derivation in V5."""
        from deepdoctection_spark.kernels.aes import (
            cbc_decrypt_nopad,
            ecb_decrypt,
        )

        u_entry, ue = enc.get("U"), enc.get("UE")
        if not isinstance(u_entry, bytes) or len(u_entry) < 48 \
                or not isinstance(ue, bytes) or len(ue) != 32:
            raise ValueError("R6 encrypt dict missing /U(48) or /UE(32)")
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if _hash_2b(b"", vsalt) != u_entry[:32]:
            raise ValueError("password-protected PDF (user password is not "
                             "empty) — cannot decrypt")
        ik = _hash_2b(b"", ksalt)
        key = cbc_decrypt_nopad(ik, bytes(16), ue)
        perms = enc.get("Perms")
        if isinstance(perms, bytes) and len(perms) == 16:
            pp = ecb_decrypt(key, perms)
            if pp[9:12] != b"adb":
                raise ValueError("R6 /Perms does not validate (wrong key)")
        self._key = key
        self._v5 = True
        self._decrypt_all_strings()

    def _decrypt_all_strings(self) -> None:
        for num in list(self.objs):
            if num == self._enc_num:
                continue  # strings in the /Encrypt dict are never encrypted
            val, stream = self.objs[num]
            self.objs[num] = (self._decrypt_strings(val, num), stream)

    def _dec(self, num: int, data: bytes) -> bytes:
        """Per-object decrypt with the active cipher (RC4, AESV2 with the
        salted object key, or AESV3 with the single file key)."""
        if self._v5:
            from deepdoctection_spark.kernels.aes import aes_cbc_decrypt
            return aes_cbc_decrypt(self._key, data)
        if self._aes:
            from deepdoctection_spark.kernels.aes import aes_cbc_decrypt
            return aes_cbc_decrypt(
                _obj_key(self._key, num, aes=True), data)
        return _rc4(_obj_key(self._key, num), data)

    def _decrypt_strings(self, v, num: int):
        if isinstance(v, bytes):
            return self._dec(num, v)
        if isinstance(v, dict):
            return {k: self._decrypt_strings(x, num) for k, x in v.items()}
        if isinstance(v, list):
            return [self._decrypt_strings(x, num) for x in v]
        return v

    def _expand_object_streams(self) -> None:
        """PDF 1.5+ compressed object streams (/Type /ObjStm): the member
        objects don't appear as top-level `N 0 obj` records, so the offset
        scan only finds the container — inflate it and parse the members
        (header: N pairs of `objnum offset`, bodies from /First). Top-level
        definitions win (same later-wins update semantics as the scan);
        member objects carry no streams per spec."""
        containers = [
            num for num, (val, stream) in self.objs.items()
            if isinstance(val, dict) and val.get("Type") == "/ObjStm"
            and stream is not None
        ]
        for num in containers:
            val = self.objs[num][0]
            data = self.stream_data(num)
            n = self.resolve(val.get("N"))
            first = self.resolve(val.get("First"))
            if not isinstance(n, int) or not isinstance(first, int):
                raise ValueError(f"ObjStm {num}: bad /N or /First")
            hdr = data[:first].split()
            if len(hdr) < 2 * n:
                raise ValueError(f"ObjStm {num}: truncated pair table")
            for k in range(n):
                onum, off = int(hdr[2 * k]), int(hdr[2 * k + 1])
                if onum in self.objs:
                    continue
                v, _ = _parse_value(data, first + off)
                self.objs[onum] = (v, None)

    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref):
            v = self.objs.get(v.num, (None, None))[0]
            seen += 1
            if seen > 32:
                raise ValueError("indirect reference loop")
        return v

    @staticmethod
    def _png_unpredict(data: bytes, columns: int, colors: int = 1,
                       bpc: int = 8) -> bytes:
        """Reverse PNG row predictors (/Predictor >= 10) on a Flate stream:
        each row is one filter-type byte + `columns*colors*bpc/8` data
        bytes; filters None/Sub/Up/Average/Paeth per the PNG spec — the
        shape every real writer's /XRef stream uses."""
        bpp = max(1, colors * bpc // 8)
        rowlen = (columns * colors * bpc + 7) // 8
        if rowlen <= 0 or len(data) % (rowlen + 1):
            raise ValueError("predicted stream length does not tile rows")
        out = bytearray()
        prev = bytearray(rowlen)
        for r in range(0, len(data), rowlen + 1):
            ft = data[r]
            row = bytearray(data[r + 1:r + 1 + rowlen])
            if ft == 1:  # Sub
                for i in range(bpp, rowlen):
                    row[i] = (row[i] + row[i - bpp]) & 0xFF
            elif ft == 2:  # Up
                for i in range(rowlen):
                    row[i] = (row[i] + prev[i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(rowlen):
                    a = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(rowlen):
                    a = row[i - bpp] if i >= bpp else 0
                    c = prev[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    row[i] = (row[i] + pred) & 0xFF
            elif ft != 0:
                raise ValueError(f"unknown PNG filter type {ft}")
            out += row
            prev = row
        return bytes(out)

    def stream_data(self, num: int) -> bytes:
        val, stream = self.objs[num]
        if stream is None:
            raise ValueError(f"obj {num} has no stream")
        length = self.resolve(val.get("Length")) if isinstance(val, dict) else None
        if isinstance(length, int) and 0 <= length <= len(stream):
            data = stream[:length]
        else:
            data = stream.rstrip(b"\r\n")
        if (self._key is not None and num != self._enc_num
                and not (isinstance(val, dict) and val.get("Type") == "/XRef")):
            # decrypt-before-defilter; /XRef streams are never encrypted
            data = self._dec(num, data)
        filt = self.resolve(val.get("Filter")) if isinstance(val, dict) else None
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        parms = self.resolve(val.get("DecodeParms", val.get("DP"))) \
            if isinstance(val, dict) else None
        parms_list = parms if isinstance(parms, list) else [parms]
        for k, f in enumerate(filters):
            f = self.resolve(f)
            if f == "/FlateDecode":
                data = zlib.decompress(data)
                pr = self.resolve(parms_list[k]) if k < len(parms_list) \
                    else None
                if isinstance(pr, dict):
                    pred = self.resolve(pr.get("Predictor", 1))
                    if pred >= 10:  # PNG row predictors
                        data = self._png_unpredict(
                            data,
                            int(self.resolve(pr.get("Columns", 1))),
                            int(self.resolve(pr.get("Colors", 1))),
                            int(self.resolve(pr.get("BitsPerComponent", 8))))
                    elif pred == 2:
                        raise ValueError("TIFF predictor (2) not supported")
            elif f is None:
                continue
            else:
                raise ValueError(f"unsupported stream filter {f}")
        return data

    def catalog_pages(self) -> list[int]:
        root = None
        for num, (val, _) in self.objs.items():
            if isinstance(val, dict) and val.get("Type") == "/Catalog":
                root = val
                break
        if root is None:
            raise ValueError("no /Catalog object")
        page_ids: list[int] = []

        def walk(node_ref) -> None:
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            t = node.get("Type")
            if t == "/Page":
                page_ids.append(node_ref.num if isinstance(node_ref, _Ref)
                                else -1)
            elif t == "/Pages":
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid)

        walk(root.get("Pages"))
        if not page_ids:
            raise ValueError("page tree has no /Page leaves")
        return page_ids

    def page_fonts(self, page_num: int):
        """Page /Resources /Font → {name: bytes→str decoder}. Simple fonts
        decode latin-1 (the declared scope); Type0 composite fonts decode
        2-byte codes through their /ToUnicode CMap. A Type0 font WITHOUT
        /ToUnicode is unrecoverable text (codes are glyph ids) → ValueError,
        which the callers' row quarantine catches."""
        page, _ = self.objs[page_num]
        res = self.resolve(page.get("Resources")) if isinstance(page, dict) \
            else None
        fdict = self.resolve(res.get("Font")) if isinstance(res, dict) \
            else None
        fonts: dict[str, object] = {}
        if not isinstance(fdict, dict):
            return fonts
        for name, ref in fdict.items():
            fobj = self.resolve(ref)
            if not isinstance(fobj, dict):
                continue
            if fobj.get("Subtype") == "/Type0":
                tu = fobj.get("ToUnicode")
                if not isinstance(tu, _Ref):
                    raise ValueError(
                        f"Type0 font /{name} without /ToUnicode stream")
                fonts["/" + name] = _cmap_decoder(self.stream_data(tu.num))
            else:
                fonts["/" + name] = None  # simple font → latin-1 default
        return fonts

    def page_content(self, page_num: int) -> bytes:
        page, _ = self.objs[page_num]
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            if isinstance(r, _Ref):
                parts.append(self.stream_data(r.num))
        return b"\n".join(parts)


# ---------------------------------------------------------------------------
# ToUnicode CMap (PDF 32000-1 §9.10.3): 2-byte code → unicode text
# ---------------------------------------------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>|\[")


def _hex_items(section: bytes) -> list[bytes | None]:
    """Hex-string operands in order; '[' markers become None (array form)."""
    out = []
    for m in _HEX_RE.finditer(section):
        if m.group(0) == b"[":
            out.append(None)
        else:
            hx = re.sub(rb"\s", b"", m.group(1))
            out.append(bytes.fromhex(hx.decode("ascii")))
    return out


def _cmap_decoder(cmap: bytes):
    """Build a bytes→str decoder from a /ToUnicode CMap stream. Supports
    bfchar pairs, bfrange with a scalar dst start, and bfrange with a dst
    array; dst values are UTF-16BE (surrogate pairs → astral chars)."""
    single: dict[int, str] = {}
    ranges: list[tuple[int, int, int]] = []  # (lo, hi, unicode_start)

    def u16(b: bytes) -> str:
        return b.decode("utf-16-be")

    for m in _BFCHAR_RE.finditer(cmap):
        items = _hex_items(m.group(1))
        for k in range(0, len(items) - 1, 2):
            src, dst = items[k], items[k + 1]
            if src is None or dst is None:
                raise ValueError("bfchar with array operand")
            single[int.from_bytes(src, "big")] = u16(dst)
    for m in _BFRANGE_RE.finditer(cmap):
        items = _hex_items(m.group(1))
        k = 0
        while k < len(items):
            lo, hi = items[k], items[k + 1]
            lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
            if k + 2 < len(items) and items[k + 2] is None:
                # array form: <lo> <hi> [<d0> <d1> ...]
                n = hi_i - lo_i + 1
                dsts = items[k + 3:k + 3 + n]
                for off, d in enumerate(dsts):
                    single[lo_i + off] = u16(d)
                k += 3 + n
            else:
                dst = items[k + 2]
                if len(dst) == 2:
                    ranges.append((lo_i, hi_i, int.from_bytes(dst, "big")))
                else:  # multi-unit start: spec increments the LAST unit
                    base, last = dst[:-2], int.from_bytes(dst[-2:], "big")
                    for off in range(hi_i - lo_i + 1):
                        single[lo_i + off] = u16(
                            base + (last + off).to_bytes(2, "big"))
                k += 3

    def decode(bs: bytes) -> str:
        if len(bs) % 2:
            raise ValueError("odd-length CID string")
        out = []
        for i in range(0, len(bs), 2):
            code = (bs[i] << 8) | bs[i + 1]
            hit = single.get(code)
            if hit is None:
                for lo, hi, ustart in ranges:
                    if lo <= code <= hi:
                        hit = chr(ustart + (code - lo))
                        break
            if hit is None:
                raise ValueError(f"CID code {code:#06x} not in /ToUnicode")
            out.append(hit)
        return "".join(out)

    return decode


# ---------------------------------------------------------------------------
# content-stream interpreter (the text machine)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|<<|>>|<[0-9A-Fa-f\s]*>|/[^\s/<>\[\]()]*"
    rb"|[+-]?\d*\.?\d+|\[|\]|[A-Za-z'\"*]+", re.S)


def _tokenize_content(data: bytes):
    for m in _TOKEN_RE.finditer(data):
        tok = m.group(0)
        if tok.startswith(b"("):
            s, _ = _parse_literal_string(tok, 0)
            yield ("str", s)
        elif tok.startswith(b"<") and tok not in (b"<<", b">>"):
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode("ascii")))
        elif tok[0:1] in b"+-0123456789." and tok not in (b"[", b"]"):
            yield ("num", float(tok))
        elif tok == b"[":
            yield ("arr_open", None)
        elif tok == b"]":
            yield ("arr_close", None)
        elif tok.startswith(b"/"):
            yield ("name", tok.decode("latin-1"))
        else:
            yield ("op", tok.decode("latin-1"))


def extract_runs(content: bytes, fonts: dict | None = None,
                 ) -> list[tuple[float, float, float, str]]:
    """Interpret a page content stream → [(x, y, size, text)] runs. Supports
    the full simple-font text-positioning/showing surface: BT ET Tf TL Td TD
    Tm T* Tj TJ ' \" (word/char-spacing operands of \" are consumed, text is
    shown). Graphics operators are ignored (no-op), matching a text miner.
    ``fonts`` maps resource names (``"/F1"``) to bytes→str decoders (None =
    the simple-font latin-1 default); ``Tf`` switches the active decoder, so
    composite CID strings decode through their /ToUnicode CMap."""
    runs: list[tuple[float, float, float, str]] = []
    stack: list = []
    size = 12.0
    leading = 0.0
    decoder = None  # active bytes→str; None = latin-1 simple-font default
    # text-line matrix origin; simple translation-only model (rotation-free
    # Tm is the declared scope — the writer only emits 1 0 0 1 tx ty)
    lx = ly = 0.0   # line start
    cx = cy = 0.0   # current point
    in_text = False
    arr: list | None = None

    def show(s: bytes) -> None:
        nonlocal cx
        text = decoder(s) if decoder is not None else s.decode("latin-1")
        if text:
            runs.append((cx, cy, size, text))
            cx += 0.5 * size * len(text)  # Helvetica-ish advance

    for kind, val in _tokenize_content(content):
        if kind == "arr_open":
            arr = []
            continue
        if kind == "arr_close":
            stack.append(arr)
            arr = None
            continue
        if kind in ("num", "str", "name"):
            (arr if arr is not None else stack).append(val)
            continue
        op = val
        try:
            if op == "BT":
                in_text = True
                lx = ly = cx = cy = 0.0
            elif op == "ET":
                in_text = False
            elif op == "Tf":
                size = float(stack[-1])
                if fonts and len(stack) >= 2 and isinstance(stack[-2], str):
                    decoder = fonts.get(stack[-2])
            elif op == "TL":
                leading = float(stack[-1])
            elif op == "Td" and in_text:
                lx += float(stack[-2]); ly += float(stack[-1])
                cx, cy = lx, ly
            elif op == "TD" and in_text:
                leading = -float(stack[-1])
                lx += float(stack[-2]); ly += float(stack[-1])
                cx, cy = lx, ly
            elif op == "Tm" and in_text:
                lx, ly = float(stack[-2]), float(stack[-1])
                cx, cy = lx, ly
            elif op == "T*" and in_text:
                ly -= leading
                cx, cy = lx, ly
            elif op == "Tj" and in_text:
                show(stack[-1])
            elif op == "TJ" and in_text:
                # one show per array: kerning numbers are sub-glyph moves,
                # so the segments form ONE visual run — emitting them
                # separately would fabricate phantom line fragments whose
                # estimated x collides with real columns downstream
                show(b"".join(el for el in stack[-1] if isinstance(el, bytes)))
            elif op == "'" and in_text:
                ly -= leading
                cx, cy = lx, ly
                show(stack[-1])
            elif op == '"' and in_text:
                ly -= leading
                cx, cy = lx, ly
                show(stack[-1])
        except (IndexError, TypeError, AttributeError) as exc:
            raise ValueError(f"malformed content stream at op {op}: {exc}")
        stack.clear()
    return runs


# ---------------------------------------------------------------------------
# public API (the PdfMiner.predict-shaped slots)
# ---------------------------------------------------------------------------


def pdf_decode(raw: bytes) -> list[list[tuple[float, float, float, str]]]:
    """PDF bytes → per-page [(x, y, size, text)] runs, page-tree order."""
    doc = _Doc(raw)
    return [extract_runs(doc.page_content(p), doc.page_fonts(p))
            for p in doc.catalog_pages()]


def pdf_page_text(runs: list[tuple[float, float, float, str]],
                  line_tol: float = 2.0) -> str:
    """Runs → plain text: lines by descending y (PDF y-up → reading order),
    runs within a line by x, concatenated; lines joined with newlines."""
    if not runs:
        return ""
    lines: list[tuple[float, list[tuple[float, str]]]] = []
    for x, y, _size, text in sorted(runs, key=lambda r: (-r[1], r[0])):
        if lines and abs(lines[-1][0] - y) <= line_tol:
            lines[-1][1].append((x, text))
        else:
            lines.append((y, [(x, text)]))
    return "\n".join(
        "".join(t for _x, t in sorted(parts)) for _y, parts in lines)


def pdf_texts(raw: bytes) -> list[str]:
    """PDF bytes → per-page plain text (stdlib; the in-sandbox realization of
    codecs.pdf_page_texts' pypdf slot)."""
    return [pdf_page_text(runs) for runs in pdf_decode(raw)]


def pdf_positioned_pages(raw: bytes) -> list[str]:
    """PDF bytes → per-page '@x,y:text' line payloads — the engine's
    pdf_reader wire format (kernels/layout.py input), so real PDFs feed the
    existing layout/sub-line kernels with zero engine changes."""
    pages = []
    for runs in pdf_decode(raw):
        pages.append("\n".join(
            f"@{x:.0f},{792 - y:.0f}:{t}"  # flip to y-down reader coords
            for x, y, _s, t in sorted(runs, key=lambda r: (-r[1], r[0]))))
    return pages
