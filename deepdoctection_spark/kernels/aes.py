"""Pure-Python AES-128 (FIPS-197) + CBC, for the PDF standard security
handler's /V 4 /AESV2 crypt filter (kernels/pdf.py). Table-driven,
stdlib-only; correctness is pinned to the FIPS-197 Appendix C.1 vector in
tests/test_pdf.py. Payloads are KB-scale content streams, so the per-block
Python loop is not a hot path (the extraction kernels never touch this
unless a payload is AES-encrypted)."""

from __future__ import annotations

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16")
_INV_SBOX = bytes(256)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


# GF(2^8) multiply tables for the (Inv)MixColumns constants
_MUL = {}
for _c in (2, 3, 9, 11, 13, 14):
    t = bytearray(256)
    for _x in range(256):
        r, a, b = 0, _x, _c
        while b:
            if b & 1:
                r ^= a
            a = _xtime(a)
            b >>= 1
        t[_x] = r
    _MUL[_c] = bytes(t)


def _expand_key(key: bytes) -> list[bytes]:
    """AES key schedule (FIPS-197 §5.2) → Nr+1 round keys of 16 bytes;
    Nk=4 (AES-128, 10 rounds) or Nk=8 (AES-256, 14 rounds)."""
    if len(key) not in (16, 32):
        raise ValueError("AES key must be 16 or 32 bytes")
    nk = len(key) // 4
    nr = nk + 6
    w = [key[i:i + 4] for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes((t[0] ^ _RCON[i // nk - 1],)) + t[1:]
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r:4 * r + 4]) for r in range(nr + 1)]


def _shift_rows(s: bytearray, inv: bool) -> None:
    for r in range(1, 4):
        row = [s[r + 4 * c] for c in range(4)]
        k = -r if inv else r
        row = row[k % 4:] + row[:k % 4]
        for c in range(4):
            s[r + 4 * c] = row[c]


def _mix_columns(s: bytearray, inv: bool) -> None:
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    for c in range(4):
        col = s[4 * c:4 * c + 4]
        for r in range(4):
            acc = 0
            for k in range(4):
                coef = m[(k - r) % 4]
                acc ^= col[k] if coef == 1 else _MUL[coef][col[k]]
            s[4 * c + r] = acc


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    nr = len(rks) - 1
    s = bytearray(a ^ b for a, b in zip(block, rks[0]))
    for rnd in range(1, nr):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        _shift_rows(s, inv=False)
        _mix_columns(s, inv=False)
        for i in range(16):
            s[i] ^= rks[rnd][i]
    for i in range(16):
        s[i] = _SBOX[s[i]]
    _shift_rows(s, inv=False)
    for i in range(16):
        s[i] ^= rks[nr][i]
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    nr = len(rks) - 1
    s = bytearray(a ^ b for a, b in zip(block, rks[nr]))
    _shift_rows(s, inv=True)
    for i in range(16):
        s[i] = _INV_SBOX[s[i]]
    for rnd in range(nr - 1, 0, -1):
        for i in range(16):
            s[i] ^= rks[rnd][i]
        _mix_columns(s, inv=True)
        _shift_rows(s, inv=True)
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
    return bytes(a ^ b for a, b in zip(s, rks[0]))


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC, block-aligned input, no padding, no IV prefix — the shape
    the PDF R6 hardening loop (Algorithm 2.B) and /UE key wrap use."""
    if len(data) % 16:
        raise ValueError("no-pad CBC needs block-aligned input")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Inverse of :func:`cbc_encrypt_nopad`."""
    if len(data) % 16:
        raise ValueError("no-pad CBC needs block-aligned input")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    return bytes(out)


def ecb_encrypt(key: bytes, data: bytes) -> bytes:
    """Raw ECB over block-aligned data (the PDF R6 /Perms block)."""
    if len(data) % 16:
        raise ValueError("ECB needs block-aligned input")
    rks = _expand_key(key)
    return b"".join(_encrypt_block(data[i:i + 16], rks)
                    for i in range(0, len(data), 16))


def ecb_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`ecb_encrypt`."""
    if len(data) % 16:
        raise ValueError("ECB needs block-aligned input")
    rks = _expand_key(key)
    return b"".join(_decrypt_block(data[i:i + 16], rks)
                    for i in range(0, len(data), 16))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC with PKCS#7 padding; returns iv + ciphertext (the PDF AESV2
    stream layout: first 16 bytes are the IV)."""
    rks = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_encrypt`: data = iv + ciphertext,
    PKCS#7 unpad. Raises ValueError on malformed length or padding."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AESV2 stream not block-aligned (iv + n*16)")
    rks = _expand_key(key)
    iv, ct = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        blk = ct[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES padding (wrong key or corrupt data)")
    return bytes(out[:-pad])
