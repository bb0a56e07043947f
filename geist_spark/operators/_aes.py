"""AES (FIPS-197) + CBC, for the PDF standard security handler's
AESV2/AESV3 crypt filters (pdf.py). Two tiers:

- When the `cryptography` package is importable, the byte-level
  entry points (aes_cbc_encrypt/decrypt, aes_*_block) delegate to
  its OpenSSL-backed cipher — AES output is standardized, so the
  bytes are identical, and the AESV3-R6 KDF (per-doc megabytes of
  CBC in the w_pdf_extract gate) stops being the profile's top
  entry: 48.9 ms -> ~1 ms per R6 fixture build (guide §4.2, native
  code inside the Python stage).
- Otherwise the pure-Python fallback runs table-driven rounds (the
  classic T-tables / inverse T-tables with the equivalent-inverse-
  cipher key schedule), key sizes 128/192/256, CBC without padding
  (the PDF layer applies PKCS#7).

Correctness of BOTH tiers is pinned by the FIPS-197 Appendix C
known-answer vectors in tests/test_pdf.py. This is a DATA-DECODE
primitive for crawl ingestion, not a security boundary —
constant-time properties are explicitly out of scope."""

from __future__ import annotations

try:  # native fast path: OpenSSL AES via the cryptography package
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _Cipher,
        algorithms as _algorithms,
        modes as _modes,
    )
except ImportError:  # pragma: no cover - environment without the lib
    _Cipher = None

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5,
    0x30, 0x01, 0x67, 0x2B, 0xFE, 0xD7, 0xAB, 0x76,
    0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0,
    0xB7, 0xFD, 0x93, 0x26, 0x36, 0x3F, 0xF7, 0xCC,
    0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A,
    0x07, 0x12, 0x80, 0xE2, 0xEB, 0x27, 0xB2, 0x75,
    0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84,
    0x53, 0xD1, 0x00, 0xED, 0x20, 0xFC, 0xB1, 0x5B,
    0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85,
    0x45, 0xF9, 0x02, 0x7F, 0x50, 0x3C, 0x9F, 0xA8,
    0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2,
    0xCD, 0x0C, 0x13, 0xEC, 0x5F, 0x97, 0x44, 0x17,
    0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88,
    0x46, 0xEE, 0xB8, 0x14, 0xDE, 0x5E, 0x0B, 0xDB,
    0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79,
    0xE7, 0xC8, 0x37, 0x6D, 0x8D, 0xD5, 0x4E, 0xA9,
    0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6,
    0xE8, 0xDD, 0x74, 0x1F, 0x4B, 0xBD, 0x8B, 0x8A,
    0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E,
    0xE1, 0xF8, 0x98, 0x11, 0x69, 0xD9, 0x8E, 0x94,
    0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68,
    0x41, 0x99, 0x2D, 0x0F, 0xB0, 0x54, 0xBB, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i


def _gmul(a: int, b: int) -> int:
    out = 0
    for _ in range(8):
        if b & 1:
            out ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return out


def _rot(w: int, n: int) -> int:
    return ((w << n) | (w >> (32 - n))) & 0xFFFFFFFF


# encryption T-tables: Te0[x] = (S[x]*2, S[x], S[x], S[x]*3) packed
# big-endian; Te1..Te3 are byte rotations
_TE0 = []
for _x in range(256):
    _s = _SBOX[_x]
    _TE0.append(
        (_gmul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _gmul(_s, 3)
    )
_TE1 = [_rot(t, 24) for t in _TE0]
_TE2 = [_rot(t, 16) for t in _TE0]
_TE3 = [_rot(t, 8) for t in _TE0]

# decryption T-tables: Td0[x] = (IS[x]*14, IS[x]*9, IS[x]*13,
# IS[x]*11) packed big-endian
_TD0 = []
for _x in range(256):
    _s = _INV_SBOX[_x]
    _TD0.append(
        (_gmul(_s, 14) << 24) | (_gmul(_s, 9) << 16)
        | (_gmul(_s, 13) << 8) | _gmul(_s, 11)
    )
_TD1 = [_rot(t, 24) for t in _TD0]
_TD2 = [_rot(t, 16) for t in _TD0]
_TD3 = [_rot(t, 8) for t in _TD0]

_RCON = [0x01]
while len(_RCON) < 14:
    _r = _RCON[-1] << 1
    _RCON.append(_r ^ 0x11B if _r & 0x100 else _r)


def _sub_word(w: int) -> int:
    return (
        (_SBOX[(w >> 24) & 0xFF] << 24)
        | (_SBOX[(w >> 16) & 0xFF] << 16)
        | (_SBOX[(w >> 8) & 0xFF] << 8)
        | _SBOX[w & 0xFF]
    )


def _expand_key(key: bytes) -> list:
    """Encryption round keys as 32-bit words."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    words = [
        int.from_bytes(key[4 * i: 4 * i + 4], "big") for i in range(nk)
    ]
    rounds = nk + 6
    for i in range(nk, 4 * (rounds + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = _sub_word(_rot(t, 8)) ^ (_RCON[i // nk - 1] << 24)
        elif nk == 8 and i % nk == 4:
            t = _sub_word(t)
        words.append(words[i - nk] ^ t)
    return words


def _inv_mix_word(w: int) -> int:
    """InvMixColumns of one word (for the equivalent inverse cipher's
    transformed round keys): Td tables composed with the forward
    S-box undo to a pure InvMixColumns."""
    return (
        _TD0[_SBOX[(w >> 24) & 0xFF]]
        ^ _TD1[_SBOX[(w >> 16) & 0xFF]]
        ^ _TD2[_SBOX[(w >> 8) & 0xFF]]
        ^ _TD3[_SBOX[w & 0xFF]]
    )


def _expand_key_dec(key: bytes) -> list:
    """Decryption round keys (equivalent inverse cipher): encryption
    schedule reversed by round, InvMixColumns applied to the middle
    rounds."""
    enc = _expand_key(key)
    rounds = len(key) // 4 + 6
    dec = []
    for rnd in range(rounds, -1, -1):
        w = enc[4 * rnd: 4 * rnd + 4]
        if 0 < rnd < rounds:
            w = [_inv_mix_word(x) for x in w]
        dec.extend(w)
    return dec


def _encrypt_block_w(block: bytes, words: list, rounds: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ words[0]
    s1 = int.from_bytes(block[4:8], "big") ^ words[1]
    s2 = int.from_bytes(block[8:12], "big") ^ words[2]
    s3 = int.from_bytes(block[12:16], "big") ^ words[3]
    k = 4
    for _ in range(rounds - 1):
        t0 = (_TE0[(s0 >> 24) & 0xFF] ^ _TE1[(s1 >> 16) & 0xFF]
              ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ words[k])
        t1 = (_TE0[(s1 >> 24) & 0xFF] ^ _TE1[(s2 >> 16) & 0xFF]
              ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ words[k + 1])
        t2 = (_TE0[(s2 >> 24) & 0xFF] ^ _TE1[(s3 >> 16) & 0xFF]
              ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ words[k + 2])
        t3 = (_TE0[(s3 >> 24) & 0xFF] ^ _TE1[(s0 >> 16) & 0xFF]
              ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ words[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    sb = _SBOX
    o0 = ((sb[(s0 >> 24) & 0xFF] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
          | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ words[k]
    o1 = ((sb[(s1 >> 24) & 0xFF] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
          | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ words[k + 1]
    o2 = ((sb[(s2 >> 24) & 0xFF] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
          | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ words[k + 2]
    o3 = ((sb[(s3 >> 24) & 0xFF] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
          | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ words[k + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def _decrypt_block_w(block: bytes, words: list, rounds: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ words[0]
    s1 = int.from_bytes(block[4:8], "big") ^ words[1]
    s2 = int.from_bytes(block[8:12], "big") ^ words[2]
    s3 = int.from_bytes(block[12:16], "big") ^ words[3]
    k = 4
    for _ in range(rounds - 1):
        t0 = (_TD0[(s0 >> 24) & 0xFF] ^ _TD1[(s3 >> 16) & 0xFF]
              ^ _TD2[(s2 >> 8) & 0xFF] ^ _TD3[s1 & 0xFF] ^ words[k])
        t1 = (_TD0[(s1 >> 24) & 0xFF] ^ _TD1[(s0 >> 16) & 0xFF]
              ^ _TD2[(s3 >> 8) & 0xFF] ^ _TD3[s2 & 0xFF] ^ words[k + 1])
        t2 = (_TD0[(s2 >> 24) & 0xFF] ^ _TD1[(s1 >> 16) & 0xFF]
              ^ _TD2[(s0 >> 8) & 0xFF] ^ _TD3[s3 & 0xFF] ^ words[k + 2])
        t3 = (_TD0[(s3 >> 24) & 0xFF] ^ _TD1[(s2 >> 16) & 0xFF]
              ^ _TD2[(s1 >> 8) & 0xFF] ^ _TD3[s0 & 0xFF] ^ words[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    sb = _INV_SBOX
    o0 = ((sb[(s0 >> 24) & 0xFF] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
          | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ words[k]
    o1 = ((sb[(s1 >> 24) & 0xFF] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
          | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ words[k + 1]
    o2 = ((sb[(s2 >> 24) & 0xFF] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
          | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ words[k + 2]
    o3 = ((sb[(s3 >> 24) & 0xFF] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
          | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ words[k + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    if _Cipher is not None:
        enc = _Cipher(_algorithms.AES(key), _modes.ECB()).encryptor()
        return enc.update(block) + enc.finalize()
    return _encrypt_block_w(block, _expand_key(key), len(key) // 4 + 6)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    if _Cipher is not None:
        dec = _Cipher(_algorithms.AES(key), _modes.ECB()).decryptor()
        return dec.update(block) + dec.finalize()
    return _decrypt_block_w(
        block, _expand_key_dec(key), len(key) // 4 + 6
    )


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt WITHOUT padding (callers pad; PDF uses PKCS#7)."""
    if len(data) % 16:
        raise ValueError("CBC data must be block-aligned")
    if _Cipher is not None:
        enc = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()
    words = _expand_key(key)
    rounds = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i: i + 16], prev))
        prev = _encrypt_block_w(blk, words, rounds)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC data must be block-aligned")
    if _Cipher is not None:
        dec = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).decryptor()
        return dec.update(data) + dec.finalize()
    words = _expand_key_dec(key)
    rounds = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i: i + 16]
        out += bytes(
            a ^ b
            for a, b in zip(_decrypt_block_w(blk, words, rounds), prev)
        )
        prev = blk
    return bytes(out)
