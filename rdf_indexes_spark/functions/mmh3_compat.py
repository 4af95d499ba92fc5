"""MurmurHash3 x64_128 — byte-compatible with the `mmh3` package's
hash64/hash128 (the reference's `--hash` id mode uses
``mmh3.hash64(term, signed=False)[0]``,
/root/reference/scripts/extract_vocabs.py:49-52). The algorithm is Austin
Appleby's public-domain MurmurHash3; this is an independent pure-Python
implementation (the mmh3 C extension is not available in this
environment), verified against the mmh3 project's published test vectors
in tests/test_reference_parity.py.

This module doubles as an import shim: its ``hash64``/``hash128`` match
the mmh3 API, so tests copy it next to the reference scripts as
``mmh3.py`` to execute their --hash path unmodified.

Hot-path note: this is the PARITY implementation (per-row Python inside
an Arrow batch). The engine's default hash-id mode stays ``xxhash64``
(pure JVM codegen) — choose mmh3 only when ids must byte-match a corpus
hashed by the reference scripts.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def mmh3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """(h1, h2) as unsigned 64-bit ints."""
    length = len(data)
    h1 = seed & _MASK
    h2 = seed & _MASK
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (_rotl((k1 * _C1) & _MASK, 31) * _C2) & _MASK
        h1 ^= k1
        h1 = ((_rotl(h1, 27) + h2) * 5 + 0x52DCE729) & _MASK
        k2 = (_rotl((k2 * _C2) & _MASK, 33) * _C1) & _MASK
        h2 ^= k2
        h2 = ((_rotl(h2, 31) + h1) * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16 :]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        h2 ^= (_rotl((k2 * _C2) & _MASK, 33) * _C1) & _MASK
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        h1 ^= (_rotl((k1 * _C1) & _MASK, 31) * _C2) & _MASK
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def _to_bytes(key) -> bytes:
    return key.encode("utf-8") if isinstance(key, str) else bytes(key)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def hash64(key, seed: int = 0, x64arch: bool = True, signed: bool = True):
    """mmh3.hash64-compatible: two 64-bit halves of the x64_128 hash."""
    if not x64arch:
        raise NotImplementedError("only the x64 variant is implemented")
    h1, h2 = mmh3_x64_128(_to_bytes(key), seed)
    return (_signed(h1), _signed(h2)) if signed else (h1, h2)


def hash128(key, seed: int = 0, x64arch: bool = True, signed: bool = False) -> int:
    """mmh3.hash128-compatible: the full 128-bit hash as one int."""
    if not x64arch:
        raise NotImplementedError("only the x64 variant is implemented")
    h1, h2 = mmh3_x64_128(_to_bytes(key), seed)
    v = h1 | (h2 << 64)
    return v - (1 << 128) if signed and v >= 1 << 127 else v


def hash64_unsigned_str(terms):
    """pandas Series[str] → Series[str] of str(uint64 first half) — the
    exact transformation the reference applies to terms in --hash mode
    (str(numpy.uint64(mmh3.hash64(term, signed=False)[0])))."""
    return terms.map(lambda t: str(mmh3_x64_128(t.encode("utf-8"))[0]))
