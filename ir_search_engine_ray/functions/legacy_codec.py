"""Reference-parity legacy codecs: Elias gamma/delta and front coding.

The serving index uses delta-gap + varint (functions/codec.py, per the north
rule).  These bit-level codecs exist for capability parity with the
reference's three on-disk formats (SURVEY.md S4-S6, F1/F2/F5):

- ``gamma(n)``: unary(len(offset)) ++ offset bits — ``pyindex/utils.py:4-10``,
  ``util/Utils.java:73-78``;
- ``delta(n)``: gamma(len(binary(n))) ++ offset bits — ``pyindex/utils.py:13-19``,
  ``util/Utils.java:80-85``;
- front coding of a sorted term block: common prefix + ``*`` + first suffix,
  then ``|``-prefixed extra chars of each following term —
  ``pyindex/compressed_index.py:44-84``, ``util/Utils.java:152-176``.

Unlike the reference implementations, these round-trip: the Python reference
packs gamma codes into uint16 (overflowing for gaps needing >16 bits,
``pyindex/compressed_index.py:32``) and the Java ``gapToBytes`` returns an
all-zero buffer (``util/Utils.java:87-98``).  Property tests in
tests/test_legacy.py verify encode->decode identity over adversarial values.

Gamma/delta cannot encode 0 (the offset construction needs n >= 1) — the
reference only ever codes gaps and lengths, which are >= 1.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def write_bits(self, bits: str) -> None:
        self._bits.extend(1 if b == "1" else 0 for b in bits)

    def getvalue(self) -> bytes:
        bits = np.array(self._bits, dtype=np.uint8)
        pad = (-bits.size) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
        return np.packbits(bits).tobytes()

    def __len__(self) -> int:
        return len(self._bits)


def gamma_bits(n: int) -> str:
    """Elias gamma code of n >= 1 as a bit string."""
    if n < 1:
        raise ValueError("gamma requires n >= 1")
    offset = bin(n)[3:]  # binary sans leading '1'
    return "1" * len(offset) + "0" + offset


def delta_bits(n: int) -> str:
    """Elias delta code of n >= 1 as a bit string."""
    if n < 1:
        raise ValueError("delta requires n >= 1")
    body = bin(n)[2:]
    return gamma_bits(len(body)) + body[1:]


def gamma_encode(values) -> bytes:
    w = BitWriter()
    for v in np.asarray(values, dtype=np.int64):
        w.write_bits(gamma_bits(int(v)))
    return w.getvalue()


def delta_encode(values) -> bytes:
    w = BitWriter()
    for v in np.asarray(values, dtype=np.int64):
        w.write_bits(delta_bits(int(v)))
    return w.getvalue()


class _BitReader:
    def __init__(self, buf: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.pos = 0

    def read_unary(self) -> int:
        n = 0
        while self.bits[self.pos] == 1:
            n += 1
            self.pos += 1
        self.pos += 1  # consume the terminating 0
        return n

    def read_bits(self, k: int) -> int:
        out = 0
        for _ in range(k):
            out = (out << 1) | int(self.bits[self.pos])
            self.pos += 1
        return out

    def exhausted(self) -> bool:
        # remaining bits can only be zero padding
        return self.pos >= self.bits.size or not self.bits[self.pos :].any()


def gamma_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    r = _BitReader(buf)
    out = []
    while (count is None and not r.exhausted()) or (
        count is not None and len(out) < count
    ):
        k = r.read_unary()
        out.append((1 << k) | r.read_bits(k))
    return np.array(out, dtype=np.int64)


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    r = _BitReader(buf)
    out = []
    while (count is None and not r.exhausted()) or (
        count is not None and len(out) < count
    ):
        k = r.read_unary()
        length = (1 << k) | r.read_bits(k)
        out.append((1 << (length - 1)) | r.read_bits(length - 1))
    return np.array(out, dtype=np.int64)


def front_code_block(terms: list[str]) -> str:
    """Front-code one sorted term block.

    ``<len><prefix>*<suffix>`` for the first term, then ``<extra_len>|<extra>``
    per following term (reference block layout, ``pyindex/compressed_index.py:
    55-66``); len counts are rendered as decimal digits like the reference's
    string dictionary."""
    if not terms:
        return ""
    import os.path

    prefix = os.path.commonprefix(terms)
    out = [f"{len(terms[0])}{prefix}*{terms[0][len(prefix):]}"]
    for t in terms[1:]:
        extra = t[len(prefix):]
        out.append(f"{len(extra)}|{extra}")
    return "".join(out)


def front_decode_block(blob: str) -> list[str]:
    """Inverse of :func:`front_code_block`."""
    if not blob:
        return []
    i = 0
    # first entry: <len><prefix>*<suffix>
    j = i
    while blob[j].isdigit():
        j += 1
    first_len = int(blob[i:j])
    star = blob.index("*", j)
    prefix_full = blob[j:star]
    suffix_len = first_len - len(prefix_full)
    first = prefix_full + blob[star + 1 : star + 1 + suffix_len]
    prefix = prefix_full
    terms = [first]
    i = star + 1 + suffix_len
    while i < len(blob):
        j = i
        while blob[j].isdigit():
            j += 1
        extra_len = int(blob[i:j])
        assert blob[j] == "|"
        terms.append(prefix + blob[j + 1 : j + 1 + extra_len])
        i = j + 1 + extra_len
    return terms
