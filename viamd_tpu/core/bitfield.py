"""Packed bitfields for atom selection masks.

TPU-native equivalent of mdlib's md_bitfield_t (reference capability surface:
/root/reference/src/viamd.h:1504-1546 — and/or/andnot/not, popcount, iteration,
hashing, base64 serialization for .via workspaces at src/main.cpp:1140-1147).

Design: a fixed-size mask over `count` bits stored as packed uint64 words in
NumPy.  Selections are evaluated host-side into Bitfields; the script/eval
compiler converts them either to dense bool/float masks (device arrays feeding
masked reductions on the VPU) or to static int32 gather index lists (feeding
MXU-friendly gathered coordinate blocks).  At VIAMD's design scale of 100M
atoms a mask is 12.5 MB (src/main.cpp:1134-1138) — packed words keep host ops
cache-friendly and O(n/64).
"""

from __future__ import annotations

import base64 as _base64
import zlib
from typing import Iterator

import numpy as np

_WORD_BITS = 64


class Bitfield:
    """Fixed-length packed bit mask with set-algebra ops.

    Words beyond `count` bits are kept zero (canonical form) so that
    popcount/hash/equality are well-defined.
    """

    __slots__ = ("count", "words")

    def __init__(self, count: int, words: np.ndarray | None = None):
        self.count = int(count)
        nwords = (self.count + _WORD_BITS - 1) // _WORD_BITS
        if words is None:
            self.words = np.zeros(nwords, dtype=np.uint64)
        else:
            assert words.dtype == np.uint64 and words.shape == (nwords,)
            self.words = words
            self._mask_tail()

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_bools(cls, mask) -> "Bitfield":
        mask = np.asarray(mask, dtype=bool)
        bf = cls(mask.size)
        packed = np.packbits(mask, bitorder="little")
        raw = np.zeros(bf.words.size * 8, dtype=np.uint8)
        raw[: packed.size] = packed
        bf.words = raw.view(np.uint64).copy()
        bf._mask_tail()
        return bf

    @classmethod
    def from_indices(cls, count: int, indices) -> "Bitfield":
        bf = cls(count)
        idx = np.asarray(indices, dtype=np.int64)
        if idx.size:
            w, b = np.divmod(idx, _WORD_BITS)
            np.bitwise_or.at(bf.words, w, np.uint64(1) << b.astype(np.uint64))
        return bf

    @classmethod
    def from_range(cls, count: int, beg: int, end: int) -> "Bitfield":
        bf = cls(count)
        bf.set_range(beg, end)
        return bf

    @classmethod
    def full(cls, count: int) -> "Bitfield":
        bf = cls(count)
        bf.words[:] = np.uint64(0xFFFFFFFFFFFFFFFF)
        bf._mask_tail()
        return bf

    # -- canonical form ------------------------------------------------------
    def _mask_tail(self):
        rem = self.count % _WORD_BITS
        if rem and self.words.size:
            self.words[-1] &= np.uint64((1 << rem) - 1)

    # -- element access ------------------------------------------------------
    def set_bit(self, i: int, value: bool = True):
        w, b = divmod(int(i), _WORD_BITS)
        if value:
            self.words[w] |= np.uint64(1) << np.uint64(b)
        else:
            self.words[w] &= ~(np.uint64(1) << np.uint64(b))

    def test_bit(self, i: int) -> bool:
        w, b = divmod(int(i), _WORD_BITS)
        return bool((self.words[w] >> np.uint64(b)) & np.uint64(1))

    def set_range(self, beg: int, end: int):
        """Set bits [beg, end)."""
        beg, end = max(0, int(beg)), min(self.count, int(end))
        if beg >= end:
            return
        idx = np.arange(beg, end, dtype=np.int64)
        w, b = np.divmod(idx, _WORD_BITS)
        np.bitwise_or.at(self.words, w, np.uint64(1) << b.astype(np.uint64))

    def clear(self):
        self.words[:] = 0

    # -- set algebra ---------------------------------------------------------
    def __and__(self, o: "Bitfield") -> "Bitfield":
        return Bitfield(self.count, self.words & o.words)

    def __or__(self, o: "Bitfield") -> "Bitfield":
        return Bitfield(self.count, self.words | o.words)

    def __xor__(self, o: "Bitfield") -> "Bitfield":
        return Bitfield(self.count, self.words ^ o.words)

    def __invert__(self) -> "Bitfield":
        return Bitfield(self.count, ~self.words)

    def andnot(self, o: "Bitfield") -> "Bitfield":
        return Bitfield(self.count, self.words & ~o.words)

    def __eq__(self, o) -> bool:
        return (
            isinstance(o, Bitfield)
            and self.count == o.count
            and bool(np.array_equal(self.words, o.words))
        )

    def __hash__(self):
        return hash((self.count, self.words.tobytes()))

    # -- queries -------------------------------------------------------------
    def popcount(self) -> int:
        return int(np.bitwise_count(self.words).sum())

    def __len__(self) -> int:
        return self.count

    def __bool__(self) -> bool:
        return bool(self.words.any())

    def any(self) -> bool:
        return bool(self.words.any())

    def first_set(self) -> int:
        """Index of the first set bit, or -1."""
        nz = np.nonzero(self.words)[0]
        if not nz.size:
            return -1
        w = int(nz[0])
        word = int(self.words[w])
        return w * _WORD_BITS + (word & -word).bit_length() - 1

    def indices(self) -> np.ndarray:
        """Set-bit indices as int32 array (host-side; static gather lists)."""
        return np.nonzero(self.to_bools())[0].astype(np.int32)

    def __iter__(self) -> Iterator[int]:
        return iter(self.indices().tolist())

    def to_bools(self) -> np.ndarray:
        bits = np.unpackbits(self.words.view(np.uint8), bitorder="little")
        return bits[: self.count].astype(bool)

    def to_f32(self) -> np.ndarray:
        """Dense float32 0/1 mask (device-friendly for masked VPU reductions)."""
        return self.to_bools().astype(np.float32)

    def hash64(self) -> int:
        return zlib.crc32(self.words.tobytes()) ^ (self.count << 32)

    # -- serialization (workspace .via compatibility) ------------------------
    def to_base64(self) -> str:
        """Compressed base64 of the packed words (deflate + b64)."""
        payload = self.count.to_bytes(8, "little") + zlib.compress(
            self.words.tobytes(), 6
        )
        return _base64.b64encode(payload).decode("ascii")

    @classmethod
    def from_base64(cls, s: str) -> "Bitfield":
        payload = _base64.b64decode(s)
        count = int.from_bytes(payload[:8], "little")
        raw = zlib.decompress(payload[8:])
        words = np.frombuffer(raw, dtype=np.uint64).copy()
        return cls(count, words)

    def __repr__(self):
        return f"Bitfield({self.popcount()}/{self.count} set)"
