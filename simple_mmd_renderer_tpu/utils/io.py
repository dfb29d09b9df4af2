"""Binary cursor reader for MMD file formats.

Equivalent in role to libmmd's FileReader (`util/dwarf.inl`): whole-buffer
reads of packed little-endian records, variable-width indices, and
UTF-16LE/UTF-8 length-prefixed strings. Index semantics match
`FileReader::ReadIndex` (`util/dwarf_impl.inl:84-105`): 1 byte -> uint8,
2 bytes -> uint16, 4 bytes -> int32 (so "none" is 255/65535/-1 and callers
range-check against the entity count).
"""

from __future__ import annotations

import struct

import numpy as np


class BinReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def remaining(self) -> int:
        return len(self.buf) - self.pos

    def read(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.buf, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def read_bytes(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("buffer length exceeded")
        self.pos += n
        return out

    def read_array(self, dtype, count: int) -> np.ndarray:
        dt = np.dtype(dtype).newbyteorder("<")
        nbytes = dt.itemsize * count
        out = np.frombuffer(self.buf, dt, count, self.pos).copy()
        self.pos += nbytes
        return out

    _INDEX_FMT = {1: "B", 2: "H", 4: "i"}

    def read_index(self, size: int) -> int:
        return self.read(self._INDEX_FMT[size])

    def read_text(self, utf8: bool) -> str:
        length = self.read("i")
        raw = self.read_bytes(length)
        return raw.decode("utf-8" if utf8 else "utf-16-le", errors="replace")


def decode_shift_jis(raw: bytes) -> str:
    """ShiftJIS fixed-width name field -> str, stopping at the first NUL.

    Mirrors ShiftJISToUTF16String over mmd_string<N>
    (`util/dwarf_impl.inl:216-229`).
    """
    nul = raw.find(b"\x00")
    if nul >= 0:
        raw = raw[:nul]
    return raw.decode("cp932", errors="replace")


def encode_shift_jis(text: str, width: int) -> bytes:
    raw = text.encode("cp932", errors="replace")[:width]
    return raw + b"\x00" * (width - len(raw))
