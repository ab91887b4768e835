"""gzip (RFC 1952) wrapper over our flate codec.

Reference parity: gzip/gzip.go + gzip/gunzip.go — header fields (name,
comment, extra, mtime, OS), multistream reading, CRC-32 verification.
"""

from __future__ import annotations

import zlib as _zlib  # stdlib: crc32 only (C-speed IEEE CRC)

from dataclasses import dataclass, field

from compress_tpu.flate import deflate, inflate

MAGIC = b"\x1f\x8b"
_DEFLATE_CM = 8
_FLG_TEXT, _FLG_HCRC, _FLG_EXTRA, _FLG_NAME, _FLG_COMMENT = 1, 2, 4, 8, 16


class GzipError(ValueError):
    pass


@dataclass
class Header:
    """Reference: gzip.Header{Comment, Extra, ModTime, Name, OS}."""

    name: str = ""
    comment: str = ""
    extra: bytes = b""
    mtime: int = 0
    os: int = 255


def _encode_header(h: Header, level: int) -> bytes:
    """Serialize the RFC 1952 member header (shared by compress() and
    the streaming Writer)."""
    flg = 0
    if h.extra:
        flg |= _FLG_EXTRA
    if h.name:
        flg |= _FLG_NAME
    if h.comment:
        flg |= _FLG_COMMENT
    out = bytearray(MAGIC)
    out.append(_DEFLATE_CM)
    out.append(flg)
    out += h.mtime.to_bytes(4, "little")
    out.append(2 if level >= 9 else (4 if level <= 2 else 0))  # XFL
    out.append(h.os)
    if h.extra:
        out += len(h.extra).to_bytes(2, "little") + h.extra
    if h.name:
        out += h.name.encode("latin-1") + b"\x00"
    if h.comment:
        out += h.comment.encode("latin-1") + b"\x00"
    return bytes(out)


def compress(data, level: int = 6, header: Header | None = None) -> bytes:
    data = bytes(data)
    h = header or Header()
    out = bytearray(_encode_header(h, level))
    out += deflate(data, level)
    out += (_zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "little")
    out += (len(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def decompress(blob, multistream: bool = True, max_size: int = 1 << 31):
    """Returns (data, Header of the first member)."""
    blob = bytes(blob)
    pos = 0
    out = bytearray()
    first_header = None
    while pos < len(blob):
        if blob[pos : pos + 2] != MAGIC:
            raise GzipError("bad magic")
        if blob[pos + 2] != _DEFLATE_CM:
            raise GzipError("unknown compression method")
        flg = blob[pos + 3]
        h = Header(mtime=int.from_bytes(blob[pos + 4 : pos + 8], "little"),
                   os=blob[pos + 9])
        p = pos + 10
        if flg & _FLG_EXTRA:
            xlen = int.from_bytes(blob[p : p + 2], "little")
            h.extra = blob[p + 2 : p + 2 + xlen]
            p += 2 + xlen
        if flg & _FLG_NAME:
            end = blob.index(0, p)
            h.name = blob[p:end].decode("latin-1")
            p = end + 1
        if flg & _FLG_COMMENT:
            end = blob.index(0, p)
            h.comment = blob[p:end].decode("latin-1")
            p = end + 1
        if flg & _FLG_HCRC:
            p += 2
        if first_header is None:
            first_header = h
        # decode the member; find its end by tracking consumed bits
        consumed = {}

        def cb(cp):
            consumed["end"] = (cp.compressed_offset, cp.bit_offset, cp.final)

        data = inflate(blob[p:], max_size=max_size - len(out), eob_callback=cb)
        endb, endbit, _ = consumed["end"]
        p += endb + (1 if endbit else 0)
        want_crc = int.from_bytes(blob[p : p + 4], "little")
        want_len = int.from_bytes(blob[p + 4 : p + 8], "little")
        if _zlib.crc32(data) & 0xFFFFFFFF != want_crc:
            raise GzipError("crc mismatch")
        if len(data) & 0xFFFFFFFF != want_len:
            raise GzipError("length mismatch")
        out += data
        pos = p + 8
        if not multistream:
            break
    return bytes(out), first_header


__all__ = ["compress", "decompress", "Header", "GzipError", "MAGIC"]


class Writer:
    """Streaming gzip writer with bounded memory (reference: gzip.Writer,
    gzip/gzip.go:36): header on first write, deflate blocks stream via
    flate.Writer's native continuation entry, CRC-32 and ISIZE trail at
    close()."""

    def __init__(self, dst, level: int = 6, header: Header | None = None):
        self.dst = dst
        self._hdr = header or Header()
        self._level = level
        self._fw = None
        self._crc = 0
        self._n = 0
        self._closed = False

    def _ensure(self):
        if self._fw is not None:
            return
        self.dst.write(_encode_header(self._hdr, self._level))
        from compress_tpu.flate.deflate import Writer as _FW

        self._fw = _FW(self.dst, level=self._level)

    def write(self, data) -> int:
        if self._closed:
            raise GzipError("writer closed")
        data = bytes(data)
        self._ensure()
        self._crc = _zlib.crc32(data, self._crc)
        self._n += len(data)
        return self._fw.write(data)

    def flush(self):
        if self._closed:
            raise GzipError("writer closed")
        self._ensure()
        self._fw.flush()

    def close(self):
        if self._closed:
            return
        self._ensure()
        self._fw.close()
        self.dst.write((self._crc & 0xFFFFFFFF).to_bytes(4, "little"))
        self.dst.write((self._n & 0xFFFFFFFF).to_bytes(4, "little"))
        self._closed = True
