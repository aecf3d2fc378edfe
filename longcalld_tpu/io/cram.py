"""CRAM 3.0 / 3.1 container reading and writing.

Replaces the CRAM half of htslib's alignment-file support used by the
reference (`hts_set_fai_filename` + `sam_itr_*` CRAM decode,
/root/reference/src/call_var_main.c:661-712, and `--out-cram` phased output,
:753-754).  Independent implementation of the CRAM container format:

* file definition (versions 3.0 and 3.1), containers, blocks
  (raw/gzip/bzip2/lzma/rANS-4x8/rANS-Nx16)
* compression header (preservation map, data-series encodings, tag dict)
* slice decode: EXTERNAL / HUFFMAN / BETA / BYTE_ARRAY_STOP / BYTE_ARRAY_LEN
  codecs, reference-based sequence reconstruction via read features
* writer: reference-based features (=/X/I/D/S/H/N/P vs the FASTA),
  EXTERNAL-only encodings, per-block gzip or rANS (4x8 for 3.0 quals,
  Nx16 for 3.1 externals), .crai index; `version=(3, 1)` selects 3.1
* records surface as io.bam.BamRecord (raw BAM bytes are synthesized), so
  the rest of the pipeline is container-agnostic

Entropy codecs live in native/rans4x8.c and native/ransnx16.c (ctypes,
built lazily like the sdust kernel).  The Nx16 decoder covers the full
3.1 flag surface (order-0/1, 4/32-way, PACK, RLE, CAT, STRIPE, NOSZ,
compressed order-1 tables); the encoder emits order-0/1, PACK and CAT.
"""

from __future__ import annotations

import bz2
import ctypes
import gzip
import lzma
import os
import struct
import subprocess
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from longcalld_tpu.io.bam import (CDEL, CDIFF, CEQUAL, CHARD_CLIP, CINS,
                                  CMATCH, CPAD, CREF_SKIP, CSOFT_CLIP,
                                  FUNMAP, SEQ_NT16_STR, BamRecord)

MAGIC = b"CRAM\x03\x00"
# canonical v3 EOF container (CRAM 3.0 spec section 9)
EOF_V3 = bytes.fromhex(
    "0f000000ffffffff0fe0454f4600000000010005bdd94f0001000606010001"
    "000100ee63014b")

BLK_RAW, BLK_GZIP, BLK_BZIP2, BLK_LZMA, BLK_RANS = 0, 1, 2, 3, 4
BLK_RANSNX16 = 5               # CRAM 3.1 rANS Nx16
CT_FILE_HEADER, CT_COMP_HEADER, CT_SLICE_HEADER = 0, 1, 2
CT_EXTERNAL, CT_CORE = 4, 5

ENC_NULL, ENC_EXTERNAL, ENC_GOLOMB, ENC_HUFFMAN = 0, 1, 2, 3
ENC_BYTE_ARRAY_LEN, ENC_BYTE_ARRAY_STOP, ENC_BETA, ENC_SUBEXP = 4, 5, 6, 7
ENC_GAMMA = 9

CF_QUAL_STORED = 0x1
CF_DETACHED = 0x2
CF_MATE_DOWNSTREAM = 0x4

_BASES = "ACGTN"
_NT16_OF = {c: i for i, c in enumerate(SEQ_NT16_STR)}
_CIGAR_CHARS = "MIDNSHP=X"


# ---------------------------------------------------------------- rANS glue

_rans = None


def _rans_lib():
    global _rans
    if _rans is not None:
        return _rans
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "native", "rans4x8.c")
    so = os.path.join(here, "..", "native", "_rans4x8.so")
    from longcalld_tpu.utils.cbuild import build_so
    if not build_so(src, so, flags=("-O2",)):
        raise OSError("cannot build rans4x8 codec")
    lib = ctypes.CDLL(so)
    lib.rans_encode0.restype = ctypes.c_int64
    lib.rans_encode1.restype = ctypes.c_int64
    lib.rans_decode0.restype = ctypes.c_int
    lib.rans_decode1.restype = ctypes.c_int
    _rans = lib
    return lib


def rans_compress(data: bytes, order: int = 0) -> bytes:
    lib = _rans_lib()
    src = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros(len(src) * 2 + 300000, dtype=np.uint8)
    fn = lib.rans_encode0 if order == 0 or len(src) < 4 else lib.rans_encode1
    order = 0 if (order == 0 or len(src) < 4) else 1
    n = fn(src.ctypes.data_as(ctypes.c_void_p), len(src),
           out.ctypes.data_as(ctypes.c_void_p))
    if n < 0:
        raise ValueError("rans encode failed")
    head = struct.pack("<BII", order, int(n), len(data))
    return head + bytes(out[:n])


def rans_uncompress(data: bytes) -> bytes:
    lib = _rans_lib()
    order, comp_sz, raw_sz = struct.unpack_from("<BII", data, 0)
    payload = np.frombuffer(data, dtype=np.uint8, offset=9)
    out = np.zeros(max(raw_sz, 1), dtype=np.uint8)
    fn = lib.rans_decode0 if order == 0 else lib.rans_decode1
    r = fn(payload.ctypes.data_as(ctypes.c_void_p), len(payload),
           out.ctypes.data_as(ctypes.c_void_p), raw_sz)
    if r != 0:
        raise ValueError("rans decode failed")
    return bytes(out[:raw_sz])


# -------- rANS Nx16 (CRAM 3.1 method 5), native/ransnx16.c --------

RNX_ORDER1, RNX_N32, RNX_STRIPE = 0x01, 0x04, 0x08
RNX_NOSZ, RNX_CAT, RNX_RLE, RNX_PACK = 0x10, 0x20, 0x40, 0x80

_ransnx16 = None


def _ransnx16_lib():
    global _ransnx16
    if _ransnx16 is not None:
        return _ransnx16
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "native", "ransnx16.c")
    so = os.path.join(here, "..", "native", "_ransnx16.so")
    from longcalld_tpu.utils.cbuild import build_so
    if not build_so(src, so, flags=("-O2",)):
        raise OSError("cannot build ransnx16 codec")
    lib = ctypes.CDLL(so)
    lib.ransnx16_encode.restype = ctypes.c_int64
    lib.ransnx16_encode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int]
    lib.ransnx16_decode.restype = ctypes.c_int64
    lib.ransnx16_decode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int64]
    _ransnx16 = lib
    return lib


def ransnx16_compress(data: bytes, flags: int = 0) -> bytes:
    """Encode one rANS Nx16 stream (flags: RNX_* bits; ORDER1 falls back
    to order-0 on tiny inputs inside the codec)."""
    lib = _ransnx16_lib()
    src = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros(len(src) * 2 + 300000, dtype=np.uint8)
    n = lib.ransnx16_encode(src.ctypes.data_as(ctypes.c_void_p), len(src),
                            out.ctypes.data_as(ctypes.c_void_p), flags)
    if n < 0:
        raise ValueError("ransnx16 encode failed")
    return bytes(out[:n])


def ransnx16_uncompress(data: bytes, raw_size: int) -> bytes:
    """Decode one rANS Nx16 stream.  raw_size: the block's declared raw
    size (used as the buffer bound and the NOSZ length)."""
    lib = _ransnx16_lib()
    src = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros(max(raw_size, 1), dtype=np.uint8)
    n = lib.ransnx16_decode(src.ctypes.data_as(ctypes.c_void_p), len(src),
                            out.ctypes.data_as(ctypes.c_void_p), raw_size,
                            raw_size)
    if n < 0:
        raise ValueError("ransnx16 decode failed")
    return bytes(out[:n])


# ---------------------------------------------------------------- varints

class Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def i32(self) -> int:
        v = struct.unpack_from("<i", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def itf8(self) -> int:
        b0 = self.u8()
        if b0 < 0x80:
            v = b0
        elif b0 < 0xC0:
            v = ((b0 & 0x3F) << 8) | self.u8()
        elif b0 < 0xE0:
            v = ((b0 & 0x1F) << 16) | (self.u8() << 8) | self.u8()
        elif b0 < 0xF0:
            v = ((b0 & 0x0F) << 24) | (self.u8() << 16) | \
                (self.u8() << 8) | self.u8()
        else:
            v = ((b0 & 0x0F) << 28) | (self.u8() << 20) | \
                (self.u8() << 12) | (self.u8() << 4) | (self.u8() & 0x0F)
        # ITF8 is a signed 32-bit value
        return v - (1 << 32) if v >= (1 << 31) else v

    def ltf8(self) -> int:
        b0 = self.u8()
        n_extra = 0
        mask = b0
        for bit in (0x80, 0x40, 0x20, 0x10, 0x08, 0x04, 0x02, 0x01):
            if mask & bit:
                n_extra += 1
            else:
                break
        if n_extra == 0:
            return b0
        if n_extra >= 8:
            v = 0
            for _ in range(8):
                v = (v << 8) | self.u8()
        else:
            v = b0 & ((1 << (7 - n_extra)) - 1)
            for _ in range(n_extra):
                v = (v << 8) | self.u8()
        return v - (1 << 64) if v >= (1 << 63) else v


def itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                      v & 0xFF])
    return bytes([0xF0 | ((v >> 28) & 0x0F), (v >> 20) & 0xFF,
                  (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F])


def ltf8(v: int) -> bytes:
    v &= (1 << 64) - 1
    if v < 0x80:
        return bytes([v])
    # choose the smallest representation: n_extra trailing bytes plus
    # (7 - n_extra) payload bits in the prefix byte
    for n_extra in range(1, 8):
        top_bits = 7 - n_extra
        if v < (1 << (8 * n_extra + top_bits)):
            prefix = (0xFF << (8 - n_extra)) & 0xFF
            out = [prefix | (v >> (8 * n_extra))]
            for k in range(n_extra - 1, -1, -1):
                out.append((v >> (8 * k)) & 0xFF)
            return bytes(out)
    out = [0xFF]
    for k in range(7, -1, -1):
        out.append((v >> (8 * k)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- blocks

def _compress(method: int, data: bytes) -> bytes:
    if method == BLK_RAW:
        return data
    if method == BLK_GZIP:
        # mtime=0: the gzip header must not embed wall-clock time —
        # identical record streams must produce byte-identical CRAMs
        # (checkpoint replay and determinism tests rely on it)
        return gzip.compress(data, 6, mtime=0)
    if method == BLK_BZIP2:
        return bz2.compress(data)
    if method == BLK_LZMA:
        return lzma.compress(data)
    if method == BLK_RANS:
        return rans_compress(data, order=0)
    if method == BLK_RANSNX16:
        return ransnx16_compress(data, flags=RNX_ORDER1
                                 if len(data) > 4096 else 0)
    raise ValueError(f"method {method}")


def _uncompress(method: int, data: bytes, raw_size: int) -> bytes:
    if method == BLK_RAW:
        return data
    if method == BLK_GZIP:
        return gzip.decompress(data)
    if method == BLK_BZIP2:
        return bz2.decompress(data)
    if method == BLK_LZMA:
        return lzma.decompress(data)
    if method == BLK_RANS:
        return rans_uncompress(data)
    if method == BLK_RANSNX16:
        return ransnx16_uncompress(data, raw_size)
    names = {6: "adaptive arithmetic", 7: "fqzcomp", 8: "name tokeniser"}
    raise ValueError(
        f"unsupported CRAM compression method {method}"
        f" ({names.get(method, 'unknown')}); supported: raw/gzip/bzip2/"
        f"lzma/rANS-4x8/rANS-Nx16 — re-encode the CRAM with "
        f"`samtools view -O cram,version=3.0` or convert to BAM")


class Block:
    __slots__ = ("method", "content_type", "content_id", "data")

    def __init__(self, content_type: int, content_id: int, data: bytes,
                 method: int = BLK_RAW):
        self.method = method
        self.content_type = content_type
        self.content_id = content_id
        self.data = data

    def serialize(self) -> bytes:
        comp = _compress(self.method, self.data)
        out = bytes([self.method, self.content_type]) + \
            itf8(self.content_id) + itf8(len(comp)) + \
            itf8(len(self.data)) + comp
        return out + struct.pack("<I", zlib.crc32(out) & 0xFFFFFFFF)

    @staticmethod
    def parse(cur: Cursor) -> "Block":
        start = cur.pos
        method = cur.u8()
        ctype = cur.u8()
        cid = cur.itf8()
        comp_size = cur.itf8()
        raw_size = cur.itf8()
        comp = cur.read(comp_size)
        crc = cur.u32()
        _ = crc  # integrity is best-effort; zlib/gzip have their own checks
        data = _uncompress(method, comp, raw_size)
        b = Block(ctype, cid, data, method)
        return b


# ---------------------------------------------------------------- encodings

class BitReader:
    __slots__ = ("buf", "pos", "bit")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.bit = 0

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.buf[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class Encoding:
    """One data-series codec instance (spec section 13)."""

    def __init__(self, codec: int, params: bytes):
        self.codec = codec
        c = Cursor(params)
        if codec == ENC_EXTERNAL:
            self.content_id = c.itf8()
        elif codec == ENC_HUFFMAN:
            n = c.itf8()
            self.symbols = [c.itf8() for _ in range(n)]
            m = c.itf8()
            self.lengths = [c.itf8() for _ in range(m)]
            self._build_huffman()
        elif codec == ENC_BYTE_ARRAY_LEN:
            lc = c.itf8()
            lp = c.read(c.itf8())
            vc = c.itf8()
            vp = c.read(c.itf8())
            self.len_enc = Encoding(lc, lp)
            self.val_enc = Encoding(vc, vp)
        elif codec == ENC_BYTE_ARRAY_STOP:
            self.stop = c.u8()
            self.content_id = c.itf8()
        elif codec == ENC_BETA:
            self.offset = c.itf8()
            self.nbits = c.itf8()
        elif codec == ENC_GAMMA:
            self.offset = c.itf8()
        elif codec == ENC_NULL:
            pass
        else:
            raise ValueError(f"unsupported encoding codec {codec}")

    def _build_huffman(self):
        # canonical code assignment (symbols sorted by (len, symbol order))
        pairs = sorted(zip(self.lengths, range(len(self.symbols))))
        self.table: Dict[Tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        self.zero_len = all(l == 0 for l in self.lengths)
        if self.zero_len:
            self.const = self.symbols[0]
            return
        for ln, idx in pairs:
            code <<= (ln - prev_len)
            prev_len = ln
            self.table[(ln, code)] = self.symbols[idx]
            code += 1

    # --- integer / byte reads ---
    def read_int(self, core: BitReader, ext: Dict[int, Cursor]) -> int:
        if self.codec == ENC_EXTERNAL:
            return ext[self.content_id].itf8()
        if self.codec == ENC_HUFFMAN:
            if self.zero_len:
                return self.const
            ln = 0
            code = 0
            while True:
                code = (code << 1) | core.bits(1)
                ln += 1
                if (ln, code) in self.table:
                    return self.table[(ln, code)]
                if ln > 31:
                    raise ValueError("bad huffman stream")
        if self.codec == ENC_BETA:
            return core.bits(self.nbits) - self.offset
        if self.codec == ENC_GAMMA:
            n = 0
            while core.bits(1) == 0:
                n += 1
            v = (1 << n) | core.bits(n)
            return v - self.offset
        raise ValueError(f"read_int on codec {self.codec}")

    def read_byte(self, core: BitReader, ext: Dict[int, Cursor]) -> int:
        if self.codec == ENC_EXTERNAL:
            return ext[self.content_id].u8()
        return self.read_int(core, ext)

    def read_bytes(self, core: BitReader, ext: Dict[int, Cursor]) -> bytes:
        if self.codec == ENC_BYTE_ARRAY_STOP:
            cur = ext[self.content_id]
            end = cur.buf.index(bytes([self.stop]), cur.pos)
            b = cur.buf[cur.pos:end]
            cur.pos = end + 1
            return b
        if self.codec == ENC_BYTE_ARRAY_LEN:
            n = self.len_enc.read_int(core, ext)
            if self.val_enc.codec == ENC_EXTERNAL:
                return self.val_enc_read(ext, n)
            return bytes(self.val_enc.read_byte(core, ext) for _ in range(n))
        raise ValueError(f"read_bytes on codec {self.codec}")

    def val_enc_read(self, ext: Dict[int, Cursor], n: int) -> bytes:
        return ext[self.val_enc.content_id].read(n)


def enc_external(content_id: int) -> bytes:
    p = itf8(content_id)
    return itf8(ENC_EXTERNAL) + itf8(len(p)) + p


def enc_byte_array_stop(stop: int, content_id: int) -> bytes:
    p = bytes([stop]) + itf8(content_id)
    return itf8(ENC_BYTE_ARRAY_STOP) + itf8(len(p)) + p


def enc_byte_array_len(len_cid: int, val_cid: int) -> bytes:
    le = enc_external(len_cid)
    ve = enc_external(val_cid)
    p = le + ve
    return itf8(ENC_BYTE_ARRAY_LEN) + itf8(len(p)) + p


# ------------------------------------------------------- compression header

# fixed content-id assignment for series we write
SERIES_IDS = {
    "BF": 1, "CF": 2, "RL": 4, "AP": 5, "RG": 6, "MF": 7, "NS": 8,
    "NP": 9, "TS": 10, "NF": 11, "TL": 12, "FN": 13, "FC": 14, "FP": 15,
    "DL": 16, "BS": 17, "IN": 18, "SC": 19, "HC": 20, "PD": 21, "RS": 22,
    "MQ": 23, "BA": 24, "QS": 25, "RN": 26, "RI": 27, "BB": 28, "QQ": 29,
}
TAG_LEN_ID = 40
TAG_VAL_ID = 41

_INT_SERIES = ("BF", "CF", "RI", "RL", "AP", "RG", "MF", "NS", "NP", "TS",
               "NF", "TL", "FN", "FP", "DL", "HC", "PD", "RS", "MQ")
_BYTE_SERIES = ("FC", "BS", "BA", "QS")
_ARR_SERIES = ("RN", "IN", "SC", "BB", "QQ")

_DEFAULT_SM = bytes([0x1B] * 5)  # identity-order substitution codes


class CompressionHeader:
    def __init__(self):
        self.read_names_included = True
        self.ap_delta = False
        self.reference_required = True
        self.sub_matrix = _DEFAULT_SM
        self.tag_lines: List[List[Tuple[bytes, int]]] = [[]]
        self.encodings: Dict[str, Encoding] = {}
        self.tag_encodings: Dict[int, Encoding] = {}
        self._sub_tab = self._build_sub(self.sub_matrix)

    @staticmethod
    def _build_sub(sm: bytes):
        # sub_tab[ref_base_idx][code] -> substituted base char
        tab = []
        for r, byte in enumerate(sm):
            alts = [b for b in range(5) if b != r]
            row = [None] * 4
            for k, a in enumerate(alts):
                code = (byte >> (6 - 2 * k)) & 3
                row[code] = _BASES[a]
            tab.append(row)
        return tab

    def serialize(self) -> bytes:
        # preservation map
        pm = bytearray()
        n = 0
        for key, val in ((b"RN", self.read_names_included),
                         (b"AP", self.ap_delta),
                         (b"RR", self.reference_required)):
            pm += key + bytes([1 if val else 0])
            n += 1
        pm += b"SM" + self.sub_matrix
        n += 1
        td = bytearray()
        for line in self.tag_lines:
            for tag, typ in line:
                td += tag + bytes([typ])
            td += b"\x00"
        pm += b"TD" + itf8(len(td)) + td
        n += 1
        pres = itf8(n) + bytes(pm)

        # data series encodings (all EXTERNAL / byte-array)
        dse = bytearray()
        n = 0
        for s in _INT_SERIES + _BYTE_SERIES:
            dse += s.encode() + enc_external(SERIES_IDS[s])
            n += 1
        dse += b"RN" + enc_byte_array_stop(9, SERIES_IDS["RN"])
        n += 1
        for s in ("IN", "SC", "BB"):
            dse += s.encode() + enc_byte_array_stop(0, SERIES_IDS[s])
            n += 1
        dse += b"QQ" + enc_byte_array_len(SERIES_IDS["QQ"], SERIES_IDS["QQ"])
        n += 1
        series = itf8(n) + bytes(dse)

        # tag encodings: every tag uses BYTE_ARRAY_LEN over two shared
        # external streams
        te = bytearray()
        keys = set()
        for line in self.tag_lines:
            for tag, typ in line:
                keys.add((tag[0] << 16) | (tag[1] << 8) | typ)
        for key in sorted(keys):
            te += itf8(key) + enc_byte_array_len(TAG_LEN_ID, TAG_VAL_ID)
        tags = itf8(len(keys)) + bytes(te)

        body = (itf8(len(pres)) + pres + itf8(len(series)) + series +
                itf8(len(tags)) + tags)
        # note: the spec nests sizes differently (size prefix then map);
        # parse() mirrors this layout exactly
        return body

    @staticmethod
    def parse(data: bytes) -> "CompressionHeader":
        h = CompressionHeader()
        cur = Cursor(data)
        # preservation map
        _sz = cur.itf8()
        n = cur.itf8()
        for _ in range(n):
            key = cur.read(2)
            if key == b"RN":
                h.read_names_included = bool(cur.u8())
            elif key == b"AP":
                h.ap_delta = bool(cur.u8())
            elif key == b"RR":
                h.reference_required = bool(cur.u8())
            elif key == b"SM":
                h.sub_matrix = cur.read(5)
                h._sub_tab = h._build_sub(h.sub_matrix)
            elif key == b"TD":
                blob = cur.read(cur.itf8())
                h.tag_lines = []
                line: List[Tuple[bytes, int]] = []
                i = 0
                while i < len(blob):
                    if blob[i] == 0:
                        h.tag_lines.append(line)
                        line = []
                        i += 1
                    else:
                        line.append((blob[i:i + 2], blob[i + 2]))
                        i += 3
                if not h.tag_lines:
                    h.tag_lines = [[]]
            else:
                raise ValueError(f"unknown preservation key {key!r}")
        # data series encodings
        _sz = cur.itf8()
        n = cur.itf8()
        for _ in range(n):
            key = cur.read(2).decode()
            codec = cur.itf8()
            params = cur.read(cur.itf8())
            h.encodings[key] = Encoding(codec, params)
        # tag encodings
        _sz = cur.itf8()
        n = cur.itf8()
        for _ in range(n):
            key = cur.itf8()
            codec = cur.itf8()
            params = cur.read(cur.itf8())
            h.tag_encodings[key] = Encoding(codec, params)
        return h


# ---------------------------------------------------------------- reg2bin

def _reg2bin(beg: int, end: int) -> int:
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


_TAG_SIZES = {ord("c"): 1, ord("C"): 1, ord("s"): 2, ord("S"): 2,
              ord("i"): 4, ord("I"): 4, ord("f"): 4, ord("A"): 1}


def _tag_value_len(typ: int, buf: bytes, off: int) -> int:
    """Byte length of a BAM aux value of ``typ`` at ``off``."""
    if typ in _TAG_SIZES:
        return _TAG_SIZES[typ]
    if typ in (ord("Z"), ord("H")):
        return buf.index(b"\x00", off) + 1 - off
    if typ == ord("B"):
        st = buf[off]
        cnt = struct.unpack_from("<i", buf, off + 1)[0]
        return 5 + cnt * _TAG_SIZES[st]
    raise ValueError(f"tag type {chr(typ)}")


# ---------------------------------------------------------------- slices

class SliceHeader:
    def __init__(self, ref_id: int, start: int, span: int, n_records: int,
                 counter: int, content_ids: List[int],
                 embedded_ref_id: int = -1, md5: bytes = b"\x00" * 16):
        self.ref_id = ref_id
        self.start = start
        self.span = span
        self.n_records = n_records
        self.counter = counter
        self.content_ids = content_ids
        self.embedded_ref_id = embedded_ref_id
        self.md5 = md5

    def serialize(self) -> bytes:
        out = itf8(self.ref_id) + itf8(self.start) + itf8(self.span)
        out += itf8(self.n_records) + ltf8(self.counter)
        out += itf8(len(self.content_ids) + 1)  # +1 for the core block
        out += itf8(len(self.content_ids))
        for cid in self.content_ids:
            out += itf8(cid)
        out += itf8(self.embedded_ref_id) + self.md5
        return out

    @staticmethod
    def parse(data: bytes) -> "SliceHeader":
        c = Cursor(data)
        ref_id = c.itf8()
        start = c.itf8()
        span = c.itf8()
        n_records = c.itf8()
        counter = c.ltf8()
        _n_blocks = c.itf8()
        n_ids = c.itf8()
        ids = [c.itf8() for _ in range(n_ids)]
        emb = c.itf8()
        md5 = c.read(16)
        return SliceHeader(ref_id, start, span, n_records, counter, ids,
                           emb, md5)


def _decode_slice(comp: CompressionHeader, sl: SliceHeader,
                  blocks: List[Block], ref_bytes: Optional[bytes],
                  ref_off: int, references: List[str]) -> List[BamRecord]:
    """Decode one slice into synthesized BAM records.

    ``ref_bytes``/``ref_off``: reference bases covering the slice span
    (uppercase ASCII), with ref_off = 0-based position of ref_bytes[0].
    """
    core = BitReader(b"")
    ext: Dict[int, Cursor] = {}
    for b in blocks:
        if b.content_type == CT_CORE:
            core = BitReader(b.data)
        elif b.content_type == CT_EXTERNAL:
            ext[b.content_id] = Cursor(b.data)
    E = comp.encodings

    def rint(series: str) -> int:
        return E[series].read_int(core, ext)

    def rbyte(series: str) -> int:
        return E[series].read_byte(core, ext)

    def rbytes(series: str) -> bytes:
        return E[series].read_bytes(core, ext)

    recs: List[Tuple] = []
    last_ap = sl.start
    for rec_i in range(sl.n_records):
        bf = rint("BF")
        cf = rint("CF")
        ref_id = rint("RI") if sl.ref_id == -2 else sl.ref_id
        rl = rint("RL")
        ap = rint("AP")
        if comp.ap_delta:
            ap = last_ap + ap
            last_ap = ap
        rg = rint("RG") if "RG" in E else -1
        name = rbytes("RN") if comp.read_names_included else b""
        mf = 0
        ns = -1
        np_ = 0
        ts = 0
        nf = -1
        if cf & CF_DETACHED:
            mf = rint("MF")
            if not comp.read_names_included:
                name = rbytes("RN")
            ns = rint("NS")
            np_ = rint("NP")
            ts = rint("TS")
        elif cf & CF_MATE_DOWNSTREAM:
            nf = rint("NF")
        tl = rint("TL")
        tags = bytearray()
        for tag, typ in comp.tag_lines[tl]:
            key = (tag[0] << 16) | (tag[1] << 8) | typ
            val = comp.tag_encodings[key].read_bytes(core, ext)
            tags += tag + bytes([typ]) + val
        if not (bf & FUNMAP):
            fn = rint("FN")
            feats = []
            prev = 0
            for _ in range(fn):
                fc = chr(rbyte("FC"))
                fp = prev + rint("FP")
                prev = fp
                if fc == "X":
                    feats.append((fp, "X", rbyte("BS")))
                elif fc == "B":
                    feats.append((fp, "B", (rbyte("BA"), rbyte("QS"))))
                elif fc == "I":
                    feats.append((fp, "I", rbytes("IN")))
                elif fc == "i":
                    feats.append((fp, "i", rbyte("BA")))
                elif fc == "S":
                    feats.append((fp, "S", rbytes("SC")))
                elif fc == "D":
                    feats.append((fp, "D", rint("DL")))
                elif fc == "N":
                    feats.append((fp, "N", rint("RS")))
                elif fc == "H":
                    feats.append((fp, "H", rint("HC")))
                elif fc == "P":
                    feats.append((fp, "P", rint("PD")))
                elif fc == "b":
                    feats.append((fp, "b", rbytes("BB")))
                elif fc == "q":
                    feats.append((fp, "q", rbytes("QQ")))
                elif fc == "Q":
                    feats.append((fp, "Q", rbyte("QS")))
                else:
                    raise ValueError(f"feature code {fc!r}")
            mq = rint("MQ")
            qual = (bytes(rbyte("QS") for _ in range(rl))
                    if cf & CF_QUAL_STORED else b"\xff" * rl)
            seq, cigar = _reconstruct_seq(comp, feats, rl, ap, ref_bytes,
                                          ref_off)
        else:
            feats = []
            mq = 0
            seq = bytes(rbyte("BA") for _ in range(rl))
            qual = (bytes(rbyte("QS") for _ in range(rl))
                    if cf & CF_QUAL_STORED else b"\xff" * rl)
            cigar = []
        recs.append((bf, cf, ref_id, rl, ap, rg, name, mf, ns, np_, ts, nf,
                     bytes(tags), mq, seq, cigar, qual))

    # mate resolution for NF (records in the same slice); our writer always
    # uses detached mates, this is interop support
    out: List[BamRecord] = []
    for i, r in enumerate(recs):
        (bf, cf, ref_id, rl, ap, rg, name, mf, ns, np_, ts, nf, tags, mq,
         seq, cigar, qual) = r
        flag = bf
        if cf & CF_DETACHED:
            if mf & 1:
                flag |= 0x20
            if mf & 2:
                flag |= 0x8
        elif nf >= 0 and i + nf + 1 < len(recs):
            mate = recs[i + nf + 1]
            ns, np_ = mate[2], mate[4]
            ts = 0
        out.append(_synth_bam(flag, ref_id, ap - 1, mq, name, cigar, seq,
                              qual, ns, np_ - 1, ts, tags))
    return out


def _reconstruct_seq(comp: CompressionHeader, feats, rl: int, ap: int,
                     ref_bytes: Optional[bytes], ref_off: int):
    """Apply read features to the reference (spec section 10.3); returns
    (seq ascii bytes, cigar [(op, len)])."""
    seq = bytearray(rl)
    cig: List[List[int]] = []

    def ref_base(p0: int) -> str:
        if ref_bytes is None:
            return "N"
        k = p0 - ref_off
        if 0 <= k < len(ref_bytes):
            return chr(ref_bytes[k]).upper()
        return "N"

    def push(op: int, ln: int):
        if ln <= 0:
            return
        if cig and cig[-1][0] == op:
            cig[-1][1] += ln
        else:
            cig.append([op, ln])

    qpos = 0          # 0-based read index
    rpos = ap - 1     # 0-based ref index

    def copy_match(upto: int):
        nonlocal qpos, rpos
        while qpos < upto and qpos < rl:
            seq[qpos] = ord(ref_base(rpos))
            qpos += 1
            rpos += 1
            push(CEQUAL, 1)

    for fpos, code, val in feats:
        copy_match(fpos - 1)
        if code == "X":
            rb = ref_base(rpos)
            ri = _BASES.index(rb) if rb in _BASES else 4
            seq[qpos] = ord(comp._sub_tab[ri][val] or "N")
            push(CDIFF, 1)
            qpos += 1
            rpos += 1
        elif code == "B":
            base, _q = val
            seq[qpos] = base
            push(CDIFF if chr(base) != ref_base(rpos) else CEQUAL, 1)
            qpos += 1
            rpos += 1
        elif code == "I":
            seq[qpos:qpos + len(val)] = val
            push(CINS, len(val))
            qpos += len(val)
        elif code == "i":
            seq[qpos] = val
            push(CINS, 1)
            qpos += 1
        elif code == "S":
            seq[qpos:qpos + len(val)] = val
            push(CSOFT_CLIP, len(val))
            qpos += len(val)
        elif code == "D":
            push(CDEL, val)
            rpos += val
        elif code == "N":
            push(CREF_SKIP, val)
            rpos += val
        elif code == "H":
            push(CHARD_CLIP, val)
        elif code == "P":
            push(CPAD, val)
        elif code == "b":
            seq[qpos:qpos + len(val)] = val
            push(CMATCH, len(val))
            qpos += len(val)
            rpos += len(val)
        elif code == "q":
            pass  # partial quals: superseded by the stored-qual array
        elif code == "Q":
            pass
    copy_match(rl)
    return bytes(seq), [(op, ln) for op, ln in cig]


def _synth_bam(flag: int, tid: int, pos: int, mapq: int, name: bytes,
               cigar: List[Tuple[int, int]], seq: bytes, qual: bytes,
               next_tid: int, next_pos: int, tlen: int,
               tags: bytes) -> BamRecord:
    name = (name or b"*") + b"\x00"
    ref_span = sum(ln for op, ln in cigar
                   if op in (CMATCH, CEQUAL, CDIFF, CDEL, CREF_SKIP))
    bin_ = _reg2bin(max(pos, 0), max(pos, 0) + max(ref_span, 1))
    head = struct.pack("<iiBBHHHiiii", tid, pos, len(name), mapq, bin_,
                       len(cigar), flag, len(seq), next_tid, next_pos, tlen)
    body = bytearray(head)
    body += name
    for op, ln in cigar:
        body += struct.pack("<I", (ln << 4) | op)
    packed = bytearray((len(seq) + 1) // 2)
    for i, ch in enumerate(seq):
        code = _NT16_OF.get(chr(ch).upper(), 15)
        if i % 2 == 0:
            packed[i // 2] = code << 4
        else:
            packed[i // 2] |= code
    body += packed
    body += qual
    body += tags
    return BamRecord(bytes(body))


# ---------------------------------------------------------------- reader

class CramReader:
    """CRAM 3.0 reader with the same surface as io.bam.BamReader."""

    def __init__(self, path: str, ref_fa_fn: Optional[str] = None):
        from longcalld_tpu.io.remote import fetch_url, is_url, resolve_url
        self.path = path
        if is_url(path):
            # remote CRAM: one-shot download (containers are not BGZF, so
            # range reuse is poor; the reference's htslib streams these too)
            self._data = fetch_url(resolve_url(path))
        else:
            with open(path, "rb") as f:
                self._data = f.read()
        if (self._data[:4] != b"CRAM" or self._data[4] != 3
                or self._data[5] not in (0, 1)):
            raise ValueError("not a CRAM 3.0/3.1 file")
        self._fasta = None
        if ref_fa_fn:
            from longcalld_tpu.io.fasta import FastaFile
            self._fasta = FastaFile(ref_fa_fn)
        cur = Cursor(self._data, 26)  # magic(4) + version(2) + file id(20)
        # SAM header container
        hdr_start, hdr_end, blocks = self._read_container(cur)
        text_block = blocks[0]
        tc = Cursor(text_block.data)
        text_len = tc.i32()
        self.header_text = tc.read(text_len).decode()
        self.references: List[str] = []
        self.lengths: List[int] = []
        for line in self.header_text.splitlines():
            if line.startswith("@SQ"):
                d = dict(fld.split(":", 1) for fld in line.split("\t")[1:]
                         if ":" in fld)
                self.references.append(d["SN"])
                self.lengths.append(int(d["LN"]))
        self._first_data_container = cur.pos
        self._crai = self._load_crai(path + ".crai")

    def name2tid(self, name: str) -> int:
        try:
            return self.references.index(name)
        except ValueError:
            return -1

    @staticmethod
    def _load_crai(path: str):
        from longcalld_tpu.io.remote import fetch_url, is_url
        if is_url(path):
            try:
                text = gzip.decompress(fetch_url(path)).decode()
            except OSError:
                return None
        elif os.path.exists(path):
            with gzip.open(path, "rt") as f:
                text = f.read()
        else:
            return None
        out = []
        for line in text.splitlines():
            parts = line.split()
            if len(parts) >= 6:
                out.append(tuple(int(x) for x in parts[:6]))
        return out

    def _read_container(self, cur: Cursor):
        """Parse one container at cur; returns (header_start, end_pos,
        blocks).  Leaves cur at the container end."""
        start = cur.pos
        length = cur.i32()
        ref_id = cur.itf8()
        ref_start = cur.itf8()
        span = cur.itf8()
        n_records = cur.itf8()
        counter = cur.ltf8()
        bases = cur.ltf8()
        n_blocks = cur.itf8()
        n_land = cur.itf8()
        for _ in range(n_land):
            cur.itf8()
        _crc = cur.u32()
        body_start = cur.pos
        blocks = []
        for _ in range(n_blocks):
            blocks.append(Block.parse(cur))
        cur.pos = body_start + length
        return start, cur.pos, blocks

    def _slice_records(self, comp: CompressionHeader, blocks: List[Block],
                      idx: int) -> List[BamRecord]:
        """Decode the slice starting at blocks[idx] (a slice header)."""
        sl = SliceHeader.parse(blocks[idx].data)
        n_following = len(sl.content_ids) + 1
        slice_blocks = blocks[idx + 1: idx + 1 + n_following]
        ref_bytes = None
        ref_off = 0
        if sl.embedded_ref_id >= 0:
            for b in slice_blocks:
                if b.content_id == sl.embedded_ref_id:
                    ref_bytes = b.data
                    ref_off = sl.start - 1
        elif self._fasta is not None and 0 <= sl.ref_id < len(self.references):
            ref_off = max(0, sl.start - 1)
            ref_bytes = self._fasta.fetch(
                self.references[sl.ref_id], ref_off,
                sl.start - 1 + sl.span).upper()
        return _decode_slice(comp, sl, slice_blocks, ref_bytes, ref_off,
                             self.references)

    def _container_records(self, pos: int) -> List[BamRecord]:
        cur = Cursor(self._data, pos)
        _, _, blocks = self._read_container(cur)
        if not blocks:
            return []
        if blocks[0].content_type != CT_COMP_HEADER:
            return []
        comp = CompressionHeader.parse(blocks[0].data)
        out = []
        i = 1
        while i < len(blocks):
            if blocks[i].content_type == CT_SLICE_HEADER:
                sl = SliceHeader.parse(blocks[i].data)
                out.extend(self._slice_records(comp, blocks, i))
                i += 1 + len(sl.content_ids) + 1
            else:
                i += 1
        return out

    def __iter__(self) -> Iterator[BamRecord]:
        cur = Cursor(self._data, self._first_data_container)
        while cur.pos < len(self._data):
            if self._data[cur.pos:cur.pos + len(EOF_V3)] == EOF_V3:
                break
            pos = cur.pos
            _, end, _ = self._read_container(cur)
            for rec in self._container_records(pos):
                yield rec
            cur.pos = end

    @property
    def index(self):
        """Scheduling adapter: exposes window_volumes like BaiIndex so the
        range planner cost-balances CRAM inputs too (None without .crai)."""
        return self if self._crai is not None else None

    def _byte_density(self, tid: int):
        """Cached piecewise-constant bytes-per-bp density for one contig:
        every .crai slice spreads its byte size uniformly over its genomic
        span, so the per-window volume is the integral of the summed
        density over the window — one O(S log S) build per contig instead
        of an O(S x W) pass per call (S slices can reach tens of thousands
        on whole-genome CRAMs).  Returns (xs breakpoints, F prefix
        integral at xs, rate per segment) or None when the contig has no
        slices."""
        import numpy as np
        cache = getattr(self, "_density_cache", None)
        if cache is None:
            cache = self._density_cache = {}
        got = cache.get(tid)
        if got is not None or tid in cache:
            return got
        s0s, s1s, rates = [], [], []
        for e in self._crai:
            if e[0] != tid:
                continue
            s0, span, size = e[1] - 1, e[2], e[5]
            s0s.append(s0)
            s1s.append(s0 + max(span, 1))
            rates.append(size / max(span, 1))
        if not s0s:
            cache[tid] = None
            return None
        s0s = np.asarray(s0s, dtype=np.int64)
        s1s = np.asarray(s1s, dtype=np.int64)
        rates = np.asarray(rates, dtype=np.float64)
        xs = np.unique(np.concatenate([s0s, s1s]))
        delta = np.zeros(len(xs), dtype=np.float64)
        np.add.at(delta, np.searchsorted(xs, s0s), rates)
        np.add.at(delta, np.searchsorted(xs, s1s), -rates)
        rate = np.cumsum(delta)               # density on [xs[i], xs[i+1])
        F = np.zeros(len(xs), dtype=np.float64)
        np.cumsum(rate[:-1] * np.diff(xs), out=F[1:])
        cache[tid] = (xs, F, rate)
        return cache[tid]

    def window_volumes(self, tid: int, begs, ends):
        """Approximate compressed-byte volume per window from the .crai:
        each slice's byte size apportioned to windows by genomic overlap
        fraction (BaiIndex.window_volumes analog), evaluated as the prefix
        integral of the cached per-contig byte density."""
        import numpy as np
        begs = np.asarray(begs, dtype=np.int64)
        ends = np.asarray(ends, dtype=np.int64)
        if self._crai is None:
            return np.zeros(len(begs), dtype=np.int64)
        dens = self._byte_density(tid)
        if dens is None:
            return np.zeros(len(begs), dtype=np.int64)
        xs, F, rate = dens

        def integral(pos):
            i = np.searchsorted(xs, pos, side="right") - 1
            lo = np.clip(i, 0, len(xs) - 1)
            inside = (i >= 0) & (i < len(xs) - 1)
            out = np.where(i < 0, 0.0, np.where(i >= len(xs) - 1, F[-1],
                                                F[lo]))
            return out + np.where(inside, rate[lo] * (pos - xs[lo]), 0.0)

        return (integral(ends) - integral(begs)).astype(np.int64)

    def window_certainly_empty(self, tid: int, beg: int, end: int) -> bool:
        """Index-only emptiness test (BamReader.window_certainly_empty
        analog) via the .crai slice table."""
        if self._crai is None:
            return False
        return not any(e[0] == tid and e[1] - 1 < end and e[1] - 1 + e[2] > beg
                       for e in self._crai)

    def windows_busy(self, tid: int, begs, ends):
        """Vectorized emptiness test over many windows (BamReader
        analog) against the .crai slice table."""
        import numpy as np
        begs = np.asarray(begs, dtype=np.int64)
        ends = np.asarray(ends, dtype=np.int64)
        busy = np.zeros(len(begs), dtype=bool)
        if self._crai is None:
            busy[:] = True
            return busy
        for e in self._crai:
            if e[0] == tid:
                busy |= (e[1] - 1 < ends) & (e[1] - 1 + e[2] > begs)
        return busy

    def fetch(self, tid: int, beg: int, end: int) -> List[BamRecord]:
        """Records overlapping [beg, end) 0-based half-open (BamReader
        semantics)."""
        out = []
        if self._crai is not None:
            offsets = sorted({e[3] for e in self._crai
                              if e[0] == tid and e[1] - 1 < end
                              and e[1] - 1 + e[2] > beg})
            for off in offsets:
                out.extend(self._container_records(off))
        else:
            out = list(self)
        return [r for r in out
                if r.tid == tid and r.pos < end and r.endpos > beg]


# ---------------------------------------------------------------- writer

_REV_NT16 = {i: c for c, i in _NT16_OF.items()}


class CramWriter:
    """Reference-based CRAM 3.0 writer (one slice per container)."""

    def __init__(self, path: str, header_text: str, references: List[str],
                 lengths: List[int], ref_fa_fn: str,
                 records_per_slice: int = 1000, use_rans: bool = True,
                 version: tuple = (3, 0)):
        from longcalld_tpu.io.fasta import FastaFile
        self._fh = open(path, "wb")
        self._crai_fh = gzip.open(path + ".crai", "wt")
        self._fasta = FastaFile(ref_fa_fn)
        self.references = references
        self.lengths = lengths
        self._rps = records_per_slice
        self._use_rans = use_rans
        if version not in ((3, 0), (3, 1)):
            raise ValueError(f"unsupported CRAM version {version}")
        self._version = version
        self._counter = 0
        self._pending: List[BamRecord] = []
        self._pending_tid = -9
        self._fh.write(b"CRAM" + bytes(version) + b"\x00" * 20)
        text = header_text.encode()
        block = Block(CT_FILE_HEADER, 0,
                      struct.pack("<i", len(text)) + text, BLK_GZIP)
        self._write_container(-1, 0, 0, 0, [block])

    def _write_container(self, ref_id: int, start: int, span: int,
                         n_records: int, blocks: List[Block]) -> int:
        payload = b"".join(b.serialize() for b in blocks)
        landmarks = [0]
        hdr = itf8(ref_id) + itf8(start) + itf8(span) + itf8(n_records)
        hdr += ltf8(self._counter) + ltf8(0) + itf8(len(blocks))
        hdr += itf8(len(landmarks))
        for lm in landmarks:
            hdr += itf8(lm)
        head = struct.pack("<i", len(payload)) + hdr
        crc = struct.pack("<I", zlib.crc32(head) & 0xFFFFFFFF)
        pos = self._fh.tell()
        self._fh.write(head + crc + payload)
        return pos

    def write_record(self, rec: BamRecord) -> None:
        if rec.tid != self._pending_tid or len(self._pending) >= self._rps:
            self.flush()
            self._pending_tid = rec.tid
        self._pending.append(rec)

    def flush(self) -> None:
        if not self._pending:
            return
        recs = self._pending
        self._pending = []
        tid = self._pending_tid

        comp = CompressionHeader()
        # tag dictionary from the records
        line_of: Dict[Tuple, int] = {(): 0}
        comp.tag_lines = [[]]
        rec_lines = []
        rec_tags: List[List[Tuple[bytes, int, bytes]]] = []
        for rec in recs:
            tl: List[Tuple[bytes, int, bytes]] = []
            raw = rec._raw
            off = rec._tag_off
            while off + 3 <= len(raw):
                tag = raw[off:off + 2]
                typ = raw[off + 2]
                vlen = _tag_value_len(typ, raw, off + 3)
                tl.append((tag, typ, raw[off + 3:off + 3 + vlen]))
                off += 3 + vlen
            key = tuple((t, ty) for t, ty, _ in tl)
            if key not in line_of:
                line_of[key] = len(comp.tag_lines)
                comp.tag_lines.append([(t, ty) for t, ty in key])
            rec_lines.append(line_of[key])
            rec_tags.append(tl)

        streams: Dict[int, bytearray] = {}

        def put_int(series: str, v: int):
            streams.setdefault(SERIES_IDS[series], bytearray()).extend(
                itf8(v))

        def put_byte(series: str, v: int):
            streams.setdefault(SERIES_IDS[series], bytearray()).append(
                v & 0xFF)

        def put_arr(series: str, b: bytes, stop: int):
            st = streams.setdefault(SERIES_IDS[series], bytearray())
            st += b
            st.append(stop)

        ref_name = self.references[tid] if tid >= 0 else None
        pmin = min((r.pos for r in recs if r.pos >= 0), default=0)
        pmax = max((r.endpos for r in recs), default=pmin + 1)
        ref = (self._fasta.fetch(ref_name, pmin, pmax).upper()
               if ref_name else b"")

        for rec, tl_idx, tl in zip(recs, rec_lines, rec_tags):
            raw = rec._raw
            put_int("BF", rec.flag)
            put_int("CF", CF_QUAL_STORED | CF_DETACHED)
            put_int("RL", rec.l_seq)
            put_int("AP", rec.pos + 1 if rec.pos >= 0 else 0)
            put_int("RG", -1)
            put_arr("RN", rec.qname.encode(), 9)
            mf = ((1 if rec.flag & 0x20 else 0) |
                  (2 if rec.flag & 0x8 else 0))
            put_int("MF", mf)
            ntid, npos, tlen = struct.unpack_from("<iii", raw, 20)
            put_int("NS", ntid)
            put_int("NP", npos + 1 if npos >= 0 else 0)
            put_int("TS", tlen)
            put_int("TL", tl_idx)
            for tag, typ, val in tl:
                streams.setdefault(TAG_LEN_ID, bytearray()).extend(
                    itf8(len(val)))
                streams.setdefault(TAG_VAL_ID, bytearray()).extend(val)
            seq = "".join(_REV_NT16.get((raw[rec._seq_off + i // 2] >>
                                         (4 if i % 2 == 0 else 0)) & 0xF,
                                        "N")
                          for i in range(rec.l_seq))
            qual = raw[rec._qual_off:rec._qual_off + rec.l_seq]
            if not (rec.flag & FUNMAP):
                feats = self._features(rec, seq, qual, ref, pmin)
                put_int("FN", len(feats))
                prev = 0
                for fpos, code, val in feats:
                    put_byte("FC", ord(code))
                    put_int("FP", fpos - prev)
                    prev = fpos
                    if code == "X":
                        put_byte("BS", val)
                    elif code == "B":
                        put_byte("BA", val[0])
                        put_byte("QS", val[1])
                    elif code == "I":
                        put_arr("IN", val, 0)
                    elif code == "S":
                        put_arr("SC", val, 0)
                    elif code == "D":
                        put_int("DL", val)
                    elif code == "N":
                        put_int("RS", val)
                    elif code == "H":
                        put_int("HC", val)
                    elif code == "P":
                        put_int("PD", val)
                put_int("MQ", rec.mapq)
                streams.setdefault(SERIES_IDS["QS"], bytearray()).extend(
                    qual)
            else:
                streams.setdefault(SERIES_IDS["BA"], bytearray()).extend(
                    seq.encode())
                streams.setdefault(SERIES_IDS["QS"], bytearray()).extend(
                    qual)

        content_ids = sorted(streams)
        sl = SliceHeader(tid, pmin + 1 if recs and recs[0].pos >= 0 else 0,
                         max(1, pmax - pmin), len(recs), self._counter,
                         content_ids)
        blocks = [Block(CT_COMP_HEADER, 0, comp.serialize(), BLK_GZIP),
                  Block(CT_SLICE_HEADER, 0, sl.serialize(), BLK_RAW),
                  Block(CT_CORE, 0, b"", BLK_RAW)]
        # CRAM 3.1 files entropy-code externals with rANS Nx16 (method 5,
        # the htslib default there); 3.0 keeps rANS 4x8 for quals
        rans_m = BLK_RANSNX16 if self._version >= (3, 1) else BLK_RANS
        for cid in content_ids:
            data = bytes(streams[cid])
            if self._version >= (3, 1) and len(data) > 100:
                method = rans_m
            elif (self._use_rans and cid == SERIES_IDS["QS"]
                    and len(data) > 100):
                method = rans_m
            else:
                method = BLK_GZIP
            blocks.append(Block(CT_EXTERNAL, cid, data, method))

        # container (slice offset = bytes of comp-header block)
        comp_block_len = len(blocks[0].serialize())
        slice_len = sum(len(b.serialize()) for b in blocks[1:])
        pos = self._write_container(tid, sl.start, sl.span, len(recs),
                                    blocks)
        self._crai_fh.write(
            f"{tid}\t{sl.start}\t{sl.span}\t{pos}\t{comp_block_len}\t"
            f"{slice_len}\n")
        self._counter += len(recs)

    @staticmethod
    def _features(rec: BamRecord, seq: str, qual: bytes, ref: bytes,
                  ref_off: int):
        feats = []
        qpos = 0
        rpos = rec.pos
        for op, ln in rec.cigar_array():
            op = int(op)
            ln = int(ln)
            if op in (CMATCH, CEQUAL, CDIFF):
                for k in range(ln):
                    rk = rpos + k - ref_off
                    rb = chr(ref[rk]) if 0 <= rk < len(ref) else "N"
                    qb = seq[qpos + k]
                    if qb == rb:
                        continue
                    if qb in "ACGT" and rb in _BASES:
                        ri = _BASES.index(rb)
                        alts = [b for b in range(5) if b != ri]
                        code = None
                        for ci, a in enumerate(alts):
                            if _BASES[a] == qb:
                                # identity matrix: code == position index
                                code = (_DEFAULT_SM[ri] >> (6 - 2 * ci)) & 3
                        feats.append((qpos + k + 1, "X", code))
                    else:
                        feats.append((qpos + k + 1, "B",
                                      (ord(qb), qual[qpos + k])))
                qpos += ln
                rpos += ln
            elif op == CINS:
                feats.append((qpos + 1, "I",
                              seq[qpos:qpos + ln].encode()))
                qpos += ln
            elif op == CSOFT_CLIP:
                feats.append((qpos + 1, "S",
                              seq[qpos:qpos + ln].encode()))
                qpos += ln
            elif op == CDEL:
                feats.append((qpos + 1, "D", ln))
                rpos += ln
            elif op == CREF_SKIP:
                feats.append((qpos + 1, "N", ln))
                rpos += ln
            elif op == CHARD_CLIP:
                feats.append((qpos + 1, "H", ln))
            elif op == CPAD:
                feats.append((qpos + 1, "P", ln))
        return feats

    def close(self) -> None:
        self.flush()
        self._fh.write(EOF_V3)
        self._fh.close()
        self._crai_fh.close()


def is_cram(path: str) -> bool:
    from longcalld_tpu.io.remote import is_url
    if is_url(path):
        # remote inputs route by extension: probing 4 magic bytes would
        # cost a round-trip per candidate (htslib does the same via hts_
        # format guessing on the opened hfile; .cram URLs are rare enough)
        return path.split("?", 1)[0].rstrip("/").endswith(".cram")
    try:
        with open(path, "rb") as f:
            return f.read(4) == b"CRAM"
    except OSError:
        return False

