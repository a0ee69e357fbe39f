"""FLAC codec for the data loader (no external audio deps in the image).

The reference decodes shard audio with torchaudio/sox, which accepts flac
among others (`/root/reference/wenet/dataset/processor.py:178-211`,
`tools/make_shard.py:36` AUDIO_FORMAT_SETS).  This environment ships no
audio library at all, so:

* decode: native C++ decoder (`native/pafc_native.cpp: flac_decode`,
  spec-complete for the common stream surface) with a pure-python
  transliteration as fallback;
* encode: pure-python writer (fixed-order-2 + rice residuals, correct
  CRC-8/CRC-16) used by `bin/make_shard.py --audio_format flac` and the
  round-trip tests.
"""
from __future__ import annotations

import ctypes
import struct
from typing import Optional, Tuple

import numpy as np

from paper_accurate_fast_cheap_tpu import native


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

def decode_flac(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """bytes -> (float32 samples in [-1, 1], shape (T,) mono or (T, C);
    sample_rate).  Returns None if the payload is not FLAC."""
    if len(data) < 42 or data[:4] != b"fLaC":
        return None
    out = _decode_native(data)
    if out is None:
        out = _decode_python(data)
    if out is None:
        return None
    pcm, sr, bps = out
    scale = float(1 << (bps - 1))
    x = pcm.astype(np.float32) / scale
    if x.ndim == 2 and x.shape[1] == 1:
        x = x[:, 0]
    return x, sr


def _decode_native(data: bytes):
    L = native.lib()
    if L is None or not hasattr(L, "flac_decode"):
        return None
    # exact capacity from STREAMINFO (mandatory first metadata block);
    # generous bound if total_samples is unset
    info = struct.unpack(">Q", data[18:26])[0]
    total = info & ((1 << 36) - 1)
    nch = ((info >> 41) & 0x7) + 1
    cap = max(int(total) * nch if total else len(data) * 8, 65536)
    out = np.empty(cap, np.int32)
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    bps = ctypes.c_int32(0)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    n = L.flac_decode(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap, ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(bps))
    if n <= 0:
        return None
    c = int(ch.value)
    pcm = out[: n * c].reshape(-1, c).copy()
    return pcm, int(sr.value), int(bps.value)


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        d, pos = self.d, self.pos
        end = pos + n
        if end > len(d) * 8:
            raise EOFError
        while n > 0:
            avail = 8 - (pos & 7)
            take = min(n, avail)
            byte = d[pos >> 3]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if n and (v >> (n - 1)) & 1 else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 24:
                raise EOFError
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}
_BLOCK_SIZES = [0, 192, 576, 1152, 2304, 4608, 0, 0, 256, 512, 1024, 2048,
                4096, 8192, 16384, 32768]
_BPS_CODES = [0, 8, 12, 0, 16, 20, 24, 32]


def _read_utf8(br: _BitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    lead = 0
    while lead < 8 and (b0 << lead) & 0x80:
        lead += 1
    if lead < 2 or lead > 7:
        raise ValueError("bad utf8 number")
    v = b0 & (0x7F >> lead)
    for _ in range(lead - 1):
        b = br.bits(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad utf8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(br: _BitReader, order: int, bs: int) -> np.ndarray:
    method = br.bits(2)
    if method > 1:
        raise ValueError("bad residual method")
    plen = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    po = br.bits(4)
    nparts = 1 << po
    res = np.empty(bs - order, np.int64)
    idx = 0
    for part in range(nparts):
        n = (bs >> po) - (order if part == 0 else 0)
        param = br.bits(plen)
        if param == escape:
            raw = br.bits(5)
            for i in range(n):
                res[idx] = br.sbits(raw)
                idx += 1
        else:
            for i in range(n):
                q = br.unary()
                u = (q << param) | br.bits(param)
                res[idx] = (u >> 1) ^ -(u & 1)
                idx += 1
    return res


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.bits(1) != 0:
        raise ValueError("bad subframe padding")
    stype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = 1 + br.unary()
    bps -= wasted
    out = np.empty(bs, np.int64)
    if stype == 0:
        out[:] = br.sbits(bps)
    elif stype == 1:
        for i in range(bs):
            out[i] = br.sbits(bps)
    elif (stype & 0x38) == 0x08 and (stype & 7) <= 4:
        order = stype & 7
        for i in range(order):
            out[i] = br.sbits(bps)
        res = _read_residual(br, order, bs)
        coef = _FIXED_COEF[order]
        for i in range(order, bs):
            p = sum(c * out[i - 1 - j] for j, c in enumerate(coef))
            out[i] = p + res[i - order]
    elif stype & 0x20:
        order = (stype & 0x1F) + 1
        for i in range(order):
            out[i] = br.sbits(bps)
        precision = br.bits(4) + 1
        shift = br.sbits(5)
        coef = [br.sbits(precision) for _ in range(order)]
        res = _read_residual(br, order, bs)
        for i in range(order, bs):
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(coef))
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"bad subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def _decode_python(data: bytes):
    try:
        br = _BitReader(data)
        br.pos = 32
        sr = ch = bps = 0
        while True:
            last = br.bits(1)
            btype = br.bits(7)
            blen = br.bits(24)
            if btype == 0:
                br.bits(16 + 16 + 24 + 24)
                sr = br.bits(20)
                ch = br.bits(3) + 1
                bps = br.bits(5) + 1
                br.bits(36)
                br.pos += (blen - 18) * 8
            else:
                br.pos += blen * 8
            if last:
                break
        chans = []
        while br.pos + 16 <= len(data) * 8:
            if br.bits(14) != 0x3FFE:
                break
            br.bits(2)
            bs_code = br.bits(4)
            sr_code = br.bits(4)
            ch_code = br.bits(4)
            ss_code = br.bits(3)
            br.bits(1)
            _read_utf8(br)
            if bs_code == 6:
                bs = br.bits(8) + 1
            elif bs_code == 7:
                bs = br.bits(16) + 1
            else:
                bs = _BLOCK_SIZES[bs_code]
            if sr_code == 12:
                br.bits(8)
            elif sr_code in (13, 14):
                br.bits(16)
            fbps = _BPS_CODES[ss_code] or bps
            br.bits(8)  # crc8
            if ch_code <= 7:
                nch, assign = ch_code + 1, None
            else:
                nch, assign = 2, ch_code - 8   # 0 l/s, 1 r/s, 2 m/s
            subs = []
            for c in range(nch):
                sb = fbps
                if assign == 0 and c == 1:
                    sb += 1
                if assign == 1 and c == 0:
                    sb += 1
                if assign == 2 and c == 1:
                    sb += 1
                subs.append(_decode_subframe(br, bs, sb))
            br.align()
            br.bits(16)  # crc16
            if assign == 0:
                L, S = subs
                subs = [L, L - S]
            elif assign == 1:
                S, R = subs
                subs = [S + R, R]
            elif assign == 2:
                M, S = subs
                m2 = (M << 1) | (S & 1)
                subs = [(m2 + S) >> 1, (m2 - S) >> 1]
            chans.append(np.stack(subs, axis=1))
        if not chans:
            return None
        return np.concatenate(chans, axis=0).astype(np.int32), sr, bps
    except (EOFError, ValueError, IndexError):
        return None


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31),
                         (7, 36)):
        if n < (1 << bits):
            break
    shift = 6 * (nbytes - 1)
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out = [lead | (n >> shift)]
    for _ in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int):
    """Fixed-order-2 predictor + single-partition rice residuals (falls
    back to verbatim when rice would be larger)."""
    bs = len(x)
    x = x.astype(np.int64)
    if bs > 2:
        res = x[2:] - (2 * x[1:-1] - x[:-2])
        zig = (res << 1) ^ (res >> 63)
        mean = max(1, int(zig.mean()))
        param = min(14, max(0, int(mean).bit_length() - 1))
        cost = int((zig >> param).sum()) + len(zig) * (param + 1)
        if cost < bs * bps:
            bw.bits(0, 1)
            bw.bits(0x08 | 2, 6)   # FIXED order 2
            bw.bits(0, 1)          # no wasted bits
            bw.bits(int(x[0]), bps)
            bw.bits(int(x[1]), bps)
            bw.bits(0, 2)          # residual method 0 (4-bit rice)
            bw.bits(0, 4)          # partition order 0
            bw.bits(param, 4)
            for u in zig:
                q = int(u) >> param
                bw.bits(1, q + 1)   # unary: q zeros then a one
                bw.bits(int(u) & ((1 << param) - 1), param)
            return
    bw.bits(0, 1)
    bw.bits(1, 6)                  # VERBATIM
    bw.bits(0, 1)
    for s in x:
        bw.bits(int(s), bps)


def encode_flac(pcm: np.ndarray, sample_rate: int,
                block_size: int = 4096) -> bytes:
    """float [-1,1] or int16 samples, shape (T,) or (T, C) -> FLAC bytes
    (16-bit, independent channels)."""
    if pcm.dtype.kind == "f":
        pcm = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype(np.int16)
    pcm = np.asarray(pcm, np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    T, C = pcm.shape
    bps = 16

    header = bytearray(b"fLaC")
    si = _BitWriter()
    si.bits(block_size, 16)
    si.bits(block_size, 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(sample_rate, 20)
    si.bits(C - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(T, 36)
    for _ in range(16):
        si.bits(0, 8)              # md5 unset
    payload = si.bytes()
    header += bytes([0x80]) + struct.pack(">I", len(payload))[1:] + payload

    out = bytearray(header)
    fnum = 0
    for start in range(0, T, block_size):
        blk = pcm[start : start + block_size]
        bs = len(blk)
        hw = _BitWriter()
        hw.bits(0x3FFE, 14)
        hw.bits(0, 1)
        hw.bits(0, 1)              # fixed blocksize stream
        hw.bits(7, 4)              # blocksize: 16-bit at end of header
        hw.bits(0, 4)              # sample rate: from STREAMINFO
        hw.bits(C - 1, 4)          # independent channels
        hw.bits(4, 3)              # 16-bit
        hw.bits(0, 1)
        hw.align()
        hdr = bytearray(hw.bytes())
        hdr += _utf8_number(fnum)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))
        fw = _BitWriter()
        for c in range(C):
            _encode_subframe(fw, blk[:, c], bps)
        fw.align()
        frame = bytes(hdr) + fw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        fnum += 1
    return bytes(out)
