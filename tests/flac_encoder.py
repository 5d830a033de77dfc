"""Minimal FLAC *encoder* — test fixture generator only.

Produces spec-conformant streams exercising the decoder's paths:
constant, verbatim, and fixed-predictor (order 0-4) subframes with
Rice-coded residuals (multi-partition), mono and stereo, correct
CRC-8/CRC-16. Not part of the shipped package; the framework only
needs to *read* FLAC (LibriSpeech corpora)."""

from __future__ import annotations

import numpy as np

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        assert 0 <= v < (1 << n), (v, n)
        self.acc = (self.acc << n) | v
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v: int, n: int):
        self.write(v & ((1 << n) - 1), n)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 1
    while n >= (1 << (6 * nbytes + (6 - nbytes))):
        nbytes += 1
    lead_bits = 6 - nbytes
    out.append((0xFF << (lead_bits + 1)) & 0xFF | (n >> (6 * nbytes)))
    for i in range(nbytes - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_write(bw: BitWriter, res, param: int):
    for v in res:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        q = u >> param
        if q:
            bw.write(0, q)
        bw.write(1, 1)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(res) -> int:
    mean = float(np.mean(np.abs(np.asarray(res, np.float64)))) if len(res) else 0.0
    p = 0
    while (mean > (1 << p)) and p < 14:
        p += 1
    return p


def _write_subframe(bw: BitWriter, x, bps: int, mode: str, npart_order: int = 0):
    bw.write(0, 1)  # padding
    if mode == "constant":
        assert all(v == x[0] for v in x)
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
        return
    if mode == "lpc2":
        # order-2 LPC: coefs [3, -1], shift 1 => pred = (3a - b) >> 1
        order, prec, shift, coefs = 2, 4, 1, [3, -1]
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        res = [
            int(x[i])
            - ((sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))) >> shift)
            for i in range(order, len(x))
        ]
        bw.write(0, 2)
        bw.write(npart_order, 4)
        nparts = 1 << npart_order
        n_per = len(x) >> npart_order
        pos = 0
        for p in range(nparts):
            n = n_per - order if p == 0 else n_per
            part = res[pos : pos + n]
            pos += n
            param = min(_best_rice_param(part), 14)
            bw.write(param, 4)
            _rice_write(bw, part, param)
        return
    assert mode.startswith("fixed")
    order = int(mode[-1])
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for v in x[:order]:
        bw.write_signed(int(v), bps)
    coefs = _FIXED_COEFS[order]
    res = [
        int(x[i]) - sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
        for i in range(order, len(x))
    ]
    bw.write(0, 2)  # rice method 0 (4-bit params)
    bw.write(npart_order, 4)
    nparts = 1 << npart_order
    n_per = len(x) >> npart_order
    pos = 0
    for p in range(nparts):
        n = n_per - order if p == 0 else n_per
        part = res[pos : pos + n]
        pos += n
        param = min(_best_rice_param(part), 14)
        bw.write(param, 4)
        _rice_write(bw, part, param)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 16,
    blocksize: int = 256,
    mode: str = "fixed2",
    npart_order: int = 0,
) -> bytes:
    """pcm: (N,) or (N, channels) ints. Channels coded independently."""
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape

    # STREAMINFO
    si = BitWriter()
    si.write(1, 1)  # last metadata block
    si.write(0, 7)  # STREAMINFO
    si.write(34, 24)
    si.write(min(blocksize, 16), 16)  # min blocksize (last frame may be short)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)

    out = bytearray(b"fLaC" + si.getvalue())
    frame_idx = 0
    for start in range(0, n, blocksize):
        block = pcm[start : start + blocksize]
        bs = block.shape[0]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        stereo_mode = mode if mode in ("left_side", "right_side", "mid_side") else None
        if stereo_mode:
            assert nch == 2
            bw.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
        else:
            bw.write(nch - 1, 4)  # independent channels
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        for b in _utf8_number(frame_idx):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bw.getvalue()
        bw = BitWriter()
        for b in hdr:
            bw.write(b, 8)
        bw.write(crc8(hdr), 8)
        if stereo_mode:
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            side = left - right
            if stereo_mode == "left_side":
                _write_subframe(bw, left, bps, "verbatim")
                _write_subframe(bw, side, bps + 1, "verbatim")
            elif stereo_mode == "right_side":
                _write_subframe(bw, side, bps + 1, "verbatim")
                _write_subframe(bw, right, bps, "verbatim")
            else:
                mid = (left + right) >> 1
                _write_subframe(bw, mid, bps, "verbatim")
                _write_subframe(bw, side, bps + 1, "verbatim")
        else:
            use_mode = mode
            if (mode.startswith("fixed") or mode == "lpc2") and bs <= (
                2 if mode == "lpc2" else int(mode[-1])
            ):
                use_mode = "verbatim"
            for ch in range(nch):
                x = block[:, ch].astype(np.int64)
                m = use_mode
                if m == "constant" and not np.all(x == x[0]):
                    m = "verbatim"
                po = npart_order if (bs % (1 << npart_order)) == 0 else 0
                _write_subframe(bw, x, bps, m, po)
        bw.align()
        body = bw.getvalue()
        bw2 = BitWriter()
        for b in body:
            bw2.write(b, 8)
        bw2.write(crc16(body), 16)
        out += bw2.getvalue()
        frame_idx += 1
    return bytes(out)
