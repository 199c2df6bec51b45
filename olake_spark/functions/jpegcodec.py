"""Real baseline JPEG (ITU-T T.81) codec in pure numpy — no libjpeg, no PIL.

This closes the one declared stand-in left in the media layer
(imagecodec.py's ``fmt == "jpeg"`` quantize-and-PNG-frame container): the
engine can now DECODE real JPEG streams produced by real encoders and
ENCODE spec-compliant baseline JPEG any libjpeg-based consumer can read.

Decoder (``jpeg_decode``) — baseline sequential DCT plus PROGRESSIVE
(SOF2, T.81 Annex G), the two profiles real-world JPEG files use:
  * markers: SOI/APPn/COM skipped, DQT (8-bit, multi-table segments), DHT
    (multi-table segments), SOF0/SOF2, DRI + RSTn restart handling, SOS,
    EOI
  * interleaved MCUs with arbitrary sampling factors (4:4:4, 4:2:2, 4:2:0,
    grayscale), canonical Huffman per Annex C, DC prediction + EXTEND
    (F.2.2.1), AC run-length with ZRL/EOB (F.2.2.2)
  * progressive scans (G.1.2): DC first/refinement with the arithmetic
    point transform, non-interleaved AC band scans with cross-block
    end-of-band runs, and AC refinement correction bits
  * dequant → inverse zigzag → vectorized float IDCT over all blocks of a
    component at once (A.3.3) → level shift → per-axis sample replication
    upsample → JFIF YCbCr→RGB
  * output: HxWx3 uint8 (grayscale replicated), matching
    ``imagecodec.decode_image``'s contract

Encoder (``jpeg_encode``) — baseline sequential (default) or progressive
(``progressive=True``: libjpeg's default 10-scan script — spectral
selection + successive approximation — transmitting coefficients identical
to the baseline scan's, so both layouts decode to bit-identical pixels);
4:4:4 or 4:2:0, one quant table pair scaled from the Annex-K.1 tables with
the libjpeg quality curve, the Annex-K.3 "typical" Huffman tables, JFIF
APP0 header. Deterministic: identical input + options → identical bytes.

Scale note: entropy (de)coding is a sequential bit stream — a per-image
Python loop by nature. That is fine where this codec runs (inside
mapInPandas/pandas_udf kernels, one worker per image batch, the same
placement the reference gives libjpeg); the synthetic bench fixture keeps
imagecodec's vectorized deterministic lossy container precisely so the
1.2M-image scaling measurements stay entropy-coder-independent
(BENCH/BASELINE.md). ``imagecodec.decode_image`` routes real JPEG magic
(FF D8) here, so every decode-bearing operator accepts real-world bytes
unchanged.

Validated against real libjpeg-written files from the CPython/IPython test
suites (grayscale, 4:2:0, and 4:4:4-with-restart-markers variants) — and
cross-checked block-by-block by an INDEPENDENT naive scalar decoder
written in the test file, the same independence pattern as
tests/test_avro_independent.py (tests/test_jpegcodec.py).

Reference parity: OLake carries image bytes as opaque payloads and lets
the lakehouse consumer decode; this module is what makes our consumer-side
kernels (multimodal.py decode-stats/resize, PSNR verify) real for JPEG
rather than stand-in-only.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1 — luminance / chrominance quantization tables (natural order)
K1_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
K1_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag index: ZIGZAG[k] = natural-order position of the k-th zigzag coeff
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 — typical Huffman tables as (BITS[1..16], HUFFVAL)
K3_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
K3_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT-II basis: C[u, x] = a(u) cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """Inverse 8x8 DCT over a (n, 8, 8) stack (A.3.3), vectorized."""
    return np.einsum("ux,nuv,vy->nxy", _C, coefs, _C, optimize=True)


def _dct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT over a (n, 8, 8) stack (A.3.3), vectorized."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


# -------------------------------------------------------------- huffman


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman (Annex C): {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """{symbol -> (code, length)} from the same canonical construction."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_decode_table(bits, vals).items()
    }


class _BitReader:
    """MSB-first reader over an entropy-coded segment with 0xFF00
    byte-stuffing; RSTn markers are consumed by `restart()`."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif nxt == 0xFF:
                    # B.1.1.2 fill byte preceding a marker — skip it
                    self.pos += 1
                    continue
                elif 0xD0 <= nxt <= 0xD7 or nxt in (0xD9, 0xDA, 0xC4,
                                                    0xDB, 0xDD):
                    # a marker (RST / EOI / the next scan's headers):
                    # pad with 1-bits per F.2.2.5 until consumed
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def restart(self) -> None:
        """Byte-align and consume the RSTn marker (F.2.1.3.1)."""
        self.bitbuf = 0
        self.nbits = 0
        while self.d[self.pos] != 0xFF or not (
            0xD0 <= self.d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """EXTEND (F.2.2.1): map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------- decoder


def jpeg_decode(data: bytes, luma_only: bool = False) -> np.ndarray:
    """Decode baseline sequential JPEG bytes to an HxWx3 uint8 RGB array
    (grayscale replicated across channels).

    ``luma_only`` returns the coded Y plane as (h, w) uint8 — the exact
    luma the encoder quantized, with no YCbCr→RGB→luma roundtrip error —
    for luma-driven consumers (frame stats, perceptual features).

    Error contract: any malformed or truncated stream raises ValueError
    (byte-access overruns are translated, never leaked as IndexError)."""
    try:
        return _decode_impl(bytes(data), luma_only)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt JPEG stream ({exc})") from None
    except KeyError as exc:
        # the only KeyErrors reachable from a decode are scan references to
        # Huffman/quant tables the stream never defined (B.2.4.2 allows a
        # table to arrive in any earlier segment — absence is malformed)
        raise ValueError(
            f"JPEG scan references undefined Huffman/quant table {exc}"
        ) from None


def _decode_block(r: _BitReader, c: dict, dc_t: dict, ac_t: dict,
                  row: int, col: int) -> None:
    """Entropy-decode one 8x8 block of component `c` into its coefficient
    grid at (row, col): DC prediction + EXTEND, AC run-length (F.2.2)."""
    blk = np.zeros(64, dtype=np.int32)
    t = r.huff(dc_t)
    c["pred"] += _extend(r.bits(t), t)
    blk[0] = c["pred"]
    k = 1
    while k < 64:
        rs = r.huff(ac_t)
        rr, ss = rs >> 4, rs & 0xF
        if ss == 0:
            if rr == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC run past block end")
        blk[ZIGZAG[k]] = _extend(r.bits(ss), ss)
        k += 1
    c["coef"][row * c["bw"] + col] = blk.reshape(8, 8)


def _decode_scan(data: bytes, pos: int, scan: list[dict],
                 huff_dc: dict, huff_ac: dict, dri: int,
                 mcus_x: int, mcus_y: int, w: int, h: int,
                 hmax: int, vmax: int) -> int:
    """Decode one scan's entropy-coded segment. Ns>1 scans interleave
    MCUs of h x v blocks per component (A.2.3); Ns=1 scans are
    NON-interleaved — the MCU is a single block and the data unit count is
    the component's OWN block grid, ceil(cw/8) x ceil(ch/8) (A.2.2), NOT
    the interleaved MCU geometry. Returns the offset of the next marker."""
    r = _BitReader(data, pos)
    for c in scan:
        c["pred"] = 0  # F.2.1.3.1: DC prediction resets at scan start
        c["scanned"] = True
    interleaved = len(scan) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        c0 = scan[0]
        cw = -(-w * c0["h"] // hmax)
        ch = -(-h * c0["v"] // vmax)
        cbw, cbh = -(-cw // 8), -(-ch // 8)
        n_units = cbw * cbh
    for unit in range(n_units):
        if dri and unit and unit % dri == 0:
            r.restart()
            for c in scan:
                c["pred"] = 0
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            for c in scan:
                dc_t, ac_t = huff_dc[c["td"]], huff_ac[c["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        _decode_block(r, c, dc_t, ac_t,
                                      my * c["v"] + by, mx * c["h"] + bx)
        else:
            row, col = divmod(unit, cbw)
            _decode_block(r, c0, huff_dc[c0["td"]], huff_ac[c0["ta"]],
                          row, col)
    # skip residual entropy bytes / stuffing / RSTs up to the next marker
    pos = r.pos
    while not (
        data[pos] == 0xFF
        and data[pos + 1] != 0x00
        and not (0xD0 <= data[pos + 1] <= 0xD7)
    ):
        pos += 1
    return pos


def _refine_nonzero(r: _BitReader, flat: np.ndarray, z: int, p1: int) -> None:
    """Apply one AC refinement correction bit to a nonzero-history
    coefficient (G.1.2.3): if the bit is set and the bit at this scan's
    precision is still 0, move the magnitude outward by 1 << Al."""
    if r.bits(1) and (flat[z] & p1) == 0:
        flat[z] += p1 if flat[z] > 0 else -p1


def _decode_scan_prog(data: bytes, pos: int, scan: list[dict],
                      huff_dc: dict, huff_ac: dict, dri: int,
                      mcus_x: int, mcus_y: int, w: int, h: int,
                      hmax: int, vmax: int,
                      ss: int, se: int, ah: int, al: int) -> int:
    """Decode one PROGRESSIVE scan (T.81 Annex G / G.1.2): DC scans
    (Ss=Se=0, optionally interleaved) carry the high-order DC bits first
    (arithmetic point transform) then one refinement bit per block; AC
    scans (Ns=1 required by G.1.1) carry a zigzag band [Ss..Se] with
    end-of-band RUNS spanning blocks, first pass placing values scaled by
    2^Al and refinement passes appending one magnitude bit per coefficient.
    Returns the offset of the next marker."""
    r = _BitReader(data, pos)
    state = {"eobrun": 0}
    dc_scan = ss == 0
    if dc_scan:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        for c in scan:
            c["pred"] = 0
            c["scanned"] = True
        interleaved = len(scan) > 1
        if interleaved:
            n_units = mcus_x * mcus_y
        else:
            c0 = scan[0]
            cw = -(-w * c0["h"] // hmax)
            ch = -(-h * c0["v"] // vmax)
            cbw, cbh = -(-cw // 8), -(-ch // 8)
            n_units = cbw * cbh
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        c0 = scan[0]
        c0["scanned"] = True
        cw = -(-w * c0["h"] // hmax)
        ch = -(-h * c0["v"] // vmax)
        cbw, cbh = -(-cw // 8), -(-ch // 8)
        n_units = cbw * cbh

    def _dc_block(c: dict, row: int, col: int) -> None:
        flat = c["coef"][row * c["bw"] + col].reshape(64)
        if ah == 0:
            t = r.huff(huff_dc[c["td"]])
            c["pred"] += _extend(r.bits(t), t)
            flat[0] = c["pred"] << al
        elif r.bits(1):
            flat[0] |= 1 << al  # two's-complement OR appends the bit

    def _ac_first(flat: np.ndarray) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ac_t = huff_ac[c0["ta"]]
        k = ss
        while k <= se:
            rs = r.huff(ac_t)
            run, s = rs >> 4, rs & 0xF
            if s:
                k += run
                if k > se:
                    raise ValueError("AC run past band end")
                flat[ZIGZAG[k]] = _extend(r.bits(s), s) << al
                k += 1
            elif run != 15:
                state["eobrun"] = (1 << run) - 1
                if run:
                    state["eobrun"] += r.bits(run)
                break
            else:
                k += 16  # ZRL
    def _ac_refine(flat: np.ndarray) -> None:
        ac_t = huff_ac[c0["ta"]]
        p1 = 1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = r.huff(ac_t)
                run, s = rs >> 4, rs & 0xF
                if s == 0:
                    if run != 15:
                        # NOT decremented here: the tail pass below must
                        # still consume this block's remaining correction
                        # bits before the run count drops (G.1.2.3)
                        state["eobrun"] = 1 << run
                        if run:
                            state["eobrun"] += r.bits(run)
                        break
                    newval = 0  # ZRL: skip 16 zero-history slots
                else:
                    if s != 1:
                        raise ValueError("invalid AC refinement magnitude")
                    newval = p1 if r.bits(1) else -p1
                # advance: correction bits over nonzero-history coeffs,
                # `run` counts down over zero-history slots
                while k <= se:
                    z = int(ZIGZAG[k])
                    if flat[z]:
                        _refine_nonzero(r, flat, z, p1)
                    else:
                        run -= 1
                        if run < 0:
                            break
                    k += 1
                if k <= se and newval:
                    flat[int(ZIGZAG[k])] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                z = int(ZIGZAG[k])
                if flat[z]:
                    _refine_nonzero(r, flat, z, p1)
                k += 1
            state["eobrun"] -= 1

    for unit in range(n_units):
        if dri and unit and unit % dri == 0:
            r.restart()
            state["eobrun"] = 0
            for c in scan:
                c["pred"] = 0
        if dc_scan:
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _dc_block(c, my * c["v"] + by, mx * c["h"] + bx)
            else:
                row, col = divmod(unit, cbw)
                _dc_block(scan[0], row, col)
        else:
            row, col = divmod(unit, cbw)
            flat = c0["coef"][row * c0["bw"] + col].reshape(64)
            if ah == 0:
                _ac_first(flat)
            else:
                _ac_refine(flat)
    pos = r.pos
    while not (
        data[pos] == 0xFF
        and data[pos + 1] != 0x00
        and not (0xD0 <= data[pos + 1] <= 0xD7)
    ):
        pos += 1
    return pos


def _decode_impl(data: bytes, luma_only: bool) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    hmax = vmax = mcus_x = mcus_y = 0
    dri = 0
    progressive = False
    pos = 2
    while True:
        # B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while data[pos] == 0xFF and data[pos + 1] == 0xFF:
            pos += 1
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI — done parsing
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + ln]
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables: not baseline")
                z = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = z
                qt[tq] = nat.reshape(8, 8)
                i += 65
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _build_decode_table(bits, vals)
                i += 17 + n
        elif m in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = m == 0xC2
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            from olake_spark.functions.imagecodec import check_dims

            check_dims(w, h, "JPEG")
            nc = seg[5]
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq,
                    "scanned": False,
                })
            # allocate every component's coefficient grid over the full
            # interleaved MCU geometry; non-interleaved scans write into
            # its top-left ceil(cw/8) x ceil(ch/8) sub-grid
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcus_x * c["h"]  # blocks per row in the MCU grid
                c["bh"] = mcus_y * c["v"]
                c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8),
                                     dtype=np.int32)
                c["pred"] = 0
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{m - 0xC0}: only baseline sequential (SOF0) and "
                f"progressive (SOF2) supported"
            )
        elif m == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS — scan parameters then entropy data
            if not comps or h == 0:
                raise ValueError("missing SOF frame header before SOS")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in comps if x["id"] == cs), None)
                if comp is None:
                    raise ValueError(
                        f"SOS references component id {cs} not in SOF"
                    )
                comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
                scan.append(comp)
            if progressive:
                s_s, s_e = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _decode_scan_prog(
                    data, pos + ln, scan, huff_dc, huff_ac, dri,
                    mcus_x, mcus_y, w, h, hmax, vmax,
                    s_s, s_e, ahal >> 4, ahal & 0xF,
                )
            else:
                pos = _decode_scan(data, pos + ln, scan, huff_dc, huff_ac,
                                   dri, mcus_x, mcus_y, w, h, hmax, vmax)
            continue  # keep parsing — multi-scan files have more SOS
        pos += ln
    if not comps or h == 0:
        raise ValueError("no SOF frame header")
    missing = [c["id"] for c in comps if not c["scanned"]]
    if missing:
        raise ValueError(f"no scan data for component(s) {missing}")

    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :, :]
        px = _idct_blocks(deq.astype(np.float64)) + 128.0
        grid = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # crop to the component's true extent, then replicate to full size
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        grid = grid[:ch, :cw]
        grid = np.repeat(grid, vmax // c["v"], axis=0)
        grid = np.repeat(grid, hmax // c["h"], axis=1)
        planes.append(grid[:h, :w])

    if luma_only:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encoder


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K.1 tables scaled with the libjpeg quality curve."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (K1_LUM, K1_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0].reshape(8, 8), out[1].reshape(8, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per F.1.2.3


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_zz(bw: _BitWriter, zz: np.ndarray, dc_tab: dict,
               ac_tab: dict, pred: int) -> int:
    """Entropy-encode (n, 64) zigzag-ordered quantized coefficients."""
    for row in zz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        t = _category(diff)
        code, ln = dc_tab[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        nz = np.nonzero(row[1:])[0]
        k = 0
        for idx in nz:
            run = int(idx) - k
            while run >= 16:
                zc, zl = ac_tab[0xF0]
                bw.put(zc, zl)
                run -= 16
            v = int(row[1 + idx])
            s = _category(v)
            code, ln = ac_tab[(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            k = int(idx) + 1
        if k < 63:
            ec, el = ac_tab[0x00]
            bw.put(ec, el)  # EOB
    return pred


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Pad an HxW float plane to 8-multiples (edge replicate) and return
    the (n, 8, 8) block stack in raster order."""
    ph = -(-plane.shape[0] // 8) * 8
    pw = -(-plane.shape[1] // 8) * 8
    p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
               mode="edge")
    return (
        p.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad an HxW plane up to (mh, mw)."""
    return np.pad(
        plane,
        ((0, mh - plane.shape[0]), (0, mw - plane.shape[1])),
        mode="edge",
    )


def _quant_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Plane → (n_blocks, 64) zigzag-ordered quantized coefficients."""
    co = _dct_blocks(_blocks_of(plane) - 128.0)
    return np.round(co / q[None, :, :]).astype(np.int32) \
        .reshape(-1, 64)[:, ZIGZAG]


def _component_grids(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                     qy: np.ndarray, qc: np.ndarray, sub: bool,
                     w: int, h: int) -> list[dict]:
    """Quantized zigzag coefficient grids per component, padded to the MCU
    geometry, with both the padded grid (bw, bh) and the component's TRUE
    block grid (cbw, cbh — what a non-interleaved scan covers, A.2.2)."""
    if not sub:
        bw_, bh_ = -(-w // 8), -(-h // 8)
        return [
            {"zz": _quant_zz(p, q), "bw": bw_, "bh": bh_,
             "cbw": bw_, "cbh": bh_}
            for p, q in ((y, qy), (cb, qc), (cr, qc))
        ]
    mx, my = -(-w // 16), -(-h // 16)
    yp = _pad_to(y, my * 16, mx * 16)
    grids = [{"zz": _quant_zz(yp, qy), "bw": mx * 2, "bh": my * 2,
              "cbw": -(-w // 8), "cbh": -(-h // 8)}]
    ccw, cch = -(-w // 2), -(-h // 2)
    for c in (cb, cr):
        cp = _pad_to(c, my * 16, mx * 16)
        s = (cp[0::2, 0::2] + cp[1::2, 0::2]
             + cp[0::2, 1::2] + cp[1::2, 1::2]) / 4.0
        grids.append({"zz": _quant_zz(s, qc), "bw": mx, "bh": my,
                      "cbw": -(-ccw // 8), "cbh": -(-cch // 8)})
    return grids


def _mcu_schedule(grids: list[dict], sub: bool) -> list[tuple[int, int]]:
    """(component, block-index) pairs in interleaved MCU stream order
    (A.2.3) over the padded grids."""
    sched = []
    if not sub:
        for i in range(grids[0]["bw"] * grids[0]["bh"]):
            for ci in range(3):
                sched.append((ci, i))
        return sched
    mx, my = grids[1]["bw"], grids[1]["bh"]
    ybw = grids[0]["bw"]
    for m in range(mx * my):
        r, c = divmod(m, mx)
        for by in range(2):
            for bx in range(2):
                sched.append((0, (2 * r + by) * ybw + (2 * c + bx)))
        sched.append((1, m))
        sched.append((2, m))
    return sched


def jpeg_encode(arr: np.ndarray, quality: int = 85,
                subsampling: str = "444", progressive: bool = False) -> bytes:
    """Encode an HxWx3 uint8 RGB array as JPEG (JFIF, Annex-K Huffman
    tables). ``subsampling``:

    - ``"444"`` (default): full-resolution chroma, one block per component
      per MCU — bit-deterministic and the highest-fidelity choice.
    - ``"420"``: 2x2-averaged chroma (libjpeg's default), MCU = four Y
      blocks + one Cb + one Cr — roughly half the chroma payload for
      visually equivalent output on photographic content.

    ``progressive=True`` emits SOF2 with libjpeg's default 10-scan script
    (spectral selection + successive approximation, Annex G): the DCT
    coefficients transmitted are identical to the baseline scan's, so the
    decoded pixels are bit-identical to the sequential encoding — only the
    bitstream layout differs. EOB runs are capped at one block because the
    Annex-K.3 AC tables carry no EOBn (n>=1) symbols; cap aside, any
    spec-conforming progressive decoder reads the output.
    """
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("jpeg_encode wants an HxWx3 uint8 array")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', "
                         f"got {subsampling!r}")
    sub = subsampling == "420"
    h, w = arr.shape[:2]
    f = arr.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
    qy, qc = _quality_tables(quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, unit-less density, no thumb

    def _dqt(tid: int, tbl: np.ndarray) -> bytes:
        z = tbl.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + z

    out += _dqt(0, qy) + _dqt(1, qc)
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
    y_hv = 0x22 if sub else 0x11
    for cid, hv, tq in ((1, y_hv, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += struct.pack("BBB", cid, hv, tq)

    def _dht(tc: int, th: int, tdef) -> bytes:
        bits, vals = tdef
        body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += _dht(0, 0, K3_DC_LUM) + _dht(1, 0, K3_AC_LUM)
    out += _dht(0, 1, K3_DC_CHROM) + _dht(1, 1, K3_AC_CHROM)
    if progressive:
        _emit_progressive_scans(out, y, cb, cr, qy, qc, sub, w, h)
        out += b"\xff\xd9"
        return bytes(out)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack("BB", cid, tdta)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    dc_l = _build_encode_table(*K3_DC_LUM)
    ac_l = _build_encode_table(*K3_AC_LUM)
    dc_c = _build_encode_table(*K3_DC_CHROM)
    ac_c = _build_encode_table(*K3_AC_CHROM)
    bw = _BitWriter()
    preds = [0, 0, 0]
    tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    if not sub:
        zzs = [_quant_zz(p, q)  # zigzag once per plane, not per MCU
               for p, q in ((y, qy), (cb, qc), (cr, qc))]
        # interleaved 4:4:4 MCU = one block per component
        for i in range(zzs[0].shape[0]):
            for ci in range(3):
                preds[ci] = _encode_zz(
                    bw, zzs[ci][i:i + 1], *tabs[ci], preds[ci]
                )
    else:
        # 4:2:0 MCU = 16x16 px: four Y blocks (2x2 raster) + Cb + Cr over
        # the 2x2-averaged chroma planes (A.2.3 interleaved order)
        mx, my = -(-w // 16), -(-h // 16)
        yp = _pad_to(y, my * 16, mx * 16)
        # average 2x2 neighborhoods on even-padded full-res chroma
        che, cwe = my * 16, mx * 16
        subs = []
        for c in (cb, cr):
            cp = _pad_to(c, che, cwe)
            subs.append(
                (cp[0::2, 0::2] + cp[1::2, 0::2]
                 + cp[0::2, 1::2] + cp[1::2, 1::2]) / 4.0
            )
        zz_y = _quant_zz(yp, qy)
        zz_c = [_quant_zz(s, qc) for s in subs]
        ybw = mx * 2  # Y blocks per row
        for m in range(mx * my):
            r, c = divmod(m, mx)
            for by in range(2):
                for bx in range(2):
                    i = (2 * r + by) * ybw + (2 * c + bx)
                    preds[0] = _encode_zz(
                        bw, zz_y[i:i + 1], dc_l, ac_l, preds[0]
                    )
            ci = r * mx + c
            preds[1] = _encode_zz(bw, zz_c[0][ci:ci + 1], dc_c, ac_c,
                                  preds[1])
            preds[2] = _encode_zz(bw, zz_c[1][ci:ci + 1], dc_c, ac_c,
                                  preds[2])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------- progressive scan emission

# libjpeg's default progression script for a 3-component image
# (jcparam.c jpeg_simple_progression): ("dc"/"ac", comp(s), Ss, Se, Ah, Al)
_PROG_SCRIPT = (
    ("dc", (0, 1, 2), 0, 0, 0, 1),
    ("ac", 0, 1, 5, 0, 2),
    ("ac", 2, 1, 63, 0, 1),
    ("ac", 1, 1, 63, 0, 1),
    ("ac", 0, 6, 63, 0, 2),
    ("ac", 0, 1, 63, 2, 1),
    ("dc", (0, 1, 2), 0, 0, 1, 0),
    ("ac", 2, 1, 63, 1, 0),
    ("ac", 1, 1, 63, 1, 0),
    ("ac", 0, 1, 63, 1, 0),
)


def _flush_eob(bw: _BitWriter, st: dict, ac_tab: dict) -> None:
    """Emit the pending end-of-band run (always length 1 here — the K.3
    tables define no EOBn symbols for n >= 1) plus the correction bits
    buffered for the blocks it covers."""
    if st["eobrun"]:
        code, ln = ac_tab[0x00]
        bw.put(code, ln)
        st["eobrun"] = 0
        for b in st["bits"]:
            bw.put(b, 1)
        st["bits"] = []


def _prog_ac_first_block(bw: _BitWriter, st: dict, ac_tab: dict,
                         band: np.ndarray, ss: int, se: int,
                         al: int) -> None:
    """One block of a first AC scan (G.1.2.2): point transform is a
    sign-magnitude shift, zero runs > 15 emit ZRL, a zero tail joins the
    end-of-band run."""
    r = 0
    for k in range(ss, se + 1):
        v = int(band[k])
        v = -((-v) >> al) if v < 0 else v >> al
        if v == 0:
            r += 1
            continue
        _flush_eob(bw, st, ac_tab)
        while r > 15:
            zc, zl = ac_tab[0xF0]
            bw.put(zc, zl)
            r -= 16
        s = _category(v)
        code, ln = ac_tab[(r << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    if r > 0:
        st["eobrun"] = 1
        _flush_eob(bw, st, ac_tab)


def _prog_ac_refine_block(bw: _BitWriter, st: dict, ac_tab: dict,
                          band: np.ndarray, ss: int, se: int,
                          al: int) -> None:
    """One block of a refinement AC scan (G.1.2.3): coefficients already
    nonzero at the previous precision send one correction bit (buffered
    until the next symbol so the decoder reads them while advancing);
    newly visible coefficients send (run, 1) + a sign bit; the zero tail
    joins the end-of-band run."""
    absv = []
    eob = -1
    for k in range(ss, se + 1):
        v = int(band[k])
        t = (-v if v < 0 else v) >> al
        absv.append(t)
        if t == 1:
            eob = k
    r = 0
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eob(bw, st, ac_tab)
            zc, zl = ac_tab[0xF0]
            bw.put(zc, zl)
            r -= 16
            for b in st["bits"]:
                bw.put(b, 1)
            st["bits"] = []
        if t > 1:
            st["bits"].append(t & 1)
            continue
        _flush_eob(bw, st, ac_tab)
        code, ln = ac_tab[(r << 4) | 1]
        bw.put(code, ln)
        bw.put(0 if int(band[k]) < 0 else 1, 1)
        for b in st["bits"]:
            bw.put(b, 1)
        st["bits"] = []
        r = 0
    if r > 0 or st["bits"]:
        st["eobrun"] = 1
        _flush_eob(bw, st, ac_tab)


def _emit_progressive_scans(out: bytearray, y: np.ndarray, cb: np.ndarray,
                            cr: np.ndarray, qy: np.ndarray, qc: np.ndarray,
                            sub: bool, w: int, h: int) -> None:
    """Append every SOS of the progressive scan script to `out`."""
    grids = _component_grids(y, cb, cr, qy, qc, sub, w, h)
    sched = _mcu_schedule(grids, sub)
    dc_tabs = [_build_encode_table(*K3_DC_LUM),
               _build_encode_table(*K3_DC_CHROM)]
    ac_tabs = [_build_encode_table(*K3_AC_LUM),
               _build_encode_table(*K3_AC_CHROM)]
    tab_of = (0, 1, 1)  # component -> table id (luma / chroma / chroma)
    for kind, comp, ss, se, ah, al in _PROG_SCRIPT:
        bw = _BitWriter()
        if kind == "dc":
            out += b"\xff\xda" + struct.pack(">HB", 12, 3)
            for cid in comp:
                out += struct.pack("BB", cid + 1, tab_of[cid] << 4)
            out += struct.pack("BBB", ss, se, (ah << 4) | al)
            if ah == 0:
                preds = [0, 0, 0]
                for ci, idx in sched:
                    v = int(grids[ci]["zz"][idx, 0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    t = _category(diff)
                    code, ln = dc_tabs[tab_of[ci]][t]
                    bw.put(code, ln)
                    if t:
                        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            else:
                for ci, idx in sched:
                    bw.put((int(grids[ci]["zz"][idx, 0]) >> al) & 1, 1)
        else:
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += struct.pack("BB", comp + 1, tab_of[comp])
            out += struct.pack("BBB", ss, se, (ah << 4) | al)
            g = grids[comp]
            ac_tab = ac_tabs[tab_of[comp]]
            st = {"eobrun": 0, "bits": []}
            block = (_prog_ac_refine_block if ah else _prog_ac_first_block)
            for row in range(g["cbh"]):
                for col in range(g["cbw"]):
                    block(bw, st, ac_tab, g["zz"][row * g["bw"] + col],
                          ss, se, al)
            _flush_eob(bw, st, ac_tab)
        bw.flush()
        out += bw.out
