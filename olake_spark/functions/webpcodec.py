"""WebP container walk + full VP8L (lossless WebP) decoder and encoder.

Pure stdlib + numpy, like the sibling codecs (no PIL/libwebp in this
container).  Completes the web-image ingest set: PNG, JPEG, GIF, BMP,
TIFF, Netpbm, and now WebP — ``decode_image`` routes ``RIFF....WEBP``
magic here.

Decoder coverage (WebP Lossless Bitstream Specification, RFC 9649):

- ``VP8L`` chunks (pure lossless files) and ``VP8X`` extended files
  whose image data is ``VP8L``.
- LSB-first bit reader; canonical prefix codes read MSB-of-code-first
  (the RFC 1951 convention the spec adopts), including the 0-bit
  single-symbol code and the 1/2-symbol "simple code" header.
- The full code-length code path: the 19-symbol alphabet in
  ``kCodeLengthCodeOrder``, repeat codes 16/17/18, and the optional
  ``max_symbol`` early-stop field.
- Color cache (1-11 bits, the 0x1e35a7bd multiplicative hash), LZ77
  backward references with the 120-entry distance-to-plane-code
  neighborhood map, and the meta-prefix (entropy image) selecting
  between multiple prefix-code groups per 2^n-pixel tile.
- All four transforms, inverted in reverse bitstream order: predictor
  (14 spatial modes with the scan-order border rules), cross-color
  (signed 3.5 fixed-point ``green_to_red`` / ``green_to_blue`` /
  ``red_to_blue`` deltas), subtract-green, and color-indexing including
  the sub-byte pixel bundling used for palettes of 2/4/16 colors.
- Lossless ``ALPH`` alpha planes (compression method 1: a headerless
  VP8L stream whose green channel is the alpha plane), plus the four
  row filters (none/horizontal/vertical/gradient) — exposed via
  ``webp_alpha`` so alpha survives even for lossy-color files.

Lossy ``VP8`` color payloads raise a clear ValueError: VP8 is a full
intra video codec and stays a documented dispatch seam (same decision
as mp4/webm in videocodec.py).

The encoder (``webp_encode``) emits spec-compliant lossless VP8L —
literal-only (no LZ77/cache/transforms), per-channel canonical prefix
codes with length-limited Huffman (15-bit main codes, 7-bit code-length
code) and the ``max_symbol`` trim for trailing zeros — so round-trip
property tests and webp egest both work against any conforming decoder.

Validation: decoded output is byte-checked in tests/test_webpcodec.py
against a real libwebp-produced bitstream (the ``ALPH`` chunk of
CPython's 16x16 ``python.webp`` test asset, cross-checked against the
alpha plane of its sibling ``python.png``) plus hand-built per-feature
micro-streams.  Like the other entropy decoders this is a scalar
per-image kernel off the bench rewrite path; Spark parallelism is
across images in Arrow-batched UDFs (multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (LSB-first within bytes, per the VP8L spec)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("truncated VP8L bitstream")
        v = 0
        got = 0
        d = self.data
        pos = self.pos
        while got < n:
            byte = d[pos >> 3]
            bit = pos & 7
            take = min(8 - bit, n - got)
            v |= ((byte >> bit) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self.pos = pos
        return v

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("truncated VP8L bitstream")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, nbits: int, val: int) -> None:
        self.acc |= (val & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, length: int, code: int) -> None:
        """Emit a canonical prefix code MSB-of-code-first."""
        for i in range(length - 1, -1, -1):
            self.write(1, (code >> i) & 1)

    def append(self, other: "_BitWriter") -> None:
        """Splice another writer's bits in at the current (unaligned)
        bit position — used to embed sub-image streams."""
        for byte in other.buf:
            self.write(8, byte)
        if other.n:
            self.write(other.n, other.acc)

    def getvalue(self) -> bytes:
        out = bytes(self.buf) + (bytes([self.acc & 0xFF]) if self.n else b"")
        return out


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


class _PrefixCode:
    """Canonical prefix decoder built from per-symbol code lengths.

    A single used symbol is the spec's 0-bit code.  A 2-symbol "simple
    code" assigns code 0/1 in *read* order (not symbol order) — callers
    construct that case via ``from_pair``.
    """

    __slots__ = ("single", "maxlen", "counts", "firsts", "offsets", "symbols")

    def __init__(self, lengths) -> None:
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            return
        self.single = None
        used.sort()
        maxlen = used[-1][0]
        counts = [0] * (maxlen + 1)
        for length, _ in used:
            counts[length] += 1
        # canonical first-code per length + completeness (Kraft) check
        firsts = [0] * (maxlen + 1)
        offsets = [0] * (maxlen + 1)
        code = 0
        off = 0
        for length in range(1, maxlen + 1):
            firsts[length] = code
            offsets[length] = off
            code += counts[length]
            off += counts[length]
            if code > (1 << length):
                raise ValueError("over-subscribed prefix code")
            code <<= 1
        if code != (1 << (maxlen + 1)):
            raise ValueError("incomplete prefix code")
        self.maxlen = maxlen
        self.counts = counts
        self.firsts = firsts
        self.offsets = offsets
        self.symbols = [s for _, s in used]

    @classmethod
    def from_pair(cls, s0: int, s1: int) -> "_PrefixCode":
        self = cls.__new__(cls)
        self.single = None
        self.maxlen = 1
        self.counts = [0, 2]
        self.firsts = [0, 0]
        self.offsets = [0, 0]
        self.symbols = [s0, s1]  # read order: s0 -> code 0, s1 -> code 1
        return self

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.maxlen + 1):
            code = (code << 1) | br.read_bit()
            idx = code - self.firsts[length]
            if 0 <= idx < self.counts[length]:
                return self.symbols[self.offsets[length] + idx]
        raise ValueError("invalid prefix code in stream")


# Storage order of the 19 code-length-code lengths: tuned from RFC 1951's
# order, weighted for low symbol counts — note 16 sits at position 8.
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        s0 = br.read(8) if br.read_bit() else br.read_bit()
        if num_symbols == 1:
            lengths = [0] * alphabet
            if s0 >= alphabet:
                raise ValueError("simple-code symbol out of range")
            lengths[s0] = 1
            return _PrefixCode(lengths)
        s1 = br.read(8)
        if s0 >= alphabet or s1 >= alphabet or s0 == s1:
            raise ValueError("bad simple-code symbols")
        return _PrefixCode.from_pair(s0, s1)
    # full path: code-length code, then the per-symbol lengths
    num_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read_bit():  # explicit symbol-count budget
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise ValueError("max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    symbol = 0
    prev_len = 8
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = clc.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet:
                raise ValueError("code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values and the distance plane-code neighborhood map
# ---------------------------------------------------------------------------


def _lz77_value(sym: int, br: _BitReader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _make_plane_codes():
    # Neighborhood offsets (dx, dy): dy 0..7 with dx 1..8, or dy 1..7 with
    # dx -7..8, ordered by squared distance then |dx| then sign — this
    # reproduces the spec's 120-entry table generatively.
    offs = [(dx, 0) for dx in range(1, 9)]
    offs += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    offs.sort(key=lambda o: (o[0] * o[0] + o[1] * o[1], abs(o[0]), o[0] < 0))
    assert len(offs) == 120
    return offs


_PLANE_CODES = _make_plane_codes()


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _PLANE_CODES[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# pixel-level helpers (uint32 ARGB SWAR ops on Python ints)
# ---------------------------------------------------------------------------


def _add_px(a: int, b: int) -> int:
    return (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00) | (
        ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    )


def _avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _select(top: int, left: int, top_left: int) -> int:
    s = 0
    for sh in (24, 16, 8, 0):
        t = (top >> sh) & 0xFF
        l = (left >> sh) & 0xFF
        tl = (top_left >> sh) & 0xFF
        s += abs(l - tl) - abs(t - tl)
    return top if s <= 0 else left


def _clamp_add_sub_full(left: int, top: int, top_left: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((top_left >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(left: int, top: int, top_left: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        ave = (((left >> sh) & 0xFF) + ((top >> sh) & 0xFF)) >> 1
        d = ave - ((top_left >> sh) & 0xFF)
        d = d // 2 if d >= 0 else -((-d) // 2)  # C trunc-toward-zero
        v = ave + d
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# entropy-coded image stream (recursive)
# ---------------------------------------------------------------------------


def _decode_pixels(br, w, h, cache_bits, meta, meta_bits, meta_w, groups):
    npx = w * h
    img = [0] * npx
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    x = 0
    y = 0
    group = groups[0]
    while pos < npx:
        if meta is not None:
            group = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        g = group[0].read(br)
        if g < 256:
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            img[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif g < 280:
            length = _lz77_value(g - 256, br)
            dist = _plane_to_distance(_lz77_value(group[4].read(br), br), w)
            if dist > pos or pos + length > npx:
                raise ValueError("LZ77 reference out of bounds")
            for _ in range(length):
                px = img[pos - dist]
                img[pos] = px
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
                pos += 1
            x = pos % w
            y = pos // w
        else:
            if cache is None or g - 280 >= len(cache):
                raise ValueError("color-cache index without/beyond cache")
            px = cache[g - 280]
            img[pos] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return np.array(img, dtype=np.uint32).reshape(h, w)


def _decode_image_stream(br: _BitReader, w: int, h: int, level0: bool) -> np.ndarray:
    transforms = []
    seen_types = set()
    xsize = w
    if level0:
        while br.read_bit():
            t = br.read(2)
            if t in seen_types:
                raise ValueError("duplicate transform")
            seen_types.add(t)
            if t == 3:  # color indexing
                n_colors = br.read(8) + 1
                bits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
                pal_img = _decode_image_stream(br, n_colors, 1, False)
                transforms.append(("cidx", bits, _delta_palette(pal_img), xsize))
                xsize = _subsample(xsize, bits)
            elif t == 2:
                transforms.append(("sg",))
            else:  # 0 predictor / 1 cross-color, tiled sub-image
                size_bits = br.read(3) + 2
                tw = _subsample(xsize, size_bits)
                th = _subsample(h, size_bits)
                timg = _decode_image_stream(br, tw, th, False)
                transforms.append(("pred" if t == 0 else "ccol", size_bits, timg))
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    meta = None
    meta_bits = 0
    meta_w = 0
    num_groups = 1
    if level0 and br.read_bit():  # meta prefix codes (entropy image)
        meta_bits = br.read(3) + 2
        meta_w = _subsample(xsize, meta_bits)
        mimg = _decode_image_stream(br, meta_w, _subsample(h, meta_bits), False)
        meta = ((mimg.astype(np.uint32) >> 8) & 0xFFFF).ravel().tolist()
        num_groups = max(meta) + 1
    alphabets = (256 + 24 + ((1 << cache_bits) if cache_bits else 0), 256, 256, 256, 40)
    groups = [
        tuple(_read_prefix_code(br, a) for a in alphabets) for _ in range(num_groups)
    ]
    img = _decode_pixels(br, xsize, h, cache_bits, meta, meta_bits, meta_w, groups)
    for t in reversed(transforms):
        if t[0] == "pred":
            img = _inverse_predictor(img, t[1], t[2])
        elif t[0] == "ccol":
            img = _inverse_cross_color(img, t[1], t[2])
        elif t[0] == "sg":
            img = _inverse_subtract_green(img)
        else:
            img = _inverse_color_index(img, t[1], t[2], t[3])
    return img


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _delta_palette(pal_img: np.ndarray) -> np.ndarray:
    """Palette entries are stored componentwise-delta-coded; integrate."""
    a = (pal_img >> 24) & 0xFF
    r = (pal_img >> 16) & 0xFF
    g = (pal_img >> 8) & 0xFF
    b = pal_img & 0xFF
    out = []
    ca = cr = cg = cb = 0
    for i in range(pal_img.shape[1]):
        ca = (ca + int(a[0, i])) & 0xFF
        cr = (cr + int(r[0, i])) & 0xFF
        cg = (cg + int(g[0, i])) & 0xFF
        cb = (cb + int(b[0, i])) & 0xFF
        out.append((ca << 24) | (cr << 16) | (cg << 8) | cb)
    return np.array(out, dtype=np.uint32)


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << 16) | b


def _inverse_cross_color(img: np.ndarray, size_bits: int, timg: np.ndarray) -> np.ndarray:
    h, w = img.shape
    ys = np.arange(h) >> size_bits
    xs = np.arange(w) >> size_bits
    elem = timg[np.ix_(ys, xs)]
    # multipliers are signed 3.5 fixed-point bytes; channels too are
    # interpreted signed inside the delta (libwebp ColorTransformDelta)
    as_s8 = lambda v: v.astype(np.uint8).astype(np.int8).astype(np.int32)
    g2r = as_s8(elem & 0xFF)
    g2b = as_s8((elem >> 8) & 0xFF)
    r2b = as_s8((elem >> 16) & 0xFF)
    g = as_s8((img >> 8) & 0xFF)
    r = ((((img >> 16) & 0xFF).astype(np.int32) + ((g2r * g) >> 5)) & 0xFF)
    rs = r.astype(np.uint8).astype(np.int8).astype(np.int32)
    b = (((img & 0xFF).astype(np.int32) + ((g2b * g) >> 5) + ((r2b * rs) >> 5)) & 0xFF)
    return (
        (img & np.uint32(0xFF00FF00))
        | (r.astype(np.uint32) << 16)
        | b.astype(np.uint32)
    )


def _inverse_predictor(img: np.ndarray, size_bits: int, timg: np.ndarray) -> np.ndarray:
    h, w = img.shape
    flat = img.ravel().tolist()
    modes = ((timg >> 8) & 0xFF).ravel().tolist()
    tw = timg.shape[1]
    for pos in range(h * w):
        y, x = divmod(pos, w)
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = flat[pos - 1]
        elif x == 0:
            pred = flat[pos - w]
        else:
            mode = modes[(y >> size_bits) * tw + (x >> size_bits)]
            left = flat[pos - 1]
            top = flat[pos - w]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = flat[pos - w + 1]
            elif mode == 4:
                pred = flat[pos - w - 1]
            elif mode == 5:
                pred = _avg2(_avg2(left, flat[pos - w + 1]), top)
            elif mode == 6:
                pred = _avg2(left, flat[pos - w - 1])
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(flat[pos - w - 1], top)
            elif mode == 9:
                pred = _avg2(top, flat[pos - w + 1])
            elif mode == 10:
                pred = _avg2(
                    _avg2(left, flat[pos - w - 1]), _avg2(top, flat[pos - w + 1])
                )
            elif mode == 11:
                pred = _select(top, left, flat[pos - w - 1])
            elif mode == 12:
                pred = _clamp_add_sub_full(left, top, flat[pos - w - 1])
            elif mode == 13:
                pred = _clamp_add_sub_half(left, top, flat[pos - w - 1])
            else:
                raise ValueError(f"invalid predictor mode {mode}")
        flat[pos] = _add_px(flat[pos], pred)
    return np.array(flat, dtype=np.uint32).reshape(h, w)


def _inverse_color_index(
    img: np.ndarray, bits: int, palette: np.ndarray, orig_w: int
) -> np.ndarray:
    h = img.shape[0]
    n = palette.shape[0]
    green = ((img >> 8) & 0xFF).astype(np.int64)
    if bits:
        bpp = 8 >> bits
        xs = np.arange(orig_w)
        shifts = (xs & ((1 << bits) - 1)) * bpp
        idx = (green[:, xs >> bits] >> shifts[None, :]) & ((1 << bpp) - 1)
    else:
        idx = green
    lut = np.zeros(max(int(idx.max()) + 1, n), dtype=np.uint32)
    lut[:n] = palette  # out-of-range indices decode to 0 (libwebp behavior)
    return lut[idx].reshape(h, orig_w)


# ---------------------------------------------------------------------------
# public decode API
# ---------------------------------------------------------------------------


def vp8l_decode(payload: bytes, dims: tuple[int, int] | None = None) -> np.ndarray:
    """Decode a VP8L bitstream to an (h, w) uint32 ARGB array.

    ``dims``: pass (w, h) for headerless streams (ALPH alpha planes);
    otherwise the 5-byte VP8L header (signature/size/version) is parsed.
    """
    br = _BitReader(bytes(payload))
    if dims is None:
        if br.read(8) != 0x2F:
            raise ValueError("bad VP8L signature")
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read_bit()  # alpha-used hint
        if br.read(3) != 0:
            raise ValueError("unsupported VP8L version")
    else:
        w, h = dims
    if w <= 0 or h <= 0:
        raise ValueError("bad VP8L dimensions")
    from olake_spark.functions.imagecodec import check_dims

    check_dims(w, h, "VP8L")
    return _decode_image_stream(br, w, h, True)


def _argb_to_rgb(argb: np.ndarray) -> np.ndarray:
    return np.stack(
        [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF], axis=-1
    ).astype(np.uint8)


def _walk_chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    off = 12
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    while off + 8 <= end:
        tag = data[off : off + 4]
        size = struct.unpack("<I", data[off + 4 : off + 8])[0]
        if off + 8 + size > len(data):
            raise ValueError("truncated WebP chunk")
        yield tag, data[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    if method == 0:
        return plane
    h, w = plane.shape
    out = np.empty_like(plane)
    for y in range(h):
        prev = out[y - 1] if y else None
        row = plane[y].astype(np.int32)
        if method == 1 or prev is None:  # horizontal (all methods on row 0)
            pred = int(prev[0]) if prev is not None else 0
            for x in range(w):
                pred = (pred + int(row[x])) & 0xFF
                out[y, x] = pred
        elif method == 2:  # vertical
            out[y] = ((row + prev.astype(np.int32)) & 0xFF).astype(np.uint8)
        elif method == 3:  # gradient
            left = tl = int(prev[0])
            for x in range(w):
                top = int(prev[x])
                g = left + top - tl
                g = 0 if g < 0 else 255 if g > 255 else g
                left = (int(row[x]) + g) & 0xFF
                tl = top
                out[y, x] = left
        else:
            raise ValueError(f"invalid ALPH filtering method {method}")
    return out


def _decode_alph(payload: bytes, w: int, h: int) -> np.ndarray:
    if not payload:
        raise ValueError("empty ALPH chunk")
    head = payload[0]
    compression = head & 3
    filtering = (head >> 2) & 3
    # bits 4-5 are the level-reduction preprocessing flag: encoder-side
    # quantization, nothing to invert on decode
    if compression == 0:
        if len(payload) - 1 < w * h:
            raise ValueError("truncated raw ALPH plane")
        plane = np.frombuffer(payload[1 : 1 + w * h], np.uint8).reshape(h, w).copy()
    elif compression == 1:
        argb = vp8l_decode(payload[1:], dims=(w, h))
        plane = ((argb >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"invalid ALPH compression {compression}")
    return _unfilter_alpha(plane, filtering)


def _vp8x_dims(payload: bytes) -> tuple[int, int]:
    if len(payload) < 10:
        raise ValueError("truncated VP8X chunk")
    w = 1 + int.from_bytes(payload[4:7], "little")
    h = 1 + int.from_bytes(payload[7:10], "little")
    return w, h


_LOSSY_SEAM_MSG = (
    "lossy WebP (VP8 color payload) is not supported without system "
    "libwebp: VP8 is a full intra video codec — documented dispatch seam, "
    "same decision as mp4/webm (install libwebp to enable the gated "
    "syscodec fallback)"
)


def _lossy_vp8_argb(data: bytes) -> np.ndarray:
    """Lossy-VP8 path: gated system-libwebp fallback (syscodec.py). The
    pure decoders own every other format; VP8 is the one deliberate
    delegation — see syscodec's module docstring for the rationale. Raises
    the documented seam ValueError when libwebp is absent."""
    from olake_spark.functions.syscodec import webp_decode_rgba_sys

    rgba = webp_decode_rgba_sys(data)  # whole file: libwebp applies ALPH too
    if rgba is None:
        raise ValueError(_LOSSY_SEAM_MSG)
    r, g, b, a = (rgba[..., i].astype(np.uint32) for i in range(4))
    return (a << 24) | (r << 16) | (g << 8) | b


def webp_decode_argb(data: bytes) -> np.ndarray:
    """Decode a WebP file to an (h, w) uint32 ARGB array — pure-python
    VP8L for lossless, gated libwebp for lossy VP8. Extended (VP8X) files
    may carry an EXIF chunk, which can sit AFTER the image data: the walk
    collects both before decoding, and the result is returned in display
    orientation (exif.py)."""
    data = bytes(data)
    image = None  # ("VP8L", payload) | ("VP8 ", None)
    exif = None
    for tag, payload in _walk_chunks(data):
        if tag == b"VP8L" and image is None:
            image = ("VP8L", payload)
        elif tag == b"VP8 " and image is None:
            image = ("VP8 ", None)
        elif tag == b"EXIF" and exif is None:
            exif = payload
    if image is None:
        raise ValueError("no image data chunk in WebP file")
    argb = vp8l_decode(image[1]) if image[0] == "VP8L" else _lossy_vp8_argb(data)
    if exif is not None:
        from olake_spark.functions.exif import (
            apply_orientation,
            orientation_from_exif,
        )

        argb = apply_orientation(argb, orientation_from_exif(exif))
    return argb


def webp_decode(data: bytes) -> np.ndarray:
    """Decode lossless WebP to (h, w, 3) uint8 RGB (alpha dropped — the
    same training-data ingest convention as png/gif/tiff decode)."""
    return _argb_to_rgb(webp_decode_argb(data))


def webp_decode_rgba(data: bytes) -> np.ndarray:
    """Decode lossless WebP to (h, w, 4) uint8 RGBA."""
    argb = webp_decode_argb(data)
    return np.stack(
        [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF, (argb >> 24) & 0xFF],
        axis=-1,
    ).astype(np.uint8)


def webp_alpha(data: bytes) -> np.ndarray:
    """The (h, w) uint8 alpha plane of a WebP file: from the ALPH chunk
    (works even when the color payload is lossy VP8) or the VP8L alpha
    channel; all-255 when the file has no alpha."""
    data = bytes(data)
    dims = None
    for tag, payload in _walk_chunks(data):
        if tag == b"VP8X":
            dims = _vp8x_dims(payload)
        elif tag == b"ALPH":
            if dims is None:
                raise ValueError("ALPH chunk without VP8X dimensions")
            return _decode_alph(payload, *dims)
        elif tag == b"VP8L":
            argb = vp8l_decode(payload)
            return ((argb >> 24) & 0xFF).astype(np.uint8)
        elif tag == b"VP8 " and dims is not None:
            return np.full((dims[1], dims[0]), 255, np.uint8)
    raise ValueError("no alpha-bearing chunk in WebP file")


# ---------------------------------------------------------------------------
# encoder (lossless VP8L, literal-only)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Length-limited Huffman code lengths forming a complete code.
    ``freqs`` must have >= 2 entries."""
    import heapq

    heap = [(f, s, None) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    counter = max(freqs) + 1
    parents: dict[int, tuple] = {}
    while len(heap) > 1:
        f1, s1, n1 = heapq.heappop(heap)
        f2, s2, n2 = heapq.heappop(heap)
        node = (counter, (s1, n1), (s2, n2))
        counter += 1
        heapq.heappush(heap, (f1 + f2, counter, node))
    lengths: dict[int, int] = {}

    def walk(entry, depth):
        sym, node = entry
        if node is None:
            lengths[sym] = max(depth, 1)
        else:
            walk(node[1], depth + 1)
            walk(node[2], depth + 1)

    _, s, n = heap[0]
    walk((s, n), 0)

    if max(lengths.values()) > max_len:
        for s in lengths:
            if lengths[s] > max_len:
                lengths[s] = max_len
        target = 1 << max_len
        kraft = sum(1 << (max_len - l) for l in lengths.values())
        while kraft > target:  # deepen the deepest non-max symbol
            s = max(
                (s for s, l in lengths.items() if l < max_len),
                key=lambda s: lengths[s],
            )
            lengths[s] += 1
            kraft -= 1 << (max_len - lengths[s])
        while kraft < target:  # shallow the deepest symbols back up
            s = max(
                (s for s, l in lengths.items() if kraft + (1 << (max_len - l)) <= target),
                key=lambda s: lengths[s],
            )
            kraft += 1 << (max_len - lengths[s])
            lengths[s] -= 1
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    prev_len = 0
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        code <<= lengths[s] - prev_len
        codes[s] = (lengths[s], code)
        code += 1
        prev_len = lengths[s]
    return codes


def _write_prefix_code(
    bw: _BitWriter, freqs: dict[int, int], alphabet: int
) -> dict[int, tuple[int, int]]:
    used = sorted(s for s, f in freqs.items() if f)
    if not used:
        used = [0]
    if len(used) == 1 and used[0] <= 255:
        s0 = used[0]
        bw.write(1, 1)  # simple
        bw.write(1, 0)  # one symbol
        if s0 <= 1:
            bw.write(1, 0)
            bw.write(1, s0)
        else:
            bw.write(1, 1)
            bw.write(8, s0)
        return {s0: (0, 0)}
    if len(used) == 2 and used[1] <= 255:
        s0, s1 = used
        bw.write(1, 1)
        bw.write(1, 1)
        bw.write(1, 1)
        bw.write(8, s0)
        bw.write(8, s1)
        return {s0: (1, 0), s1: (1, 1)}
    if len(used) == 1:  # single symbol > 255: complex header, 0-bit code
        lengths = {used[0]: 1}
    else:
        lengths = _huffman_lengths({s: freqs[s] for s in used}, 15)
    max_sym = max(lengths) + 1
    lens_list = [lengths.get(s, 0) for s in range(max_sym)]
    clc_freqs: dict[int, int] = {}
    for l in lens_list:
        clc_freqs[l] = clc_freqs.get(l, 0) + 1
    bw.write(1, 0)  # not simple
    bw.write(4, 15)  # num_code_lengths = 19
    if len(clc_freqs) == 1:
        clc_lengths = {next(iter(clc_freqs)): 1}
        clc_codes = {next(iter(clc_freqs)): (0, 0)}  # 0-bit single-symbol code
    else:
        clc_lengths = _huffman_lengths(clc_freqs, 7)
        clc_codes = _canonical_codes(clc_lengths)
    for sym in _CLC_ORDER:
        bw.write(3, clc_lengths.get(sym, 0))
    bw.write(1, 1)  # use the max_symbol trim for the zero tail
    need = max((max_sym - 2).bit_length(), 2)
    i = (need - 2 + 1) // 2
    bw.write(3, i)
    bw.write(2 + 2 * i, max_sym - 2)
    for l in lens_list:
        bw.write_code(*clc_codes[l])
    if len(lengths) == 1:
        return {used[0]: (0, 0)}  # decoder reads single-symbol codes with 0 bits
    return _canonical_codes(lengths)


def webp_encode(arr: np.ndarray) -> bytes:
    """Encode a uint8 image — (h, w) gray, (h, w, 3) RGB or (h, w, 4)
    RGBA — as lossless WebP (VP8L, literal-only)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("webp_encode expects uint8")
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError(f"bad image shape {arr.shape}")
    h, w = a.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    if a.shape[2] == 3:
        alpha = np.full((h, w), 255, np.uint8)
    else:
        alpha = a[:, :, 3]
    planes = [a[:, :, 1], a[:, :, 0], a[:, :, 2], alpha]  # g, r, b, a emit order

    bw = _BitWriter()
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, int(bool((alpha != 255).any())))
    bw.write(3, 0)  # version
    bw.write(1, 0)  # no transforms
    bw.write(1, 0)  # no color cache
    bw.write(1, 0)  # no meta prefix codes
    codes = []
    for plane, alphabet in zip(planes, (256 + 24, 256, 256, 256)):
        vals, counts = np.unique(plane, return_counts=True)
        codes.append(
            _write_prefix_code(
                bw, dict(zip(vals.tolist(), counts.tolist())), alphabet
            )
        )
    _write_prefix_code(bw, {0: 1}, 40)  # distance code (never used)
    g, r, b, al = (p.ravel().tolist() for p in planes)
    cg, cr, cb, ca = codes
    for i in range(w * h):
        bw.write_code(*cg[g[i]])
        bw.write_code(*cr[r[i]])
        bw.write_code(*cb[b[i]])
        bw.write_code(*ca[al[i]])
    return _wrap_vp8l(b"\x2f" + bw.getvalue())


def _wrap_vp8l(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
