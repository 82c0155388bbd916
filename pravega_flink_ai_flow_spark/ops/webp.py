"""WebP VP8L (lossless) codec — pure python, the r13 verdict #7
decision: implement the entropy layer for real rather than keep the
whole format a seam (reference parity target: the multimodal decode
family of SURVEY.md §2 L5; the reference itself ships no codecs — this
is the north-star operator set).

Implemented from the public "WebP Lossless Bitstream Specification"
(RFC 9649 / the libwebp doc):

* container: RIFF / ``WEBP`` / ``VP8L`` chunk;
* header: 0x2F signature, 14-bit width−1 / height−1, alpha hint,
  3-bit version (must be 0);
* the spatially-coded ARGB image: color cache (1–11 bit),
  simple (1–2 symbol) AND normal prefix codes (code-length codes with
  the 16/17/18 repeat symbols and the optional max_symbol limit),
  single-symbol 0-bit codes, LZ77 backward references with both the
  120-entry 2-D distance-plane mapping and plain distances;
* three of the four spatial transforms, BOTH directions (r14-r15):
  subtract-green (r−g / b−g ahead of the entropy layer), the
  PREDICTOR transform (all 14 modes incl. Select and the two
  clamp-add-subtract forms, normative border rules, per-block modes
  decoded from the recursive entropy-coded sub-image), and the COLOR
  (cross-channel decorrelation) transform (int8 green_to_red /
  green_to_blue / red_to_blue deltas, ``(int8·int8) >> 5``);
  inverse application in reverse stream order per RFC 9649 §4.4.

NOT implemented — explicit documented seams, each raising
``NotImplementedError`` with the feature name: the color-indexing
transform (pixel-bundled palette images) and meta-prefix (entropy
image) partitioning. Our encoder never emits them; a corpus payload
using them quarantines through ``decode_image_safe`` exactly like the
other codec seams (12-bit JPEG, non-PCM WAV).

Honesty note on verification: the sandbox has no libwebp/PIL, so — as
with the GIF/JPEG codecs — the wire format is anchored by a HAND-BUILT
spec vector (tests/test_properties.py: a bitstream assembled byte by
byte from the spec's pseudocode, independent of this module's writer)
plus encoder↔decoder roundtrips over the feature grid; the
distance-plane table and cache-insertion rule are transcribed from the
spec and exercised by both directions.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

_SIG = 0x2F
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16,
                      6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_NUM_LENGTH_CODES = 24          # green alphabet = 256 + 24 + cache_size
_NUM_DISTANCE_CODES = 40
_CACHE_MULT = 0x1E35A7BD
_MAX_LZ77_LEN = 4096

# the spec's 120-entry distance-plane neighborhood, code 1..120 →
# (dx, dy) with dy ≥ 0; distance = dy * width + dx (clamped ≥ 1)
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (3, 8),
    (-3, 8), (8, 5), (4, 8), (-4, 8), (8, 6), (7, 6), (-7, 6), (8, 7),
)


# ---------------------------------------------------------------------------
# LSB-first bit I/O (VP8L convention: bits fill each byte from the
# least-significant end; prefix-code bits are read one at a time, the
# FIRST-read bit being the most significant bit of the canonical code)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def bits(self, value: int, n: int) -> None:
        """Append the n LOW bits of value, LSB first."""
        self._acc |= (value & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self._buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def code(self, code: int, length: int) -> None:
        """Append a canonical prefix code MSB-first (the read order)."""
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self._buf)
        if self._n:
            out.append(self._acc & 0xFF)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def bits(self, n: int) -> int:
        while self._n < n:
            if self._pos >= len(self._d):
                raise ValueError("VP8L bitstream truncated")
            self._acc |= self._d[self._pos] << self._n
            self._pos += 1
            self._n += 8
        v = self._acc & ((1 << n) - 1)
        self._acc >>= n
        self._n -= n
        return v


# ---------------------------------------------------------------------------
# canonical prefix codes (shared assignment; the decoder's table and the
# encoder's emit use the same function, and the hand-built spec vector
# in tests anchors the convention itself)
# ---------------------------------------------------------------------------

def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol→(code, length) for the canonical code of the given
    lengths: symbols sorted by (length, symbol), code values counting
    up, left-shifted at each length increase (the DEFLATE rule, which
    VP8L shares)."""
    syms = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    out: dict[int, tuple[int, int]] = {}
    code, prev = 0, 0
    for ln, s in syms:
        code <<= (ln - prev)
        out[s] = (code, ln)
        code += 1
        prev = ln
    return out


class _Decoder:
    """Prefix-code reader over {(length, code): symbol}; a
    single-symbol code reads ZERO bits (the spec's degenerate case)."""

    def __init__(self, lengths: dict[int, int], what: str,
                 table: dict[tuple[int, int], int] | None = None) -> None:
        if table is not None:            # explicit (simple-code) table
            self._single: int | None = None
            self._table = table
            return
        nz = {s: ln for s, ln in lengths.items() if ln > 0}
        if not nz:
            if len(lengths) == 1:        # the {sym: 0} degenerate form
                self._single = next(iter(lengths))
                self._table = {}
                return
            raise ValueError(f"VP8L {what}: empty prefix code")
        if len(nz) == 1 and not any(ln == 0 for ln in lengths.values()):
            self._single = next(iter(nz))
            self._table = {}
            return
        kraft = sum(1 << (15 - ln) for ln in nz.values() if ln <= 15)
        if any(ln > 15 for ln in nz.values()) or kraft != (1 << 15):
            raise ValueError(f"VP8L {what}: invalid prefix code "
                             f"(Kraft sum {kraft}/{1 << 15})")
        self._single = None
        self._table = {(ln, code): s
                       for s, (code, ln) in _canonical_codes(nz).items()}

    def read(self, br: _BitReader) -> int:
        if self._single is not None:
            return self._single
        code = ln = 0
        while ln <= 15:
            code = (code << 1) | br.bits(1)
            ln += 1
            s = self._table.get((ln, code))
            if s is not None:
                return s
        raise ValueError("VP8L prefix code over 15 bits")


def _build_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Huffman code lengths from frequencies, depth-limited by
    frequency dampening (ratio irrelevant here — validity is)."""
    import heapq
    import itertools

    f = {s: c for s, c in freqs.items() if c > 0}
    if not f:
        return {}
    if len(f) == 1:
        return {next(iter(f)): 0}
    while True:
        tie = itertools.count()
        heap = [(c, next(tie), {s: 0}) for s, c in f.items()]
        heapq.heapify(heap)
        while len(heap) > 1:
            c1, _, d1 = heapq.heappop(heap)
            c2, _, d2 = heapq.heappop(heap)
            merged = {s: ln + 1 for s, ln in d1.items()}
            merged.update({s: ln + 1 for s, ln in d2.items()})
            heapq.heappush(heap, (c1 + c2, next(tie), merged))
        lengths = heap[0][2]
        if max(lengths.values()) <= max_len:
            return lengths
        f = {s: (c + 1) // 2 for s, c in f.items()}


# ---------------------------------------------------------------------------
# the length/distance prefix-value scheme (spec pseudocode)
# ---------------------------------------------------------------------------

def _prefix_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value ≥ 1 → (prefix_code, n_extra_bits, extra_value)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 64):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, extra, v - offset - 1
    raise ValueError(f"prefix-codable value out of range: {v}")


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _read_prefix_code(br: _BitReader, alphabet: int,
                      what: str) -> _Decoder:
    """One prefix code from the stream: simple (1-bit flag) or normal
    (code-length-coded lengths)."""
    if br.bits(1):                       # simple code
        n_sym = br.bits(1) + 1
        first_8 = br.bits(1)
        s0 = br.bits(8 if first_8 else 1)
        if n_sym == 1:
            return _Decoder({s0: 0}, what)
        s1 = br.bits(8)
        if s0 == s1:
            raise ValueError(f"VP8L {what}: duplicate simple symbols")
        # codes follow LISTED order (spec), not symbol order
        return _Decoder({}, what, table={(1, 0): s0, (1, 1): s1})
    lengths = _read_code_lengths(br, alphabet, what)
    return _Decoder(lengths, what)


def _read_code_lengths(br: _BitReader, alphabet: int,
                       what: str) -> dict[int, int]:
    """The normal-form code lengths (the simple flag already read)."""
    n_codes = 4 + br.bits(4)
    cl_lengths = {}
    for i in range(n_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl = _Decoder(cl_lengths, f"{what} code-length")
    if br.bits(1):                       # explicit max_symbol
        nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(nbits)
    else:
        max_symbol = alphabet
    lengths: dict[int, int] = {}
    sym, prev_nz = 0, 8
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl.read(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev_nz = s
        elif s == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev_nz
                    sym += 1
        elif s == 17:
            sym += 3 + br.bits(3)
        else:                            # 18
            sym += 11 + br.bits(7)
    return lengths


def _decode_argb_section(br: "_BitReader", w: int, h: int, *,
                         level0: bool) -> "list[int]":
    """One spatially-coded ARGB image section — optional color cache,
    five prefix codes, pixel loop — shared by the main image and the
    transform sub-images (predictor modes / color-transform elements
    are themselves entropy-coded images, RFC 9649 §4.4). Only the
    level-0 (main) image may carry a meta-prefix bit; sub-images read
    straight from the cache bit to the codes."""
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad VP8L color-cache size {cache_bits}")
    if level0 and br.bits(1):
        raise NotImplementedError(
            "VP8L meta-prefix (entropy image) partitioning not "
            "implemented (documented seam)")
    cache_size = (1 << cache_bits) if cache_bits else 0
    green = _read_prefix_code(
        br, 256 + _NUM_LENGTH_CODES + cache_size, "green")
    red = _read_prefix_code(br, 256, "red")
    blue = _read_prefix_code(br, 256, "blue")
    alpha = _read_prefix_code(br, 256, "alpha")
    dist = _read_prefix_code(br, _NUM_DISTANCE_CODES, "distance")

    n = w * h
    px: list[int] = []
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0

    def insert(argb: int) -> None:
        if cache_bits:
            cache[(_CACHE_MULT * argb & 0xFFFFFFFF) >> shift] = argb

    while len(px) < n:
        s = green.read(br)
        if s < 256:
            g = s
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            px.append(argb)
            insert(argb)
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_value(br, s - 256)
            dcode = _prefix_value(br, dist.read(br))
            if dcode > 120:
                d = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                d = max(1, dy * w + dx)
            if d > len(px):
                raise ValueError("VP8L backward reference before start")
            if len(px) + length > n:
                raise ValueError("VP8L backward reference past end")
            for _ in range(length):
                argb = px[-d]
                px.append(argb)
                insert(argb)
        else:
            idx = s - 256 - _NUM_LENGTH_CODES
            if idx >= cache_size:
                raise ValueError("VP8L color-cache index out of range")
            argb = cache[idx]
            px.append(argb)
            insert(argb)
    return px


# --- per-pixel SWAR helpers on packed 0xAARRGGBB ints ---------------------

def _add_px(a: int, b: int) -> int:
    """Per-channel mod-256 addition of two packed ARGB pixels."""
    rb = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    ag = (((a >> 8) & 0x00FF00FF) + ((b >> 8) & 0x00FF00FF)) & 0x00FF00FF
    return (ag << 8) | rb


def _avg2(a: int, b: int) -> int:
    """Per-channel floor((a+b)/2) without cross-channel carries."""
    return (a & b) + (((a ^ b) & 0xFEFEFEFE) >> 1)


def _channels(p: int) -> "tuple[int, int, int, int]":
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _select(l: int, t: int, tl: int) -> int:
    """Predictor 11 (RFC 9649): the L/T candidate closer to the
    gradient prediction L + T − TL, summed over all four channels."""
    la, lr, lg, lb = _channels(l)
    ta, tr, tg, tb = _channels(t)
    ca, cr, cg, cb = _channels(tl)
    pa, pr, pg, pb = la + ta - ca, lr + tr - cr, lg + tg - cg, lb + tb - cb
    p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    p_t = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return l if p_l < p_t else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_subtract_full(l: int, t: int, tl: int) -> int:
    """Predictor 12: per-channel clamp(L + T − TL)."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)
                      - ((tl >> sh) & 0xFF)) << sh
    return out


def _clamp_add_subtract_half(ave: int, tl: int) -> int:
    """Predictor 13: per-channel clamp(a + (a − b) / 2) with C's
    truncate-toward-zero division, a = avg2(L, T), b = TL."""
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)   # C trunc division
        out |= _clamp(a + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_subtract_full(l, t, tl)
    if mode == 13:
        return _clamp_add_subtract_half(_avg2(l, t), tl)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _predictor_inverse(px: "list[int]", w: int, h: int,
                       size_bits: int, modes: "list[int]") -> None:
    """In-place inverse of the predictor transform (RFC 9649 §4.4.1):
    each entropy-decoded value is a residual; add the prediction from
    already-restored neighbors. Border rules are normative: pixel
    (0,0) predicts black, the rest of row 0 predicts L, column 0
    predicts T — regardless of the block's mode. The top-right
    neighbor of a right-edge pixel wraps to the linear-buffer
    successor — index i − w + 1 = the CURRENT row's x = 0 pixel,
    already restored — exactly libwebp's in-place buffer addressing."""
    bw = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = (modes[(y >> size_bits) * bw
                              + (x >> size_bits)] >> 8) & 0xFF
                pred = _predict(mode, px[i - 1], px[i - w],
                                px[i - w + 1], px[i - w - 1])
            px[i] = _add_px(px[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 with arithmetic
    shift (RFC 9649 §4.4.2)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _color_inverse(px: "list[int]", w: int, h: int,
                   size_bits: int, elems: "list[int]") -> None:
    """In-place inverse of the color (cross-channel decorrelation)
    transform: per block, red += delta(green_to_red, green) and
    blue += delta(green_to_blue, green) + delta(red_to_blue, RESTORED
    red) — element channels per the spec: green_to_red in blue,
    green_to_blue in green, red_to_blue in red."""
    bw = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            e = elems[(y >> size_bits) * bw + (x >> size_bits)]
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            p = px[i]
            g = (p >> 8) & 0xFF
            r = ((p >> 16) & 0xFF) + _ct_delta(g2r, g)
            r &= 0xFF
            b = (p & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
            px[i] = (p & 0xFF00FF00) | (r << 16) | (b & 0xFF)


def decode_vp8l(payload: bytes):
    """VP8L chunk payload → (width, height, 4, uint8 h×w×4 RGBA)."""
    import numpy as np

    if not payload or payload[0] != _SIG:
        raise ValueError("not a VP8L stream (bad signature byte)")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)                           # alpha-is-used hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    # transforms are read in stream order and INVERTED in reverse
    # order after entropy decode (RFC 9649 §4.4); each of predictor /
    # color carries a subresolution image that is itself an
    # entropy-coded ARGB section
    transforms: list[tuple] = []
    seen_types: set[int] = set()
    while br.bits(1):
        t = br.bits(2)
        if t in seen_types:
            raise ValueError(f"duplicate VP8L transform type {t}")
        seen_types.add(t)
        if t == 2:                       # subtract-green: no payload
            transforms.append(("subtract_green",))
        elif t in (0, 1):                # predictor / color
            size_bits = br.bits(3) + 2
            bw = (w + (1 << size_bits) - 1) >> size_bits
            bh = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_argb_section(br, bw, bh, level0=False)
            transforms.append(("predictor" if t == 0 else "color",
                               size_bits, sub))
        else:
            raise NotImplementedError(
                "VP8L transform color-indexing not implemented "
                "(documented seam — pixel-bundled palette images; our "
                "encoder never emits it; swap this seam for PIL/libwebp "
                "where available)")
    px = _decode_argb_section(br, w, h, level0=True)

    subtract_green = False
    for tf in reversed(transforms):
        if tf[0] == "predictor":
            _predictor_inverse(px, w, h, tf[1], tf[2])
        elif tf[0] == "color":
            _color_inverse(px, w, h, tf[1], tf[2])
        else:
            # vectorized below, after the numpy unpack — it is always
            # the FIRST-read transform our encoder emits, hence the
            # last inverse, so deferring it is order-preserving; a
            # foreign stream ordering it earlier gets the exact
            # per-pixel path instead
            if tf is transforms[0]:
                subtract_green = True
            else:  # pragma: no cover - unusual but legal ordering
                for i, p in enumerate(px):
                    g = (p >> 8) & 0xFF
                    r = (((p >> 16) & 0xFF) + g) & 0xFF
                    b = ((p & 0xFF) + g) & 0xFF
                    px[i] = (p & 0xFF00FF00) | (r << 16) | b

    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = (arr >> 16) & 0xFF    # R
    out[:, :, 1] = (arr >> 8) & 0xFF     # G
    out[:, :, 2] = arr & 0xFF            # B
    out[:, :, 3] = (arr >> 24) & 0xFF    # A
    if subtract_green:
        # inverse transform, vectorized after entropy decode: the
        # forward pass stored r−g and b−g (mod 256)
        out[:, :, 0] += out[:, :, 1]
        out[:, :, 2] += out[:, :, 1]
    return w, h, 4, out


def decode_webp(content: bytes):
    """WebP bytes → (width, height, 4, uint8 h×w×4 RGBA). Lossless
    (VP8L) only; lossy VP8 and extended VP8X raise — documented seams
    like the rest of :func:`.multimodal.decode_image`'s family."""
    if len(content) < 21 or content[:4] != b"RIFF" \
            or content[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (bad RIFF header)")
    fourcc = content[12:16]
    if fourcc != b"VP8L":
        raise NotImplementedError(
            f"WebP {fourcc.decode('ascii', 'replace').strip()} (lossy/"
            "extended) decode requires an image library not present in "
            "this container; only lossless VP8L is implemented here")
    size = int.from_bytes(content[16:20], "little")
    if size < 1 or 20 + size > len(content):
        raise ValueError("WebP VP8L chunk size out of bounds")
    return decode_vp8l(content[20:20 + size])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _write_code(bw: _BitWriter, lengths: dict[int, int]) -> None:
    """Emit one prefix-code description: simple form for ≤2 symbols
    that fit 8 bits, else the normal code-length-coded form with the
    max_symbol limit (so the decoder stops exactly where our lengths
    end — and that decoder path is gate-exercised)."""
    used = sorted(s for s in lengths if lengths[s] > 0) \
        or sorted(lengths)          # single-symbol case: length 0
    if len(used) <= 2 and used[-1] <= 255:
        bw.bits(1, 1)                                   # simple
        bw.bits(len(used) - 1, 1)
        if used[0] <= 1:
            bw.bits(0, 1)                               # 1-bit first sym
            bw.bits(used[0], 1)
        else:
            bw.bits(1, 1)                               # 8-bit first sym
            bw.bits(used[0], 8)
        if len(used) == 2:
            bw.bits(used[1], 8)
        return
    # symbols listed in ascending order ⇒ the canonical assignment
    # _SymWriter uses equals the spec's listed-order simple semantics,
    # so only the ascending form is ever emitted
    n_written = used[-1] + 1
    seq = [lengths.get(s, 0) for s in range(n_written)]
    cl_freq: dict[int, int] = {}
    for v in seq:
        cl_freq[v] = cl_freq.get(v, 0) + 1
    cl_lengths = _build_lengths(cl_freq, 7)
    if len(cl_lengths) == 1:
        # complete the degenerate code with an unused dummy symbol so
        # strict Kraft validation passes on the decode side
        only = next(iter(cl_lengths))
        dummy = 0 if only != 0 else 1
        cl_lengths = {only: 1, dummy: 1}
    bw.bits(0, 1)                                       # normal
    bw.bits(19 - 4, 4)                                  # all 19 slots
    for i in range(19):
        bw.bits(cl_lengths.get(_CODE_LENGTH_ORDER[i], 0), 3)
    # max_symbol = number of code-length symbols we write: without it
    # the decoder would keep decoding lengths for the full alphabet out
    # of the pixel data that follows
    bw.bits(1, 1)
    i = 0
    while 2 + (1 << (2 + 2 * i)) <= n_written:
        i += 1
    if i > 7:
        raise ValueError("VP8L max_symbol field overflow")
    bw.bits(i, 3)
    bw.bits(n_written - 2, 2 + 2 * i)
    cl_codes = _canonical_codes(cl_lengths)
    for v in seq:
        c, ln = cl_codes[v]
        bw.code(c, ln)


class _SymWriter:
    """Emit symbols of one alphabet under its chosen code (handles the
    0-bit single-symbol form)."""

    def __init__(self, lengths: dict[int, int]) -> None:
        self._single = (next(iter(lengths))
                        if len(lengths) == 1
                        and next(iter(lengths.values())) == 0 else None)
        self._codes = _canonical_codes(lengths)

    def write(self, bw: _BitWriter, sym: int) -> None:
        if self._single is not None:
            return                       # 0-bit code
        c, ln = self._codes[sym]
        bw.code(c, ln)


def _predictor_forward(a: "list[int]", w: int, h: int,
                       size_bits: int, mode: int) -> "list[int]":
    """Residual image of the predictor transform: out[i] = a[i] − pred
    per channel mod 256, predictions from the ACTUAL neighbor values
    (what the decoder will have restored), same border rules as
    :func:`_predictor_inverse`."""
    out = [0] * len(a)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = a[i - 1]
            elif x == 0:
                pred = a[i - w]
            else:
                pred = _predict(mode, a[i - 1], a[i - w],
                                a[i - w + 1], a[i - w - 1])
            v = a[i]
            res = 0
            for sh in (24, 16, 8, 0):
                res |= ((((v >> sh) & 0xFF) - ((pred >> sh) & 0xFF))
                        & 0xFF) << sh
            out[i] = res
    return out


def _write_argb_section(bw: "_BitWriter", a: "list[int]", w: int, *,
                        use_lz77: bool, cache_bits: int,
                        level0: bool) -> None:
    """Write one spatially-coded ARGB section (cache bit, prefix
    codes, token stream) — the writer twin of
    :func:`_decode_argb_section`, shared by the main image and the
    predictor/color transform sub-images."""
    n = len(a)
    cache_size = (1 << cache_bits) if cache_bits else 0
    shift = 32 - cache_bits if cache_bits else 0
    cache = [0] * cache_size

    def insert(v: int) -> None:
        if cache_bits:
            cache[(_CACHE_MULT * v & 0xFFFFFFFF) >> shift] = v

    # --- tokenize ---------------------------------------------------
    # token kinds: ("lit", argb) / ("ref", length, distance) /
    # ("cache", idx)
    tokens: list[tuple] = []
    pos = 0
    while pos < n:
        best_len, best_d = 0, 0
        if use_lz77 and pos > 0:
            for d in (1, w):
                if d > pos:
                    continue
                ln = 0
                limit = min(n - pos, _MAX_LZ77_LEN)
                while ln < limit and a[pos + ln - d] == a[pos + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_d = ln, d
        if best_len >= 3:
            tokens.append(("ref", best_len, best_d))
            for i in range(best_len):
                insert(a[pos + i])
            pos += best_len
            continue
        v = a[pos]
        if cache_bits:
            idx = (_CACHE_MULT * v & 0xFFFFFFFF) >> shift
            if cache[idx] == v:
                tokens.append(("cache", idx))
                insert(v)
                pos += 1
                continue
        tokens.append(("lit", v))
        insert(v)
        pos += 1

    # distance value → distance code (plane code for the two mapped
    # neighbors so the 2-D path decodes at the gate, plain otherwise)
    plane = {}
    for i, (dx, dy) in enumerate(_DIST_MAP):
        d = dy * w + dx
        if d >= 1 and d not in plane:
            plane[d] = i + 1

    def dist_code(d: int) -> int:
        return plane.get(d, d + 120)

    # --- frequencies ------------------------------------------------
    fg: dict[int, int] = {}
    fr: dict[int, int] = {}
    fb: dict[int, int] = {}
    fa: dict[int, int] = {}
    fd: dict[int, int] = {}

    def bump(d: dict, k: int) -> None:
        d[k] = d.get(k, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            bump(fg, (v >> 8) & 0xFF)
            bump(fr, (v >> 16) & 0xFF)
            bump(fb, v & 0xFF)
            bump(fa, (v >> 24) & 0xFF)
        elif t[0] == "ref":
            bump(fg, 256 + _prefix_encode(t[1])[0])
            bump(fd, _prefix_encode(dist_code(t[2]))[0])
        else:
            bump(fg, 256 + _NUM_LENGTH_CODES + t[1])
    for f in (fg, fr, fb, fa, fd):
        if not f:
            f[0] = 1                     # decoder rejects empty codes

    lg = _build_lengths(fg, 15)
    lr = _build_lengths(fr, 15)
    lb = _build_lengths(fb, 15)
    la = _build_lengths(fa, 15)
    ld = _build_lengths(fd, 15)

    if cache_bits:
        bw.bits(1, 1)
        bw.bits(cache_bits, 4)
    else:
        bw.bits(0, 1)
    if level0:
        bw.bits(0, 1)                    # no meta-prefix image
    for lengths in (lg, lr, lb, la, ld):
        _write_code(bw, lengths)
    wg, wr, wb, wa, wd = (_SymWriter(x) for x in (lg, lr, lb, la, ld))
    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            wg.write(bw, (v >> 8) & 0xFF)
            wr.write(bw, (v >> 16) & 0xFF)
            wb.write(bw, v & 0xFF)
            wa.write(bw, (v >> 24) & 0xFF)
        elif t[0] == "ref":
            code, nb, extra = _prefix_encode(t[1])
            wg.write(bw, 256 + code)
            bw.bits(extra, nb)
            code, nb, extra = _prefix_encode(dist_code(t[2]))
            wd.write(bw, code)
            bw.bits(extra, nb)
        else:
            wg.write(bw, 256 + _NUM_LENGTH_CODES + t[1])


def encode_webp_lossless(pixels, *, use_lz77: bool = True,
                         cache_bits: int = 0,
                         subtract_green: bool = False,
                         predictor: int | None = None,
                         color_transform: "tuple[int, int, int] | None"
                         = None,
                         transform_bits: int = 9) -> bytes:
    """uint8 array (h×w, h×w×3 or h×w×4) → lossless WebP bytes.

    Emits literals, optional greedy LZ77 back-references (run of the
    previous pixel, distance 1, and the pixel-above run, distance =
    width — both through PLAIN distance codes ``d+120`` and, for the
    two mapped neighbors, the 2-D plane codes, so the decoder's both
    distance paths are exercised), an optional color cache whose
    state mirrors the decoder's exactly (every emitted pixel inserted,
    including back-reference copies — the spec's rule), and the VP8L
    spatial transforms (all implemented BOTH directions, r15):
    ``subtract_green`` (r−g / b−g mod 256), ``predictor`` (a mode
    0-13 applied uniformly — the per-block mode SUB-IMAGE is emitted
    for real through the shared entropy-section writer, so the
    decoder exercises its recursive sub-image path), and
    ``color_transform`` (uniform (green_to_red, green_to_blue,
    red_to_blue) int8 deltas). ``transform_bits`` sizes the transform
    blocks (2..9 per spec). Forward application follows STREAM order
    (subtract-green, color, predictor) so the decoder's
    reverse-order inversion restores exactly."""
    import numpy as np

    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if not (1 <= h <= 1 << 14 and 1 <= w <= 1 << 14):
        raise ValueError("VP8L dims must be 1..16384")
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    if c == 1:
        rgba[:, :, 0] = rgba[:, :, 1] = rgba[:, :, 2] = arr[:, :, 0]
        rgba[:, :, 3] = 255
    elif c == 3:
        rgba[:, :, :3] = arr
        rgba[:, :, 3] = 255
    elif c == 4:
        rgba[:] = arr
    else:
        raise ValueError(f"unsupported channel count {c}")
    if subtract_green:
        # forward transform before the entropy layer (cache and LZ77
        # both see the transformed values, mirroring the decoder)
        rgba = rgba.copy()
        rgba[:, :, 0] -= rgba[:, :, 1]
        rgba[:, :, 2] -= rgba[:, :, 1]
    argb = ((rgba[:, :, 3].astype(np.uint32) << 24)
            | (rgba[:, :, 0].astype(np.uint32) << 16)
            | (rgba[:, :, 1].astype(np.uint32) << 8)
            | rgba[:, :, 2].astype(np.uint32)).reshape(-1)
    has_alpha = bool((rgba[:, :, 3] != 255).any())
    if predictor is not None and not 0 <= predictor <= 13:
        raise ValueError(f"VP8L predictor mode must be 0..13, got {predictor}")
    if not 2 <= transform_bits <= 9:
        raise ValueError("transform_bits must be 2..9")

    # forward transforms, applied in STREAM order (the decoder inverts
    # in reverse read order): subtract-green already ran on the numpy
    # planes above; predictor and color run on the packed list
    a = argb.tolist()
    if color_transform is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        for i, p in enumerate(a):
            g = (p >> 8) & 0xFF
            r = (p >> 16) & 0xFF
            b = p & 0xFF
            nr = (r - _ct_delta(g2r, g)) & 0xFF
            nb_ = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            a[i] = (p & 0xFF00FF00) | (nr << 16) | nb_
    if predictor is not None:
        a = _predictor_forward(a, w, h, transform_bits, predictor)

    # --- bitstream ----------------------------------------------------
    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if has_alpha else 0, 1)
    bw.bits(0, 3)                        # version
    if subtract_green:
        bw.bits(1, 1)                    # a transform follows
        bw.bits(2, 2)                    # type 2 = subtract-green
    sbits = transform_bits
    bsub_w = (w + (1 << sbits) - 1) >> sbits
    bsub_h = (h + (1 << sbits) - 1) >> sbits
    if color_transform is not None:
        bw.bits(1, 1)
        bw.bits(1, 2)                    # type 1 = color transform
        bw.bits(sbits - 2, 3)
        elem = 0xFF000000 | ((color_transform[2] & 0xFF) << 16) \
            | ((color_transform[1] & 0xFF) << 8) \
            | (color_transform[0] & 0xFF)
        _write_argb_section(bw, [elem] * (bsub_w * bsub_h), bsub_w,
                            use_lz77=False, cache_bits=0, level0=False)
    if predictor is not None:
        bw.bits(1, 1)
        bw.bits(0, 2)                    # type 0 = predictor transform
        bw.bits(sbits - 2, 3)
        mode_px = 0xFF000000 | ((predictor & 0xFF) << 8)
        _write_argb_section(bw, [mode_px] * (bsub_w * bsub_h), bsub_w,
                            use_lz77=False, cache_bits=0, level0=False)
    bw.bits(0, 1)                        # no (further) transforms
    _write_argb_section(bw, a, w, use_lz77=use_lz77,
                        cache_bits=cache_bits, level0=True)

    payload = bytes([_SIG]) + bw.bytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") \
        + b"WEBP" + chunk
    return riff
