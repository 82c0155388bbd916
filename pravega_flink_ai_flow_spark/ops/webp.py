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
* the subtract-green transform (both directions — the entropy layer
  sees r−g / b−g, the decoder inverts after entropy decode).

NOT implemented — explicit documented seams, each raising
``NotImplementedError`` with the feature name: the other three
transforms (predictor / color / color-indexing) and meta-prefix
(entropy image) partitioning. Our encoder never emits them; a corpus
payload using them quarantines through ``decode_image_safe`` exactly
like the other codec seams (12-bit JPEG, non-PCM WAV).

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
    subtract_green = False
    while br.bits(1):
        t = br.bits(2)
        if t == 2:                       # subtract-green: no payload
            subtract_green = True
            continue
        raise NotImplementedError(
            f"VP8L transform {('predictor', 'color', 'subtract-green', 'color-indexing')[t]} "
            "not implemented (documented seam — our encoder never emits "
            "it; swap this seam for PIL/libwebp where available)")
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad VP8L color-cache size {cache_bits}")
    if br.bits(1):
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


def encode_webp_lossless(pixels, *, use_lz77: bool = True,
                         cache_bits: int = 0,
                         subtract_green: bool = False) -> bytes:
    """uint8 array (h×w, h×w×3 or h×w×4) → lossless WebP bytes.

    Emits literals, optional greedy LZ77 back-references (run of the
    previous pixel, distance 1, and the pixel-above run, distance =
    width — both through PLAIN distance codes ``d+120`` and, for the
    two mapped neighbors, the 2-D plane codes, so the decoder's both
    distance paths are exercised), an optional color cache whose
    state mirrors the decoder's exactly (every emitted pixel inserted,
    including back-reference copies — the spec's rule), and optionally
    the subtract-green transform (r−g / b−g mod 256 ahead of the
    entropy layer — the one VP8L transform implemented on both
    sides)."""
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
    n = argb.size
    has_alpha = bool((rgba[:, :, 3] != 255).any())

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
    a = argb.tolist()
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

    # --- bitstream ----------------------------------------------------
    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if has_alpha else 0, 1)
    bw.bits(0, 3)                        # version
    if subtract_green:
        bw.bits(1, 1)                    # a transform follows
        bw.bits(2, 2)                    # type 2 = subtract-green
    bw.bits(0, 1)                        # no (further) transforms
    if cache_bits:
        bw.bits(1, 1)
        bw.bits(cache_bits, 4)
    else:
        bw.bits(0, 1)
    bw.bits(0, 1)                        # no meta-prefix image
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

    payload = bytes([_SIG]) + bw.bytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") \
        + b"WEBP" + chunk
    return riff
