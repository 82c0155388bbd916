"""Pure-python baseline JPEG codec (SURVEY.md L5 — the r7 verdict's one
remaining seam). No reference codec ships in this container, so the
suite leans on properties a paired encoder/decoder bug could NOT fake:
the quality-100 DC-only exactness contract (integer arithmetic survives
the float DCT round-trip), format invariants (restart markers, byte
stuffing, table-from-file decoding), and decode-side rejection of
non-baseline processes.
"""

import numpy as np
import pytest

from pravega_flink_ai_flow_spark.ops.jpeg import (
    QUANT_LUMA, decode_jpeg, encode_jpeg, quality_quant,
)
from pravega_flink_ai_flow_spark.ops.multimodal import decode_image


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return (96 + 60 * np.sin(x / 20.0)
            + 50 * np.cos(y / 15.0)).clip(0, 255).astype(np.uint8)


def test_quality100_block_constant_grayscale_is_exact():
    """The declared-query contract: at quality 100 every quantizer step
    is 1, a constant 8×8 block is DC-only, and grayscale skips the
    YCbCr rounding — so block-constant images round-trip BIT-exactly."""
    rng = np.random.RandomState(7)
    blocks = rng.randint(0, 256, (5, 3), dtype=np.uint8)
    px = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    w, h, c, arr = decode_jpeg(encode_jpeg(px, 100))
    assert (w, h, c) == (24, 40, 1)
    assert np.array_equal(arr[:, :, 0], px)


def test_quality100_exactness_holds_at_non_mcu_sizes():
    """Edge-replication padding must not leak into the cropped output:
    the same exactness at sizes that are not multiples of 8 — provided
    each (possibly partial) 8×8 tile is still constant."""
    blocks = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    px = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:19, :27]
    w, h, c, arr = decode_jpeg(encode_jpeg(px, 100))
    assert (w, h) == (27, 19)
    assert np.array_equal(arr[:, :, 0], px)


def test_smooth_grayscale_error_bounds_by_quality():
    """Reconstruction error must shrink with quality and stay tiny for
    a band-limited image — the standard codec sanity curve."""
    px = _gradient(48, 64)
    last = None
    for q in (50, 75, 90, 100):
        _, _, _, arr = decode_jpeg(encode_jpeg(px, q))
        err = np.abs(arr[:, :, 0].astype(int) - px.astype(int))
        assert err.max() <= 8 and err.mean() <= 2.0
        if last is not None:
            assert err.mean() <= last + 0.05   # monotone-ish in quality
        last = err.mean()
    assert last <= 0.1                          # q=100 is near-lossless


def test_rgb_roundtrip_444_and_420():
    px = np.stack([_gradient(40, 56), np.roll(_gradient(40, 56), 9, 0),
                   255 - _gradient(40, 56)], axis=2)
    _, _, c, a444 = decode_jpeg(encode_jpeg(px, 90))
    assert c == 3
    err = np.abs(a444.astype(int) - px.astype(int))
    assert err.mean() <= 3.0
    # 4:2:0 at an odd size: dims survive, luma stays close, chroma is
    # box-averaged so the bound is looser
    odd = px[:37, :51]
    w, h, c, a420 = decode_jpeg(encode_jpeg(odd, 90, subsample=True))
    assert (w, h, c) == (51, 37, 3) and a420.shape == (37, 51, 3)
    err = np.abs(a420.astype(int) - odd.astype(int))
    assert err.mean() <= 6.0


def test_restart_intervals_decode_identically():
    """DRI/RSTn handling: restarts change the byte stream (markers +
    DC-predictor resets) but must not change the decoded pixels."""
    px = _gradient(40, 64)
    plain = encode_jpeg(px, 85)
    with_rst = encode_jpeg(px, 85, restart_interval=2)
    assert plain != with_rst
    assert any(0xD0 <= with_rst[i + 1] <= 0xD7
               for i in range(len(with_rst) - 1) if with_rst[i] == 0xFF)
    _, _, _, a = decode_jpeg(plain)
    _, _, _, b = decode_jpeg(with_rst)
    assert np.array_equal(a, b)


def test_decoder_reads_tables_from_file_not_constants():
    """A custom (non-Annex-K) quant table must round-trip through the
    DQT segment: doubling the table halves the coefficients the decoder
    reconstructs — provable via the q-100-vs-q-50 DC step on a constant
    image 8 grey levels apart."""
    # quality 50 keeps the Annex K table verbatim; quality 100 is all-1s
    assert np.array_equal(quality_quant(QUANT_LUMA, 50), QUANT_LUMA)
    assert quality_quant(QUANT_LUMA, 100).max() == 1
    # DC quant step at q50 is 16: constant images 8 apart (half a step)
    # can decode to the same plane, while q100 must distinguish ALL
    a = np.full((8, 8), 100, dtype=np.uint8)
    b = np.full((8, 8), 104, dtype=np.uint8)   # 8(104-100)/16 rounds away
    _, _, _, da100 = decode_jpeg(encode_jpeg(a, 100))
    _, _, _, db100 = decode_jpeg(encode_jpeg(b, 100))
    assert da100[0, 0, 0] == 100 and db100[0, 0, 0] == 104
    _, _, _, da50 = decode_jpeg(encode_jpeg(a, 50))
    assert abs(int(da50[0, 0, 0]) - 100) <= 2   # quantized to the 16-grid


def test_byte_stuffing_survives():
    """Entropy bytes equal to 0xFF must be stuffed (FF 00) and
    unstuffed — exercised by an image tuned to emit many 1-bits."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    enc = encode_jpeg(px, 95)
    _, _, _, arr = decode_jpeg(enc)
    # noise at q95: not exact, but bounded — and decode must not desync
    err = np.abs(arr[:, :, 0].astype(int) - px.astype(int))
    assert err.mean() <= 12.0


def test_decode_image_routes_jpeg_and_rejects_junk():
    px = np.full((8, 8), 77, dtype=np.uint8)
    w, h, c, arr = decode_image(encode_jpeg(px, 100))
    assert (w, h, c) == (8, 8, 1) and arr[0, 0, 0] == 77
    # r14: WebP routes into the VP8L decoder now — a TRUNCATED WebP is
    # malformed (ValueError), a lossy-VP8 one is the documented seam
    # (NotImplementedError); both covered in test_properties too
    with pytest.raises(ValueError):
        decode_image(b"RIFF....WEBP")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")


def test_non_baseline_processes_raise_not_implemented():
    """Flipping SOF0 to SOF3 (lossless) must raise NotImplementedError,
    not mis-decode; flipping to SOF2 (progressive — supported since
    r10) makes the baseline scan header ILLEGAL for the progressive
    process (Ss=0 with Se=63 is not a valid DC scan), which must be a
    clean ValueError, not a mis-decode."""
    enc = bytearray(encode_jpeg(np.full((8, 8), 50, np.uint8), 90))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(enc))
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bytes(enc))


def test_truncated_stream_raises_value_error():
    enc = encode_jpeg(_gradient(16, 16), 90)
    for cut in (10, 40, len(enc) - 6):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(enc[:cut])


def test_encode_is_deterministic():
    px = _gradient(32, 32)
    assert encode_jpeg(px, 80) == encode_jpeg(px, 80)


def test_quality100_exactness_fuzz():
    """Property form of the declared-query contract: ANY block-constant
    grayscale image round-trips bit-exactly at quality 100 — arbitrary
    block grids, values, and crops (partial edge tiles stay constant
    under edge-replication padding)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 7),
           st.integers(0, 7), st.integers(0, 2**31 - 1))
    def check(bw, bh, cut_x, cut_y, seed):
        rng = np.random.RandomState(seed)
        blocks = rng.randint(0, 256, (bh, bw), dtype=np.uint8)
        px = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        h = bh * 8 - cut_y
        w = bw * 8 - cut_x
        px = px[:h, :w]
        dw, dh, c, arr = decode_jpeg(encode_jpeg(px, 100))
        assert (dw, dh, c) == (w, h, 1)
        assert np.array_equal(arr[:, :, 0], px)

    check()


def test_non_interleaved_first_scan_decodes_without_crash():
    """r9 review finding: a baseline file whose first SOS covers only
    ONE of three components (non-interleaved scans) crashed the
    batched-IDCT rewrite on the empty-coefficient scatter. The decoder
    reads the first scan only (pre-rewrite behavior); unscanned
    components must come back as zero planes, not a ValueError."""
    import struct

    from pravega_flink_ai_flow_spark.ops import jpeg as J

    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all-ones (quality-100 shape)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([0])
    ones = np.ones(64, dtype=np.int64)
    zz = np.empty(64, dtype=np.int64)
    zz[:] = ones  # all ones in any order
    out += bytes(int(x) for x in zz)
    # SOF0: 8-bit 8x8, 3 components, 1x1 sampling, all quant table 0
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: DC luma (class 0 id 0) + AC luma (class 1 id 0)
    for tc, bits, vals in ((0, J._DC_LUMA_BITS, J._DC_LUMA_VALS),
                           (1, J._AC_LUMA_BITS, J._AC_LUMA_VALS)):
        seg = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg
    # SOS covering ONLY component 1
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    # entropy: one 8x8 block, constant 130 → DC level 8*(130-128)=16
    bw = J._BitWriter()
    dc_codes, ac_codes = J._std_codes()
    coef = np.zeros(64)
    coef[0] = 16
    J._encode_block(bw, coef.reshape(8, 8), 0, dc_codes[0], ac_codes[0])
    bw.pad_to_byte()
    out += bw.buf
    out += b"\xff\xd9"

    w, h, c, arr = decode_jpeg(bytes(out))
    assert (w, h, c) == (8, 8, 3)
    assert arr.shape == (8, 8, 3)
    # Y plane decoded (constant 130), chroma planes zero → the YCbCr
    # transform runs on Cb=Cr=0 without crashing
    assert arr.dtype == np.uint8


# -- progressive (SOF2) round-trips: spectral selection + successive
# approximation (r10). Progressive transmission reorders the SAME
# quantized coefficients, so progressive decode must be BIT-IDENTICAL
# to baseline decode of the same pixels at the same quality — a parity
# a paired encoder/decoder bug cannot fake against the independent
# baseline path.


def _parity(px, quality, **enc_kw):
    base = decode_jpeg(encode_jpeg(px, quality, **enc_kw))
    prog = decode_jpeg(encode_jpeg(px, quality, progressive=True,
                                   **enc_kw))
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3]), (
        f"progressive != baseline at q={quality} shape={px.shape}")


def test_progressive_equals_baseline_grayscale():
    _parity(_gradient(40, 56), 90)
    _parity(_gradient(17, 23), 75)           # non-MCU-aligned crop
    rng = np.random.RandomState(11)
    _parity(rng.randint(0, 256, (24, 24), dtype=np.uint8), 50)


def test_progressive_equals_baseline_color_444_and_420():
    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, (33, 41, 3), dtype=np.uint8)
    _parity(px, 85)
    _parity(px, 85, subsample=True)           # 4:2:0, non-MCU-aligned
    smooth = np.stack([_gradient(32, 48)] * 3, axis=2)
    _parity(smooth, 95, subsample=True)


def test_progressive_quality100_block_constant_is_exact():
    """The declared-query contract extends to progressive: at quality
    100 a block-constant grayscale image round-trips bit-exactly
    through the progressive scan script (DC successive approximation
    reassembles the integer DC, AC scans carry all-zero bands)."""
    rng = np.random.RandomState(29)
    blocks = rng.randint(0, 256, (3, 4), dtype=np.uint8)
    px = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    dw, dh, c, arr = decode_jpeg(encode_jpeg(px, 100, progressive=True))
    assert (dw, dh, c) == (32, 24, 1)
    assert np.array_equal(arr[:, :, 0], px)


def test_progressive_fuzz_parity():
    """Property form: ANY image decodes identically via the progressive
    and baseline paths — random sizes (incl. non-MCU-aligned), random
    content, gray and color, with and without 4:2:0."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(8, 40), st.integers(8, 40), st.booleans(),
           st.booleans(), st.integers(0, 2**31 - 1))
    def check(h, w, color, subsample, seed):
        rng = np.random.RandomState(seed)
        shape = (h, w, 3) if color else (h, w)
        px = rng.randint(0, 256, shape, dtype=np.uint8)
        _parity(px, 80, subsample=subsample and color)

    check()


def test_progressive_file_structure():
    """The emitted file is structurally progressive: SOF2 marker and
    one SOS per scan-script entry (6 for grayscale, 14 for color)."""
    enc = encode_jpeg(_gradient(16, 16), 90, progressive=True)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc[2:4]
    assert enc.count(b"\xff\xda") >= 6
    enc3 = encode_jpeg(np.stack([_gradient(16, 16)] * 3, 2), 90,
                       progressive=True)
    assert enc3.count(b"\xff\xda") >= 14


def test_progressive_rejects_restart_intervals():
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(_gradient(16, 16), 90, progressive=True,
                    restart_interval=2)
