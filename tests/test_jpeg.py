"""Baseline-JPEG decoder (operators/multimodal.py::decode_jpeg) against
REAL JPEG byte streams produced by a minimal in-test encoder — Huffman,
zigzag, dequantization, IDCT, restart markers, and YCbCr→RGB are all
exercised end-to-end on spec-conformant files, with pixel-exact
expectations computed from the spec's own IDCT formula."""

import math
import struct

from uckg_spark.operators.multimodal import (
    JPEG_ZIGZAG,
    _jpeg_huff,
    decode_jpeg,
)

# canonical-valid Huffman tables sized for the whole baseline alphabet:
# DC = 12 categories at length 4, AC = EOB + ZRL + every (run, size)
# with size 1..10 at length 8 (the all-ones code stays unused, per spec)
DC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
DC_VALS = bytes(range(12))
AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                          for s in range(1, 11)]
AC_BITS = bytes([0, 0, 0, 0, 0, 0, 0, len(AC_SYMS)] + [0] * 8)
AC_VALS = bytes(AC_SYMS)

DC_ENC = {sym: (code, length)
          for (length, code), sym in _jpeg_huff(DC_BITS, DC_VALS).items()}
AC_ENC = {sym: (code, length)
          for (length, code), sym in _jpeg_huff(AC_BITS, AC_VALS).items()}


class _BitWriter:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _cat(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _enc_block(w: _BitWriter, zz: list[int], pred: int) -> int:
    """Entropy-encode one block of ZIGZAG-ORDER quantized coefficients."""
    diff = zz[0] - pred
    t = _cat(diff)
    code, length = DC_ENC[t]
    w.put(code, length)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k, run = 1, 0
    while k < 64:
        if zz[k] == 0:
            run += 1
        else:
            while run >= 16:
                zc, zl = AC_ENC[0xF0]
                w.put(zc, zl)
                run -= 16
            s = _cat(zz[k])
            ac, al = AC_ENC[(run << 4) | s]
            w.put(ac, al)
            v = zz[k]
            w.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        k += 1
    if run:
        ec, el = AC_ENC[0x00]
        w.put(ec, el)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def make_jpeg(w_px, h_px, mcu_blocks, quant, n_comp=1, restart=0):
    """Minimal spec-conformant baseline JPEG. ``mcu_blocks``: per MCU, a
    list of zigzag-order quantized coefficient blocks — [Y] for
    grayscale, [Y, Cb, Cr] for 4:4:4 color. ``quant``: 64 zigzag-order
    values shared by all components."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes(quant))
    comp_spec = b""
    for i in range(n_comp):
        comp_spec += bytes([i + 1, 0x11, 0])  # 1x1 sampling, qtable 0
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h_px, w_px)
                + bytes([n_comp]) + comp_spec)
    out += _seg(0xC4, bytes([0x00]) + DC_BITS + DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + AC_BITS + AC_VALS)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    scan_spec = b""
    for i in range(n_comp):
        scan_spec += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    out += _seg(0xDA, bytes([n_comp]) + scan_spec + bytes([0, 63, 0]))
    preds = [0] * n_comp
    bw = _BitWriter()
    for m, blocks in enumerate(mcu_blocks):
        if restart and m and m % restart == 0:
            out += bw.flush()
            out += bytes([0xFF, 0xD0 + ((m // restart - 1) % 8)])
            bw = _BitWriter()
            preds = [0] * n_comp
        for ci, zz in enumerate(blocks):
            preds[ci] = _enc_block(bw, zz, preds[ci])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _ref_idct(zz_quantized, quant):
    """Spec Annex A IDCT over one dequantized zigzag block → 8×8 levels
    (round, +128, clamp) — the decoder must reproduce these exactly."""
    coef = [0.0] * 64
    for k in range(64):
        coef[JPEG_ZIGZAG[k]] = zz_quantized[k] * quant[k]
    c = [[(math.sqrt(0.5) if u == 0 else 1.0)
          * math.cos((2 * x + 1) * u * math.pi / 16.0)
          for u in range(8)] for x in range(8)]
    out = []
    for y in range(8):
        for x in range(8):
            v = 0.25 * sum(
                c[x][u] * c[y][v2] * coef[v2 * 8 + u]
                for u in range(8) for v2 in range(8))
            iv = int(round(v)) + 128
            out.append(min(255, max(0, iv)))
    return out


FLAT_Q = [1] * 64


def test_uniform_gray_block_decodes_exactly():
    # DC = 8·(L−128) with quant 1 ⇒ every output pixel is exactly L
    for level in (0, 57, 128, 200, 255):
        zz = [8 * (level - 128)] + [0] * 63
        payload = make_jpeg(8, 8, [[zz]], FLAT_Q)
        got = decode_jpeg(payload, want_pixels=True)
        assert got is not None
        assert (got["width"], got["height"], got["channels"]) == (8, 8, 1)
        assert set(got["pixels"]) == {level}
        assert abs(got["means"][0] - level / 255.0) < 1e-12


def test_ac_coefficients_zigzag_and_quant_exact():
    # a busy block + a non-flat quant table: Huffman AC path, ZRL, EOB,
    # zigzag placement and dequantization must reproduce the spec IDCT
    quant = [(k % 7) + 1 for k in range(64)]
    zz = [0] * 64
    zz[0] = 37          # DC
    zz[1] = -12         # first AC
    zz[5] = 9
    zz[23] = -3
    zz[40] = 2          # forces a 16-zero ZRL run
    zz[63] = 1          # last coefficient: no EOB emitted
    payload = make_jpeg(8, 8, [[zz]], quant)
    got = decode_jpeg(payload, want_pixels=True)
    assert got is not None
    assert list(got["pixels"]) == _ref_idct(zz, quant)


def test_multi_block_dc_prediction_and_restart():
    # 24×8 grayscale, three blocks with distinct levels; restart=1 puts
    # an RST marker between every block and resets the DC predictor
    levels = [40, 180, 90]
    blocks = [[[8 * (lv - 128)] + [0] * 63] for lv in levels]
    for restart in (0, 1):
        payload = make_jpeg(24, 8, blocks, FLAT_Q, restart=restart)
        got = decode_jpeg(payload, want_pixels=True)
        assert got is not None and got["width"] == 24
        px = got["pixels"]
        for b, lv in enumerate(levels):
            assert set(px[y * 24 + b * 8 + x]
                       for y in range(8) for x in range(8)) == {lv}


def test_color_444_ycbcr_to_rgb():
    # uniform Y/Cb/Cr planes: decoded RGB equals the ITU-R BT.601
    # conversion of those levels, applied per pixel
    y_l, cb_l, cr_l = 120, 90, 170
    mcu = [[[8 * (v - 128)] + [0] * 63 for v in (y_l, cb_l, cr_l)]]
    payload = make_jpeg(8, 8, mcu, FLAT_Q, n_comp=3)
    got = decode_jpeg(payload, want_pixels=True)
    assert got is not None and got["channels"] == 3
    r = min(255, max(0, round(y_l + 1.402 * (cr_l - 128))))
    g = min(255, max(0, round(y_l - 0.344136 * (cb_l - 128)
                              - 0.714136 * (cr_l - 128))))
    b = min(255, max(0, round(y_l + 1.772 * (cb_l - 128))))
    assert set(zip(got["pixels"][0::3], got["pixels"][1::3],
                   got["pixels"][2::3])) == {(r, g, b)}
    assert [round(m * 255) for m in got["means"]] == [r, g, b]


def test_non_jpeg_and_progressive_fall_back():
    assert decode_jpeg(b"\x89PNG\r\n\x1a\nnope") is None
    assert decode_jpeg(b"\xff\xd8\xff\xee") is None  # truncated
    # progressive frame marker (SOF2) → None, caller falls back
    prog = bytearray(make_jpeg(8, 8, [[[0] * 64]], FLAT_Q))
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None


def test_extract_features_flags_real_jpeg_decode(spark):
    from uckg_spark.operators.multimodal import extract_features

    zz = [8 * (200 - 128)] + [0] * 63
    payload = make_jpeg(8, 8, [[zz]], FLAT_Q)
    df = spark.createDataFrame(
        [(1, "image", "image/jpeg", payload, {}),
         (2, "image", "image/webp", b"RIFFxxxxWEBP", {})],
        "media_id long, kind string, mime string, payload binary, "
        "meta map<string,string>")
    got = {r["media_id"]: r["feature"] for r in
           extract_features(df).collect()}
    assert got[1][-1] == 1.0            # decoded-for-real flag
    assert abs(got[1][2] - 200 / 255.0) < 1e-6  # channel mean
    assert got[2][-1] != 1.0            # webp still falls back
