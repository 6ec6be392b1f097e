"""Dependency-free baseline JPEG codec (ITU-T T.81 / JFIF).

The third real COMPRESSED image format in the media layer (after PNG
and QOI), and the first lossy one: 8-bit baseline sequential DCT with
Huffman entropy coding, written with numpy + the shared bit I/O only.
This closed the JPEG entry of the declared codec seams; with FLAC
(flac.py) and Motion-JPEG video (mjpeg.py) also real, only
inter-frame H.264-family video remains library-bound.

Encoder slice: grayscale or RGB (converted to YCbCr; 4:4:4 or 4:2:0
chroma subsampling), standard Annex K quantization tables scaled by
libjpeg's quality formula (or caller-supplied tables), the Annex K
typical Huffman tables, single interleaved scan, optional restart
intervals (DRI/RSTn).

Decoder slice: any baseline (SOF0) JFIF stream with 8-bit precision,
1 or 3 components, ARBITRARY sampling factors (4:4:4, 4:2:0, 4:2:2,
4:4:0 — chroma planes are box-upsampled), Huffman tables taken from
the file's own DHT segments, restart markers (DRI/RSTn) honored.
Progressive (SOF2), arithmetic-coded, hierarchical and 12-bit streams
raise ``ValueError`` — they never decode silently wrong, matching the
PNG decoder's strictness (quarantine contract: ValueError is the ONLY
failure mode, enforced by the fuzz gate in tests/test_multimodal.py).

Exactness note for oracles: JPEG is lossy in general, but an image
whose pixels are CONSTANT within every aligned 8x8 block has only DC
energy — all 63 AC coefficients are exactly zero — and with a DC
quantization step of 8 the DC coefficient ``8*(v-128)`` quantizes to
the integer ``v-128`` with no rounding loss, so encode→decode is
bit-exact.  ``DC8_QTABLE`` packages that table; the catalog fixture
(media.synthesize_jpeg_media) synthesizes block-constant images so a
DuckDB oracle can replay the full DCT→Huffman→decode roundtrip
value-for-value (mm_jpeg_roundtrip_stats).

Public references: ITU-T T.81 (1992) Annex F/K, the JFIF 1.02 spec,
and the libjpeg quality-scaling formula (jcparam.c, public source).
No code was taken from any implementation.
"""

from __future__ import annotations

import struct

import numpy as np

from .bitio import BitReader, BitWriter

# --------------------------------------------------------------- constants

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto
# standard tables every camera/libjpeg-family encoder scales).
_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# All-DC-8 table: block-constant images roundtrip bit-exactly (module
# docstring).  AC entries are the Annex K luma values so non-constant
# content still compresses sanely under this table.
DC8_QTABLE = _STD_LUMA_Q.copy()
DC8_QTABLE[0] = 8

# Decoder allocation cap, counted PER COMPONENT (not total across
# components) so a legitimate 4096x4096 baseline decodes whether it is
# grayscale (2**18 total blocks) or 4:4:4 color (3 * 2**18 total).
MAX_COMPONENT_BLOCKS = 1 << 18

# Annex K.3 "typical" Huffman tables as (BITS[1..16], HUFFVAL) pairs.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix.  With this normalization the 2-D
# transform C @ block @ C.T reproduces T.81's S(u,v) scaling exactly
# (constant block v -> DC coefficient 8*v, all AC zero).
_C8 = np.zeros((8, 8))
_C8[0, :] = 1.0 / np.sqrt(8.0)
for _u in range(1, 8):
    _C8[_u, :] = np.sqrt(2.0 / 8.0) * np.cos(
        (2 * np.arange(8) + 1) * _u * np.pi / 16.0
    )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the inverse of _canonical_codes."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality->table scaling (jcparam.c formula, public)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _magnitude(v: int) -> int:
    """JPEG magnitude category: bit length of |v| (0 for v == 0)."""
    return int(abs(v)).bit_length()


# ----------------------------------------------------------------- encoder


def _encode_blocks(
    plane: np.ndarray, qtable: np.ndarray
) -> np.ndarray:
    """DCT + quantize every aligned 8x8 block of a uint8 plane.

    Returns (n_blocks_y, n_blocks_x, 64) int64 coefficients in zigzag
    order.  Plane dimensions must be multiples of 8 (caller pads).
    """
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ux,byxw,vw->byuv", _C8, blocks, _C8)
    q = np.round(coef.reshape(by, bx, 64)[:, :, _ZIGZAG] / qtable)
    return q.astype(np.int64)


def _emit_block(
    bw: BitWriter,
    zz: np.ndarray,
    dc_pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - dc_pred
    s = _magnitude(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write((diff if diff >= 0 else diff + (1 << s) - 1) & ((1 << s) - 1), s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL: 16 zeros
            bw.write(code, length)
            run -= 16
        s = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write((v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1), s)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB -> YCbCr, rounded to uint8 planes."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(
        np.round(np.stack([y, cb, cr], axis=2)), 0, 255
    ).astype(np.uint8)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y = planes[:, :, 0].astype(np.float64)
    cb = planes[:, :, 1].astype(np.float64) - 128.0
    cr = planes[:, :, 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    qtables: tuple[np.ndarray, np.ndarray] | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 image as baseline JFIF JPEG.

    ``pixels``: (h, w) or (h, w, 1) grayscale, or (h, w, 3) RGB.
    ``qtables``: optional (luma, chroma) zigzag-order int tables that
    BYPASS quality scaling — e.g. ``(DC8_QTABLE, DC8_QTABLE)`` for the
    bit-exact block-constant regime.
    ``subsampling``: '444' (chroma full-res) or '420' (chroma
    box-averaged 2x2, the dominant camera/libjpeg default layout).
    ``restart_interval``: if > 0, emit DRI and an RSTn marker every N
    MCUs (what streaming encoders do so a corrupt segment only loses
    one restart window).
    """
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3) or px.dtype != np.uint8:
        raise ValueError(
            "pixels must be uint8 (h, w), (h, w, 1) or (h, w, 3), got "
            f"{px.shape} {px.dtype}"
        )
    h, w, ncomp = px.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"image dimensions out of range: {w}x{h}")
    if qtables is not None:
        luma_q = np.asarray(qtables[0], dtype=np.int64)
        chroma_q = np.asarray(qtables[1], dtype=np.int64)
        if luma_q.shape != (64,) or chroma_q.shape != (64,):
            raise ValueError("qtables must be zigzag-order length-64 arrays")
        if (luma_q < 1).any() or (chroma_q < 1).any() or (
            luma_q > 255
        ).any() or (chroma_q > 255).any():
            raise ValueError("qtable entries must be in [1, 255]")
    else:
        luma_q = _quality_scale(_STD_LUMA_Q, quality)
        chroma_q = _quality_scale(_STD_CHROMA_Q, quality)

    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if restart_interval < 0 or restart_interval > 65535:
        raise ValueError(f"restart_interval out of range: {restart_interval}")
    sub420 = subsampling == "420" and ncomp == 3
    if ncomp == 3:
        planes = _rgb_to_ycbcr(px)
    else:
        planes = px

    # Per-component sampling factors and plane construction.  Chroma
    # for 4:2:0 is box-averaged 2x2 from an even-padded full plane.
    samp = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp[:ncomp])
    vmax = max(s[1] for s in samp[:ncomp])
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    comp_coefs = []
    for c in range(ncomp):
        plane = planes[:, :, c]
        if sub420 and c > 0:
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            full = np.pad(plane, ((0, eh - h), (0, ew - w)), mode="edge")
            plane = np.round(
                full.reshape(eh // 2, 2, ew // 2, 2)
                .astype(np.float64)
                .mean(axis=(1, 3))
            ).astype(np.uint8)
        # Pad to this component's MCU coverage by edge replication (the
        # standard encoder trick: replicated edges add no AC energy jump).
        hs, vs = samp[c]
        tph, tpw = mcus_y * vs * 8, mcus_x * hs * 8
        plane = np.pad(
            plane,
            ((0, tph - plane.shape[0]), (0, tpw - plane.shape[1])),
            mode="edge",
        )
        comp_coefs.append(
            _encode_blocks(plane, luma_q if c == 0 else chroma_q)
        )

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(v) for v in luma_q
    )
    if ncomp == 3:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            int(v) for v in chroma_q
        )
    # SOF0: baseline, 8-bit
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for c in range(ncomp):
        hs, vs = samp[c]
        sof += bytes([c + 1, hs << 4 | vs, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def _dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += _dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if ncomp == 3:
        out += _dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)

    sos = bytearray([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_luma = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_luma = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_chroma = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_chroma = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    bw = BitWriter()
    preds = [0] * ncomp
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # Close the window: 1-pad to a byte boundary, emit RSTn.
                out += bw.getvalue(fill_bit=1).replace(b"\xff", b"\xff\x00")
                out += bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                bw = BitWriter()
                preds = [0] * ncomp
            for c in range(ncomp):
                hs, vs = samp[c]
                for vy in range(vs):
                    for hx in range(hs):
                        preds[c] = _emit_block(
                            bw,
                            comp_coefs[c][my * vs + vy, mx * hs + hx],
                            preds[c],
                            dc_luma if c == 0 else dc_chroma,
                            ac_luma if c == 0 else ac_chroma,
                        )
            mcu += 1
    out += bw.getvalue(fill_bit=1).replace(b"\xff", b"\xff\x00")  # byte stuffing
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decoder


def _need(data: bytes, off: int, n: int) -> None:
    if off + n > len(data):
        raise ValueError("truncated JPEG: segment exceeds payload")


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_tbl", "ac_tbl", "blocks")

    def __init__(self, cid: int, h: int, v: int, tq: int) -> None:
        self.cid = cid
        self.h = h
        self.v = v
        self.tq = tq
        self.dc_tbl = 0
        self.ac_tbl = 0
        self.blocks: list[np.ndarray] = []


def _decode_huffman(br: BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s-bit raw value to signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    br: BitReader,
    dc_tbl: dict[tuple[int, int], int],
    ac_tbl: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    s = _decode_huffman(br, dc_tbl)
    if s > 11:
        raise ValueError(f"invalid DC magnitude category {s}")
    diff = _extend(br.read(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huffman(br, ac_tbl)
        run, s = rs >> 4, rs & 0x0F
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(br.read(s), s)
        k += 1
    return zz, pred


def _split_entropy(data: bytes, off: int) -> tuple[list[bytes], int]:
    """De-stuff the entropy-coded data from ``off``; split at RSTn.

    Returns (segments, offset_of_terminating_marker).  The terminator
    is any non-RST marker (normally EOI or the next SOS/DNL).
    """
    segs: list[bytes] = []
    cur = bytearray()
    i = off
    n = len(data)
    while True:
        if i >= n:
            raise ValueError("truncated JPEG: entropy stream has no terminator")
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("truncated JPEG: dangling 0xFF")
        m = data[i + 1]
        if m == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte before a marker
            i += 1
        else:
            segs.append(bytes(cur))
            return segs, i


def decode_jpeg(content: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a baseline JFIF JPEG to a uint8 (h, w, channels) array.

    channels is 1 (grayscale) or 3 (RGB, converted from YCbCr).
    Raises ValueError on anything malformed or outside the baseline
    slice (progressive, arithmetic, 12-bit, >3 components) — never a
    silently wrong decode and never a non-ValueError exception.
    """
    data = bytes(content)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")

    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict[tuple[int, int], int]] = {}
    ac_tables: dict[int, dict[tuple[int, int], int]] = {}
    comps: list[_Component] = []
    frame: tuple[int, int] | None = None  # (h, w)
    restart_interval = 0
    i = 2
    while True:
        _need(data, i, 2)
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("JPEG has no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless markers
        _need(data, i, 2)
        seg_len = struct.unpack_from(">H", data, i)[0]
        if seg_len < 2:
            raise ValueError(f"invalid segment length {seg_len}")
        _need(data, i, seg_len)
        seg = data[i + 2 : i + seg_len]
        i += seg_len

        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if j + 65 > len(seg):
                    raise ValueError("truncated DQT segment")
                qtables[tq] = np.frombuffer(
                    seg[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                if j + 17 > len(seg):
                    raise ValueError("truncated DHT segment")
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nvals = sum(bits)
                if j + 17 + nvals > len(seg):
                    raise ValueError("truncated DHT values")
                vals = list(seg[j + 17 : j + 17 + nvals])
                (dc_tables if cls == 0 else ac_tables)[tid] = _decode_table(
                    bits, vals
                )
                j += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both baseline-decodable)
            if len(seg) < 6:
                raise ValueError("truncated SOF segment")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported (baseline is 8)")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            if fh == 0 or fw == 0:
                raise ValueError("zero image dimension")
            if len(seg) != 6 + 3 * nc:
                raise ValueError("SOF length does not match component count")
            frame = (fh, fw)
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"invalid sampling factors {hs}x{vs}")
                comps.append(_Component(cid, hs, vs, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG is supported "
                f"(unsupported SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) != 2:
                raise ValueError("invalid DRI segment")
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(seg) < 1 or len(seg) != 1 + 2 * seg[0] + 3:
                raise ValueError("invalid SOS segment")
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("non-interleaved multi-scan JPEG unsupported")
            by_id = {c.cid: c for c in comps}
            for s in range(ns):
                cid, tbls = seg[1 + 2 * s], seg[2 + 2 * s]
                if cid not in by_id:
                    raise ValueError(f"SOS references unknown component {cid}")
                by_id[cid].dc_tbl = tbls >> 4
                by_id[cid].ac_tbl = tbls & 0x0F
            return _decode_scan(
                data, i, frame, comps, qtables, dc_tables, ac_tables,
                restart_interval,
            )
        elif marker == 0xC8 or marker == 0xCC:
            raise ValueError("hierarchical/arithmetic JPEG unsupported")
        # APPn, COM, DNL and friends: skipped


def _decode_scan(
    data: bytes,
    off: int,
    frame: tuple[int, int],
    comps: list[_Component],
    qtables: dict[int, np.ndarray],
    dc_tables: dict[int, dict[tuple[int, int], int]],
    ac_tables: dict[int, dict[tuple[int, int], int]],
    restart_interval: int,
) -> np.ndarray:
    h, w = frame
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcus_x * mcus_y
    for c in comps:
        if c.tq not in qtables:
            raise ValueError(f"missing quantization table {c.tq}")
        if c.dc_tbl not in dc_tables or c.ac_tbl not in ac_tables:
            raise ValueError("missing Huffman table referenced by scan")

    # Bound the allocations by what the entropy payload could possibly
    # encode (mirrors decode_qoi's n_px > n_ops*62 guard): every 8x8
    # block costs at least 2 bits — a 1-bit DC category-0 code plus a
    # 1-bit EOB is the floor any Huffman table can reach — so a crafted
    # 65535x65535 SOF0 over a tiny payload must raise ValueError here,
    # not MemoryError inside the coefficient/plane allocations
    # (MemoryError escapes the ValueError-only quarantine contract and
    # kills the whole batch).
    segs, _ = _split_entropy(data, off)
    blocks_per_mcu = sum(c.h * c.v for c in comps)
    total_blocks = n_mcus * blocks_per_mcu
    payload_bits = sum(len(s) for s in segs) * 8
    if total_blocks > payload_bits // 2:
        raise ValueError(
            f"frame declares {total_blocks} blocks but the entropy "
            f"payload has only {payload_bits} bits"
        )
    # Absolute cap for this semantic-reference decoder: 2**18 blocks
    # PER COMPONENT (~16.7M px/component, covers 4096x4096 for
    # grayscale AND 4:4:4 color alike) keeps worst-case decode
    # intermediates bounded (low GB for 3 components).  Capping total
    # blocks instead would quarantine a legitimate 4096x4096 color
    # baseline (3 * 2**18 total).  A native kernel bound at the same
    # mapInPandas seam would lift this.
    max_comp_blocks = n_mcus * max(c.h * c.v for c in comps)
    if max_comp_blocks > MAX_COMPONENT_BLOCKS:
        raise ValueError(
            f"frame declares {max_comp_blocks} blocks in one component, "
            f"exceeding the decoder cap ({MAX_COMPONENT_BLOCKS} "
            f"blocks/component)"
        )
    seg_idx = 0
    br = BitReader(segs[0])
    preds = {c.cid: 0 for c in comps}
    per_comp_zz: dict[int, list[np.ndarray]] = {c.cid: [] for c in comps}
    # Per-MCU block order (T.81 interleave): for each component,
    # v×h blocks row-major; we record placement to rebuild planes.
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart marker segment")
            br = BitReader(segs[seg_idx])
            preds = {c.cid: 0 for c in comps}
        for c in comps:
            for _ in range(c.h * c.v):
                zz, preds[c.cid] = _decode_block(
                    br, dc_tables[c.dc_tbl], ac_tables[c.ac_tbl], preds[c.cid]
                )
                per_comp_zz[c.cid].append(zz)

    planes = []
    for c in comps:
        zzs = np.stack(per_comp_zz[c.cid])  # (nblocks, 64)
        deq = zzs * qtables[c.tq][None, :]
        blocks = np.zeros((len(deq), 64), dtype=np.float64)
        blocks[:, _ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        spat = np.einsum("xu,buv,vy->bxy", _C8.T, blocks, _C8)
        spat = np.clip(np.round(spat) + 128.0, 0, 255).astype(np.uint8)
        # Rebuild the component plane from the MCU interleave order.
        pw_blocks = mcus_x * c.h
        ph_blocks = mcus_y * c.v
        plane = np.zeros((ph_blocks * 8, pw_blocks * 8), dtype=np.uint8)
        b = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for vy in range(c.v):
                    for hx in range(c.h):
                        plane[
                            (my * c.v + vy) * 8 : (my * c.v + vy) * 8 + 8,
                            (mx * c.h + hx) * 8 : (mx * c.h + hx) * 8 + 8,
                        ] = spat[b]
                        b += 1
        # Upsample to full resolution (box/nearest), then crop.
        if c.h != hmax or c.v != vmax:
            if hmax % c.h or vmax % c.v:
                raise ValueError("non-integer sampling ratio unsupported")
            plane = np.repeat(
                np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1
            )
        planes.append(plane[:h, :w])

    stacked = np.stack(planes, axis=2)
    if len(comps) == 3:
        return _ycbcr_to_rgb(stacked)
    return stacked
