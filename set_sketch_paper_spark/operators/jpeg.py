"""JPEG codec (8-bit grayscale + YCbCr color, 4:4:4 / 4:2:0 / 4:2:2
chroma subsampling, baseline sequential AND progressive) in pure numpy +
stdlib — no media library.

Scope: ITU-T T.81 baseline sequential DCT (SOF0: 1 or 3 components with
per-component sampling factors and interleaved MCUs, A.2.3) and
progressive DCT (SOF2: multi-scan spectral selection + successive
approximation per Annex G — DC first/refinement, banded AC first passes
with EOBn end-of-band runs, AC refinement with woven correction bits).
Standard Annex-K quantization and Huffman tables (emitted in DQT/DHT so
any conforming reader decodes the output), optional restart markers
(DRI/RSTn).  Decode accepts any integer sampling ratio (nearest-neighbor
chroma upsample) for both frame types; encode offers (1,1) / (2,2) /
(2,1) luma factors via encode_jpeg (baseline) and
encode_jpeg_progressive (standard scan script).  Enough to read/write
real .jpg files — including the dominant 4:2:0 camera format and
progressive web JPEGs — for image corpora.

Encode: 8x8 blocks -> level shift -> orthonormal 2D DCT (one einsum for
ALL blocks) -> quantize -> zigzag -> DC differences + AC run-length ->
Huffman bitstream with 0xFF byte stuffing.  Decode reads DQT/DHT/DRI from
the file and inverts each step; the entropy decode is a per-symbol Python
loop (correctness path — bounded by test image sizes; bulk corpora should
store PNG/PNM, which decode vectorized).

JPEG is lossy BY DESIGN: roundtrip tests assert coefficient-exact
recovery of the quantized spectrum (the lossless layer: Huffman + RLE +
zigzag + DC prediction invert exactly) and PSNR bounds on pixels.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# Annex K.1 luminance quantization table (quality 50 base)
_QTABLE_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 standard DC luminance Huffman spec: (bits per code length 1..16,
# symbols)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

# Annex K.3 standard AC luminance Huffman spec
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag order: _ZIGZAG[i] = flat index (row*8+col) of the i-th coefficient
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# any 0xFFD0-0xFFD7 byte pair inside entropy data IS a restart marker:
# stuffing guarantees a data 0xFF is always followed by 0x00
_RST_RE = re.compile(rb"\xff[\xd0-\xd7]")


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = x[:, None]
    d = np.cos((2 * x[None, :] + 1) * u * np.pi / 16) / 2.0
    d[0, :] *= 1 / np.sqrt(2)
    return d


_DCT = _dct_matrix()


def _build_codes(bits, vals):
    """JPEG canonical Huffman: symbol -> (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)

# Annex K.2 chrominance quantization table
_QTABLE_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 standard chrominance Huffman specs.  (Both sides of this codec
# read DHT from the file, so correctness is table-independent; these are
# emitted for interoperability with standard decoders.)
_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_DC_CODES_C = _build_codes(_DC_BITS_C, _DC_VALS_C)
_AC_CODES_C = _build_codes(_AC_BITS_C, _AC_VALS_C)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> float64 YCbCr (JFIF full-range)."""
    a = rgb.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """float64 YCbCr (JFIF) -> uint8 RGB."""
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _scaled_qtable(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K table (clamped to [1, 255])."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QTABLE_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # truncate emitted bits: without this the accumulator grows into an
        # ever-larger bigint and encode turns O(n^2) in scan length
        self.acc &= (1 << self.nbits) - 1

    def restart(self, m: int):
        """Byte-align (1-pad) and emit RSTm — markers are never stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        # bounds-checked: entropy data cut short must surface as the same
        # ValueError malformed-media callers already catch, not IndexError
        if self.pos >= len(self.data):
            raise ValueError("truncated scan")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:  # unstuff
            if self.pos >= len(self.data):
                raise ValueError("truncated scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF  # bounded accumulator
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits) per T.81 F.1.2.1 — negative values encode
    as one's-complement of |v| in `category` bits."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else (v + (1 << cat) - 1)
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _zz_of_channel(channel: np.ndarray, q: np.ndarray) -> np.ndarray:
    """One channel (ph, pw) float64 -> (n_blocks, 64) quantized zigzag."""
    ph, pw = channel.shape
    blocks = (
        channel.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        - 128.0
    )
    coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
    quant = np.round(coef / q).astype(np.int64)
    return quant.reshape(-1, 64)[:, _ZIGZAG]


def _pad_edge(a: np.ndarray, mv: int = 8, mh: int = 8):
    """Edge-pad to multiples of (mv, mh) — 8 for plain blocks, 8*V / 8*H so
    subsampled MCUs tile exactly."""
    h, w = a.shape[:2]
    ph, pw = (h + mv - 1) // mv * mv, (w + mh - 1) // mh * mh
    pad = ((0, ph - h), (0, pw - w)) + ((0, 0),) * (a.ndim - 2)
    return np.pad(a, pad, mode="edge"), ph, pw


def _downsample_box(ch: np.ndarray, vf: int, hf: int) -> np.ndarray:
    """Box-average downsample a (ph, pw) plane by integer factors (vf, hf) —
    the standard chroma-subsampling filter (ITU T.81 A.1.1 leaves the
    filter to the encoder; box average is what libjpeg's h2v2 path uses)."""
    if vf == 1 and hf == 1:
        return ch
    ph, pw = ch.shape
    return ch.reshape(ph // vf, vf, pw // hf, hf).mean(axis=(1, 3))


def _mcu_order(bh: int, bw: int, hi: int, vi: int) -> np.ndarray:
    """Plane-raster block indices in MCU interleave order (T.81 A.2.3) for a
    component with plane block grid (bh, bw) and sampling factors (hi, vi):
    MCUs raster-scan, and within each MCU the component contributes its
    vi x hi sub-grid of blocks top-to-bottom, left-to-right."""
    my, mx, v, hh = np.meshgrid(
        np.arange(bh // vi), np.arange(bw // hi),
        np.arange(vi), np.arange(hi), indexing="ij",
    )
    return ((my * vi + v) * bw + (mx * hi + hh)).reshape(-1)


def quantized_blocks(img: np.ndarray, quality: int = 85):
    """(padded_h, padded_w, q, zz) — the encoder's quantized zigzag spectrum
    for every 8x8 block of a GRAYSCALE image, exposed so tests can assert
    the lossless layer (entropy coding) inverts EXACTLY.  For color (incl.
    subsampled) use quantized_blocks_color."""
    a = np.asarray(img, dtype=np.uint8)
    padded, ph, pw = _pad_edge(a)
    q = _scaled_qtable(quality)
    return ph, pw, q, _zz_of_channel(padded.astype(np.float64), q)


def _chroma_qtable(quality: int) -> np.ndarray:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((_QTABLE_CHROMA * scale + 50) // 100, 1, 255)


def quantized_blocks_color(img: np.ndarray, quality: int = 85, sampling=(1, 1)):
    """Color analog: (ph, pw, [q_luma, q_chroma], [zz_y, zz_cb, zz_cr]).

    ``sampling`` is the luma (H, V) sampling-factor pair — (1, 1) = 4:4:4,
    (2, 2) = 4:2:0, (2, 1) = 4:2:2; chroma is always (1, 1).  Chroma planes
    are box-downsampled by the luma factors, so each component's spectrum is
    at COMPONENT resolution, blocks in plane-raster order; ph/pw are the
    padded LUMA dims (multiples of 8*V / 8*H so MCUs tile exactly)."""
    hf, vf = sampling
    if hf not in (1, 2) or vf not in (1, 2):
        raise ValueError("sampling factors must be 1 or 2")
    a = np.asarray(img, dtype=np.uint8)
    padded, ph, pw = _pad_edge(a, 8 * vf, 8 * hf)
    ycc = rgb_to_ycbcr(padded)
    ql, qc = _scaled_qtable(quality), _chroma_qtable(quality)
    zzs = [
        _zz_of_channel(ycc[..., 0], ql),
        _zz_of_channel(_downsample_box(ycc[..., 1], vf, hf), qc),
        _zz_of_channel(_downsample_box(ycc[..., 2], vf, hf), qc),
    ]
    return ph, pw, [ql, qc], zzs


def _encode_block(bw: _BitWriter, blk, prev_dc: int, dc_codes, ac_codes) -> int:
    dc_diff = int(blk[0]) - prev_dc
    cat, bits = _magnitude(dc_diff)
    code, ln = dc_codes[cat]
    bw.write(code, ln)
    if cat:
        bw.write(bits, cat)
    run = 0
    last_nz = np.nonzero(blk[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for i in range(1, last + 1):
        v = int(blk[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(blk[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tq: int, q: np.ndarray) -> bytes:
    qz = q.reshape(64)[_ZIGZAG]  # DQT stores the table in zigzag order
    return _seg(0xDB, bytes([tq]) + bytes(int(x) for x in qz))


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    sampling=(1, 1),
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF JPEG bytes
    (color = YCbCr with luma ``sampling`` (H, V): (1, 1) = 4:4:4, (2, 2) =
    4:2:0, (2, 1) = 4:2:2; Annex-K luma + chroma tables).

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    that many MCUs (what cameras/libjpeg produce for error resilience)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        ph, pw, q, zz = quantized_blocks(a, quality)
        # (dc_codes, ac_codes, blocks_per_mcu, zz in MCU order)
        mcu_specs = [(_DC_CODES, _AC_CODES, 1, zz)]
        n_mcus = len(zz)
        header = (
            _dqt_seg(0, q)
            + _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
            + _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
            + _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
        )
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    elif a.ndim == 3 and a.shape[2] == 3:
        hf, vf = sampling
        h, w = a.shape[:2]
        ph, pw, (ql, qc), zzs = quantized_blocks_color(a, quality, sampling)
        # luma blocks leave plane-raster order for MCU interleave order;
        # chroma at (1, 1) contributes one block per MCU (identity order)
        luma_seq = zzs[0][_mcu_order(ph // 8, pw // 8, hf, vf)]
        mcu_specs = [
            (_DC_CODES, _AC_CODES, hf * vf, luma_seq),
            (_DC_CODES_C, _AC_CODES_C, 1, zzs[1]),
            (_DC_CODES_C, _AC_CODES_C, 1, zzs[2]),
        ]
        n_mcus = len(zzs[1])
        header = (
            _dqt_seg(0, ql)
            + _dqt_seg(1, qc)
            + _seg(
                0xC0,
                struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, (hf << 4) | vf, 0, 2, 0x11, 1, 3, 0x11, 1]),
            )
            + _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
            + _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
            + _seg(0xC4, bytes([0x01]) + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
            + _seg(0xC4, bytes([0x11]) + bytes(_AC_BITS_C) + bytes(_AC_VALS_C))
        )
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    else:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB uint8")

    bw = _BitWriter()
    prev_dc = [0] * len(mcu_specs)
    rst = 0
    for n in range(n_mcus):
        if restart_interval and n and n % restart_interval == 0:
            bw.restart(rst)
            rst = (rst + 1) & 7
            prev_dc = [0] * len(mcu_specs)
        for ci, (dc_codes, ac_codes, nb, seq) in enumerate(mcu_specs):
            for b in range(nb):
                prev_dc[ci] = _encode_block(
                    bw, seq[n * nb + b], prev_dc[ci], dc_codes, ac_codes
                )
    scan = bw.flush()

    out = (
        b"\xff\xd8"  # SOI
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + header
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, sos) + scan + b"\xff\xd9"
    return out


# Progressive AC scans need EOBn symbols (0x10..0xE0), which the baseline
# Annex-K tables do not contain — progressive encoders ship custom DHTs.
# This one is deliberately simple: every symbol a progressive AC scan can
# emit ((run<<4)|size for size 1..10, EOB0..EOB14, ZRL) at a flat 8 bits.
# Suboptimal compression, trivially canonical (176 codes, none all-ones),
# and any conforming decoder reads it from the DHT we emit.
_AC_PROG_VALS = (
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [n << 4 for n in range(15)]
    + [0xF0]
)
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
_AC_PROG_CODES = _build_codes(_AC_PROG_BITS, _AC_PROG_VALS)


def _enc_dc_scan(bw: _BitWriter, mcu_specs, n_mcus: int, Al: int, first: bool):
    """Progressive DC scan: first pass Huffman-codes diffs of the point-
    transformed DC (arithmetic >> Al, T.81 G.1.2.1); refinement emits one
    raw bit ((dc >> Al) & 1) per block in the same interleave order."""
    prev = [0] * len(mcu_specs)
    for n in range(n_mcus):
        for ci, (dc_codes, nb, seq) in enumerate(mcu_specs):
            for b in range(nb):
                dc = int(seq[n * nb + b][0]) >> Al
                if first:
                    cat, bits = _magnitude(dc - prev[ci])
                    code, ln = dc_codes[cat]
                    bw.write(code, ln)
                    if cat:
                        bw.write(bits, cat)
                    prev[ci] = dc
                else:
                    bw.write(dc & 1, 1)


def _flush_eobrun(bw: _BitWriter, eobrun: int, ac_codes, pend=None) -> int:
    """Emit a pending EOBn (+ extension bits, + any buffered refinement
    correction bits that ride the run) and return the reset counter."""
    if eobrun:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(eobrun & ((1 << nbits) - 1), nbits)
        if pend is not None:
            for bit in pend:
                bw.write(bit, 1)
            pend.clear()
    return 0


def _enc_ac_first(bw: _BitWriter, blocks, Ss: int, Se: int, Al: int, ac_codes):
    """Progressive AC first pass (G.2.2): band run-length with EOBn runs;
    values point-transformed toward zero (|v| >> Al, sign kept)."""
    eobrun = 0
    for blk in blocks:
        tv = [
            -((-v) >> Al) if v < 0 else v >> Al
            for v in (int(x) for x in blk[Ss:Se + 1])
        ]
        nz = [i for i, t in enumerate(tv) if t]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun, ac_codes)
            continue
        eobrun = _flush_eobrun(bw, eobrun, ac_codes)
        r = 0
        for i in range(nz[-1] + 1):
            t = tv[i]
            if t == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                r -= 16
            cat, bits = _magnitude(t)
            code, ln = ac_codes[(r << 4) | cat]
            bw.write(code, ln)
            bw.write(bits, cat)
            r = 0
        if nz[-1] < Se - Ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun, ac_codes)
    _flush_eobrun(bw, eobrun, ac_codes)


def _enc_ac_refine(bw: _BitWriter, blocks, Ss: int, Se: int, Al: int, ac_codes):
    """Progressive AC refinement (G.2.3): newly-significant coefficients
    ((|v| >> Al) == 1) emit (run<<4)|1 + sign; history-nonzero coefficients
    emit one buffered correction bit, woven after the next symbol / ZRL /
    EOBn exactly where the figure-G.7 decoder reads them.  A pending EOB
    run (with the covered blocks' correction bits) is flushed BEFORE any
    block that inserts a new coefficient — the run's bits must precede the
    block's first Huffman symbol on the wire."""
    eobrun = 0
    pend: list[int] = []
    for blk in blocks:
        vals = [int(x) for x in blk[Ss:Se + 1]]
        absv = [(-v if v < 0 else v) >> Al for v in vals]
        eob = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        if eob >= 0:
            eobrun = _flush_eobrun(bw, eobrun, ac_codes, pend)
        r = 0
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                r -= 16
                for bit in pend:
                    bw.write(bit, 1)
                pend.clear()
            if t > 1:
                pend.append(t & 1)
                continue
            code, ln = ac_codes[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if vals[i] > 0 else 0, 1)
            for bit in pend:
                bw.write(bit, 1)
            pend.clear()
            r = 0
        if r > 0 or pend:
            eobrun += 1
            if eobrun == 0x7FFF or len(pend) > 900:
                eobrun = _flush_eobrun(bw, eobrun, ac_codes, pend)
    _flush_eobrun(bw, eobrun, ac_codes, pend)


def _sos_seg(comp_sel, Ss: int, Se: int, Ah: int, Al: int) -> bytes:
    body = bytes([len(comp_sel)])
    for cs, tsel in comp_sel:
        body += bytes([cs, tsel])
    return _seg(0xDA, body + bytes([Ss, Se, (Ah << 4) | Al]))


def _subgrid(zz: np.ndarray, bwidth: int, nbr: int, nbc: int) -> np.ndarray:
    """The non-interleaved scan sub-grid (T.81 A.2.2): the top-left
    ceil(comp_px/8) blocks of the padded plane — interleave-padding blocks
    carry no AC data in progressive files."""
    idx = [r * bwidth + c for r in range(nbr) for c in range(nbc)]
    return zz[idx]


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, sampling=(1, 1)
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> progressive (SOF2) JFIF
    JPEG bytes using the standard successive-approximation scan script:
    DC (Al=1) -> luma AC 1-5 -> chroma AC 1-63 -> luma AC 6-63 (all Al=1)
    -> DC refinement -> per-component AC refinement (Ah=1, Al=0) — every
    coefficient fully delivered, so the quantized spectrum roundtrips
    exactly (same lossless-layer contract as the baseline encoder)."""
    a = np.asarray(img, dtype=np.uint8)
    ac = _AC_PROG_CODES
    if a.ndim == 2:
        h, w = a.shape
        ph, pw, q, zz = quantized_blocks(a, quality)
        header = (
            _dqt_seg(0, q)
            + _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
            + _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
            + _seg(0xC4, bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS))
        )
        dc_specs = [(_DC_CODES, 1, zz)]
        n_mcus = len(zz)
        dc_sel = [(1, 0x00)]
        subs = [zz]  # grayscale: sub-grid == padded plane
        ac_plan = [(0, 1, 5), (0, 6, 63)]
        refine_comps = [0]
        ids = [1]
    elif a.ndim == 3 and a.shape[2] == 3:
        hf, vf = sampling
        h, w = a.shape[:2]
        ph, pw, (ql, qc), zzs = quantized_blocks_color(a, quality, sampling)
        luma_seq = zzs[0][_mcu_order(ph // 8, pw // 8, hf, vf)]
        dc_specs = [
            (_DC_CODES, hf * vf, luma_seq),
            (_DC_CODES_C, 1, zzs[1]),
            (_DC_CODES_C, 1, zzs[2]),
        ]
        n_mcus = len(zzs[1])
        header = (
            _dqt_seg(0, ql)
            + _dqt_seg(1, qc)
            + _seg(
                0xC2,
                struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, (hf << 4) | vf, 0, 2, 0x11, 1, 3, 0x11, 1]),
            )
            + _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
            + _seg(0xC4, bytes([0x01]) + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
            + _seg(0xC4, bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS))
        )
        dc_sel = [(1, 0x00), (2, 0x10), (3, 0x10)]
        subs = [
            _subgrid(zzs[0], pw // 8, -(-h // 8), -(-w // 8)),
            zzs[1],  # chroma planes pad to exactly the sub-grid
            zzs[2],
        ]
        ac_plan = [(0, 1, 5), (1, 1, 63), (2, 1, 63), (0, 6, 63)]
        refine_comps = [0, 1, 2]
        ids = [1, 2, 3]
    else:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB uint8")

    out = (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + header
    )
    bw = _BitWriter()
    _enc_dc_scan(bw, dc_specs, n_mcus, 1, first=True)
    out += _sos_seg(dc_sel, 0, 0, 0, 1) + bw.flush()
    for ci, ss, se in ac_plan:
        bw = _BitWriter()
        _enc_ac_first(bw, subs[ci], ss, se, 1, ac)
        out += _sos_seg([(ids[ci], 0x00)], ss, se, 0, 1) + bw.flush()
    bw = _BitWriter()
    _enc_dc_scan(bw, dc_specs, n_mcus, 0, first=False)
    out += _sos_seg(dc_sel, 0, 0, 1, 0) + bw.flush()
    for ci in refine_comps:
        bw = _BitWriter()
        _enc_ac_refine(bw, subs[ci], 1, 63, 0, ac)
        out += _sos_seg([(ids[ci], 0x00)], 1, 63, 1, 0) + bw.flush()
    return out + b"\xff\xd9"


def _decode_huffman(reader: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _entropy_decode(scan, n_mcus, specs, restart_interval):
    """scan bytes -> [per-component (n_mcus * blocks_per_mcu, 64) spectra in
    MCU interleave order].  ``specs`` is one (dc_dec, ac_dec, h_i, v_i)
    tuple per component; each MCU carries h_i*v_i blocks of that component
    (T.81 A.2.3).  Restart markers (if declared via DRI, counted in MCUs)
    byte-align and reset every DC predictor."""
    segments = _RST_RE.split(scan) if restart_interval else [scan]
    ncomp = len(specs)
    nbs = [hi * vi for _, _, hi, vi in specs]
    zzs = [np.zeros((n_mcus * nb, 64), dtype=np.int64) for nb in nbs]
    seq = [0] * ncomp
    m = 0
    for segment in segments:
        reader = _BitReader(segment)
        prev_dc = [0] * ncomp
        expect = min(restart_interval, n_mcus - m) if restart_interval else n_mcus
        for _ in range(expect):
            for ci, (dc_dec, ac_dec, _hi, _vi) in enumerate(specs):
                zz = zzs[ci]
                for _b in range(nbs[ci]):
                    cat = _decode_huffman(reader, dc_dec)
                    prev_dc[ci] += _extend(reader.read_bits(cat), cat)
                    s = seq[ci]
                    zz[s, 0] = prev_dc[ci]
                    i = 1
                    while i < 64:
                        sym = _decode_huffman(reader, ac_dec)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            i += 16
                            continue
                        run, cat = sym >> 4, sym & 0xF
                        i += run
                        if i > 63:
                            raise ValueError("AC run overflows block")
                        zz[s, i] = _extend(reader.read_bits(cat), cat)
                        i += 1
                    seq[ci] = s + 1
            m += 1
        if m >= n_mcus:
            break
    if m != n_mcus:
        raise ValueError(f"scan ended after {m}/{n_mcus} MCUs")
    return zzs


# end of an entropy-coded segment: the next 0xFF not followed by a stuffed
# 0x00, an RSTn, or another 0xFF (trailing fill bytes belong to the marker)
_SCAN_END_RE = re.compile(rb"\xff(?![\x00\xd0-\xd7\xff])")


def _scan_end(payload: bytes, pos: int) -> int:
    m = _SCAN_END_RE.search(payload, pos)
    return m.start() if m else len(payload)


def _progressive_scan(
    scan, sel, Ss, Se, Ah, Al, coefs, orders, grids, n_mcus, restart_interval
):
    """Decode ONE progressive (SOF2) scan per ITU T.81 Annex G.2, mutating
    the per-component zigzag coefficient accumulators in place.

    ``sel`` = [(ci, dc_dec, ac_dec, hi, vi)] for the scan's components;
    ``orders[ci]`` maps interleaved-sequence index -> plane block index;
    ``grids[ci]`` = (plane_block_cols, sub_rows, sub_cols) for the
    NON-interleaved addressing (a single-component scan covers only
    ceil(comp_px/8) blocks of the padded plane, T.81 A.2.2).

    Four scan kinds: DC first (Huffman diffs of the point-transformed DC,
    value << Al), DC refinement (one raw bit per block, |= 1 << Al), AC
    first (run-length with EOBn end-of-band runs, values << Al), and AC
    successive-approximation refinement (correction bits for history-
    nonzero coefficients woven between newly-significant +-1<<Al
    insertions — the Annex G.2 figure G.7 algorithm).  Restart markers
    byte-align and reset DC predictors AND the EOB run."""
    ncomp = len(sel)
    if Ss == 0:
        if Se != 0:
            raise ValueError("DC scan must have Se == 0")
        if Ah == 0 and any(dc is None for _, dc, _, _, _ in sel):
            raise ValueError("scan references undefined Huffman table")
        interleaved = ncomp > 1
    else:
        if ncomp != 1:
            raise ValueError("progressive AC scans must be single-component")
        if not Ss <= Se <= 63:
            raise ValueError("bad spectral band")
        if sel[0][2] is None:
            raise ValueError("scan references undefined Huffman table")
        interleaved = False
    if interleaved:
        total = n_mcus
    else:
        _bw, nbr, nbc = grids[sel[0][0]]
        total = nbr * nbc
    p1, m1 = 1 << Al, -(1 << Al)
    segments = _RST_RE.split(scan) if restart_interval else [scan]
    m = 0
    for segment in segments:
        reader = _BitReader(segment)
        preds = [0] * ncomp
        eobrun = 0
        expect = min(restart_interval, total - m) if restart_interval else total
        for _ in range(expect):
            if Ss == 0:
                for si, (ci, dc_dec, _ac, hi, vi) in enumerate(sel):
                    nb = hi * vi if interleaved else 1
                    for b in range(nb):
                        if interleaved:
                            idx = orders[ci][m * nb + b]
                        else:
                            bw_i, _nr, nbc = grids[ci]
                            idx = (m // nbc) * bw_i + (m % nbc)
                        row = coefs[ci][idx]
                        if Ah == 0:
                            cat = _decode_huffman(reader, dc_dec)
                            preds[si] += _extend(reader.read_bits(cat), cat)
                            row[0] = preds[si] << Al
                        elif reader.read_bit():
                            row[0] |= p1
            else:
                ci, _dc, ac_dec, _hi, _vi = sel[0]
                bw_i, _nr, nbc = grids[ci]
                row = coefs[ci][(m // nbc) * bw_i + (m % nbc)]
                if Ah == 0:
                    # ---- AC first pass (G.2.2): band run-length + EOBn ----
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        k = Ss
                        while k <= Se:
                            sym = _decode_huffman(reader, ac_dec)
                            r, s = sym >> 4, sym & 0xF
                            if s == 0:
                                if r != 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += reader.read_bits(r)
                                    break
                                k += 16  # ZRL
                            else:
                                k += r
                                if k > Se:
                                    raise ValueError(
                                        "AC coefficient outside spectral band"
                                    )
                                row[k] = _extend(reader.read_bits(s), s) << Al
                                k += 1
                else:
                    # ---- AC refinement (G.2.3, figure G.7) ----
                    k = Ss
                    if eobrun == 0:
                        while k <= Se:
                            sym = _decode_huffman(reader, ac_dec)
                            r, s = sym >> 4, sym & 0xF
                            val = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.read_bits(r)
                                    break
                                # ZRL: skip 16 zero-HISTORY coefficients
                            elif s == 1:
                                val = p1 if reader.read_bit() else m1
                            else:
                                raise ValueError("bad AC refinement symbol")
                            while k <= Se:
                                if row[k] != 0:
                                    if (
                                        reader.read_bit()
                                        and (row[k] & p1) == 0
                                    ):
                                        row[k] += p1 if row[k] > 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val:
                                if k > Se:
                                    raise ValueError(
                                        "AC refinement overflows band"
                                    )
                                row[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= Se:
                            if row[k] != 0:
                                if reader.read_bit() and (row[k] & p1) == 0:
                                    row[k] += p1 if row[k] > 0 else m1
                            k += 1
                        eobrun -= 1
            m += 1
        if m >= total:
            break
    if m != total:
        raise ValueError(f"scan ended after {m}/{total} blocks")


def _parse(payload: bytes):
    """Shared marker walk: -> (zzs, h, w, qs, comps, mcu_grid) with one
    plane-raster-order spectrum + quant table per component and comps =
    [(h_i, v_i)] sampling factors.  Handles baseline sequential (SOF0,
    single interleaved scan) AND progressive (SOF2, multi-scan successive
    approximation / spectral selection).  Reads DQT/DHT/DRI from the file;
    tolerates 0xFF fill bytes and standalone TEM/RST markers in the header
    region; malformed / truncated input raises ValueError (never
    IndexError) so media-decode callers can catch one type."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = None
    comp_q: list[int] = []
    comp_ids: list[int] = []
    comps: list[tuple[int, int]] = []
    restart_interval = 0
    progressive = False
    saw_scan = False
    coefs = orders = grids = None
    hmax = vmax = hm = wm = None
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # spec-legal fill bytes: any number of 0xFF before the marker code
        while payload[pos + 1] == 0xFF:
            pos += 1
            if pos + 1 >= len(payload):
                raise ValueError("truncated header (fill bytes to EOF)")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RST: standalone
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated segment header")
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated segment body")
        pos += 2 + ln
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, off + 1)
                qtables[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                if len(bits) < 16 or off + 17 + n > len(body):
                    raise ValueError("truncated DHT")
                vals = list(body[off + 17:off + 17 + n])
                codes = _build_codes(bits, vals)
                dec = {(lnn, c): s for s, (c, lnn) in codes.items()}
                (dc_tables if tc == 0 else ac_tables)[th] = dec
                off += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated SOF")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component frames supported")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF component list")
            comp_q, comp_ids, comps = [], [], []
            for ci in range(ncomp):
                # per-component bytes: id, sampling factors, quant table id
                comp_ids.append(body[6 + 3 * ci])
                hv = body[6 + 3 * ci + 1]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factors {hi}x{vi}")
                comps.append((hi, vi))
                comp_q.append(body[6 + 3 * ci + 2])
            if ncomp == 1:
                # single-component scans are non-interleaved: data is a
                # plain 8x8 block grid whatever the SOF sampling bytes say
                comps = [(1, 1)]
            hmax = max(hi for hi, _ in comps)
            vmax = max(vi for _, vi in comps)
            if any(hmax % hi or vmax % vi for hi, vi in comps):
                raise ValueError("non-integer sampling ratios unsupported")
            # MCU grid at max sampling; each component's padded plane is
            # its (vi, hi) fraction of the (hm*8*vmax, wm*8*hmax) canvas
            hm = (h + 8 * vmax - 1) // (8 * vmax)
            wm = (w + 8 * hmax - 1) // (8 * hmax)
            if progressive:
                # coefficients accumulate across scans, in plane raster
                # order at component resolution; non-interleaved scans
                # cover only the ceil(comp_px/8) sub-grid (T.81 A.2.2)
                coefs, orders, grids = [], [], []
                for hi, vi in comps:
                    bh_i, bw_i = hm * vi, wm * hi
                    coefs.append(np.zeros((bh_i * bw_i, 64), dtype=np.int64))
                    orders.append(_mcu_order(bh_i, bw_i, hi, vi))
                    nbr = (-(-h * vi // vmax) + 7) // 8
                    nbc = (-(-w * hi // hmax) + 7) // 8
                    grids.append((bw_i, nbr, nbc))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("only baseline (SOF0) and progressive (SOF2) supported")
        elif marker == 0xDA:
            if h is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if progressive:
                if len(body) < 1 + 2 * ns + 3 or not 1 <= ns <= len(comps):
                    raise ValueError("bad SOS header")
                sel = []
                for i in range(ns):
                    cs, tsel = body[1 + 2 * i], body[2 + 2 * i]
                    if cs not in comp_ids:
                        raise ValueError("scan references unknown component")
                    ci = comp_ids.index(cs)
                    hi, vi = comps[ci]
                    sel.append(
                        (
                            ci,
                            dc_tables.get(tsel >> 4),
                            ac_tables.get(tsel & 0xF),
                            hi,
                            vi,
                        )
                    )
                Ss, Se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
                end = _scan_end(payload, pos)
                _progressive_scan(
                    payload[pos:end], sel, Ss, Se, ahal >> 4, ahal & 0xF,
                    coefs, orders, grids, hm * wm, restart_interval,
                )
                saw_scan = True
                pos = end
                continue
            if ns != len(comps):
                raise ValueError("only single interleaved scan supported")
            specs = []
            for ci in range(ns):
                tsel = body[2 + 2 * ci]
                if tsel >> 4 not in dc_tables or tsel & 0xF not in ac_tables:
                    raise ValueError("scan references undefined Huffman table")
                hi, vi = comps[ci]
                specs.append((dc_tables[tsel >> 4], ac_tables[tsel & 0xF], hi, vi))
            end = payload.rfind(b"\xff\xd9")
            scan = payload[pos:end if end > 0 else len(payload)]
            if any(t not in qtables for t in comp_q):
                raise ValueError("component references undefined quant table")
            zzs_seq = _entropy_decode(scan, hm * wm, specs, restart_interval)
            zzs = []
            for (hi, vi), zz in zip(comps, zzs_seq):
                order = _mcu_order(hm * vi, wm * hi, hi, vi)
                plane = np.empty_like(zz)
                plane[order] = zz  # MCU interleave -> plane raster
                zzs.append(plane)
            return zzs, h, w, [qtables[t] for t in comp_q], comps, (hm, wm)
    if progressive and saw_scan:
        if any(t not in qtables for t in comp_q):
            raise ValueError("component references undefined quant table")
        return coefs, h, w, [qtables[t] for t in comp_q], comps, (hm, wm)
    raise ValueError("no SOS marker found")


def _channel_pixels(zz: np.ndarray, q: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """(n_blocks, 64) zigzag spectrum + quant table -> (ph, pw) float64."""
    quant = np.zeros_like(zz)
    quant[:, _ZIGZAG] = zz
    coef = quant.reshape(-1, 8, 8).astype(np.float64) * q
    blocks = np.einsum("xu,nuv,yv->nxy", _DCT.T.copy(), coef, _DCT.T.copy())
    return (
        (blocks + 128.0)
        .reshape(ph // 8, pw // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)
    )


def decode_jpeg(payload: bytes):
    """Baseline (SOF0) or progressive (SOF2) JPEG -> (h, w) uint8 grayscale
    or (h, w, 3) uint8 RGB.  Reads the DQT/DHT/DRI segments FROM THE FILE
    (not assumed), handles restart markers, fill bytes, and per-component
    sampling factors with integer ratios — 4:4:4, 4:2:0, 4:2:2 (and 4:4:0)
    files from standard encoders decode, not just this module's output.
    Subsampled chroma is nearest-neighbor upsampled to the luma grid (ITU
    T.81 A.2).  Progressive files cut between complete scans decode to the
    partial-delivery image, per the format's design."""
    zzs, h, w, qs, comps, (hm, wm) = _parse(payload)
    hmax = max(hi for hi, _ in comps)
    vmax = max(vi for _, vi in comps)
    chans = []
    for (hi, vi), zz, q in zip(comps, zzs, qs):
        plane = _channel_pixels(zz, q, hm * vi * 8, wm * hi * 8)
        if hi != hmax or vi != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        chans.append(plane)
    if len(chans) == 1:
        return np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)[:h, :w]
    return ycbcr_to_rgb(np.stack(chans, axis=-1))[:h, :w]


def decode_jpeg_spectrum(payload: bytes):
    """The quantized zigzag spectrum as the decoder read it, per component
    at COMPONENT resolution in plane-raster block order — one array for
    grayscale, a [Y, Cb, Cr] list for color — paired with
    quantized_blocks(_color) to assert the entropy layer is LOSSLESS (the
    pairing holds for subsampled files too: both sides order blocks
    plane-raster after the MCU de-interleave)."""
    zzs = _parse(payload)[0]
    return zzs[0] if len(zzs) == 1 else zzs
