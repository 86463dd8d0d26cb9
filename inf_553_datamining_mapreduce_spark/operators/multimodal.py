"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata (schemas.MEDIA_ASSET), processed through
Arrow-batched ``mapInPandas`` kernels.

Decoding: these formats decode for REAL via pure numpy + stdlib with no
external library — P6 PPM, 24-bit BMP, 8-bit RGB/RGBA PNG, GIF, and
baseline JPEG images (``decode_image`` — exact pixel rasters for the
lossless formats, quantization-accurate rasters for JPEG; PNG's only
"codec" is DEFLATE, which Python ships as ``zlib``, GIF's is ~50 lines
of LZW, and baseline JPEG is Huffman + IDCT, both implemented here per
ITU-T T.81) and RIFF/WAVE 16-bit PCM audio (``decode_audio`` — exact
sample matrices, real RMS/peak/zero-crossing features). Formats whose
codec the container genuinely lacks (progressive
JPEG/WebP/MP3/...) raise NotImplementedError
from the decoders and fall back to the deterministic ``fake_features``
stand-in, so mixed corpora flow through one pipeline and the Spark-side
contract — schema, partitioning, UDF signature, Arrow batch shape — is
identical on every path.

Scale notes: payloads never pass through Python row-at-a-time; batches
arrive as Arrow buffers. Feature extraction repartitions by asset_id so
batch sizes stay bounded regardless of upstream file layout
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds them further).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from inf_553_datamining_mapreduce_spark.deploy import ensure_worker_imports

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("payload_sha256", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_sha256", StringType(), True),
    ]
)


def decode_image(payload: bytes):
    """REAL pixel decode for the formats this container can decode with
    no external library — returns an ``(h, w, 3)`` uint8 numpy array:

    * **P6 binary PPM** (8-bit RGB, the netpbm interchange format)
    * **BMP** (BITMAPINFOHEADER, 24-bit, uncompressed, bottom-up rows
      with 4-byte row padding)
    * **PNG** (8-bit RGB/RGBA non-interlaced — DEFLATE via the stdlib
      ``zlib``, all five scanline filters; see ``_decode_png``)
    * **JPEG** (baseline DCT/SOF0 — pure-Python Huffman entropy decode +
      numpy IDCT per ITU-T T.81; see ``_decode_jpeg``)
    * **GIF** (87a/89a first frame — pure-Python variable-width LZW,
      interlacing, global/local color tables; see ``_decode_gif``)

    Formats needing a codec the runtime lacks (progressive
    JPEG/WebP/...) raise
    ``NotImplementedError`` — wire an imaging library there when one
    exists; the pipeline falls back to ``fake_features`` for payloads
    this decoder rejects, so mixed corpora keep flowing.
    """
    import numpy as np

    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255 or w <= 0 or h <= 0:
            raise NotImplementedError(
                "only 8-bit P6 PPM with positive dimensions supported"
            )
        raster = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
        return raster.reshape(h, w, 3)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        hdr_size = int.from_bytes(payload[14:18], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if hdr_size < 40 or bpp != 24 or compression != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP supported")
        bottom_up = h > 0
        h = abs(h)
        row_bytes = (w * 3 + 3) // 4 * 4
        if w <= 0 or h == 0 or off + row_bytes * h > len(payload):
            raise NotImplementedError("malformed or truncated BMP header")
        rows = np.frombuffer(
            payload, np.uint8, count=row_bytes * h, offset=off
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return rows[..., ::-1]  # BGR -> RGB
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    raise NotImplementedError(
        "codec-requiring image format; wire an imaging library here"
    )


def _decode_gif(payload: bytes):
    """REAL GIF decode with ZERO external dependencies: GIF's one codec
    is LZW with variable code width (GIF89a spec appendix F), ~50 lines
    of stdlib Python. Decodes the FIRST image frame — global or local
    color table, interlaced or sequential row order — and returns it as
    ``(h, w, 3)`` uint8 via the palette. Later animation frames are out
    of scope (the feature contract is one raster per payload); malformed
    streams raise ``NotImplementedError`` and fall back like any other
    undecodable payload.
    """
    import numpy as np

    def color_table(pos, flags):
        if not flags & 0x80:
            return None, pos
        n = 2 << (flags & 0x07)
        table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        return table, pos + n * 3

    try:
        flags = payload[10]
        gct, pos = color_table(13, flags)
        while pos < len(payload):
            block = payload[pos]
            if block == 0x21:  # extension: label + sub-blocks, skip
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif block == 0x3B:  # trailer before any image
                break
            elif block == 0x2C:  # image descriptor
                w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
                h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
                iflags = payload[pos + 9]
                lct, pos = color_table(pos + 10, iflags)
                palette = lct if lct is not None else gct
                if palette is None or w <= 0 or h <= 0:
                    raise NotImplementedError("GIF image without color table")
                if w * h > 64_000_000:
                    # same 64 MP sanity cap as _jpeg_scan: 16-bit w and h
                    # allow ~4.3e9 pixels, and the limit-sized Python
                    # list in _lzw_decode would allocate GBs from a tiny
                    # highly-compressible stream before any other check
                    raise NotImplementedError(
                        "implausibly large GIF dimensions"
                    )
                min_code = payload[pos]
                pos += 1
                data = bytearray()
                while payload[pos] != 0:
                    n = payload[pos]
                    data += payload[pos + 1 : pos + 1 + n]
                    pos += 1 + n
                indices = _lzw_decode(bytes(data), min_code, w * h)
                if len(indices) < w * h:
                    raise NotImplementedError("short GIF pixel stream")
                idx = np.array(indices[: w * h], dtype=np.int64).reshape(h, w)
                if iflags & 0x40:  # interlaced: 4-pass row order
                    order = (
                        list(range(0, h, 8))
                        + list(range(4, h, 8))
                        + list(range(2, h, 4))
                        + list(range(1, h, 2))
                    )
                    deinterlaced = np.empty_like(idx)
                    deinterlaced[order] = idx
                    idx = deinterlaced
                if int(idx.max()) >= len(palette):
                    raise NotImplementedError("GIF index beyond color table")
                return palette[idx]
            else:
                raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
    except IndexError as exc:
        raise NotImplementedError("truncated GIF stream") from exc
    raise NotImplementedError("GIF with no image frame")


def _lzw_decode(data: bytes, min_code: int, limit: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit packing, variable code width
    starting at ``min_code + 1``, dictionary reset on CLEAR, width
    growth at dictionary sizes 2^w (capped at 12 bits per spec)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = [[i] for i in range(clear)] + [None, None]
    table = list(base)
    width = min_code + 1
    out: list[int] = []
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table) or table[code] is None:
                    raise NotImplementedError("invalid initial LZW code")
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise NotImplementedError("LZW code out of range")
            out.extend(entry)
            if len(out) >= limit:
                return out
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _decode_png(payload: bytes):
    """REAL PNG decode with ZERO external dependencies: the one "codec"
    PNG needs is DEFLATE, and that ships in the Python stdlib (``zlib``).
    Supports the dominant web profile — 8-bit, color type 2 (RGB) or 6
    (RGBA, alpha stripped to keep the ``(h, w, 3)`` contract),
    non-interlaced — with all five scanline filters (None/Sub/Up/
    Average/Paeth) unfiltered per the spec. Other profiles (palette,
    16-bit, Adam7) raise ``NotImplementedError`` and fall back like any
    other undecodable payload.

    Filters None/Up vectorize (uint8 wraparound addition); Sub/Average/
    Paeth recur on the reconstructed left neighbor, so those scanlines
    walk per-byte — fine for the fallback-grade decoding this container
    supports, and the Arrow-batch plumbing around it is unchanged."""
    import zlib

    import numpy as np

    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise NotImplementedError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + data + crc
    if ihdr is None or not idat:
        raise NotImplementedError("missing IHDR/IDAT chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, comp, filt, interlace = ihdr[8:13]
    if (
        bit_depth != 8
        or color_type not in (2, 6)
        or comp != 0
        or filt != 0
        or interlace != 0
        or w <= 0
        or h <= 0
    ):
        raise NotImplementedError(
            "only 8-bit non-interlaced RGB/RGBA PNG supported"
        )
    if h * w > 64_000_000:
        # same 64 MP sanity cap as _jpeg_scan: a garbage IHDR must not
        # demand a multi-GB allocation before decode fails
        raise NotImplementedError("implausibly large PNG dimensions")
    bpp = 3 if color_type == 2 else 4
    stride = w * bpp
    need = (stride + 1) * h
    try:
        # Bounded inflate: a deflate bomb with plausible IHDR dims must
        # not expand past the declared raster. Ask for need+1 so an
        # oversize stream is detectable without materializing it.
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), need + 1)
    except zlib.error as exc:
        raise NotImplementedError(f"corrupt PNG deflate stream: {exc}") from exc
    if len(raw) > need:
        raise NotImplementedError("PNG deflate stream larger than raster")
    if len(raw) < need:
        raise NotImplementedError("short PNG pixel stream")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up — vector uint8 addition wraps mod 256 per spec
            out[y] = line + prev
        elif f in (1, 3, 4):
            rec = out[y]
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + int(prev[x])) >> 1
                else:  # Paeth
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"invalid PNG filter byte {f}")
    return out.reshape(h, w, bpp)[..., :3]


def _jpeg_dct_basis():
    """The orthonormal 8x8 DCT-II basis ``A`` (``A[u, x] = c(u)/2 *
    cos((2x+1)u*pi/16)``, ``c(0)=1/sqrt(2)``): inverse DCT is
    ``A.T @ F @ A``, forward is ``A @ f @ A.T`` (T.81 A.3.3)."""
    import numpy as np

    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    a[0] /= np.sqrt(2.0)
    return a


# T.81 Figure A.6 zigzag: _JPEG_ZIGZAG[k] = raster index of the k-th
# coefficient in zigzag transmission order.
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JpegBitReader:
    """MSB-first bit reader over a JPEG entropy-coded segment: unstuffs
    ``FF 00`` to ``FF``, stops at any real marker (leaving it for the
    caller), and realigns to a byte boundary across restart markers."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.acc, self.nbits = 0, 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise NotImplementedError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed FF
                else:
                    raise NotImplementedError("unexpected marker in entropy stream")
            else:
                self.pos += 1
            self.acc, self.nbits = byte, 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at the current (byte-aligned) position."""
        self.nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise NotImplementedError("missing JPEG restart marker")
        self.pos += 2


def _jpeg_huffman_decode(reader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    # T.81 F.2.2.1 EXTEND: high bit 0 means negative.
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _decode_jpeg(payload: bytes):
    """REAL baseline JPEG decode with ZERO external dependencies — pure
    stdlib marker/Huffman parsing plus numpy IDCT, per ITU-T T.81:
    marker scan (DQT/DHT/SOF0/DRI/SOS), canonical Huffman entropy decode
    with byte unstuffing and restart-interval handling, dequantize,
    dezigzag, 8x8 inverse DCT as two matrix products, generic subsampling
    placement (any h/v factors, e.g. 4:4:4 and 4:2:0), nearest-neighbor
    chroma upsample, JFIF BT.601 YCbCr->RGB. Returns ``(h, w, 3)`` uint8;
    grayscale replicates to 3 channels.

    Out of scope (raise ``NotImplementedError``, falling back like any
    other undecodable payload): progressive (SOF2), arithmetic coding,
    12-bit precision, hierarchical modes.
    """
    import numpy as np

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> {(len, code): sym}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("malformed JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI before any SOS
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit JPEG quant table")
                vals = np.frombuffer(body, np.uint8, 64, b + 1).astype(np.float64)
                table = np.empty(64)
                table[_JPEG_ZIGZAG] = vals  # de-zigzag to raster order
                qt[tid] = table.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT — canonical code reconstruction
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = body[b + 1 : b + 17]
                table, code, v = {}, 0, b + 17
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = body[v]
                        code += 1
                        v += 1
                    code <<= 1
                huff[(tc, th)] = table
                b = v
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline DCT
            if body[0] != 8:
                raise NotImplementedError("non-8-bit JPEG precision")
            h_img = int.from_bytes(body[1:3], "big")
            w_img = int.from_bytes(body[3:5], "big")
            comps = []
            for c in range(body[5]):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = (h_img, w_img, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline JPEG (SOF0) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF")
            scan = {}
            for c in range(body[0]):
                cid, tabs = body[1 + 2 * c : 3 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0xF)
            return _jpeg_scan(
                payload, pos + 2 + seg_len, frame, scan, qt, huff, restart_interval
            )
        pos += 2 + seg_len
    raise NotImplementedError("no JPEG scan found")


def _jpeg_scan(payload, pos, frame, scan, qt, huff, restart_interval):
    import numpy as np

    h_img, w_img, comps = frame
    if h_img <= 0 or w_img <= 0 or not comps:
        raise NotImplementedError("degenerate JPEG dimensions")
    if h_img * w_img > 64_000_000:
        # sanity cap (64 MP): a garbage header must not demand a
        # multi-GB plane allocation before the entropy decode fails
        raise NotImplementedError("implausibly large JPEG dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or any(
        hmax % c["h"] or vmax % c["v"] for c in comps
    ):
        raise NotImplementedError("invalid JPEG sampling factors")
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    basis = _jpeg_dct_basis()
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
        if c["tq"] not in qt:
            raise NotImplementedError("JPEG component references missing quant table")
        dc_tab, ac_tab = scan.get(c["id"], (None, None))
        if (0, dc_tab) not in huff or (1, ac_tab) not in huff:
            raise NotImplementedError("JPEG scan references missing huffman table")
        c["dc"], c["ac"] = huff[(0, dc_tab)], huff[(1, ac_tab)]

    reader = _JpegBitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64)
                        size = _jpeg_huffman_decode(reader, c["dc"])
                        pred[ci] += _jpeg_extend(reader.bits(size), size)
                        coefs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _jpeg_huffman_decode(reader, c["ac"])
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise NotImplementedError("JPEG AC index overflow")
                            coefs[k] = _jpeg_extend(reader.bits(size), size)
                            k += 1
                        block = np.empty(64)
                        block[_JPEG_ZIGZAG] = coefs
                        block = block.reshape(8, 8) * qt[c["tq"]]
                        spatial = basis.T @ block @ basis + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial

    full = []
    for ci, c in enumerate(comps):
        p = np.repeat(
            np.repeat(planes[ci], vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        rgb = np.stack([full[0]] * 3, axis=-1)
    elif len(full) == 3:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rgb = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=-1,
        )
    else:
        raise NotImplementedError("unsupported JPEG component count")
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_audio(payload: bytes):
    """REAL sample decode for canonical RIFF/WAVE PCM — returns
    ``(samples, channels)`` int16 numpy array plus the sample rate:
    ``(array, rate)``. Walks the chunk list (fmt / data may be preceded
    by LIST/fact chunks), accepts 16-bit integer PCM only; compressed
    or float encodings raise ``NotImplementedError`` (wire a codec
    library there when available)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16 or n_channels < 1 or rate <= 0:
        raise NotImplementedError("only 16-bit integer PCM supported")
    n = len(data) // (2 * n_channels) * n_channels
    samples = np.frombuffer(data, np.int16, count=n).reshape(-1, n_channels)
    return samples, rate


def audio_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real ``dim``-vector from decoded PCM: RMS, peak, mean (each scaled
    by 2¹⁵), zero-crossing rate, duration, rate, channel count, sample
    count — deterministic float64 numpy reductions."""
    import numpy as np

    samples, rate = decode_audio(payload)
    if samples.size == 0:
        raise NotImplementedError("empty PCM payload")
    x = samples.astype(np.float64) / 32768.0
    mono = x.mean(axis=1)
    # A valid 1-sample WAV has no adjacent pair: np.mean over the empty
    # comparison would return NaN (not raise), silently poisoning the
    # features column — define the zero-crossing rate as 0.0 instead.
    zc = (
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if mono.shape[0] >= 2
        else 0.0
    )
    feats = [
        float(np.sqrt((x * x).mean())),
        float(np.abs(x).max()),
        float(x.mean()),
        zc,
        samples.shape[0] / float(rate),
        float(rate),
        float(samples.shape[1]),
        float(samples.shape[0]),
    ]
    feats += [0.0] * (dim - len(feats))
    return feats[:dim]


def decode_video_frames(payload: bytes):
    """REAL frame extraction for RIFF/AVI containers carrying
    uncompressed 24-bit DIB frames — returns a list of ``(h, w, 3)``
    uint8 RGB rasters (same raster handling as the BMP branch of
    ``decode_image``: bottom-up rows, 4-byte padding, BGR order). The
    chunk walker recurses through LIST chunks to find the video
    ``strf`` header and the ``movi`` frame chunks; compressed codecs
    raise ``NotImplementedError``."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    dims: dict = {}
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + size]
            if cid == b"LIST":
                walk(body[4:])
            elif cid == b"strf" and not dims:
                dims.update(
                    w=int.from_bytes(body[4:8], "little", signed=True),
                    h=int.from_bytes(body[8:12], "little", signed=True),
                    bpp=int.from_bytes(body[14:16], "little"),
                    comp=int.from_bytes(body[16:20], "little"),
                )
            elif cid[2:4] in (b"db", b"dc") and size > 0:
                frames.append(body)
            pos += 8 + size + (size & 1)  # word-aligned chunks

    walk(payload[12:])
    if not dims or dims["bpp"] != 24 or dims["comp"] != 0 or dims["w"] <= 0:
        raise NotImplementedError("only uncompressed 24-bit DIB AVI supported")
    w, bottom_up = dims["w"], dims["h"] > 0
    h = abs(dims["h"])
    row_bytes = (w * 3 + 3) // 4 * 4
    out = []
    for body in frames:
        if h == 0 or len(body) < row_bytes * h:
            raise NotImplementedError("malformed or truncated frame chunk")
        arr = np.frombuffer(body, np.uint8, count=row_bytes * h).reshape(
            h, row_bytes
        )[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            arr = arr[::-1]
        out.append(arr[..., ::-1])  # BGR -> RGB
    return out


def image_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real ``dim``-vector from decoded pixels: per-channel mean/std/
    min/max (each scaled to [0, 1]) plus width, height, aspect, and mean
    luminance — all float64 numpy reductions over the uint8 raster, so
    the vector is deterministic across processes and platforms."""
    import numpy as np

    img = decode_image(payload).astype(np.float64)
    h, w = img.shape[0], img.shape[1]
    chan = img.reshape(-1, 3)
    feats = []
    feats.extend((chan.mean(axis=0) / 255.0).tolist())
    feats.extend((chan.std(axis=0) / 255.0).tolist())
    feats.extend((chan.min(axis=0) / 255.0).tolist())
    feats.extend((chan.max(axis=0) / 255.0).tolist())
    lum = (
        0.2126 * chan[:, 0] + 0.7152 * chan[:, 1] + 0.0722 * chan[:, 2]
    ).mean() / 255.0
    feats.extend([float(w), float(h), float(w) / float(h), float(lum)])
    return feats[:dim]


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: sha256-seeded values in [0, 1).
    Stable across processes, so tests can assert exact outputs."""
    digest = hashlib.sha256(payload).digest()
    out = []
    for i in range(dim):
        pair = digest[(2 * i) % len(digest)], digest[(2 * i + 1) % len(digest)]
        out.append((pair[0] * 256 + pair[1]) / 65536.0)
    return out


def extract_features(assets: DataFrame, try_decode: bool = True) -> DataFrame:
    """Per-asset feature extraction over Arrow batches. Payloads the
    pure-numpy decoder understands (P6 PPM, 24-bit BMP) get REAL pixel
    features (``image_features``); everything else falls back to the
    deterministic ``fake_features`` stand-in, so mixed corpora keep
    flowing and the Spark plumbing — schema, partitioning, batch shape —
    is identical either way. ``try_decode=False`` forces the stand-in
    (exact-reproducibility mode for tests of the plumbing alone)."""
    ensure_worker_imports(assets.sparkSession)

    def featurize(payload: bytes) -> list[float]:
        if try_decode:
            for real in (image_features, audio_features):
                try:
                    return real(payload)
                except (NotImplementedError, ValueError, IndexError):
                    continue
        return fake_features(payload)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(p) for p in payloads],
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "features": [featurize(p) for p in payloads],
                }
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Perceptual hash (integer pHash) + banded image near-dup
# ---------------------------------------------------------------------------

# Fixed-point 8x32 DCT-II basis for the pHash: Q[u][x] =
# round(cos((2x+1)*u*pi/64) * 2^14), FROZEN as literals (computed once
# with IEEE doubles and inlined) so neither platform libm variation nor
# engine trig can ever skew a bit — the same shared-constant-table trick
# as text.PII_PATTERNS. The oracle SQL embeds these exact integers.
_PHASH_Q_SCALE_BITS = 14
PHASH_SIZE = 32  # raster side after downscale; 8x8 low-frequency block kept
_PHASH_DCT_Q: tuple[tuple[int, ...], ...] = (
    (16384,) * 32,
    (16364, 16207, 15893, 15426, 14811, 14053, 13160, 12140, 11003, 9760,
     8423, 7005, 5520, 3981, 2404, 804, -804, -2404, -3981, -5520, -7005,
     -8423, -9760, -11003, -12140, -13160, -14053, -14811, -15426, -15893,
     -16207, -16364),
    (16305, 15679, 14449, 12665, 10394, 7723, 4756, 1606, -1606, -4756,
     -7723, -10394, -12665, -14449, -15679, -16305, -16305, -15679, -14449,
     -12665, -10394, -7723, -4756, -1606, 1606, 4756, 7723, 10394, 12665,
     14449, 15679, 16305),
    (16207, 14811, 12140, 8423, 3981, -804, -5520, -9760, -13160, -15426,
     -16364, -15893, -14053, -11003, -7005, -2404, 2404, 7005, 11003, 14053,
     15893, 16364, 15426, 13160, 9760, 5520, 804, -3981, -8423, -12140,
     -14811, -16207),
    (16069, 13623, 9102, 3196, -3196, -9102, -13623, -16069, -16069, -13623,
     -9102, -3196, 3196, 9102, 13623, 16069, 16069, 13623, 9102, 3196,
     -3196, -9102, -13623, -16069, -16069, -13623, -9102, -3196, 3196, 9102,
     13623, 16069),
    (15893, 12140, 5520, -2404, -9760, -14811, -16364, -14053, -8423, -804,
     7005, 13160, 16207, 15426, 11003, 3981, -3981, -11003, -15426, -16207,
     -13160, -7005, 804, 8423, 14053, 16364, 14811, 9760, 2404, -5520,
     -12140, -15893),
    (15679, 10394, 1606, -7723, -14449, -16305, -12665, -4756, 4756, 12665,
     16305, 14449, 7723, -1606, -10394, -15679, -15679, -10394, -1606, 7723,
     14449, 16305, 12665, 4756, -4756, -12665, -16305, -14449, -7723, 1606,
     10394, 15679),
    (15426, 8423, -2404, -12140, -16364, -13160, -3981, 7005, 14811, 15893,
     9760, -804, -11003, -16207, -14053, -5520, 5520, 14053, 16207, 11003,
     804, -9760, -15893, -14811, -7005, 3981, 13160, 16364, 12140, 2404,
     -8423, -15426),
)


def phash64(payload: bytes) -> int:
    """Integer perceptual hash: REAL decode (PPM/BMP/PNG/baseline-JPEG/
    GIF via ``decode_image``) -> integer luma ``(77R + 150G + 29B) >> 8``
    -> integer block-mean downscale to 32x32 (floor division — exact) ->
    fixed-point 8x8 low-frequency DCT ``Q @ G @ Q^T`` in int64 -> the
    63-bit median-threshold hash: bit ``u*8+v-1`` set iff AC coefficient
    ``C[u][v]`` strictly exceeds the MEDIAN of the 63 ACs (the classic
    pHash rule — a sign threshold degenerates when most ACs are
    non-positive, hashing dissimilar images alike). The median of 63
    integers is the 32nd-smallest — an exact integer selection, no
    average — so every step is integer and the hash is bit-identical
    across engines and platforms, which is what lets the near-dup query
    run under the DuckDB oracle.
    Undecodable payloads fall back to a deterministic raster of the raw
    payload bytes cycled row-major into 32x32 (the plumbing stand-in,
    mirroring ``fake_features``)."""
    import numpy as np

    try:
        rgb = decode_image(payload).astype(np.int64)
        gray = (77 * rgb[..., 0] + 150 * rgb[..., 1] + 29 * rgb[..., 2]) >> 8
    except (NotImplementedError, ValueError, IndexError):
        buf = np.frombuffer(payload, np.uint8)
        if buf.size == 0:
            buf = np.zeros(1, np.uint8)
        gray = np.resize(buf, (PHASH_SIZE, PHASH_SIZE)).astype(np.int64)
    h, w = gray.shape
    if (h, w) != (PHASH_SIZE, PHASH_SIZE):
        out = np.empty((PHASH_SIZE, PHASH_SIZE), np.int64)
        for i in range(PHASH_SIZE):
            lo_r = i * h // PHASH_SIZE
            hi_r = max(lo_r + 1, (i + 1) * h // PHASH_SIZE)
            for j in range(PHASH_SIZE):
                lo_c = j * w // PHASH_SIZE
                hi_c = max(lo_c + 1, (j + 1) * w // PHASH_SIZE)
                blk = gray[lo_r:hi_r, lo_c:hi_c]
                out[i, j] = int(blk.sum()) // blk.size
        gray = out
    q = np.array(_PHASH_DCT_Q, np.int64)
    c = q @ gray @ q.T  # C[u][v]: u = row frequency, v = column frequency
    ac = c.ravel()[1:]  # 63 AC coefficients, DC dropped
    med = int(np.sort(ac)[31])  # 32nd-smallest: exact integer median
    h64 = 0
    for k, v in enumerate(ac, start=1):
        if v > med:
            h64 |= 1 << (k - 1)
    return h64


def media_phash(assets: DataFrame) -> DataFrame:
    """Per-asset 63-bit perceptual hash over Arrow batches —
    ``(asset_id, phash)``. Same mapInPandas plumbing as
    ``extract_features``: no per-row Python in the surrounding plan, one
    Arrow round-trip for the binary column."""
    ensure_worker_imports(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "phash": [
                        phash64(bytes(p) if p is not None else b"")
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        kernel, "asset_id long, phash long"
    )


def media_phash_near_duplicates(
    assets: DataFrame, max_hamming: int = 8
) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash — the multimodal
    member of the near-dup family, banded exactly like
    ``dedup.simhash_near_duplicates``: candidates via 7-bit band
    collision (9 bands over the 63-bit hash; any pair within Hamming 8
    agrees exactly on at least one band — pigeonhole), then exact
    popcount verification JVM-side. ``(asset_a, asset_b, hamming)``.

    Shape at scale: the hash is one Arrow pass per asset; banding is an
    explode + equi-join on (band, chunk) — never all-pairs; verification
    touches candidates only. A JPEG re-encode of a PNG lands within a
    few bits (the above-median set of the 8x8 low-frequency block
    survives quantization noise); distinct images differ in ~half of 63
    bits."""
    sig = media_phash(assets).localCheckpoint()
    bands = sig.select(
        "asset_id",
        "phash",
        _phash_bands_expr().alias("bb"),
    ).select(
        "asset_id",
        "phash",
        F.col("bb.band").alias("band"),
        F.col("bb.chunk").alias("chunk"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.phash").alias("sig_a"),
            F.col("b.phash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("asset_a", "asset_b", "hamming")
        .orderBy("asset_a", "asset_b")
    )


def _phash_bands_expr() -> Column:
    """The 9x7-bit band explode of a ``phash`` column (shared by the
    batch self-join and the index probe so the two cannot drift)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("phash"), i * 7)
                    .bitwiseAND(F.lit(0x7F))
                    .alias("chunk"),
                )
                for i in range(9)
            ]
        )
    )


def build_phash_index(assets: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Persistable pHash index for ingestion-time image dedup:
    ``(band_tbl, sig_tbl)`` — the banded bucket table
    ``(band, chunk, index_asset_id)`` and the signature table
    ``(index_asset_id, index_phash)``. The artifact an ingestion
    pipeline keeps next to its MinHash/span indexes; at scale both are
    written bucketed on their join keys."""
    sig = media_phash(assets).localCheckpoint()
    bands = sig.select(
        F.col("asset_id").alias("index_asset_id"), _phash_bands_expr().alias("bb")
    ).select(
        "index_asset_id",
        F.col("bb.band").alias("band"),
        F.col("bb.chunk").alias("chunk"),
    )
    return bands, sig.select(
        F.col("asset_id").alias("index_asset_id"),
        F.col("phash").alias("index_phash"),
    )


def index_phash_near_duplicates(
    new_assets: DataFrame,
    band_tbl: DataFrame,
    index_sig: DataFrame,
    max_hamming: int = 8,
) -> DataFrame:
    """Ingestion-time image near-dup check — the stream-static twin of
    ``media_phash_near_duplicates``, the same composition as
    ``dedup.index_near_duplicates``: each INCOMING image is hashed (one
    Arrow pass), banded, bucket-joined against the static index, and
    verified by exact popcount — ``(asset_id, index_asset_id,
    hamming)``. Stateless per row (the pHash is a per-payload
    projection, the signature is one BIGINT so the payload-carry through
    the 9-way band explode is immaterial), so the identical plan runs
    under Structured Streaming as stream-static joins with no state;
    candidate de-duplication is structural — a pair is emitted only from
    its FIRST colliding band, computed per row from the two signatures
    (the stateless replacement for ``distinct()``, same trick as the
    MinHash probe). The first-band convention is sound HERE because
    ``build_phash_index`` applies no hot-bucket cut: every colliding
    band of a pair is present in ``band_tbl``, so the first one always
    joins. It is NOT sound under a df-cut index — the audio twin
    (``index_audio_near_duplicates``) learned this (ADVICE r8) and uses
    a verify-then-group-by dedup instead; if a ``max_band_df`` lever is
    ever added to the pHash index, switch this probe to that form."""
    sig = media_phash(new_assets)
    banded = sig.select(
        "asset_id", "phash", _phash_bands_expr().alias("bb")
    ).select(
        "asset_id",
        "phash",
        F.col("bb.band").alias("band"),
        F.col("bb.chunk").alias("chunk"),
    )
    cand = banded.join(band_tbl, ["band", "chunk"]).join(
        index_sig, "index_asset_id"
    )
    first_band = F.expr(
        "filter(sequence(0, 8), b -> "
        "(shiftright(phash, b * 7) & 127) = "
        "(shiftright(index_phash, b * 7) & 127))[0]"
    )
    return (
        cand.filter(F.col("band") == first_band)
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("phash").bitwiseXOR(F.col("index_phash"))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("asset_id", "index_asset_id", "hamming")
    )


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads. Payloads the pure-numpy AVI
    parser understands (uncompressed 24-bit DIB frames) get REAL frame
    sampling: up to ``max_frames`` evenly-strided actual frames,
    ``frame_index`` = the true frame number, hash over the decoded RGB
    raster bytes. Everything else keeps the deterministic byte-stride
    chunking stand-in (same output schema), so mixed corpora flow and
    the UDTF (explode) shape is identical on both paths."""
    ensure_worker_imports(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                try:
                    frames = decode_video_frames(p)
                    if not frames:
                        # A structurally valid AVI with zero frame chunks
                        # would otherwise emit ZERO rows (the `continue`
                        # skips the stand-in), breaking the one-plus-row-
                        # per-asset contract every other payload honors.
                        raise NotImplementedError("AVI with no frame chunks")
                    step = max(1, -(-len(frames) // max_frames))
                    for i in range(0, len(frames), step)[:max_frames]:
                        ids.append(int(aid))
                        idxs.append(i)
                        hashes.append(
                            hashlib.sha256(frames[i].tobytes()).hexdigest()
                        )
                    continue
                except (NotImplementedError, ValueError, IndexError):
                    pass
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    chunk = p[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(int(aid))
                    idxs.append(i)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_index": idxs, "frame_sha256": hashes}
            )

    return (
        assets.filter(F.col("media_type") == "video")
        .select("asset_id", "payload")
        .mapInPandas(kernel, FRAME_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Audio fingerprint near-duplicates (Haitsma-Kalker-style, exact integer)
# ---------------------------------------------------------------------------

AFP_SAMPLES = 1024  # fingerprint window: first 1024 mono samples


def audio_fingerprint64(payload: bytes) -> int:
    """63-bit AUDIO fingerprint from REAL PCM decode, every step integer:
    ``decode_audio`` -> mono by floor-averaged channels -> the first
    ``AFP_SAMPLES`` samples (zero-padded) arranged as a 32x32 matrix G
    (row j = samples 32j..32j+31) -> fixed-point spectral transform
    ``C = Q @ G`` with the shared 8x32 DCT table ``_PHASH_DCT_Q`` (so
    column t of C is the 8-band spectrum of the strided frame
    [t, 32+t, 64+t, ...] — every band mixes samples across the whole
    clip) -> band energies ``E = |C|`` -> the Haitsma & Kalker (2002)
    bit rule: bit ``(t-1)*7 + k`` (t = 1..9, k = 0..6) set iff
    ``E[k][t] > E[k][t-1]`` — the sign of adjacent-frame band-energy
    DELTAS, robust to overall level because scaling every sample by a
    positive constant scales every energy equally and flips no bit.

    Exact BIGINT throughout (no truncation anywhere), so the DuckDB
    oracle reproduces the hash from the same payload bytes. Payloads
    ``decode_audio`` rejects fall back to the deterministic byte raster
    (the ``phash64`` stand-in convention) so mixed corpora flow."""
    import numpy as np

    try:
        samples, _rate = decode_audio(bytes(payload))
        if samples.size == 0:
            raise NotImplementedError("empty PCM payload")
        mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
    except (NotImplementedError, ValueError, IndexError):
        buf = np.frombuffer(bytes(payload), np.uint8)
        if buf.size == 0:
            buf = np.zeros(1, np.uint8)
        mono = np.resize(buf, AFP_SAMPLES).astype(np.int64)
    x = np.zeros(AFP_SAMPLES, np.int64)
    n = min(mono.shape[0], AFP_SAMPLES)
    x[:n] = mono[:n]
    g = x.reshape(32, 32)
    q = np.array(_PHASH_DCT_Q, np.int64)
    e = np.abs(q @ g)  # E[k][t]: band k energy of strided frame t
    h64 = 0
    for t in range(1, 10):
        for k in range(7):
            if e[k][t] > e[k][t - 1]:
                h64 |= 1 << ((t - 1) * 7 + k)
    return h64


def media_audio_fingerprints(assets: DataFrame) -> DataFrame:
    """Per-asset audio fingerprint over Arrow batches — ``(asset_id,
    afp)``; the ``media_phash`` plumbing applied to the audio kernel."""
    ensure_worker_imports(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "afp": [
                        audio_fingerprint64(
                            bytes(p) if p is not None else b""
                        )
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        kernel, "asset_id long, afp long"
    )


def _afp_bands_expr() -> Column:
    """9x7-bit band explode of an ``afp`` column (the pHash pigeonhole
    banding applied to the audio fingerprint)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("afp"), i * 7)
                    .bitwiseAND(F.lit(0x7F))
                    .alias("chunk"),
                )
                for i in range(9)
            ]
        )
    )


def audio_near_duplicates(
    assets: DataFrame, max_hamming: int = 8, max_band_df: int | None = 2000
) -> DataFrame:
    """Audio near-duplicate pairs — ``(asset_a, asset_b, hamming)`` —
    banded exactly like ``media_phash_near_duplicates``: 9x7-bit
    pigeonhole bands (any pair within Hamming 8 collides on at least one
    band), exact popcount verification on candidates only, never
    all-pairs. A re-levelled or lightly-edited copy of a clip flips few
    delta bits; distinct clips differ in ~half of 63.

    ``max_band_df`` is the hot-bucket skew cut (the ``max_shingle_df``
    lever of the Jaccard family): delta-sign bits skew toward all-0 /
    all-1 chunks on homogeneous corpora, and one hot (band, chunk)
    bucket makes the candidate join quadratic (measured at sf1: 5e8
    candidate rows, 40x the sf0.1 wall clock). Buckets larger than the
    cut are dropped from candidate GENERATION only — a within-Hamming-8
    pair loses at most the 8 differing bands, so real near-dups still
    collide on a cooler band unless they agree ONLY on ultra-hot
    patterns. The default sits far above every observed bucket at the
    oracle gate and the bench SF (max 45 at sf0.01, ~460 at sf0.1), so
    results there are identical to the uncut form; the cut is the
    documented lossy lever beyond that."""
    sig = media_audio_fingerprints(assets).localCheckpoint()
    bands = sig.select("asset_id", "afp", _afp_bands_expr().alias("bb")).select(
        "asset_id",
        "afp",
        F.col("bb.band").alias("band"),
        F.col("bb.chunk").alias("chunk"),
    )
    if max_band_df is not None:
        hot = (
            bands.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_band_df)
            .select("band", "chunk")
        )
        bands = bands.join(hot, ["band", "chunk"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.afp").alias("sig_a"),
            F.col("b.afp").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("asset_a", "asset_b", "hamming")
        .orderBy("asset_a", "asset_b")
    )


def build_afp_index(
    assets: DataFrame, max_band_df: int | None = 2000
) -> tuple[DataFrame, DataFrame]:
    """Persistable audio-fingerprint index — ``(band_tbl, sig_tbl)``,
    the ``build_phash_index`` artifact for the audio modality. Hot
    (band, chunk) buckets beyond ``max_band_df`` are cut from the INDEX
    side (see ``audio_near_duplicates``) — the stream probe side needs
    no count state because the frozen index carries the cut."""
    sig = media_audio_fingerprints(assets).localCheckpoint()
    raw_bands = sig.select(
        F.col("asset_id").alias("index_asset_id"),
        _afp_bands_expr().alias("bb"),
    ).select(
        "index_asset_id",
        F.col("bb.band").alias("band"),
        F.col("bb.chunk").alias("chunk"),
    )
    if max_band_df is not None:
        hot = (
            raw_bands.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_band_df)
            .select("band", "chunk")
        )
        raw_bands = raw_bands.join(hot, ["band", "chunk"], "left_anti")
    band_tbl = raw_bands.localCheckpoint()
    index_sig = sig.select(
        F.col("asset_id").alias("index_asset_id"),
        F.col("afp").alias("index_afp"),
    ).localCheckpoint()
    return band_tbl, index_sig


def index_audio_near_duplicates(
    new_assets: DataFrame,
    band_tbl: DataFrame,
    index_sig: DataFrame,
    max_hamming: int = 8,
) -> DataFrame:
    """Ingestion-time audio near-dup probe — the stream-static twin of
    ``audio_near_duplicates`` (the ``index_phash_near_duplicates``
    composition): hash incoming clips, band, bucket-join the static
    index, verify by popcount. Pair emission dedups over the bands
    ACTUALLY PRESENT in the joined rows — NOT by the first colliding
    band of the raw fingerprints (the pHash probe's convention):
    ``build_afp_index`` cuts hot buckets from the index side, so a
    pair's first-colliding band may be absent from ``band_tbl`` while a
    cooler band survives; a raw-fingerprint first-band filter would
    then silently drop the pair, diverging from the batch twin's
    ``distinct``. Order matters for the shuffle: the popcount VERIFY
    runs map-side on the raw candidate rows and the dedup group-by
    shuffles only the surviving near-dup pairs (≤ 9 rows each) — a
    candidate-sized group-by instead measured 36 → 103 s at sf1.
    ``(asset_id, index_asset_id, hamming)``."""
    sig = media_audio_fingerprints(new_assets)
    banded = sig.select("asset_id", "afp", _afp_bands_expr().alias("bb")).select(
        "asset_id",
        "afp",
        F.col("bb.band").alias("band"),
        F.col("bb.chunk").alias("chunk"),
    )
    cand = banded.join(band_tbl, ["band", "chunk"]).join(
        index_sig, "index_asset_id"
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(
                F.col("afp").bitwiseXOR(F.col("index_afp"))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("asset_id", "index_asset_id")
        .agg(F.min("hamming").alias("hamming"))
        .select("asset_id", "index_asset_id", "hamming")
    )
