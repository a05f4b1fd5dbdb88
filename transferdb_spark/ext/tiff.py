"""Baseline TIFF decode — stdlib + numpy, like every codec here.

Scanned-document and scientific corpora ship TIFF; this covers the
baseline 6.0 profile that appears in practice: both byte orders
(II/MM), 8-bit grayscale and RGB, strip layout (any RowsPerStrip),
chunky planar config, and the three baseline compressions — none (1),
LZW (5, MSB-first with early-change code-width bumps), and PackBits
(32773). Tiled TIFF, 16-bit, and planar=2 route to the usual
NotImplementedError dispatch point. Spec: TIFF 6.0 (public, Adobe
1992); LZW per spec §13 — note TIFF LZW differs from GIF LZW (GIF is
LSB-first without early change; ext/multimodal._decode_gif holds that
variant, this module holds this one — shared code would obscure both).

Encoder twin (uncompressed / PackBits / LZW) exists for differential
tests, same stance as the JPEG/PNG/MJPEG twins. Torn bytes raise
ValueError at the ingestion boundary.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_tiff(buf: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8 RGB (grayscale replicated)."""
    try:
        return _decode_tiff(buf)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or corrupt TIFF: {exc!r}") from exc


def _decode_tiff(buf: bytes) -> np.ndarray:
    if buf[:4] == b"II*\x00":
        e = "<"
    elif buf[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order header)")
    (ifd_off,) = struct.unpack_from(f"{e}I", buf, 4)
    n = struct.unpack_from(f"{e}H", buf, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", buf, off)
        size = TYPE_SIZE.get(typ, 1) * cnt
        voff = off + 8 if size <= 4 else struct.unpack_from(f"{e}I", buf, off + 8)[0]
        if typ == 3:
            vals = list(struct.unpack_from(f"{e}{cnt}H", buf, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(f"{e}{cnt}I", buf, voff))
        elif typ == 1:
            vals = list(buf[voff : voff + cnt])
        else:
            vals = []
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    comp = one(259, 1)
    spp = one(277, 1)
    bps = tags.get(258, [8])
    planar = one(284, 1)
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bits-per-sample {bps} (only 8-bit)")
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, h)

    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(buf):
            raise ValueError(f"strip at {off}+{cnt} runs past EOF")
        strip = buf[off : off + cnt]
        nrows = min(rows_per_strip, h - len(raw) // (w * spp))
        if comp == 1:
            raw += strip
        elif comp == 32773:
            raw += _unpackbits(strip)
        elif comp == 5:
            raw += _lzw_decode(strip, nrows * w * spp)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
    need = h * w * spp
    if len(raw) < need:
        raise ValueError(f"TIFF pixel data short: {len(raw)} < {need}")
    px = np.frombuffer(bytes(raw[:need]), np.uint8).reshape(h, w, spp)
    # predictor 2 (horizontal differencing) — common with LZW
    if one(317, 1) == 2:
        px = np.cumsum(px.astype(np.uint16), axis=1).astype(np.uint8)
    if spp == 1:
        px = np.repeat(px, 3, axis=-1)
    elif spp > 3:
        px = px[:, :, :3]  # drop alpha/extra samples
    return np.ascontiguousarray(px)


def _unpackbits(data: bytes) -> bytearray:
    """PackBits (TIFF §9 / Apple RLE)."""
    out = bytearray()
    i = 0
    while i < len(data):
        c = data[i]
        i += 1
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return out


def _lzw_decode(data: bytes, expected: int) -> bytearray:
    """TIFF LZW (§13): MSB-first bit packing, clear=256, EOI=257,
    code width bumps at 2^n - 1 (the 'early change')."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"LZW code {code} beyond table")
            out += entry
            prev = entry
            # early change, decoder side: the decode table lags the
            # encode table by ONE entry (the first code after CLEAR
            # adds nothing), so it must widen one entry earlier for
            # the widths to stay in lockstep
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
            if len(out) >= expected:
                return out
    return out


# ---------------------------------------------------------------------------
# encoder twin (tests / re-encode sink)


def _lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit(CLEAR)
    s = b""
    for b in data:
        c = s + bytes([b])
        if c in table:
            s = c
            continue
        emit(table[s])
        table[c] = nxt
        nxt += 1
        s = bytes([b])
        if nxt == (1 << width) - 1 and width < 12:  # early change (writer side)
            width += 1
        elif nxt == (1 << 12) - 1:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
    if s:
        emit(table[s])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def encode_tiff(
    px: np.ndarray,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """(h, w[, 3]) uint8 → baseline TIFF (compression 1/5/32773;
    predictor=2 applies horizontal differencing before compression —
    the form LZW scans ship in practice)."""
    if px.ndim == 2:
        px = px[:, :, None]
    if predictor == 2:
        px = np.concatenate(
            [px[:, :1], (px[:, 1:].astype(np.int16) - px[:, :-1]) % 256], axis=1
        ).astype(np.uint8)
    h, w, spp = px.shape
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        raw = px[y0 : y0 + rps].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_lzw_encode(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            raise NotImplementedError(f"encode compression {compression}")

    header = (b"II*\x00" if not big_endian else b"MM\x00*") + struct.pack(f"{e}I", 8)
    entries = []

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(256, 3, [w])
    entry(257, 3, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [compression])
    entry(262, 3, [1 if spp == 1 else 2])
    entry(273, 4, [0] * len(strips))  # patched below
    entry(277, 3, [spp])
    entry(278, 3, [rps])
    entry(279, 4, [len(s) for s in strips])
    entry(284, 3, [1])
    if predictor == 2:
        entry(317, 3, [2])
    entries.sort()

    TYPE_SIZE = {3: 2, 4: 4}
    ifd_off = 8
    n = len(entries)
    extra_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    fixed = []
    for tag, typ, vals in entries:
        size = TYPE_SIZE[typ] * len(vals)
        if size <= 4:
            packed = struct.pack(f"{e}{len(vals)}{'H' if typ == 3 else 'I'}", *vals)
            fixed.append((tag, typ, len(vals), packed.ljust(4, b"\x00"), None))
        else:
            fixed.append((tag, typ, len(vals), extra_off + len(extra), vals))
            extra += struct.pack(f"{e}{len(vals)}{'H' if typ == 3 else 'I'}", *vals)
    data_off = extra_off + len(extra)
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    # rebuild with patched strip offsets
    out = bytearray(header)
    out += struct.pack(f"{e}H", n)
    extra = bytearray()
    for tag, typ, cnt, val, vals in fixed:
        if tag == 273:
            if vals is None:  # single strip: patch the INLINE value
                val = struct.pack(f"{e}I", offsets[0])
            else:
                vals = offsets
        if vals is None:
            out += struct.pack(f"{e}HHI", tag, typ, cnt) + val
        else:
            out += struct.pack(f"{e}HHI", tag, typ, cnt)
            out += struct.pack(f"{e}I", extra_off + len(extra))
            extra += struct.pack(f"{e}{cnt}{'H' if typ == 3 else 'I'}", *vals)
    out += struct.pack(f"{e}I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
