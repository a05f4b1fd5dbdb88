"""Arithmetic-coded JPEG entropy layer — ITU T.81 Annex D QM-coder and
Annex F sequential DCT conditioning, stdlib + numpy only.

Decoder: the adaptive binary arithmetic decoder per the T.81
flowcharts (INITDEC / BYTEIN / DECODE with MPS-LPS conditional
exchange / RENORMD, software conventions: the byte after a 0xFF
carries 7 payload bits under a stuffed 0 bit, and a marker feeds
1-bits), plus the sequential DC/AC statistical models of Annex F.1.4:
DC conditioned on the previous diff's class via the (L, U) bounds,
AC with per-k EOB/significance bins and magnitude-category trees
switched at Kx, sign in a non-adaptive bin. DAC segments override the
default conditioning (L=0, U=1, Kx=5). Wired into `decode_jpeg` for
SOF9 (arithmetic extended sequential, 8- and 12-bit) AND SOF10
(arithmetic progressive — the Annex G.2 band/bit-layer scans at the
bottom of this module).

Encoder (test-side twin): same state machine and contexts, but the
code register is an exact Python integer — interval-base additions
accumulate at full precision, so carry propagation is ordinary
addition instead of the spec's stacked-0xFF byte procedure, and the
final stream is serialized in one pass that applies the stuffed-bit
convention (after an emitted 0xFF the next byte holds 7 bits under a
0 bit). Any conformant decoder accepts the result; the byte-for-byte
output of the spec's streaming encoder is not reproduced (it flushes
incrementally), which is fine for a twin whose purpose is the
differential test: the arithmetic stream must decode to EXACTLY the
pixels of the Huffman stream built from the same `_coef_blocks`
coefficients.

State-estimation table: T.81 Table D.3 (Qe, NMPS, NLPS, SWITCH), 113
adaptive states plus the non-adaptive sign bin. Encoder/decoder
round-trips validate the machine's self-consistency over every
transition path exercised; decoding streams produced by OTHER
arithmetic encoders is structure-checked (markers, DAC, conditioning)
but has no external sample in this environment — noted so the caveat
travels with the code.

Reference parity: /root/reference has no image codecs; this extends
the engine's multimodal ingestion surface (brief: multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH). Index 113 is the
# non-adaptive sign bin used for sign decisions (F.1.4.4.1.2).
# NOTE (round 9): the original transcription had the NMPS/NLPS
# columns swapped — symmetric encode/decode kept every round-trip
# exact, but adaptation ran BACKWARDS (MPS re-attacked, LPS grew
# confident), costing ~10x on skewed streams and hitting a stuck
# 15-bit/symbol LPS loop at the Qe=0x0001 state. The monotonic
# self-check below now pins the correct orientation.
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # non-adaptive sign bin
)

# structural self-check: transitions in range, switch only on the
# high-Qe startup states (a transcription slip here would silently
# change compression behavior)
for _i, (_q, _nm, _nl, _sw) in enumerate(_QE):
    assert 0 < _q <= 0x5B12 and 0 <= _nm < len(_QE) and 0 <= _nl < len(_QE)
    assert not _sw or _q > 0x5000, _i
    if _i < 113:
        # orientation: MPS transitions grow confidence (Qe does not
        # increase); LPS transitions re-attack (Qe does not decrease)
        # except at SWITCH states, where the MPS flip IS the re-attack
        assert _QE[_nm][0] <= _q, _i
        assert _sw or _QE[_nl][0] >= _q, _i

FIXED_BIN = 113  # table index of the never-adapting sign state

# default conditioning (F.1.4.4.1.4)
DEFAULT_DC_COND = (0, 1)  # (L, U)
DEFAULT_AC_COND = 5  # Kx

DC_STAT_BINS = 64  # 0-19 per-class S0/SS/SP/SN, 20-33 X track, 34-47 M
AC_STAT_BINS = 256  # 3*(k-1) SE/S0/SP per k; X/M tracks at 189/217


def _sign_bin() -> bytearray:
    """One-byte context store holding the fixed sign state."""
    return bytearray([FIXED_BIN << 1])


class _ArithDecoder:
    """T.81 Annex D decoder (software conventions). A context store is
    a bytearray of (state_index << 1) | mps packed bytes."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.bp = pos
        b = self._byte(self.bp)
        self.c = b << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct = self.ct - 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        # running off the end behaves like a marker (feeds 1-bits), so
        # truncated streams surface as bounded garbage, not IndexError
        return self.data[i] if i < len(self.data) else 0xD9

    def _bytein(self) -> None:
        b = self._byte(self.bp)
        if b == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00  # marker: feed 1-bits, do not advance
                self.ct = 8
            else:
                # stuffed-bit convention: the byte after 0xFF carries
                # 7 payload bits below a stuffed 0
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, st: bytearray, idx: int, adapt: bool = True) -> int:
        s = st[idx]
        i, mps = s >> 1, s & 1
        qe, nmps, nlps, sw = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange (Figure D.21) + RENORMD
            if self.a < qe:
                d = mps
                i = nmps
            else:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                i = nlps
            self.a = qe
            if adapt:
                st[idx] = (i << 1) | mps
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                # MPS exchange (Figure D.22) + RENORMD
                if self.a < qe:
                    d = 1 - mps
                    if sw:
                        mps = 1 - mps
                    i = nlps
                else:
                    d = mps
                    i = nmps
                if adapt:
                    st[idx] = (i << 1) | mps
                self._renorm()
            else:
                d = mps
        return d

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break


class _ArithEncoder:
    """Annex D state machine with an exact integer code register.

    A follows the spec's 16-bit interval arithmetic decision for
    decision; C is a Python int shifted left on every renormalization,
    so interval-base additions never lose a carry. `finish` emits the
    bits of one value inside the final interval with the stuffed-bit
    byte packing the decoder's BYTEIN expects."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.nbits = 15  # INITDEC primes Chigh with 15 stream bits

    def encode(self, st: bytearray, idx: int, d: int, adapt: bool = True) -> None:
        s = st[idx]
        i, mps = s >> 1, s & 1
        qe, nmps, nlps, sw = _QE[i]
        a_top = self.a - qe
        # decoder geometry: bottom [0, Qe) is the renorm-to-Qe region,
        # top [Qe, A) the subtract region; conditional exchange puts
        # the MPS in whichever is wider
        if d == mps:
            if a_top & 0x8000:
                self.c += qe
                self.a = a_top
                return  # MPS without renorm: state unchanged
            if a_top < qe:
                self.a = qe  # exchange: MPS in bottom
            else:
                self.c += qe
                self.a = a_top
            if adapt:
                st[idx] = (nmps << 1) | mps
        else:
            if a_top < qe:
                self.c += qe  # exchange: LPS in top
                self.a = a_top
            else:
                self.a = qe
            if sw:
                mps = 1 - mps
            if adapt:
                st[idx] = (nlps << 1) | mps
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.nbits += 1
            if self.a & 0x8000:
                break

    def finish(self) -> bytes:
        """Serialize one value in [C, C+A) as a stuffed byte stream."""
        v = self.c + self.a - 1
        bits = format(v, "b").rjust(self.nbits, "0")
        if len(bits) > self.nbits:  # interval lives below 2^nbits
            raise AssertionError("arithmetic interval overflow")
        out = bytearray()
        i = 0
        while i < len(bits):
            take = 7 if (out and out[-1] == 0xFF) else 8
            chunk = bits[i : i + take]
            if len(chunk) < take:
                chunk = chunk + "1" * (take - len(chunk))  # 1-pad = marker feed
            out.append(int(chunk, 2))
            i += take
        # a trailing 0xFF would make the decoder read the marker as its
        # stuffed follower; the 1-feeding convention makes it droppable
        while out and out[-1] == 0xFF:
            out.pop()
        return bytes(out)


# ---------------------------------------------------------------------------
# Annex F.1.4 sequential statistical models. The decode procedures are
# the F.2.2.1/F.2.2.2 flows; each encode procedure is the exact mirror
# (same bins in the same order), which the round-trip differential
# tests hold to the Huffman twin's pixels.


def _dc_class(cat: int, sign: int, lo: int, up: int) -> int:
    """Next block's DC conditioning class from this diff's magnitude
    category and sign (F.1.4.4.1.2)."""
    if cat < ((1 << lo) >> 1):
        return 0
    if cat > ((1 << up) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def _decode_dc_diff(dec, st, ctx, lo, up):
    """→ (diff value, next conditioning class)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    bin_ = ctx + 2 + sign
    m = dec.decode(st, bin_)
    if m:
        # magnitude-category tree on the shared X track (bin 20+)
        m = 1
        x = 20
        while dec.decode(st, x):
            m <<= 1
            if m == 0x8000:
                raise ValueError("corrupt arithmetic JPEG: DC magnitude overflow")
            x += 1
        bin_ = x
    cat = m
    v = m
    mag = bin_ + 14
    while m > 1:
        m >>= 1
        if dec.decode(st, mag):
            v |= m
    v += 1
    if sign:
        v = -v
    return v, _dc_class(cat, sign, lo, up)


def _encode_dc_diff(enc, st, ctx, lo, up, diff):
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    m = (-diff if sign else diff) - 1
    bin_ = ctx + 2 + sign
    if m == 0:
        enc.encode(st, bin_, 0)
        cat = 0
    else:
        enc.encode(st, bin_, 1)
        cat = 1
        x = 20
        while (cat << 1) <= m:
            enc.encode(st, x, 1)
            cat <<= 1
            x += 1
        enc.encode(st, x, 0)
        bin_ = x
    mag = bin_ + 14
    mm = cat
    while mm > 1:
        mm >>= 1
        enc.encode(st, mag, 1 if (m & mm) else 0)
    return _dc_class(cat, sign, lo, up)


def _decode_ac_block(dec, st, sign_st, kx, blk) -> None:
    """AC coefficients (zigzag 1..63) into blk (F.2.2.2)."""
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > 63:
                raise ValueError("corrupt arithmetic JPEG: AC run past block")
            base = 3 * (k - 1)
        sign = dec.decode(sign_st, 0, adapt=False)
        bin_ = base + 2
        m = dec.decode(st, bin_)
        if m:
            if dec.decode(st, bin_):
                m = 2
                x = 189 if k <= kx else 217
                while dec.decode(st, x):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "corrupt arithmetic JPEG: AC magnitude overflow"
                        )
                    x += 1
                bin_ = x
        v = m
        mag = bin_ + 14
        while m > 1:
            m >>= 1
            if dec.decode(st, mag):
                v |= m
        v += 1
        blk[k] = -v if sign else v
        k += 1


def _encode_ac_block(enc, st, sign_st, kx, zz) -> None:
    last = 0
    for k in range(1, 64):
        if zz[k]:
            last = k
    k = 1
    while k <= last:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(sign_st, 0, sign, adapt=False)
        m = (-v if sign else v) - 1
        bin_ = base + 2
        if m == 0:
            enc.encode(st, bin_, 0)
            cat = 0
        else:
            enc.encode(st, bin_, 1)
            if m == 1:
                enc.encode(st, bin_, 0)
                cat = 1
            else:
                enc.encode(st, bin_, 1)
                cat = 2
                x = 189 if k <= kx else 217
                while (cat << 1) <= m:
                    enc.encode(st, x, 1)
                    cat <<= 1
                    x += 1
                enc.encode(st, x, 0)
                bin_ = x
        mag = bin_ + 14
        mm = cat
        while mm > 1:
            mm >>= 1
            enc.encode(st, mag, 1 if (m & mm) else 0)
        k += 1
    if last < 63:
        enc.encode(st, 3 * last, 1)  # EOB flag of position last+1


def decode_arith_scan(
    buf: bytes,
    pos: int,
    frame: dict,
    scan_sel: list[dict],
    qt: dict,
    dc_cond: dict,
    ac_cond: dict,
    restart_interval: int,
    native: bool = False,
    want_planes: bool = False,
) -> np.ndarray:
    """Interleaved sequential arithmetic scan → pixels (SOF9)."""
    from transferdb_spark.ext.jpeg import _A, _ZIGZAG, _planes_to_rgb

    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    # differential frames (Annex J): no level shift
    shift = 0.0 if frame.get("differential") else float(1 << (frame.get("prec", 8) - 1))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    sel = {s["id"]: s for s in scan_sel}
    for c in comps:
        if c["q"] not in qt:
            raise ValueError(f"missing quantization table {c['q']}")

    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]

    def fresh_state(p):
        return (
            _ArithDecoder(buf, p),
            {i: bytearray(DC_STAT_BINS) for i in {sel[c["id"]]["dc"] for c in comps}},
            {i: bytearray(AC_STAT_BINS) for i in {sel[c["id"]]["ac"] for c in comps}},
            _sign_bin(),
            [0] * len(comps),  # DC predictors
            [0] * len(comps),  # DC conditioning classes
        )

    dec, dc_st, ac_st, sign_st, last_dc, dc_ctx = fresh_state(pos)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # restart re-initializes the decoder AND all statistics
                # (T.81 F.2.1.3.2); scan forward for the RSTn marker
                p = dec.bp
                while p + 1 < len(buf) and not (
                    buf[p] == 0xFF and 0xD0 <= buf[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= len(buf):
                    raise ValueError("truncated arithmetic JPEG: missing restart")
                dec, dc_st, ac_st, sign_st, last_dc, dc_ctx = fresh_state(p + 2)
            for ci, c in enumerate(comps):
                s = sel[c["id"]]
                lo, up = dc_cond.get(s["dc"], DEFAULT_DC_COND)
                kx = ac_cond.get(s["ac"], DEFAULT_AC_COND)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        diff, dc_ctx[ci] = _decode_dc_diff(
                            dec, dc_st[s["dc"]], dc_ctx[ci], lo, up
                        )
                        last_dc[ci] += diff
                        zz[0] = last_dc[ci]
                        _decode_ac_block(dec, ac_st[s["ac"]], sign_st, kx, zz)
                        deq = np.zeros(64, dtype=np.float64)
                        deq[_ZIGZAG] = zz * qt[c["q"]]
                        px = _A.T @ deq.reshape(8, 8) @ _A + shift
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu += 1

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = p.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if want_planes:
        if frame.get("differential"):
            return [np.rint(p).astype(np.int64) & 0xFFFF for p in full], dec.bp
        maxv = (1 << frame.get("prec", 8)) - 1
        return [
            np.clip(np.rint(p), 0, maxv).astype(np.int64) for p in full
        ], dec.bp
    return _planes_to_rgb(full, frame.get("prec", 8), native)


def encode_jpeg_arith(px: np.ndarray, prec: int = 8) -> bytes:
    """(h, w, 3) samples → arithmetic-coded extended sequential JPEG
    (SOF9, 4:4:4). Shares `_coef_blocks` with the Huffman encoders, so
    decoding this stream must yield pixels bit-identical to the
    Huffman stream of the same image. Default conditioning is
    serialized in an explicit DAC segment so the parse path runs."""
    from transferdb_spark.ext.jpeg import _coef_blocks, _dqt_segments, _sof_segment

    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB samples")
    if prec not in (8, 12):
        raise ValueError("prec must be 8 or 12")
    h, w = px.shape[:2]
    coefs = _coef_blocks(px, prec=prec)

    out = bytearray(b"\xff\xd8")
    out += _dqt_segments(prec=prec)
    out += _sof_segment(0xC9, h, w, prec=prec)
    lo, up = DEFAULT_DC_COND
    dc_val = (up << 4) | lo
    out += b"\xff\xcc" + struct.pack(">H", 2 + 8)
    out += bytes(
        [0x00, dc_val, 0x01, dc_val, 0x10, DEFAULT_AC_COND, 0x11, DEFAULT_AC_COND]
    )
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tids in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tids])
    out += b"\x00\x3f\x00"

    enc = _ArithEncoder()
    dc_st = {0: bytearray(DC_STAT_BINS), 1: bytearray(DC_STAT_BINS)}
    ac_st = {0: bytearray(AC_STAT_BINS), 1: bytearray(AC_STAT_BINS)}
    sign_st = _sign_bin()
    last_dc = [0, 0, 0]
    dc_ctx = [0, 0, 0]
    bh, bw = coefs[0].shape[:2]
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):
                t = 0 if ci == 0 else 1
                zz = coefs[ci][by, bx]
                diff = int(zz[0]) - last_dc[ci]
                last_dc[ci] = int(zz[0])
                dc_ctx[ci] = _encode_dc_diff(enc, dc_st[t], dc_ctx[ci], lo, up, diff)
                _encode_ac_block(enc, ac_st[t], sign_st, DEFAULT_AC_COND, zz)
    out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Annex G.2 — PROGRESSIVE arithmetic coding (SOF10). Each scan carries
# one band/bit layer exactly like Huffman progressive (jpeg.py SOF2),
# but entropy-coded with the QM machine above:
#   - DC first scans: the sequential DC model over point-transformed
#     (>> Al) diffs;
#   - DC refinement: ONE decision per block in a fixed (non-adaptive)
#     0.5 bin — bit Al of the DC value;
#   - AC first scans: the sequential AC model bounded to Ss..Se,
#     values scaled << Al;
#   - AC refinement: per coefficient position, an EOB decision (only
#     once past the highest nonzero-HISTORY index), st+1 for newly
#     significant (sign in the fixed bin), st+2 as the adaptive
#     correction-bit bin for coefficients with history.
# Statistics areas and the decoder are re-initialized per scan and at
# every restart marker (G.2 inherits F.2.1.3.2). No EOB-runs exist in
# the arithmetic form — the per-block EOB decision replaces them.


def _decode_ac_first_band(dec, st, sign_st, kx, blk, ss, se, al) -> None:
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB: band done
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG: AC run past band")
            base = 3 * (k - 1)
        sign = dec.decode(sign_st, 0, adapt=False)
        bin_ = base + 2
        m = dec.decode(st, bin_)
        if m:
            if dec.decode(st, bin_):
                m = 2
                x = 189 if k <= kx else 217
                while dec.decode(st, x):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "corrupt arithmetic JPEG: AC magnitude overflow"
                        )
                    x += 1
                bin_ = x
        v = m
        mag = bin_ + 14
        while m > 1:
            m >>= 1
            if dec.decode(st, mag):
                v |= m
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def _decode_ac_refine_band(dec, st, sign_st, blk, ss, se, al) -> None:
    p1, m1 = 1 << al, -(1 << al)
    kex = ss - 1
    for k in range(ss, se + 1):
        if int(blk[k]) != 0:
            kex = k
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex:
            if dec.decode(st, base):  # EOB: no more decisions at all
                return
        while True:
            c = int(blk[k])
            if c != 0:
                if dec.decode(st, base + 2):  # adaptive correction bin
                    blk[k] = c + (p1 if c >= 0 else m1)
                break
            if dec.decode(st, base + 1):
                sign = dec.decode(sign_st, 0, adapt=False)
                blk[k] = m1 if sign else p1
                break
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG: refine run past band")
            base = 3 * (k - 1)
        k += 1


def decode_arith_prog_scan(
    buf: bytes,
    pos: int,
    frame: dict,
    scan_sel: list[dict],
    dc_cond: dict,
    ac_cond: dict,
    restart_interval: int,
    coef: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode one progressive arithmetic SOS into `coef` (in place);
    returns the position reached in the entropy stream (caller skips
    to the next marker, same contract as the Huffman progressive
    path)."""
    from transferdb_spark.ext.jpeg import _mcu_geometry

    comps = frame["comps"]
    idx = {c["id"]: ci for ci, c in enumerate(comps)}
    hmax, vmax, mcux, mcuy = _mcu_geometry(frame)
    if (ss == 0) != (se == 0):
        raise ValueError("progressive scan mixes DC and AC bands")
    if ss > 0 and len(scan_sel) != 1:
        raise ValueError("progressive AC scan must be single-component")

    def fresh(p):
        return (
            _ArithDecoder(buf, p),
            {s["dc"]: bytearray(DC_STAT_BINS) for s in scan_sel},
            {s["ac"]: bytearray(AC_STAT_BINS) for s in scan_sel},
            _sign_bin(),
            [0] * len(comps),  # DC predictors
            [0] * len(comps),  # DC conditioning classes
        )

    dec, dc_st, ac_st, sign_st, pred, dc_ctx = fresh(pos)

    if len(scan_sel) > 1:  # interleaved DC scan
        units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]

        def decode_unit(unit):
            my, mx = unit
            for s in scan_sel:
                ci = idx[s["id"]]
                c = comps[ci]
                lo, up = dc_cond.get(s["dc"], DEFAULT_DC_COND)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = coef[ci][my * c["v"] + by, mx * c["h"] + bx]
                        if ah == 0:
                            diff, dc_ctx[ci] = _decode_dc_diff(
                                dec, dc_st[s["dc"]], dc_ctx[ci], lo, up
                            )
                            pred[ci] += diff
                            blk[0] = pred[ci] << al
                        elif dec.decode(sign_st, 0, adapt=False):
                            blk[0] = int(blk[0]) | (1 << al)

    else:
        s = scan_sel[0]
        ci = idx[s["id"]]
        c = comps[ci]
        cw = -(-(frame["w"] * c["h"]) // hmax)
        ch = -(-(frame["h"] * c["v"]) // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        units = [(by, bx) for by in range(bh) for bx in range(bw)]
        if ss == 0:
            lo, up = dc_cond.get(s["dc"], DEFAULT_DC_COND)

            def decode_unit(unit):
                blk = coef[ci][unit]
                if ah == 0:
                    diff, dc_ctx[ci] = _decode_dc_diff(
                        dec, dc_st[s["dc"]], dc_ctx[ci], lo, up
                    )
                    pred[ci] += diff
                    blk[0] = pred[ci] << al
                elif dec.decode(sign_st, 0, adapt=False):
                    blk[0] = int(blk[0]) | (1 << al)

        else:
            kx = ac_cond.get(s["ac"], DEFAULT_AC_COND)
            if ah == 0:

                def decode_unit(unit):
                    _decode_ac_first_band(
                        dec, ac_st[s["ac"]], sign_st, kx, coef[ci][unit], ss, se, al
                    )

            else:

                def decode_unit(unit):
                    _decode_ac_refine_band(
                        dec, ac_st[s["ac"]], sign_st, coef[ci][unit], ss, se, al
                    )

    for n, unit in enumerate(units):
        if restart_interval and n and n % restart_interval == 0:
            # restart: decoder AND statistics re-initialize (F.2.1.3.2)
            p = dec.bp
            while p + 1 < len(buf) and not (
                buf[p] == 0xFF and 0xD0 <= buf[p + 1] <= 0xD7
            ):
                p += 1
            if p + 1 >= len(buf):
                raise ValueError("truncated arithmetic JPEG: missing restart")
            dec, dc_st, ac_st, sign_st, pred, dc_ctx = fresh(p + 2)
        decode_unit(unit)
    return dec.bp


def _encode_ac_first_band(enc, st, sign_st, kx, zz, ss, se, al) -> None:
    ke = ss - 1
    for k in range(ss, se + 1):
        if abs(int(zz[k])) >> al:
            ke = k
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while (abs(int(zz[k])) >> al) == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(sign_st, 0, sign, adapt=False)
        m = (abs(v) >> al) - 1
        bin_ = base + 2
        if m == 0:
            enc.encode(st, bin_, 0)
            cat = 0
        else:
            enc.encode(st, bin_, 1)
            if m == 1:
                enc.encode(st, bin_, 0)
                cat = 1
            else:
                enc.encode(st, bin_, 1)
                cat = 2
                x = 189 if k <= kx else 217
                while (cat << 1) <= m:
                    enc.encode(st, x, 1)
                    cat <<= 1
                    x += 1
                enc.encode(st, x, 0)
                bin_ = x
        mag = bin_ + 14
        mm = cat
        while mm > 1:
            mm >>= 1
            enc.encode(st, mag, 1 if (m & mm) else 0)
        k += 1
    if ke < se:
        enc.encode(st, 3 * (max(ke + 1, ss) - 1), 1)  # EOB decision


def _encode_ac_refine_band(enc, st, sign_st, zz, ss, se, al) -> None:
    t = [abs(int(zz[k])) >> al for k in range(64)]
    ke = ss - 1
    kex = ss - 1
    for k in range(ss, se + 1):
        if t[k]:
            ke = k
        if t[k] > 1:
            kex = k
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(st, base, 0)  # not EOB
        while True:
            if t[k]:
                if t[k] > 1:  # history: adaptive correction bit
                    enc.encode(st, base + 2, t[k] & 1)
                else:  # newly significant
                    enc.encode(st, base + 1, 1)
                    enc.encode(sign_st, 0, 1 if int(zz[k]) < 0 else 0, adapt=False)
                break
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        k += 1
    if ke < se:
        enc.encode(st, 3 * (max(ke + 1, ss) - 1), 1)


def encode_jpeg_arith_progressive(px: np.ndarray, prec: int = 8) -> bytes:
    """(h, w, 3) samples → arithmetic-coded PROGRESSIVE JPEG (SOF10,
    4:4:4), the same 14-scan script as encode_jpeg_progressive
    (interleaved DC at Al=1 + refinement, two AC bands per component
    at Al=1 + refinements). Coefficients come from the shared
    `_coef_blocks` quantizer, so decoding this stream must match the
    Huffman progressive and baseline pixels bit-for-bit."""
    from transferdb_spark.ext.jpeg import _coef_blocks, _dqt_segments, _sof_segment

    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB samples")
    if prec not in (8, 12):
        raise ValueError("prec must be 8 or 12")
    h, w = px.shape[:2]
    coefs = _coef_blocks(px, prec=prec)

    out = bytearray(b"\xff\xd8")
    out += _dqt_segments(prec=prec)
    out += _sof_segment(0xCA, h, w, prec=prec)
    lo, up = DEFAULT_DC_COND
    dc_val = (up << 4) | lo
    out += b"\xff\xcc" + struct.pack(">H", 2 + 8)
    out += bytes(
        [0x00, dc_val, 0x01, dc_val, 0x10, DEFAULT_AC_COND, 0x11, DEFAULT_AC_COND]
    )

    bands = ((1, 5), (6, 63))
    scans: list[tuple] = [("dc_first", None, 0, 0, 0, 1), ("dc_refine", None, 0, 0, 1, 0)]
    for ci in range(3):
        for ss, se in bands:
            scans.append(("ac_first", ci, ss, se, 0, 1))
    for ci in range(3):
        for ss, se in bands:
            scans.append(("ac_refine", ci, ss, se, 1, 0))

    bh, bw = coefs[0].shape[:2]
    for kind, ci, ss, se, ah, al in scans:
        in_scan = [0, 1, 2] if ci is None else [ci]
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(in_scan), len(in_scan))
        for c in in_scan:
            t = 0 if c == 0 else 1
            out += bytes([c + 1, (t << 4) | t])
        out += bytes([ss, se, (ah << 4) | al])

        enc = _ArithEncoder()
        dc_st = {0: bytearray(DC_STAT_BINS), 1: bytearray(DC_STAT_BINS)}
        ac_st = {0: bytearray(AC_STAT_BINS), 1: bytearray(AC_STAT_BINS)}
        sign_st = _sign_bin()
        pred = [0, 0, 0]
        dc_ctx = [0, 0, 0]
        if kind == "dc_first":
            for by in range(bh):
                for bx in range(bw):
                    for c in in_scan:
                        t = 0 if c == 0 else 1
                        v = int(coefs[c][by, bx][0]) >> al
                        diff = v - pred[c]
                        pred[c] = v
                        dc_ctx[c] = _encode_dc_diff(
                            enc, dc_st[t], dc_ctx[c], lo, up, diff
                        )
        elif kind == "dc_refine":
            for by in range(bh):
                for bx in range(bw):
                    for c in in_scan:
                        bit = (int(coefs[c][by, bx][0]) >> al) & 1
                        enc.encode(sign_st, 0, bit, adapt=False)
        elif kind == "ac_first":
            t = 0 if ci == 0 else 1
            for by in range(bh):
                for bx in range(bw):
                    _encode_ac_first_band(
                        enc, ac_st[t], sign_st, DEFAULT_AC_COND,
                        coefs[ci][by, bx], ss, se, al,
                    )
        else:  # ac_refine
            t = 0 if ci == 0 else 1
            for by in range(bh):
                for bx in range(bw):
                    _encode_ac_refine_band(
                        enc, ac_st[t], sign_st, coefs[ci][by, bx], ss, se, al
                    )
        out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Annex H.2 — LOSSLESS arithmetic coding (SOF11). The DC statistical
# model generalized to two dimensions: the context for each sample's
# prediction difference is the pair of 5-way conditioning classes
# (zero / ±small / ±large, via the DAC (L,U) parameters exactly as in
# DC coding) of the difference coded to the LEFT (Da) and ABOVE (Db)
# — 25 contexts × (S0, SS, SP, SN). Two magnitude-track sets (X/M)
# are kept, selected by whether Db is in a large class; tracks are 32
# bins (16-bit differences → categories to 2^14). At line starts and
# after restarts the missing neighbor classes are zero, on both the
# encode and decode paths.

LL_STAT_BINS = 164  # 25×4 contexts (0-99), track A X/M 100-131, track B 132-163
LL_TRACK_A = 100
LL_TRACK_B = 132


def _ll_ctx(ca: int, cb: int) -> int:
    return 4 * (5 * ca + cb)


def _ll_track(cb: int) -> int:
    return LL_TRACK_B if cb >= 3 else LL_TRACK_A


def _decode_ll_diff(dec, st, ctx, xbase, lo, up):
    """→ (difference in [-32768, 32767], conditioning class 0..4)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    bin_ = ctx + 2 + sign
    m = dec.decode(st, bin_)
    if m:
        m = 1
        x = xbase
        while dec.decode(st, x):
            m <<= 1
            if m == 0x10000:
                raise ValueError(
                    "corrupt arithmetic JPEG: lossless magnitude overflow"
                )
            x += 1
        bin_ = x
    cat = m
    v = m
    mag = bin_ + 16
    while m > 1:
        m >>= 1
        if dec.decode(st, mag):
            v |= m
    v += 1
    if sign:
        v = -v
    return v, _dc_class(cat, sign, lo, up) // 4


def _encode_ll_diff(enc, st, ctx, xbase, lo, up, diff):
    """Mirror of _decode_ll_diff; returns the conditioning class."""
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    m = (-diff if sign else diff) - 1
    bin_ = ctx + 2 + sign
    if m == 0:
        enc.encode(st, bin_, 0)
        cat = 0
    else:
        enc.encode(st, bin_, 1)
        cat = 1
        x = xbase
        while (cat << 1) <= m:
            enc.encode(st, x, 1)
            cat <<= 1
            x += 1
        enc.encode(st, x, 0)
        bin_ = x
    mag = bin_ + 16
    mm = cat
    while mm > 1:
        mm >>= 1
        enc.encode(st, mag, 1 if (m & mm) else 0)
    return _dc_class(cat, sign, lo, up) // 4


def encode_jpeg_lossless_arith(
    px: np.ndarray, predictor: int = 1, pt: int = 0, prec: int | None = None
) -> bytes:
    """Integer samples → SOF11 arithmetic lossless JPEG — the QM-coded
    twin of encode_jpeg_lossless: same predictors, same mod-2^16
    difference arithmetic, NO color transform (Annex H has no color
    model), so decode_jpeg_native must reproduce the input exactly.
    All components share conditioning table 0; default (L,U) is
    serialized in an explicit DAC segment."""
    from transferdb_spark.ext.jpeg import _LL_PREDICT, _sof_segment

    if px.ndim == 2:
        planes = [px]
    elif px.ndim == 3 and px.shape[2] == 3:
        planes = [px[:, :, ci] for ci in range(3)]
    else:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) samples")
    if prec is None:
        prec = 8 if px.dtype == np.uint8 else 16
    if not 2 <= prec <= 16:
        raise ValueError("prec must be in 2..16")
    if predictor not in _LL_PREDICT:
        raise ValueError(f"invalid lossless predictor {predictor}")
    h, w = px.shape[:2]
    comps = [(p.astype(np.int64) >> pt).astype(np.int64) for p in planes]
    ncomp = len(comps)
    predict = _LL_PREDICT[predictor]
    default_pred = 1 << (prec - pt - 1)
    lo, up = DEFAULT_DC_COND

    out = bytearray(b"\xff\xd8")
    out += _sof_segment(0xCB, h, w, prec=prec, ncomp=ncomp)
    out += b"\xff\xcc" + struct.pack(">H", 2 + 2)
    out += bytes([0x00, (up << 4) | lo])
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x00])  # conditioning table 0 for all
    out += bytes([predictor, 0, pt])

    enc = _ArithEncoder()
    st = bytearray(LL_STAT_BINS)
    cls_above = [np.zeros(w, dtype=np.int64) for _ in comps]
    cls_left = [0] * ncomp
    for y in range(h):
        for ci in range(ncomp):
            cls_left[ci] = 0
        for x in range(w):
            for ci, samples in enumerate(comps):
                if (y, x) == (0, 0):
                    pred = default_pred
                elif y == 0:
                    pred = int(samples[0, x - 1])
                elif x == 0:
                    pred = int(samples[y - 1, 0])
                else:
                    pred = predict(
                        int(samples[y, x - 1]),
                        int(samples[y - 1, x]),
                        int(samples[y - 1, x - 1]),
                    )
                diff = (int(samples[y, x]) - pred) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                ca, cb = cls_left[ci], int(cls_above[ci][x])
                k = _encode_ll_diff(
                    enc, st, _ll_ctx(ca, cb), _ll_track(cb), lo, up, diff
                )
                cls_left[ci] = k
                cls_above[ci][x] = k
    out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)
