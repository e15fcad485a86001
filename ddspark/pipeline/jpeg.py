"""Dependency-free baseline JPEG (JFIF) codec.

Completes the image-codec set (BMP/PPM/PNG in :mod:`.multimodal`): a real
ITU-T T.81 *baseline sequential* decoder — marker walk, DQT/DHT/SOF0/SOS
parsing, byte-unstuffed Huffman bitstream, DC-diff + AC run-length entropy
decode, dequantize, de-zigzag, float IDCT, chroma upsampling, YCbCr->RGB —
plus an encoder used to synthesize deterministic test media.

Decoder scope: baseline DCT (SOF0), 8-bit samples, Huffman entropy coding,
1 or 3 components, any sampling factors h,v in {1,2}, restart intervals.
Progressive (SOF2) and arithmetic coding raise with the marker name.

The encoder writes 4:4:4 with the Annex K quantisation tables (quality
scaling per the libjpeg formula) but its OWN canonical Huffman tables
(fixed-length codes covering every symbol class, all-ones codeword unused
as the spec requires) embedded in DHT segments — the decoder reads ANY
valid DHT generically, so decode correctness does not depend on reciting
the spec's example AC tables.  Quantisation rounds half away from zero and
the final sample reconstruction uses floor(x+0.5), so a flat 8x8 tile has
an exact closed form (DC-only: recon = q00*round8(8*(c-128)/q00)), which
is what the driver oracle replays in SQL.

At 100 TB this slots into the same Arrow-batched ``mapInPandas`` decode
stage as the other codecs: blobs stay page-compressed in their own parquet
column, only ``(id, blob)`` crosses the Python boundary, per-image work is
NumPy.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "apply_orientation"]

# Decompression-bomb guard, same rationale and value as
# multimodal.MAX_DECODE_PIXELS: a corrupt SOF dimension byte must not
# turn a KB blob into a multi-GB plane allocation.
MAX_DECODE_PIXELS = 1 << 26


def _zigzag_order() -> np.ndarray:
    """The 8x8 zigzag scan order, derived (not recited): diagonals of
    constant x+y, alternating direction, up-right first."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(diag)
    idx = np.array([y * 8 + x for y, x in order], dtype=np.int64)
    assert len(set(idx.tolist())) == 64
    return idx


_ZIGZAG = _zigzag_order()          # zigzag position -> raster index
_UNZIGZAG = np.argsort(_ZIGZAG)    # raster index -> zigzag position

# ITU-T T.81 Annex K.1/K.2 example quantisation tables (raster order)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 keeps the table as-is."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def _idct(coeff: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coeff @ _DCT_M


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


# ---------------------------------------------------------------- Huffman

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


# Encoder-side tables: every symbol at one fixed length, canonical codes.
# 12 DC categories at 4 bits leaves code 0b1111 unused; 162 AC symbols at
# 8 bits leave 0xFF unused — the all-ones codeword of every length stays
# reserved, as baseline JPEG requires.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]
_AC_VALS = sorted(_AC_SYMBOLS)
_ENC_DC = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def pad_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def put_marker(self, marker: int) -> None:
        self.pad_align()
        self.buf += bytes((0xFF, marker))  # raw marker: never byte-stuffed

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.buf)


class _BitReader:
    """Windowed bit reader over byte-stuffed entropy data: bytes fill an
    integer accumulator in bulk, reads are shifts — no per-bit Python
    calls.  Filling stops (without consuming) at any real marker, so
    restart/EOI markers stay at ``pos`` for the caller to handle."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill_to(self, n: int) -> None:
        data, pos = self.data, self.pos
        end = len(data)
        # trim consumed high bits so acc stays a small int forever
        acc, nbits = self.acc & ((1 << self.nbits) - 1), self.nbits
        # greedy: buffer well past the request so each symbol+magnitude
        # pair usually costs ZERO fill calls, not one or two — filling
        # stops at markers without consuming them either way
        n = n if n > 48 else 48
        while nbits < n and pos < end:
            b = data[pos]
            if b == 0xFF:
                if pos + 1 < end and data[pos + 1] == 0x00:
                    pos += 2  # stuffed data byte
                else:
                    break  # real marker: leave it for the caller
            else:
                pos += 1
            acc = (acc << 8) | b
            nbits += 8
        self.pos, self.acc, self.nbits = pos, acc, nbits

    def peek(self, n: int) -> tuple[int, int]:
        """(value, avail): the next ``min(n, avail)`` bits left-justified
        into an n-bit field (missing low bits zero)."""
        if self.nbits < n:
            self._fill_to(n)
        if self.nbits >= n:
            return (self.acc >> (self.nbits - n)) & ((1 << n) - 1), n
        return (self.acc << (n - self.nbits)) & ((1 << n) - 1), self.nbits

    def skip(self, n: int) -> None:
        if n > self.nbits:
            raise ValueError("JPEG entropy stream exhausted")
        self.nbits -= n

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        v, avail = self.peek(n)
        if avail < n:
            raise ValueError("JPEG entropy stream exhausted")
        self.nbits -= n
        return v

    def bit(self) -> int:
        return self.bits(1)

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _HuffTree:
    """Canonical decode: one 8-bit lookup table for short codes (the vast
    majority), arithmetic compare-walk over a peeked 16-bit window for the
    rest — no per-bit calls either way."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.min_code, self.max_code, self.val_ptr = {}, {}, {}
        code, k = 0, 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.min_code[ln] = code
                self.val_ptr[ln] = k
                code += n
                k += n
                self.max_code[ln] = code - 1
            code <<= 1
        self.vals = vals
        # 8-bit LUT: index = next 8 bits, value = (symbol, code length)
        self.lut: list[tuple[int, int] | None] = [None] * 256
        for ln in range(1, 9):
            if ln not in self.max_code:
                continue
            for c in range(self.min_code[ln], self.max_code[ln] + 1):
                sym = self.vals[self.val_ptr[ln] + c - self.min_code[ln]]
                base = c << (8 - ln)
                for i in range(1 << (8 - ln)):
                    self.lut[base + i] = (sym, ln)

    def decode_mag(self, br: _BitReader) -> tuple[int, int]:
        """(symbol, EXTENDed magnitude) with one 24-bit peek serving both
        the Huffman code and its magnitude bits in the common short-code
        case (code <= 8 bits + size <= 15 bits fits the window).  The low
        nibble of the symbol is the magnitude size for AC run/size pairs,
        and equals the whole symbol for DC categories (<= 11), so one
        helper serves both; size 0 (EOB/ZRL/zero diff) reads no extra
        bits, exactly like the split decode() + bits() calls."""
        v, avail = br.peek(24)
        hit = self.lut[v >> 16]
        if hit is not None:
            sym, ln = hit
            sz = sym & 0xF
            need = ln + sz
            if need <= avail:
                br.nbits -= need
                if sz == 0:
                    return sym, 0
                mag = (v >> (24 - need)) & ((1 << sz) - 1)
                return sym, (
                    mag if mag >= (1 << (sz - 1)) else mag - (1 << sz) + 1
                )
        sym = self.decode(br)
        sz = sym & 0xF
        if sz == 0:
            return sym, 0
        mag = br.bits(sz)
        return sym, mag if mag >= (1 << (sz - 1)) else mag - (1 << sz) + 1

    def decode(self, br: _BitReader) -> int:
        v, avail = br.peek(8)
        hit = self.lut[v]
        if hit is not None and hit[1] <= avail:
            br.nbits -= hit[1]
            return hit[0]
        if hit is not None:  # short code but the stream is truncated
            raise ValueError("JPEG entropy stream exhausted")
        v16, avail16 = br.peek(16)
        for ln in range(9, 17):
            if ln not in self.max_code:
                continue
            code = v16 >> (16 - ln)
            if code <= self.max_code[ln]:
                if code < self.min_code[ln]:
                    break  # an invalid stream, not a longer code
                if ln > avail16:
                    raise ValueError("JPEG entropy stream exhausted")
                br.nbits -= ln
                return self.vals[self.val_ptr[ln] + code - self.min_code[ln]]
        raise ValueError("invalid JPEG Huffman code")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_magnitude(w: _BitWriter, v: int) -> None:
    s = _category(v)
    if s:
        w.put(v if v > 0 else v + (1 << s) - 1, s)


def _extend(v: int, s: int) -> int:
    # T.81 EXTEND: low-magnitude codes are negative values
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------- encoder

def encode_jpeg(
    arr: np.ndarray,
    quality: int = 50,
    restart_interval: int = 0,
    subsampling: str = "444",
    progressive: bool = False,
    separate_dc_scans: bool = False,
    separate_scans: bool = False,
    rgb: bool = False,
) -> bytes:
    """Encode ``(H, W) | (H, W, 1)`` gray or ``(H, W, 3) uint8`` RGB as a
    JFIF JPEG (Annex K quant tables at ``quality``, self-contained
    canonical Huffman tables).  ``subsampling`` picks the chroma layout:
    ``"444"`` (full-res chroma), ``"422"`` (half horizontal), ``"440"``
    (half vertical), or ``"420"`` (half both — the web default; box-mean
    downsampling).  ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every that many MCUs (DC predictors reset) — the
    error-resilience feature streaming encoders use, and the path that
    exercises the decoder's restart handling.  ``progressive`` writes the
    spectral-selection SOF2 layout (interleaved DC scan, then one
    full-band AC scan per component) — same coefficients as baseline, so
    a decode roundtrip must be pixel-identical.  ``separate_dc_scans``
    (progressive only) emits one Ns=1 DC scan per component instead of the
    interleaved DC scan — the layout libjpeg scan scripts produce, where
    T.81 A.2.2 mandates nominal-raster block order rather than the MCU
    walk.  ``separate_scans`` writes a non-interleaved SEQUENTIAL file —
    one full-band DC+AC scan per component in nominal raster order, the
    layout ``jpegtran``-style tooling can emit.  ``rgb`` stores the three
    components as direct R,G,B (no color transform): an Adobe APP14 with
    transform 0 plus 'R','G','B' component IDs, the two signals real
    decoders key on — 4:4:4 only."""
    if (progressive or separate_scans) and restart_interval:
        raise ValueError(
            "progressive/separate_scans + restart_interval not supported "
            "together"
        )
    if separate_dc_scans and not progressive:
        raise ValueError("separate_dc_scans requires progressive=True")
    if separate_scans and progressive:
        raise ValueError(
            "separate_scans is the sequential layout; use "
            "separate_dc_scans for progressive"
        )
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"expected (H, W[, 1/3]) uint8 array, got {a.shape}")
    h, w, ncomp = a.shape
    if rgb and (ncomp != 3 or subsampling != "444"):
        raise ValueError("rgb=True requires 3 channels and 444 subsampling")
    if ncomp == 3 and rgb:
        planes = [a[..., i].astype(np.float64) for i in range(3)]
    elif ncomp == 3:
        flt = a.astype(np.float64)
        y = 0.299 * flt[..., 0] + 0.587 * flt[..., 1] + 0.114 * flt[..., 2]
        cb = 128 - 0.168736 * flt[..., 0] - 0.331264 * flt[..., 1] + 0.5 * flt[..., 2]
        cr = 128 + 0.5 * flt[..., 0] - 0.418688 * flt[..., 1] - 0.081312 * flt[..., 2]
        planes = [np.clip(_round_half_away(p), 0, 255) for p in (y, cb, cr)]
    else:
        planes = [a[..., 0].astype(np.float64)]
    if rgb:
        qtabs = [_quality_scale(_Q_LUM, quality)]
        comp_q = [0, 0, 0]
    else:
        qtabs = [
            _quality_scale(_Q_LUM, quality),
            _quality_scale(_Q_CHROM, quality),
        ][: (2 if ncomp == 3 else 1)]
        comp_q = [0, 1, 1][:ncomp]
    comp_ids = [0x52, 0x47, 0x42] if rgb else list(range(1, ncomp + 1))
    samp = {"444": (1, 1), "422": (2, 1), "440": (1, 2), "420": (2, 2)}
    if subsampling not in samp:
        raise ValueError(f"subsampling must be one of {sorted(samp)}")
    sh, sv = samp[subsampling] if ncomp == 3 else (1, 1)
    comp_hv = [(sh, sv), (1, 1), (1, 1)][:ncomp]

    # per-component planes at their nominal resolution: luma full-res,
    # chroma box-mean downsampled by (sh, sv)
    nominal = [planes[0]]
    for p in planes[1:]:
        if (sh, sv) != (1, 1):
            ph = -(-h // sv) * sv
            pw = -(-w // sh) * sh
            p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = _round_half_away(
                p.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            )
        nominal.append(p)

    # pad every component to whole MCUs by edge replication
    mcux = -(-w // (8 * sh))
    mcuy = -(-h // (8 * sv))
    padded = []
    for (chs, cvs), p in zip(comp_hv, nominal):
        th, tw = mcuy * cvs * 8, mcux * chs * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    # quantized zigzag coefficients for EVERY block, all components, up
    # front (vectorized fdct via einsum) — baseline emits them in one
    # interleaved scan, progressive re-reads them across its scans.
    # DC = sum/8 computed exactly (integer sum, exact binary /8): the
    # matrix DCT's ~1e-13 noise can flip a value sitting exactly on a
    # quantisation .5 boundary — flat blocks always do (8*(c-128) vs
    # q00), and the flat-tile closed form the driver oracle replays
    # depends on it
    qcoeffs = []
    for ci in range(ncomp):
        q = qtabs[comp_q[ci]].astype(np.float64)
        p = padded[ci] - 128.0
        bv, bh_ = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(bv, 8, bh_, 8).transpose(0, 2, 1, 3)
        coeff = np.einsum("ux,abxy,vy->abuv", _DCT_M, blocks, _DCT_M)
        coeff[:, :, 0, 0] = blocks.sum(axis=(2, 3)) / 8.0
        zz = _round_half_away(coeff / q).astype(np.int64)
        qcoeffs.append(zz.reshape(bv, bh_, 64)[:, :, _ZIGZAG])

    def emit_dc(wtr: _BitWriter, diff: int) -> None:
        s = _category(diff)
        code, ln = _ENC_DC[s]
        wtr.put(code, ln)
        _encode_magnitude(wtr, diff)

    def emit_ac_band(wtr: _BitWriter, acs: np.ndarray) -> None:
        run = 0
        last = int(np.max(np.nonzero(acs)[0])) if acs.any() else -1
        for i in range(last + 1):
            v = int(acs[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _ENC_AC[0xF0]  # ZRL
                wtr.put(code, ln)
                run -= 16
            s = _category(v)
            code, ln = _ENC_AC[(run << 4) | s]
            wtr.put(code, ln)
            _encode_magnitude(wtr, v)
            run = 0
        if last < 62:
            code, ln = _ENC_AC[0x00]  # EOB
            wtr.put(code, ln)

    if progressive:
        # spectral-selection progressive: one interleaved DC scan
        # (Ss=Se=0) then one full-band AC scan per component (Ss=1,
        # Se=63), all at Ah=Al=0 — the simplest legal SOF2 layout
        scans = []
        if separate_dc_scans:
            # one Ns=1 DC scan per component, blocks in nominal raster
            # order (same grid as the AC scans below); DC predictor resets
            # per scan
            for ci in range(ncomp):
                chs, cvs = comp_hv[ci]
                wtr = _BitWriter()
                prev = 0
                nominal_w = -(-w * chs // sh)
                nominal_h = -(-h * cvs // sv)
                bw_ = -(-nominal_w // 8)
                bh2 = -(-nominal_h // 8)
                for u in range(bw_ * bh2):
                    by_, bx_ = divmod(u, bw_)
                    dc = int(qcoeffs[ci][by_, bx_, 0])
                    emit_dc(wtr, dc - prev)
                    prev = dc
                scans.append(([ci], 0, 0, wtr.flush()))
        else:
            wtr = _BitWriter()
            pred = [0] * ncomp
            for mcu_i in range(mcux * mcuy):
                my, mx = divmod(mcu_i, mcux)
                for ci in range(ncomp):
                    chs, cvs = comp_hv[ci]
                    for by_ in range(cvs):
                        for bx_ in range(chs):
                            dc = int(
                                qcoeffs[ci][my * cvs + by_, mx * chs + bx_, 0]
                            )
                            emit_dc(wtr, dc - pred[ci])
                            pred[ci] = dc
            scans.append((list(range(ncomp)), 0, 0, wtr.flush()))
        for ci in range(ncomp):
            chs, cvs = comp_hv[ci]
            wtr = _BitWriter()
            nominal_w = -(-w * chs // sh)
            nominal_h = -(-h * cvs // sv)
            bw_ = -(-nominal_w // 8)
            bh2 = -(-nominal_h // 8)
            for u in range(bw_ * bh2):
                by_, bx_ = divmod(u, bw_)
                emit_ac_band(wtr, qcoeffs[ci][by_, bx_, 1:])
            scans.append(([ci], 1, 63, wtr.flush()))
    elif separate_scans:
        # non-interleaved sequential: per-component full-band scans,
        # blocks in nominal raster order, DC predictor resets per scan
        seq_scans = []
        for ci in range(ncomp):
            chs, cvs = comp_hv[ci]
            wtr = _BitWriter()
            prev = 0
            nominal_w = -(-w * chs // sh)
            nominal_h = -(-h * cvs // sv)
            bw_ = -(-nominal_w // 8)
            bh2 = -(-nominal_h // 8)
            for u in range(bw_ * bh2):
                by_, bx_ = divmod(u, bw_)
                zz = qcoeffs[ci][by_, bx_]
                dc = int(zz[0])
                emit_dc(wtr, dc - prev)
                prev = dc
                emit_ac_band(wtr, zz[1:])
            seq_scans.append((ci, wtr.flush()))
    else:
        wtr = _BitWriter()
        pred = [0] * ncomp
        for mcu_i in range(mcux * mcuy):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.put_marker(0xD0 + (mcu_i // restart_interval - 1) % 8)
                pred = [0] * ncomp
            my, mx = divmod(mcu_i, mcux)
            for ci in range(ncomp):
                chs, cvs = comp_hv[ci]
                for by_ in range(cvs):
                    for bx_ in range(chs):
                        zz = qcoeffs[ci][my * cvs + by_, mx * chs + bx_]
                        dc = int(zz[0])
                        emit_dc(wtr, dc - pred[ci])
                        pred[ci] = dc
                        emit_ac_band(wtr, zz[1:])
        entropy = wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    if rgb:
        # Adobe APP14 only, transform 0 = no color transform (direct
        # RGB).  No JFIF APP0: JFIF mandates YCbCr with component IDs
        # 1,2,3, and decoders (Java ImageIO among them) reject the
        # contradiction — real Adobe RGB writers omit it too.
        out += b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + struct.pack(
            ">HHHB", 100, 0, 0, 0
        )
    else:
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        out += struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, q in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(v) for v in q.ravel()[_ZIGZAG]
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        chs, cvs = comp_hv[ci]
        sof += struct.pack(">BBB", comp_ids[ci], (chs << 4) | cvs, comp_q[ci])
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    for cls, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)), (1, (_AC_BITS, _AC_VALS))):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if progressive:
        for scan_cis, ss, se, entropy_bytes in scans:
            sos = bytes([len(scan_cis)])
            for ci in scan_cis:
                sos += bytes([comp_ids[ci], 0x00])
            sos += bytes([ss, se, 0])  # Ah=Al=0
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            out += entropy_bytes
    elif separate_scans:
        for ci, entropy_bytes in seq_scans:
            sos = bytes([1, comp_ids[ci], 0x00, 0, 63, 0])
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            out += entropy_bytes
    else:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([comp_ids[ci], 0x00])  # DC+AC table 0 for all
        sos += bytes([0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

def _exif_orientation(body: bytes) -> int | None:
    """Orientation (tag 0x0112) from an APP1 Exif payload: TIFF header
    (II/MM byte order, magic 42), IFD0 entry scan.  Returns 1-8 or None
    when absent/malformed — a broken EXIF block must not fail the pixel
    decode."""
    if not body.startswith(b"Exif\x00\x00"):
        return None
    t = body[6:]
    if len(t) < 8:
        return None
    if t[:2] == b"II":
        end = "<"
    elif t[:2] == b"MM":
        end = ">"
    else:
        return None
    try:
        (magic,) = struct.unpack_from(end + "H", t, 2)
        if magic != 42:
            return None
        (ifd_off,) = struct.unpack_from(end + "I", t, 4)
        (n,) = struct.unpack_from(end + "H", t, ifd_off)
        for i in range(n):
            off = ifd_off + 2 + 12 * i
            tag, typ, cnt = struct.unpack_from(end + "HHI", t, off)
            if tag == 0x0112 and typ == 3 and cnt >= 1:
                (val,) = struct.unpack_from(end + "H", t, off + 8)
                return val if 1 <= val <= 8 else None
    except struct.error:
        return None
    return None


def apply_orientation(a: np.ndarray, orientation: int | None) -> np.ndarray:
    """Apply an EXIF orientation (1-8) to an ``(H, W, C)`` array so the
    result reads top-left first, the way viewers display it.  1/None is a
    no-op; 5-8 swap the axes (portrait photos from landscape sensors)."""
    if orientation is None or orientation <= 1:
        return a
    if orientation == 2:    # mirror horizontal
        return a[:, ::-1]
    if orientation == 3:    # rotate 180
        return a[::-1, ::-1]
    if orientation == 4:    # mirror vertical
        return a[::-1]
    t = a.transpose(1, 0, 2) if a.ndim == 3 else a.T
    if orientation == 5:    # transpose (mirror + rotate 270 CW)
        return t
    if orientation == 6:    # rotate 90 CW
        return t[:, ::-1]
    if orientation == 7:    # transverse (mirror + rotate 90 CW)
        return t[::-1, ::-1]
    if orientation == 8:    # rotate 270 CW
        return t[::-1]
    raise ValueError(f"invalid EXIF orientation {orientation}")


def _is_rgb_direct(comps: list[dict], adobe_transform: int | None) -> bool:
    """3-component JPEGs are YCbCr unless the stream says otherwise: an
    Adobe APP14 with transform 0 means no color transform (direct RGB),
    and absent APP14 the de-facto convention is component IDs 'R','G','B'
    (libjpeg's jdmaster color-space guess does the same)."""
    if len(comps) != 3:
        return False
    if adobe_transform is not None:
        return adobe_transform == 0
    return [c["id"] for c in comps] == [0x52, 0x47, 0x42]


def decode_jpeg(blob: bytes, apply_exif_orientation: bool = True) -> np.ndarray:
    """Decode a baseline JPEG to ``(H, W, 3) uint8`` RGB (gray replicated).

    Full marker walk; generic DQT/DHT (any valid tables); baseline (SOF0)
    AND progressive (SOF2 — spectral selection + successive approximation,
    DC/AC first and refinement scans, EOB runs) Huffman processes;
    sampling factors in {1, 2}; DRI/RSTn restart intervals; triangular
    (libjpeg "fancy") chroma upsampling; BT.601 YCbCr->RGB with
    floor(x+0.5) rounding.  EXIF APP1 orientation (tags 1-8) is applied to
    the output unless ``apply_exif_orientation=False``; Adobe APP14
    transform 0 (and the R,G,B component-ID convention) decodes as direct
    RGB without the YCbCr conversion.  Sequential files decode both as
    one interleaved scan (the common layout, straight to pixels) and as
    non-interleaved per-component scans (coefficients accumulated, T.81
    A.2.2 block order); arithmetic/lossless/hierarchical processes and
    CMYK/YCCK component layouts raise with the marker/count named."""
    b = bytes(blob)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTree] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    progressive = False
    coeffs: list[np.ndarray] | None = None
    orientation: int | None = None
    adobe_transform: int | None = None

    def oriented(img: np.ndarray) -> np.ndarray:
        if apply_exif_orientation:
            return np.ascontiguousarray(apply_orientation(img, orientation))
        return img
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {b[pos]:#x}")
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1  # optional 0xFF fill bytes before a marker (B.1.1.2)
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", b, pos)
        body = b[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0xF
                o += 1
                n = 64 * (2 if prec else 1)
                raw = body[o : o + n]
                o += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = vals
                qtabs[tid] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                huff[(cls, tid)] = _HuffTree(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"invalid JPEG dimensions {w}x{h} (pixel cap "
                    f"{MAX_DECODE_PIXELS})"
                )
            if nc not in (1, 3):
                # fail at parse time with the count, like the other scope
                # guards — not a late tuple-unpack error in _assemble
                layout = (
                    "Adobe YCCK" if adobe_transform == 2 else "CMYK/YCCK"
                ) if nc == 4 else f"{nc}-component"
                raise ValueError(
                    f"unsupported JPEG component count {nc} "
                    f"({layout}; 1 grayscale or 3 YCbCr/RGB only)"
                )
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                hs, vs = hv >> 4, hv & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(f"unsupported sampling factors {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (marker 0xFF{marker:02X}; "
                "baseline sequential and progressive Huffman only)"
            )
        elif marker == 0xE1:  # APP1: EXIF (orientation is all we read)
            o = _exif_orientation(body)
            if o is not None:
                orientation = o
        elif marker == 0xEE:  # APP14: Adobe color-transform flag
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                matches = [c for c in comps if c["id"] == cid]
                if not matches:
                    raise ValueError(f"SOS references unknown component {cid}")
                scan.append((matches[0], tt >> 4, tt & 0xF))
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            if not progressive and ns == len(comps):
                # the common layout: ONE interleaved scan — decode
                # straight to pixels, no coefficient accumulation
                return oriented(
                    _decode_scan(
                        b, pos, scan, qtabs, huff, h, w, restart,
                        rgb_direct=_is_rgb_direct(comps, adobe_transform),
                    )
                )
            if coeffs is None:
                # Nested Python lists for typical sizes: the progressive /
                # sequential scan loops do tens of thousands of scalar
                # element reads+writes per image, and list indexing is
                # several times cheaper than ndarray scalar access; the
                # whole structure converts to one array in
                # _reconstruct_coeffs.  Above ~4 MP the ~3x memory
                # overhead of boxed ints matters more than the loop speed,
                # so large images keep compact int32 arrays (both shapes
                # index identically as arr[by][bx][k]).
                if w * h <= (1 << 22):
                    coeffs = [
                        [
                            [[0] * 64 for _ in range(mcux * c["h"])]
                            for _ in range(mcuy * c["v"])
                        ]
                        for c in comps
                    ]
                else:
                    coeffs = [
                        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                        for c in comps
                    ]
            if progressive:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                pos = _progressive_scan(
                    b, pos, scan, comps, coeffs, huff, restart,
                    hmax, vmax, mcux, mcuy, w, h,
                    ss, se, ahal >> 4, ahal & 0xF,
                )
            else:
                # non-interleaved SEQUENTIAL file (one scan per
                # component, T.81 A.2.2): accumulate full DC+AC blocks in
                # nominal raster order, reconstruct at EOI
                if ns != 1:
                    raise ValueError(
                        f"unsupported sequential JPEG scan with {ns} of "
                        f"{len(comps)} components (one interleaved full "
                        "scan, or one component per scan)"
                    )
                pos = _sequential_scan(
                    b, pos, scan[0], comps, coeffs, huff, restart,
                    hmax, vmax, w, h,
                )
        elif marker == 0xD9:  # EOI
            break
        # else: APPn/COM and friends — skipped
    if coeffs is not None:
        return oriented(
            _reconstruct_coeffs(
                coeffs, comps, qtabs, h, w, hmax, vmax,
                rgb_direct=_is_rgb_direct(comps, adobe_transform),
            )
        )
    raise ValueError("JPEG has no SOS scan")


def _progressive_scan(
    b, pos, scan, comps, coeffs, huff, restart,
    hmax, vmax, mcux, mcuy, w, h, ss, se, ah, al,
):
    """Decode one progressive scan into the zigzag coefficient arrays and
    return the stream position of the next marker.

    Four scan kinds per T.81 G.1.2 (bit semantics match libjpeg's
    decode_mcu_DC/AC_first/refine): DC first (diff-coded at reduced
    precision, possibly interleaved), DC refinement (one appended bit per
    block, plain OR on the two's-complement value), AC first (run-length
    with EOBn runs, single component), AC refinement (correction bits on
    nonzero history + newly significant ±1<<Al, single component)."""
    br = _BitReader(b[pos:])
    pred = [0] * len(scan)
    eobrun = 0

    def rst_boundary() -> None:
        nonlocal eobrun
        br.align()
        if (
            br.pos + 1 < len(br.data)
            and br.data[br.pos] == 0xFF
            and 0xD0 <= br.data[br.pos + 1] <= 0xD7
        ):
            br.pos += 2
        for i in range(len(pred)):
            pred[i] = 0
        eobrun = 0

    def dc_first(blk, dtree, ci) -> None:
        _s, diff = dtree.decode_mag(br)
        pred[ci] += diff
        blk[0] = pred[ci] << al

    def dc_refine(blk) -> None:
        if br.bits(1):
            blk[0] |= 1 << al

    def ac_first(blk, atree) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs, val = atree.decode_mag(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC index out of spectral band")
            blk[k] = val << al
            k += 1

    def ac_refine(blk, atree) -> None:
        nonlocal eobrun
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = atree.decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.bits(r)
                        break
                    val = 0  # ZRL: 16 zero-history coefficients
                elif s == 1:
                    val = p1 if br.bits(1) else m1
                else:
                    raise ValueError("invalid AC refinement magnitude")
                while k <= se:
                    c = blk[k]
                    if c != 0:
                        if br.bits(1) and not (c & p1):
                            blk[k] = c + (p1 if c > 0 else m1)
                    else:
                        if r == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            while k <= se:
                c = blk[k]
                if c != 0:
                    if br.bits(1) and not (c & p1):
                        blk[k] = c + (p1 if c > 0 else m1)
                k += 1
            eobrun -= 1

    if ss == 0 and len(scan) == 1:
        # Non-interleaved DC scan (Ns=1): per T.81 A.2.2 a single-component
        # scan walks blocks in raster order over the component's NOMINAL
        # ceil(dims/8) grid — the same order and restart cadence as the AC
        # path — NOT the MCU-padded grid an interleaved scan uses.  For a
        # subsampled image's full-res component the two grids differ in
        # both block count and order (libjpeg per_scan_setup does the same
        # split).
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        comp, dct, _act = scan[0]
        dtree = huff[(0, dct)] if ah == 0 else None
        arr = coeffs[comps.index(comp)]
        nominal_w = -(-w * comp["h"] // hmax)
        nominal_h = -(-h * comp["v"] // vmax)
        bw_ = -(-nominal_w // 8)
        bh_ = -(-nominal_h // 8)
        for u in range(bw_ * bh_):
            if restart and u and u % restart == 0:
                rst_boundary()
            by, bx = divmod(u, bw_)
            blk = arr[by][bx]
            if ah == 0:
                dc_first(blk, dtree, 0)
            else:
                dc_refine(blk)
    elif ss == 0:  # interleaved DC scan over the MCU grid
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        for m in range(mcux * mcuy):
            if restart and m and m % restart == 0:
                rst_boundary()
            my, mx = divmod(m, mcux)
            for ci, (comp, dct, _act) in enumerate(scan):
                dtree = huff[(0, dct)] if ah == 0 else None
                arr = coeffs[comps.index(comp)]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = arr[my * comp["v"] + by][mx * comp["h"] + bx]
                        if ah == 0:
                            dc_first(blk, dtree, ci)
                        else:
                            dc_refine(blk)
    else:  # AC scan: single component, non-interleaved block order
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        comp, _dct, act = scan[0]
        atree = huff[(1, act)]
        arr = coeffs[comps.index(comp)]
        nominal_w = -(-w * comp["h"] // hmax)  # ceil
        nominal_h = -(-h * comp["v"] // vmax)
        bw_ = -(-nominal_w // 8)
        bh_ = -(-nominal_h // 8)
        for u in range(bw_ * bh_):
            if restart and u and u % restart == 0:
                rst_boundary()
            by, bx = divmod(u, bw_)
            blk = arr[by][bx]
            if ah == 0:
                ac_first(blk, atree)
            else:
                ac_refine(blk, atree)

    # advance to the next marker (skip pad bits and stuffed bytes)
    q = pos + br.pos
    while q + 1 < len(b):
        if b[q] == 0xFF and b[q + 1] != 0x00:
            break
        q += 1
    return q


def _sequential_scan(
    b, pos, scan_entry, comps, coeffs, huff, restart, hmax, vmax, w, h
):
    """One non-interleaved SEQUENTIAL scan (Ns=1): every block of the
    component in nominal raster order (T.81 A.2.2 — the same grid and
    restart cadence as the progressive AC path), full DC-diff + AC RLE
    into the zigzag coefficient array.  Returns the position of the next
    marker."""
    comp, dct, act = scan_entry
    dtree, atree = huff[(0, dct)], huff[(1, act)]
    arr = coeffs[comps.index(comp)]
    br = _BitReader(b[pos:])
    pred = 0
    nominal_w = -(-w * comp["h"] // hmax)
    nominal_h = -(-h * comp["v"] // vmax)
    bw_ = -(-nominal_w // 8)
    bh_ = -(-nominal_h // 8)
    for u in range(bw_ * bh_):
        if restart and u and u % restart == 0:
            br.align()
            if (
                br.pos + 1 < len(br.data)
                and br.data[br.pos] == 0xFF
                and 0xD0 <= br.data[br.pos + 1] <= 0xD7
            ):
                br.pos += 2
            pred = 0
        by, bx = divmod(u, bw_)
        blk = arr[by][bx]
        _s, diff = dtree.decode_mag(br)
        pred += diff
        blk[0] = pred
        k = 1
        while k < 64:
            rs, val = atree.decode_mag(br)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                raise ValueError("JPEG AC index out of range")
            if not rs & 0xF:
                raise ValueError("invalid JPEG AC run/size")
            blk[k] = val
            k += 1
    q = pos + br.pos
    while q + 1 < len(b):
        if b[q] == 0xFF and b[q + 1] != 0x00:
            break
        q += 1
    return q


def _reconstruct_coeffs(
    coeffs, comps, qtabs, h, w, hmax, vmax, rgb_direct=False
):
    """Dequantize + IDCT every accumulated block (vectorized across all
    blocks of a component) and assemble/upsample/convert as usual."""
    planes = []
    for ci, c in enumerate(comps):
        q = qtabs[c["tq"]].astype(np.float64)
        # one bulk conversion of the nested scan-time lists (values are
        # exact in float64 — progressive coefficients are small ints)
        arr = np.asarray(coeffs[ci], dtype=np.float64)
        bv, bh_ = arr.shape[:2]
        nat = np.zeros((bv, bh_, 64), np.float64)
        nat[:, :, _ZIGZAG] = arr
        blocks = nat.reshape(bv, bh_, 8, 8) * q
        spatial = np.einsum("ux,abuv,vy->abxy", _DCT_M, blocks, _DCT_M)
        planes.append(spatial.transpose(0, 2, 1, 3).reshape(bv * 8, bh_ * 8))
    return _assemble(planes, comps, h, w, hmax, vmax, rgb_direct)


def _upsample2_triangular(p: np.ndarray, axis: int) -> np.ndarray:
    """2x upsample along ``axis`` with libjpeg's triangular filter: output
    pair (2i, 2i+1) = (3*p[i] + p[i-1])/4, (3*p[i] + p[i+1])/4, edges
    replicated."""
    if axis == 1:
        return _upsample2_triangular(p.T, 0).T
    prev = np.vstack([p[:1], p[:-1]])
    nxt = np.vstack([p[1:], p[-1:]])
    out = np.empty((p.shape[0] * 2, p.shape[1]), dtype=p.dtype)
    out[0::2] = (3 * p + prev) / 4
    out[1::2] = (3 * p + nxt) / 4
    return out


def _decode_scan(b, pos, scan, qtabs, huff, h, w, restart, rgb_direct=False):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(b[pos:])
    pred = [0] * len(scan)
    n_mcu = mcux * mcuy
    # Entropy decode into flat per-component zigzag coefficient lists (the
    # sequential Huffman walk is inherently scalar); everything after it —
    # de-zigzag, dequantize, IDCT, block placement — runs ONCE per
    # component as batched array math instead of ~4 NumPy calls per block.
    ntrees = [(huff[(0, dct)], huff[(1, act)]) for _, dct, act in scan]
    flat: list[list[int]] = [[] for _ in scan]
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            br.align()
            # consume the RSTn marker (fill stops before markers, so pos
            # sits at its 0xFF)
            if (
                br.pos + 1 < len(br.data)
                and br.data[br.pos] == 0xFF
                and 0xD0 <= br.data[br.pos + 1] <= 0xD7
            ):
                br.pos += 2
            pred = [0] * len(scan)
        for ci, (comp, _, _) in enumerate(scan):
            dtree, atree = ntrees[ci]
            out = flat[ci]
            for _blk in range(comp["v"] * comp["h"]):
                zz = [0] * 64
                _s, diff = dtree.decode_mag(br)
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs, val = atree.decode_mag(br)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("JPEG AC index out of range")
                    if not rs & 0xF:
                        # zero size outside EOB/ZRL: invalid stream (the
                        # split-decode path raised here too)
                        raise ValueError("invalid JPEG AC run/size")
                    zz[k] = val
                    k += 1
                out.extend(zz)
    planes = []
    for ci, (comp, _, _) in enumerate(scan):
        cv, ch_ = comp["v"], comp["h"]
        q = qtabs[comp["tq"]]
        zzs = np.asarray(flat[ci], dtype=np.int64).reshape(-1, 64)
        coeff = np.zeros_like(zzs)
        coeff[:, _ZIGZAG] = zzs
        # int64 dequant then float64 IDCT, exactly as the per-block
        # _idct(coeff.reshape(8, 8) * q) did — np.matmul broadcasts the
        # same (8, 8) dgemm per block, so the pixels are bit-identical
        # (asserted against the per-block path in tests)
        blocks = coeff.reshape(-1, 8, 8) * q
        spatial = _DCT_M.T @ blocks @ _DCT_M
        plane = (
            spatial.reshape(mcuy, mcux, cv, ch_, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * cv * 8, mcux * ch_ * 8)
        )
        planes.append(plane)
    return _assemble(planes, [c for c, _, _ in scan], h, w, hmax, vmax,
                     rgb_direct)


def _assemble(planes, comps, h, w, hmax, vmax, rgb_direct=False) -> np.ndarray:
    """Crop per-component planes to nominal size, upsample to full res
    with the triangular ("fancy") filter libjpeg uses for 2x — centers of
    the subsampled grid sit between output pixels, so each output mixes
    its nearest two chroma samples 3:1; plain replication is also
    spec-legal but diverges visibly from every mainstream decoder — then
    convert YCbCr -> RGB (BT.601)."""
    full = []
    for ci, comp in enumerate(comps):
        cw = -(-w * comp["h"] // hmax)
        ch = -(-h * comp["v"] // vmax)
        p = planes[ci][:ch, :cw]
        if comp["h"] != hmax:
            p = _upsample2_triangular(p, axis=1)
        if comp["v"] != vmax:
            p = _upsample2_triangular(p, axis=0)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        g = np.clip(np.floor(full[0] + 0.5), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if rgb_direct:
        # Adobe transform 0 / R,G,B component IDs: the components ARE
        # R,G,B (level-shifted like Y) — no color conversion
        out = np.stack(full, axis=2)
        return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, bl], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
