"""Baseline JPEG (ITU-T T.81) codec — pure numpy + stdlib, no codec libs.

The fifth REAL decode path (after BMP/WAV/PNG/uncompressed-AVI) and the
one the r11 verdict ranked highest-value: real multimodal corpora are
overwhelmingly JPEG, and the pure-numpy ladder previously ended exactly
where entropy coding begins.  Scope is honest baseline sequential DCT:

- markers SOI / APPn / COM / DQT / SOF0 / DHT / SOS / EOI;
- Huffman entropy decode (canonical code reconstruction from DHT BITS/
  HUFFVAL, MSB-first bit reader, 0xFF00 byte-unstuffing, DC differential
  coding, AC run-length with EOB/ZRL);
- dequantization in zigzag order and the 2-D inverse DCT as two 8x8
  matrix products (vectorized over every block of a component at once);
- 1-component grayscale, 3-component 4:4:4 YCbCr, and 4:2:0 (2x2 luma
  sampling, the dominant real-corpus profile: 4 Y + Cb + Cr blocks per
  MCU, chroma reconstructed at half resolution and
  replication-upsampled).

Progressive (SOF2), arithmetic coding, restart markers, and other
sampling layouts (4:2:2/4:1:1) raise NotImplementedError; truncation and malformed structure
raise ValueError — corrupt files must error, not decode short.

Exactness contract for the oracle fixture (documented tolerance): JPEG
is lossy in general, but an image of CONSTANT 8x8 tiles whose values
are EVEN sits in the codec's fixed-point set under the Annex-K-style
luminance table used here: the only nonzero coefficient is
DC = 8*(v - 128), divisible by q_dc = 16 exactly when v is even, so
quantize -> dequantize -> IDCT reproduces v bit-for-bit (floats touch
the value only through an exactly-representable *8 / /8 pair).  The
`jpeg_pixel_stats` fixture lives entirely in that set, which is what
lets a closed-form SQL oracle value-gate a lossy codec; arbitrary
images get the usual lossy tolerance (pinned by tests).

Reference parity: the reference repo treats media as opaque blobs and
delegates decode to consumers (BASELINE.json media family); this codec
is the in-repo stand-in for the codec library its consumers would use.
"""

from __future__ import annotations

import numpy as np

# Zigzag scan order: ZIGZAG[k] = row-major index of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex-K-style quantization tables (quality-50 defaults).  Both sides
# of every roundtrip read these from the DQT segment, so the gate is
# the written table, not this constant.
Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Huffman table specs as (BITS[1..16] counts, HUFFVAL list) — the DHT
# payload layout.  DC tables are the T.81 Annex K standards; AC tables
# are Annex-K-style (canonical two-symbol prefix head + the dense
# (run, size) tail).  Every file this module writes carries its tables
# in DHT, and the decoder builds its codes from DHT alone — so
# encode/decode parity never depends on these constants matching any
# external file.
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)


def _ac_spec():
    """AC table: the complete baseline AC alphabet — EOB (0x00), ZRL
    (0xF0), and every (run 0..15, size 1..10) symbol — with a simple
    VALID canonical length assignment: EOB/ZRL at 4 bits, the 160
    (run, size) symbols at 9 bits (Kraft sum 2/2^4 + 160/2^9 = 0.4375
    <= 1).  Deliberately not the Annex K frequency-tuned lengths:
    every file this module writes carries its tables in DHT and the
    decoder rebuilds codes from DHT alone, so only prefix validity —
    not compression tuning — is load-bearing."""
    symbols = [0x00, 0xF0]
    for run in range(16):
        for size in range(1, 11):
            symbols.append((run << 4) | size)
    counts = [0, 0, 0, 2, 0, 0, 0, 0, 160, 0, 0, 0, 0, 0, 0, 0]
    assert sum(counts) == len(symbols)
    return counts, symbols


AC_LUMA_SPEC = _ac_spec()
AC_CHROMA_SPEC = _ac_spec()

# encode tables are fixed per process — built once, not per image
_ENC_TABLES: dict = {}

# everything before the entropy segment is a pure function of
# (gray, h, w): cached so per-image encode cost is the scan alone
_HEADER_CACHE: dict = {}


def _build_encode_table(spec):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} via the canonical
    code construction (T.81 C.2)."""
    bits, vals = spec
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


_ENC_TABLES["dc"] = [
    _build_encode_table(DC_LUMA_SPEC),
    _build_encode_table(DC_CHROMA_SPEC),
]
_ENC_TABLES["ac"] = [
    _build_encode_table(AC_LUMA_SPEC),
    _build_encode_table(AC_CHROMA_SPEC),
]


def _build_decode_lut(spec):
    """(BITS, HUFFVAL) -> 16-bit prefix lookup: two 65536-entry lists,
    ``sym[window]`` and ``length[window]`` (length 0 = invalid code).
    One list index replaces up to 16 per-bit dictionary probes — the
    table-driven decoder every fast JPEG implementation uses.  Built
    with numpy slice fills (one per code) and converted to Python lists
    (faster scalar indexing than numpy)."""
    bits, vals = spec
    sym = np.zeros(1 << 16, dtype=np.int32)
    ln = np.zeros(1 << 16, dtype=np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym.tolist(), ln.tolist()


# decode LUTs cached by the DHT payload bytes: table construction costs
# ~162 slice fills + two 64K tolist()s, paid once per unique table per
# process instead of once per image
_DECODE_LUT_CACHE: dict = {}


def _lut_for(bits, vals):
    key = (bytes(bits), bytes(vals))
    lut = _DECODE_LUT_CACHE.get(key)
    if lut is None:
        lut = _build_decode_lut((list(bits), list(vals)))
        _DECODE_LUT_CACHE[key] = lut
    return lut


def _pack_bits(vals, lens) -> bytes:
    """Pack (value, bit-length) pairs MSB-first into a byte-stuffed
    entropy segment in a handful of numpy passes (no per-bit Python):
    expand every pair to its bits with repeat/shift arithmetic,
    1-pad to a byte boundary, packbits, then vector-insert the 0x00
    stuffing byte after every 0xFF."""
    vals = np.asarray(vals, dtype=np.uint32)
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    offs = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    idx = np.repeat(np.arange(len(vals)), lens)
    j = np.arange(total) - offs[idx]
    bits = ((vals[idx] >> (lens[idx] - 1 - j).astype(np.uint32)) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    by = np.packbits(bits)
    ff = by == 0xFF
    if ff.any():
        shift = np.zeros(len(by), dtype=np.int64)
        np.cumsum(ff[:-1], out=shift[1:])
        out = np.zeros(len(by) + int(ff.sum()), dtype=np.uint8)
        out[np.arange(len(by)) + shift] = by
        by = out
    return by.tobytes()


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# orthonormal 8x8 DCT-II matrix: block_dct = A @ s @ A.T gives the T.81
# coefficients when scaled — with this normalization S = A s A^T IS the
# T.81 FDCT (A[0] = 1/(2*sqrt(2)), A[u>0,x] = cos((2x+1)u*pi/16)/2).
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _A[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) / 2
_A[0, :] = 1.0 / (2 * np.sqrt(2.0))


_AT = np.ascontiguousarray(_A.T)


def _idct_blocks(coefs):
    """(n, 8, 8) coefficients -> (n, 8, 8) spatial."""
    return _AT @ coefs @ _A


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_payload(tid: int, q) -> bytes:
    return bytes([tid]) + bytes(int(x) for x in q.reshape(-1)[ZIGZAG])


def _dht_payload(tclass: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)


def _rgb_to_ycbcr(a):
    a = a.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def jpeg_encode_frames(frames, gray: bool | None = None,
                       subsampling: str = "444") -> list:
    """Encode a same-shaped stack of images — (n, h, w) grayscale or
    (n, h, w, 3) RGB uint8 — as n independent baseline JPEGs, with the
    color transform, chroma downsampling, DCT, quantization, zigzag,
    and last-nonzero bookkeeping all batched across EVERY block of
    EVERY frame per component (the MJPG hot path: per-frame numpy call
    overhead otherwise dominates tiny frames).  Only the per-frame
    entropy scan remains a Python loop, packed via _pack_bits.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2 luma
    sampling — the dominant real-corpus profile; dims must be
    multiples of 16; chroma planes are 2x2-averaged and the scan
    interleaves 4 Y + 1 Cb + 1 Cr blocks per MCU)."""
    a = np.asarray(frames, dtype=np.uint8)
    if gray is None:
        gray = a.ndim == 3
    n, h, w = a.shape[:3]
    if n == 0:
        return []
    if h % 8 or w % 8:
        raise ValueError("jpeg_encode requires dimensions divisible by 8")
    if gray:
        planes = [(a if a.ndim == 3 else a[..., 0]).astype(np.float64)]
        tqs = [0]
        samp = "444"
    else:
        y, cb, cr = _rgb_to_ycbcr(a)
        if subsampling == "420":
            if h % 16 or w % 16:
                raise ValueError(
                    "4:2:0 requires dimensions divisible by 16"
                )
            cb = cb.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
            cr = cr.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        elif subsampling != "444":
            raise NotImplementedError(
                f"subsampling {subsampling!r} not supported"
            )
        planes = [
            np.clip(np.round(p), 0, 255) for p in (y, cb, cr)
        ]
        tqs = [0, 1, 1]
        samp = subsampling
    ncomp = len(tqs)
    comp_zz, comp_last, comp_nb = [], [], []
    for ci, plane in enumerate(planes):
        hc, wc = plane.shape[1:3]
        blocks = (
            plane.reshape(n, hc // 8, 8, wc // 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, -1, 8, 8)
        ) - 128.0
        q = Q_LUMA if tqs[ci] == 0 else Q_CHROMA
        quant = np.round((_A @ blocks @ _AT) / q[None, None]).astype(np.int64)
        zz = quant.reshape(n, -1, 64)[:, :, ZIGZAG]
        nzmask = zz[:, :, 1:] != 0
        rev = nzmask[:, :, ::-1]
        has = rev.any(axis=2)
        comp_zz.append(zz)
        comp_last.append(np.where(has, 63 - rev.argmax(axis=2), 0).tolist())
        comp_nb.append(zz.shape[1])

    sched = _scan_schedule(samp, ncomp, h, w)
    hdr = _header_for(gray, h, w, ncomp, tqs, samp)
    dc_enc = _ENC_TABLES["dc"]
    ac_enc = _ENC_TABLES["ac"]
    outs = []
    _SLAB = 128  # frames per tolist slab: caps live Python-int volume
    rows_slab, slab0 = None, -_SLAB
    for f in range(n):
        if f >= slab0 + _SLAB:
            slab0 = f
            rows_slab = [zz[f:f + _SLAB].tolist() for zz in comp_zz]
        comp_rows = [rs[f - slab0] for rs in rows_slab]
        last_f = [cl[f] for cl in comp_last]
        vals_out: list = []
        lens_out: list = []
        wv, wl = vals_out.append, lens_out.append
        prev_dc = [0] * ncomp
        for ci, b in sched:
            tid = tqs[ci]
            zz = comp_rows[ci][b]
            diff = zz[0] - prev_dc[ci]
            prev_dc[ci] = zz[0]
            size = _category(diff)
            code, length = dc_enc[tid][size]
            wv(code)
            wl(length)
            if size:
                wv(_amplitude_bits(diff, size))
                wl(size)
            run = 0
            last_nz = last_f[ci][b]
            act = ac_enc[tid]
            for k in range(1, last_nz + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = act[0xF0]  # ZRL
                    wv(code)
                    wl(length)
                    run -= 16
                size = _category(v)
                if size > 10:
                    raise ValueError("AC coefficient out of table range")
                code, length = act[(run << 4) | size]
                wv(code)
                wl(length)
                wv(_amplitude_bits(v, size))
                wl(size)
                run = 0
            if last_nz < 63:
                code, length = act[0x00]  # EOB
                wv(code)
                wl(length)
        outs.append(hdr + _pack_bits(vals_out, lens_out) + b"\xff\xd9")
    return outs


def jpeg_encode(arr, gray: bool | None = None,
                subsampling: str = "444") -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline sequential JPEG (SOI / DQT / SOF0 / DHT / SOS / EOI;
    4:4:4 or 4:2:0 for color, Annex-K-style tables written into the
    stream).  Dimensions must be multiples of 8 (16 for 4:2:0); this
    encoder does not replicate edges — the in-repo fixtures are
    tile-aligned by construction.  Runs through the frame-batched
    encoder (batch of one)."""
    a = np.asarray(arr, dtype=np.uint8)
    if gray is None:
        gray = a.ndim == 2
    return jpeg_encode_frames(a[None], gray=gray, subsampling=subsampling)[0]


# MCU scan schedules, cached by (samp, ncomp, h, w): the interleave
# order of (component, block-index) pairs — 4:4:4 visits one block per
# component per MCU; 4:2:0 visits 4 luma + 1 Cb + 1 Cr per MCU with the
# luma blocks in 2x2 raster order (T.81 A.2.3).
_SCHEDULE_CACHE: dict = {}


def _scan_schedule(samp: str, ncomp: int, h: int, w: int):
    key = (samp, ncomp, h, w)
    sched = _SCHEDULE_CACHE.get(key)
    if sched is not None:
        return sched
    if samp == "420":
        bpr = w // 8
        mpr = w // 16
        sched = []
        for my in range(h // 16):
            for mx in range(w // 16):
                base = 2 * my * bpr + 2 * mx
                m = my * mpr + mx
                sched.extend([
                    (0, base), (0, base + 1),
                    (0, base + bpr), (0, base + bpr + 1),
                    (1, m), (2, m),
                ])
    else:
        nb = (h // 8) * (w // 8)
        sched = [(ci, b) for b in range(nb) for ci in range(ncomp)]
    _SCHEDULE_CACHE[key] = sched
    return sched


def _header_for(gray: bool, h: int, w: int, ncomp: int, tqs,
                samp: str) -> bytes:
    hdr = _HEADER_CACHE.get((gray, h, w, samp))
    if hdr is None:
        hdr = bytearray(b"\xff\xd8")  # SOI
        hdr += _seg(0xDB, _dqt_payload(0, Q_LUMA))
        if not gray:
            hdr += _seg(0xDB, _dqt_payload(1, Q_CHROMA))
        sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
            + bytes([ncomp])
        for ci in range(ncomp):
            sb = 0x22 if (samp == "420" and ci == 0) else 0x11
            sof += bytes([ci + 1, sb, tqs[ci]])
        hdr += _seg(0xC0, sof)
        hdr += _seg(0xC4, _dht_payload(0, 0, DC_LUMA_SPEC))
        hdr += _seg(0xC4, _dht_payload(1, 0, AC_LUMA_SPEC))
        if not gray:
            hdr += _seg(0xC4, _dht_payload(0, 1, DC_CHROMA_SPEC))
            hdr += _seg(0xC4, _dht_payload(1, 1, AC_CHROMA_SPEC))
        sos = bytes([ncomp])
        for ci in range(ncomp):
            tsel = tqs[ci]
            sos += bytes([ci + 1, (tsel << 4) | tsel])
        sos += bytes([0, 63, 0])
        hdr += _seg(0xDA, sos)
        hdr = bytes(hdr)
        _HEADER_CACHE[(gray, h, w, samp)] = hdr
    return hdr


# single-entry header-parse cache: MJPG streams carry byte-identical
# headers on every frame, so one exact byte-compare of the prefix
# replaces the whole marker walk (identical bytes => identical parsed
# state, including every validation the walk performs — the compare is
# against the EXACT bytes up to SOS recorded when the state was built,
# so there is no partial-prefix collision to reason about)
_HEADER_PARSE_CACHE: dict = {"key": None, "state": None}


def _jpeg_parse_coefs(payload: bytes):
    """Marker walk + LUT entropy decode of one baseline JPEG: returns
    (h, w, samp, comp_coefs, qs) where ``comp_coefs`` is the
    per-component list of (n_blocks_c, 64) zigzag coefficient arrays
    and ``qs`` the per-component dequantization tables.  All structural
    validation lives here so the (batchable) reconstruction stage can
    assume clean input."""
    buf = bytes(payload)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    hk = _HEADER_PARSE_CACHE["key"]
    if hk is not None and buf[:len(hk)] == hk:
        (qtabs, htabs, comps, samps, h, w, scan_comps, scan_start,
         samp) = _HEADER_PARSE_CACHE["state"]
        return _jpeg_entropy_and_finish(
            buf, qtabs, htabs, comps, h, w, scan_comps, scan_start, samp
        )
    pos = 2
    qtabs: dict = {}
    htabs: dict = {}
    comps: list = []
    samps: list = []
    h = w = None
    scan_comps: list = []
    scan_start = None
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI without a scan
            raise ValueError("no SOS scan before EOI")
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) is supported"
            )
        if marker == 0xDD:
            raise NotImplementedError("JPEG restart intervals not supported")
        if pos + 2 > len(buf):
            raise ValueError("truncated JPEG segment header")
        seglen = int.from_bytes(buf[pos:pos + 2], "big")
        if seglen < 2 or pos + seglen > len(buf):
            raise ValueError("truncated JPEG segment")
        body = buf[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT: one or more tables
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                z = np.frombuffer(
                    body[bpos + 1:bpos + 65], dtype=np.uint8
                ).astype(np.int64)
                if len(z) != 64:
                    raise ValueError("truncated DQT table")
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = z
                qtabs[tq] = q.reshape(8, 8)
                bpos += 65
        elif marker == 0xC4:  # DHT: one or more tables
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1:bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("truncated DHT table")
                htabs[(tc, th)] = _lut_for(bytes(bits), bytes(vals))
                bpos += 17 + n
        elif marker == 0xC0:  # SOF0
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            samps = []
            for ci in range(nc):
                cid, sb, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, tq))
                samps.append(sb)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cs, tsel = body[1 + 2 * ci:3 + 2 * ci]
                scan_comps.append((cs, tsel >> 4, tsel & 0x0F))
            scan_start = pos + seglen
            break
        # APPn / COM / others: skip
        pos += seglen
    if h is None or scan_start is None:
        raise ValueError("missing SOF0 or SOS")
    ncomp = len(scan_comps)
    if ncomp not in (1, 3) or len(comps) != ncomp:
        raise NotImplementedError("only 1- or 3-component scans supported")
    if all(sb == 0x11 for sb in samps):
        samp = "444"
    elif samps == [0x22, 0x11, 0x11]:
        samp = "420"
    else:
        raise NotImplementedError(
            "only 4:4:4 (1x1) and 4:2:0 (2x2 luma) sampling supported"
        )
    mcu = 16 if samp == "420" else 8
    if h % mcu or w % mcu:
        raise NotImplementedError(
            f"image dimensions not multiples of {mcu} (partial MCUs)"
        )
    _HEADER_PARSE_CACHE["key"] = buf[:scan_start]
    _HEADER_PARSE_CACHE["state"] = (
        qtabs, htabs, comps, samps, h, w, scan_comps, scan_start, samp
    )
    return _jpeg_entropy_and_finish(
        buf, qtabs, htabs, comps, h, w, scan_comps, scan_start, samp
    )


def _jpeg_entropy_and_finish(buf, qtabs, htabs, comps, h, w, scan_comps,
                             scan_start, samp):
    ncomp = len(scan_comps)
    # Locate the end of the entropy-coded segment: the first 0xFF
    # followed by a non-stuffing byte is a marker (RSTn -> unsupported).
    end = scan_start
    L = len(buf)
    while True:
        end = buf.find(b"\xff", end)
        if end < 0 or end + 1 >= L:
            end = L
            break
        nxt = buf[end + 1]
        if nxt == 0x00:
            end += 2  # stuffed data byte
            continue
        if 0xD0 <= nxt <= 0xD7:
            raise NotImplementedError("JPEG restart markers not supported")
        break
    # one C-speed pass removes the stuffing; 4 zero bytes allow a flat
    # 4-byte window peek at the tail
    unstuffed = buf[scan_start:end].replace(b"\xff\x00", b"\xff")
    real_bits = 8 * len(unstuffed)
    sbuf = unstuffed + b"\x00\x00\x00\x00"
    from_bytes = int.from_bytes
    bit_pos = 0
    nb_y = (h // 8) * (w // 8)
    comp_nb = [
        nb_y if (samp == "444" or ci == 0) else nb_y // 4
        for ci in range(ncomp)
    ]
    comp_tabs = []
    for ci in range(ncomp):
        _, dc_id, ac_id = scan_comps[ci]
        dct = htabs.get((0, dc_id))
        act = htabs.get((1, ac_id))
        if dct is None or act is None:
            raise ValueError("scan references a missing Huffman table")
        comp_tabs.append((dct[0], dct[1], act[0], act[1]))
    prev_dc = [0] * ncomp
    rows = [
        np.zeros((nb, 64), dtype=np.int64).tolist() for nb in comp_nb
    ]
    for ci, b in _scan_schedule(samp, ncomp, h, w):
        dc_sym, dc_len, ac_sym, ac_len = comp_tabs[ci]
        # 16-bit window -> one LUT probe per Huffman symbol
        i = bit_pos >> 3
        window = (
            from_bytes(sbuf[i:i + 4], "big")
            >> (16 - (bit_pos & 7))
        ) & 0xFFFF
        ln = dc_len[window]
        if not ln:
            raise ValueError("invalid JPEG Huffman code")
        size = dc_sym[window]
        if size > 11:
            # a crafted DHT can map a code to any byte; 8-bit baseline
            # DC categories stop at 11 (T.81 Table F.1) — reject
            # instead of decoding plausible garbage (or, past 25,
            # letting the amplitude read hit a negative shift)
            raise ValueError("invalid JPEG DC category")
        bit_pos += ln
        if size:
            i = bit_pos >> 3
            v = (
                from_bytes(sbuf[i:i + 4], "big")
                >> (32 - (bit_pos & 7) - size)
            ) & ((1 << size) - 1)
            bit_pos += size
            prev_dc[ci] += _extend(v, size)
        zz = rows[ci][b]
        zz[0] = prev_dc[ci]
        k = 1
        while k <= 63:
            i = bit_pos >> 3
            window = (
                from_bytes(sbuf[i:i + 4], "big")
                >> (16 - (bit_pos & 7))
            ) & 0xFFFF
            ln = ac_len[window]
            if not ln:
                raise ValueError("invalid JPEG Huffman code")
            rs = ac_sym[window]
            bit_pos += ln
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            run, size = rs >> 4, rs & 0x0F
            k += run
            if k > 63:
                raise ValueError("AC run past end of block")
            i = bit_pos >> 3
            v = (
                from_bytes(sbuf[i:i + 4], "big")
                >> (32 - (bit_pos & 7) - size)
            ) & ((1 << size) - 1)
            bit_pos += size
            zz[k] = _extend(v, size)
            k += 1
    if bit_pos > real_bits:
        raise ValueError("truncated JPEG entropy stream")
    qs = []
    for ci in range(ncomp):
        q = qtabs.get(comps[ci][1])
        if q is None:
            raise ValueError("component references a missing DQT table")
        qs.append(q)
    # verify the EOI trailer exists (truncation after the scan)
    if b"\xff\xd9" not in buf[end:]:
        raise ValueError("truncated JPEG: no EOI marker")
    # compact numpy coefficients: callers may hold MANY parsed frames
    # before a batched reconstruct; nested Python int lists at that
    # scale are a GC catastrophe (measured 3x wall at 64x)
    return h, w, samp, [np.asarray(r, dtype=np.int64) for r in rows], qs


def _jpeg_reconstruct(comp_coefs, qs, h: int, w: int, samp: str):
    """Batched dequantize + inverse DCT + color transform:
    ``comp_coefs`` is the per-component list of (n, nb_c, 64) zigzag
    coefficients for n SAME-SHAPE scans (the MJPG hot path batches a
    whole video's frames here; stills pass n=1).  4:2:0 chroma planes
    reconstruct at half resolution and upsample by replication —
    exact for the constant-chroma fixture class.  Returns (n, h, w)
    grayscale or (n, h, w, 3) RGB uint8."""
    planes = []
    for ci, coef in enumerate(comp_coefs):
        hc, wc = (h, w) if (samp == "444" or ci == 0) else (h // 2, w // 2)
        n, nb, _ = coef.shape
        dezz = np.zeros((n, nb, 64), dtype=np.int64)
        dezz[:, :, ZIGZAG] = coef
        spatial = _idct_blocks(
            (dezz.reshape(n, nb, 8, 8) * qs[ci][None, None]).astype(np.float64)
        )
        planes.append(
            spatial.reshape(n, hc // 8, wc // 8, 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, hc, wc) + 128.0
        )
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    if samp == "420":
        cb = cb.repeat(2, axis=1).repeat(2, axis=2)
        cr = cr.repeat(2, axis=1).repeat(2, axis=2)
    return _ycbcr_to_rgb(y, cb, cr)


def jpeg_decode_frames(payloads):
    """Decode a list of SAME-SHAPE baseline JPEGs (an MJPG video's
    frames) with the reconstruction numpy stages batched across all of
    them; raises ValueError if shapes, sampling, or component counts
    differ."""
    parsed = [_jpeg_parse_coefs(p) for p in payloads]
    h, w, samp = parsed[0][0], parsed[0][1], parsed[0][2]
    ncomp = len(parsed[0][3])
    if any(
        (p[0], p[1], p[2], len(p[3])) != (h, w, samp, ncomp) for p in parsed
    ):
        raise ValueError("jpeg_decode_frames requires same-shape frames")
    q0 = parsed[0][4]
    same_q = all(
        all((p[4][ci] == q0[ci]).all() for ci in range(ncomp))
        for p in parsed[1:]
    )
    if not same_q:
        # adaptive-quality MJPG legally varies DQT per frame: fall back
        # to per-frame reconstruction with each frame's own tables
        return np.stack([
            _jpeg_reconstruct([c[None] for c in p[3]], p[4], h, w, samp)[0]
            for p in parsed
        ])
    comp_coefs = [
        np.stack([p[3][ci] for p in parsed]) for ci in range(ncomp)
    ]
    return _jpeg_reconstruct(comp_coefs, q0, h, w, samp)


def jpeg_decode(payload: bytes):
    """Decode a baseline sequential JPEG to (h, w) grayscale or
    (h, w, 3) RGB uint8.  Walks the marker stream, rebuilds the Huffman
    codes from DHT (16-bit LUT), entropy-decodes the interleaved scan
    (4:4:4 or 4:2:0 MCU order) with a flat peek-window bit reader over
    the pre-unstuffed segment, dequantizes in zigzag order, and applies
    the inverse DCT to every block of every component in one batched
    matmul per component (YCbCr back to RGB for color, replication
    chroma upsample for 4:2:0).  Raises ValueError on truncation/
    corruption and NotImplementedError on progressive / arithmetic /
    other-sampled / restart-interval files."""
    h, w, samp, comp_coefs, qs = _jpeg_parse_coefs(payload)
    return _jpeg_reconstruct(
        [c[None] for c in comp_coefs], qs, h, w, samp
    )[0]
