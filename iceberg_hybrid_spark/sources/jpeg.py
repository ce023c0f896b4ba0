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


def _enc_np(table: dict, size: int):
    codes = np.zeros(size, dtype=np.int64)
    lens = np.zeros(size, dtype=np.int64)
    for sym, (c, ln) in table.items():
        codes[sym] = c
        lens[sym] = ln
    return codes, lens


# dense (tid, symbol) -> code/length arrays for the vectorized encoder:
# DC symbols are the 12 size categories, AC symbols the (run<<4)|size
# byte (length 0 = symbol absent from the table)
_ENC_NP = {
    "dc": tuple(
        np.stack(t)
        for t in zip(*(_enc_np(tb, 12) for tb in _ENC_TABLES["dc"]))
    ),
    "ac": tuple(
        np.stack(t)
        for t in zip(*(_enc_np(tb, 256) for tb in _ENC_TABLES["ac"]))
    ),
}


def _bitlen(x):
    """Vectorized int bit_length for |x| < 2**53: frexp's exponent of
    |x| as float64 is exactly floor(log2|x|)+1 for x != 0, and 0 for 0
    — the JPEG size category."""
    return np.frexp(np.abs(x).astype(np.float64))[1].astype(np.int64)


def _build_decode_lut(spec):
    """(BITS, HUFFVAL) -> 16-bit prefix lookup: ``sym[window]`` and
    ``length[window]`` (length 0 = invalid code), each as BOTH a Python
    list (fastest scalar indexing, used by the per-stream decoder) and
    the underlying int32 numpy array (vectorized gather, used by the
    cross-stream lockstep decoder).  One index replaces up to 16
    per-bit dictionary probes — the table-driven decoder every fast
    JPEG implementation uses."""
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
    return sym.tolist(), ln.tolist(), sym, ln


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
    """y plus CENTERED chroma (caller passes cb-128, cr-128): the
    centering runs once and round/clip run in place — value-identical
    to the textbook form (same products, same per-element operation
    order), fewer float64 temporaries (the batched decode path is
    memory-bandwidth-bound here)."""
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    np.round(out, out=out)
    np.clip(out, 0, 255, out=out)
    return out.astype(np.uint8)


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
    comp_zz, comp_last = [], []
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
        comp_last.append(np.where(has, 63 - rev.argmax(axis=2), 0))

    # Vectorized entropy scan across EVERY block of EVERY frame
    # (guide §4.2 — r13; the per-frame Python symbol loop was half the
    # encode cost): generate all Huffman items (DC code/amplitude, ZRL,
    # AC code/amplitude, EOB, per-frame byte padding) as flat arrays
    # with a (frame, schedule-slot, in-block-position) sort key, stable-
    # sort once into exact scan order, pack ALL frames' bits in one
    # pass, byte-stuff globally (per-byte local, so frame splits stay
    # exact), and slice per frame.  Bit-identical to the per-frame scan.
    M, sched_per = _scan_schedule_np(samp, ncomp, h, w)
    hdr = _header_for(gray, h, w, ncomp, tqs, samp)
    dcc_all, dcl_all = _ENC_NP["dc"]
    acc_all, acl_all = _ENC_NP["ac"]

    tid_s = np.empty(M, dtype=np.int64)
    dcs = np.empty((n, M), dtype=np.int64)
    prev = np.zeros((n, M), dtype=np.int64)
    acm = np.empty((n, M, 63), dtype=np.int64)
    lastm = np.empty((n, M), dtype=np.int64)
    for ci in range(ncomp):
        spos, sb = sched_per[ci]
        tid_s[spos] = tqs[ci]
        dcs[:, spos] = comp_zz[ci][:, sb, 0]
        prev[:, spos[1:]] = dcs[:, spos[:-1]]
        acm[:, spos] = comp_zz[ci][:, sb, 1:]
        lastm[:, spos] = comp_last[ci][:, sb]

    frame_key = 256 * (M + 1)  # per-frame key space: M blocks + pad slot
    # DC items (every block): code, then amplitude where size > 0
    diff = dcs - prev
    dsize = _bitlen(diff)
    base_dc = (
        np.arange(n, dtype=np.int64)[:, None] * frame_key
        + np.arange(M, dtype=np.int64)[None, :] * 256
    ).ravel()
    dsize_f = dsize.ravel()
    tid_f = np.tile(tid_s, n)
    k_dccode = base_dc
    v_dccode = dcc_all[tid_f, dsize_f]
    l_dccode = dcl_all[tid_f, dsize_f]
    damp_sel = np.flatnonzero(dsize_f)
    diff_f = diff.ravel()[damp_sel]
    dsz = dsize_f[damp_sel]
    k_dcamp = base_dc[damp_sel] + 1
    v_dcamp = diff_f + (diff_f < 0) * ((np.int64(1) << dsz) - 1)
    l_dcamp = dsz
    # AC items: nonzero coefficients in (frame, slot, position) order
    f_i, s_i, p_i = np.nonzero(acm)
    pos = p_i + 1
    same = np.zeros(pos.size, dtype=bool)
    if pos.size:
        same[1:] = (f_i[1:] == f_i[:-1]) & (s_i[1:] == s_i[:-1])
    prevpos = np.where(same, np.concatenate(([0], pos[:-1])), 0)
    run = pos - prevpos - 1
    v = acm[f_i, s_i, p_i]
    asize = _bitlen(v)
    if (asize > 10).any():
        raise ValueError("AC coefficient out of table range")
    zrl_n = run >> 4
    rs = ((run & 15) << 4) | asize
    tid_i = tid_s[s_i]
    base_ac = f_i * frame_key + s_i * 256 + 2 + 4 * p_i
    k_accode = base_ac + 1
    v_accode = acc_all[tid_i, rs]
    l_accode = acl_all[tid_i, rs]
    k_acamp = base_ac + 2
    v_acamp = v + (v < 0) * ((np.int64(1) << asize) - 1)
    l_acamp = asize
    zsel = np.repeat(np.arange(pos.size), zrl_n)
    k_zrl = base_ac[zsel]
    v_zrl = acc_all[tid_i[zsel], 0xF0]
    l_zrl = acl_all[tid_i[zsel], 0xF0]
    # EOB where the block's last nonzero is before position 63
    ef, es = np.nonzero(lastm < 63)
    k_eob = ef * frame_key + es * 256 + 255
    v_eob = acc_all[tid_s[es], 0x00]
    l_eob = acl_all[tid_s[es], 0x00]

    keys = np.concatenate([k_dccode, k_dcamp, k_zrl, k_accode, k_acamp,
                           k_eob])
    vals = np.concatenate([v_dccode, v_dcamp, v_zrl, v_accode, v_acamp,
                           v_eob])
    lens = np.concatenate([l_dccode, l_dcamp, l_zrl, l_accode, l_acamp,
                           l_eob])
    # per-frame 1-padding to a byte boundary, as its own item at the
    # frame's pad slot (identical bits to the per-frame _pack_bits pad)
    fbits = np.bincount(
        keys // frame_key, weights=lens, minlength=n
    ).astype(np.int64)
    pad = (-fbits) % 8
    keys = np.concatenate(
        [keys, np.arange(n, dtype=np.int64) * frame_key + 256 * M]
    )
    vals = np.concatenate([vals, (np.int64(1) << pad) - 1])
    lens = np.concatenate([lens, pad])

    order = np.argsort(keys, kind="stable")
    vals = vals[order]
    lens = lens[order]
    total = int(lens.sum())
    offs = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    idx = np.repeat(np.arange(lens.size), lens)
    j = np.arange(total) - offs[idx]
    bits = ((vals[idx] >> (lens[idx] - 1 - j)) & 1).astype(np.uint8)
    by = np.packbits(bits)
    # global 0xFF00 byte-stuffing (insertion is per byte, so per-frame
    # output slices are exactly the per-frame stuffed segments)
    ff = by == 0xFF
    if ff.any():
        shift = np.zeros(len(by), dtype=np.int64)
        np.cumsum(ff[:-1], out=shift[1:])
        out_b = np.zeros(len(by) + int(ff.sum()), dtype=np.uint8)
        out_b[np.arange(len(by)) + shift] = by
        ffcum = np.concatenate(([0], np.cumsum(ff)))
    else:
        out_b = by
        ffcum = np.zeros(len(by) + 1, dtype=np.int64)
    ends = np.cumsum((fbits + pad) // 8)
    starts = np.concatenate(([0], ends[:-1]))
    sb_ = out_b.tobytes()
    outs = []
    for f in range(n):
        a0 = int(starts[f] + ffcum[starts[f]])
        a1 = int(ends[f] + ffcum[ends[f]])
        outs.append(hdr + sb_[a0:a1] + b"\xff\xd9")
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


# numpy view of the MCU schedule, cached alongside it: per component,
# its schedule positions (visit order) and the block id visited there —
# the gather maps the vectorized encoder uses
_SCHED_NP_CACHE: dict = {}


def _scan_schedule_np(samp: str, ncomp: int, h: int, w: int):
    key = (samp, ncomp, h, w)
    hit = _SCHED_NP_CACHE.get(key)
    if hit is not None:
        return hit
    sched = _scan_schedule(samp, ncomp, h, w)
    M = len(sched)
    ci_arr = np.fromiter((c for c, _ in sched), dtype=np.int64, count=M)
    b_arr = np.fromiter((b for _, b in sched), dtype=np.int64, count=M)
    per = []
    for ci in range(ncomp):
        spos = np.flatnonzero(ci_arr == ci)
        per.append((spos, b_arr[spos]))
    hit = (M, per)
    _SCHED_NP_CACHE[key] = hit
    return hit


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


# bounded multi-entry header-parse cache: MJPG streams carry
# byte-identical headers on every frame and still-image corpora reuse a
# handful of (dims, tables) combinations, so one exact byte-compare of
# the prefix replaces the whole marker walk (identical bytes =>
# identical parsed state, including every validation the walk performs
# — the compare is against the EXACT bytes up to SOS recorded when the
# state was built; parsing stops at the first SOS, so any buffer
# starting with a cached prefix parses identically to it).  Multi-entry
# (r13): the old single-entry cache thrashed on corpora that interleave
# a few distinct shapes — e.g. the 12-shape jpeg_pixel_stats fixture
# missed on EVERY image.
_HEADER_STATE_CACHE: dict = {}
_HEADER_STATE_CACHE_MAX = 64


def _jpeg_parse_header(buf: bytes):
    """Marker walk of one baseline JPEG up to SOS: returns the parsed
    header state ``(qtabs, htabs, comps, samps, h, w, scan_comps,
    scan_start, samp)``, serving byte-identical header prefixes from
    the bounded cache.  All structural validation up to the scan lives
    here."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    for hk, state in _HEADER_STATE_CACHE.items():
        if buf.startswith(hk):
            return state
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
    if len(_HEADER_STATE_CACHE) >= _HEADER_STATE_CACHE_MAX:
        _HEADER_STATE_CACHE.clear()
    state = (qtabs, htabs, comps, samps, h, w, scan_comps, scan_start, samp)
    _HEADER_STATE_CACHE[buf[:scan_start]] = state
    return state


def _jpeg_parse_coefs(payload: bytes):
    """Marker walk + LUT entropy decode of one baseline JPEG: returns
    (h, w, samp, comp_coefs, qs) where ``comp_coefs`` is the
    per-component list of (n_blocks_c, 64) zigzag coefficient arrays
    and ``qs`` the per-component dequantization tables.  All structural
    validation lives here so the (batchable) reconstruction stage can
    assume clean input."""
    buf = bytes(payload)
    (qtabs, htabs, comps, samps, h, w, scan_comps, scan_start,
     samp) = _jpeg_parse_header(buf)
    return _jpeg_entropy_and_finish(
        buf, qtabs, htabs, comps, h, w, scan_comps, scan_start, samp
    )


def _entropy_segment(buf: bytes, scan_start: int) -> bytes:
    """Locate, validate, and unstuff the entropy-coded segment: the
    first 0xFF followed by a non-stuffing byte is a marker (RSTn ->
    unsupported); one C-speed ``replace`` removes the 0xFF00 stuffing;
    the EOI trailer must exist past the scan (truncation check)."""
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
    if b"\xff\xd9" not in buf[end:]:
        raise ValueError("truncated JPEG: no EOI marker")
    return buf[scan_start:end].replace(b"\xff\x00", b"\xff")


def _jpeg_entropy_and_finish(buf, qtabs, htabs, comps, h, w, scan_comps,
                             scan_start, samp):
    ncomp = len(scan_comps)
    unstuffed = _entropy_segment(buf, scan_start)
    real_bits = 8 * len(unstuffed)
    # 4 zero bytes allow a flat 4-byte window peek at the tail
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
        out = planes[0]
        np.round(out, out=out)
        np.clip(out, 0, 255, out=out)
        return out.astype(np.uint8)
    y, cb, cr = planes
    if samp == "420":
        # chroma products at QUARTER resolution, then replication-
        # upsampled: up() is element replication, so every per-pixel
        # product equals the full-resolution one bit-for-bit, and the
        # add/subtract order against y is unchanged — value-identical
        # to upsample-then-transform at a quarter of the float traffic.
        cbc = cb - 128.0
        crc = cr - 128.0

        def up(p):
            return p.repeat(2, axis=1).repeat(2, axis=2)

        r = y + up(1.402 * crc)
        g = y - up(0.344136 * cbc)
        g -= up(0.714136 * crc)
        b = y + up(1.772 * cbc)
        out = np.stack([r, g, b], axis=-1)
        np.round(out, out=out)
        np.clip(out, 0, 255, out=out)
        return out.astype(np.uint8)
    return _ycbcr_to_rgb(y, cb - 128.0, cr - 128.0)


# Lockstep decode: below this many same-header streams the vectorized
# state machine's per-step numpy-call overhead loses to the scalar
# per-stream loop (measured crossover ~4-8 streams on this class of
# payload); at or above it, every step decodes one Huffman symbol for
# EVERY stream at once.
_LOCKSTEP_MIN = 8
# bound one lockstep slab's working set (the (streams x bytes) window
# matrix is ~5x payload bytes)
_LOCKSTEP_MAX_BYTES = 64 << 20


def _decode_group_lockstep(bufs, state):
    """Entropy-decode N baseline JPEGs that share one identical header
    prefix (same dims/sampling/tables — hence the same MCU schedule) in
    LOCKSTEP: one vectorized step decodes the next Huffman symbol of
    every still-active stream (guide §4.2 — frames/images are
    independent, so the format's bit-level sequential dependency only
    binds WITHIN a stream; across streams the bit cursors advance as a
    numpy vector).  Returns (flat, err) where ``flat`` is the
    (N, total_blocks*64) zigzag coefficient matrix and ``err`` marks
    streams that diverged (invalid code / bad category / run overflow /
    truncated stream) — the caller re-runs those through the scalar
    decoder, which reproduces the exact per-payload exception, so the
    lockstep path only ever SERVES streams it decoded cleanly."""
    (qtabs, htabs, comps, samps, h, w, scan_comps, scan_start,
     samp) = state
    ncomp = len(scan_comps)
    N = len(bufs)
    err = np.zeros(N, dtype=bool)
    segs = []
    for j, buf in enumerate(bufs):
        try:
            segs.append(_entropy_segment(buf, scan_start))
        except Exception:
            segs.append(b"")
            err[j] = True
    lens = np.fromiter((len(s) for s in segs), dtype=np.int64, count=N)
    real_bits = lens * 8
    maxlen = int(lens.max()) + 8
    B = np.zeros((N, maxlen), dtype=np.uint8)
    for j, s in enumerate(segs):
        if s:
            B[j, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    b32 = B.astype(np.uint32)
    # big-endian 32-bit window starting at every byte offset: the same
    # flat 4-byte peek the scalar reader does, for all streams at once
    W = (
        (b32[:, :-3] << 24)
        | (b32[:, 1:-2] << 16)
        | (b32[:, 2:-1] << 8)
        | b32[:, 3:]
    ).astype(np.int64)
    max_i = W.shape[1] - 1

    def _tabs(tclass, sel_idx):
        out_sym, out_len = [], []
        for ci in range(ncomp):
            t = htabs.get((tclass, scan_comps[ci][sel_idx]))
            if t is None:
                raise ValueError("scan references a missing Huffman table")
            out_sym.append(t[2])
            out_len.append(t[3])
        return (
            np.stack(out_sym).astype(np.int64),
            np.stack(out_len).astype(np.int64),
        )

    dc_sym, dc_len = _tabs(0, 1)
    ac_sym, ac_len = _tabs(1, 2)

    sched = _scan_schedule(samp, ncomp, h, w)
    M = len(sched)
    sched_ci = np.fromiter((c for c, _ in sched), dtype=np.int64, count=M)
    nb_y = (h // 8) * (w // 8)
    comp_nb = [
        nb_y if (samp == "444" or ci == 0) else nb_y // 4
        for ci in range(ncomp)
    ]
    comp_off = np.concatenate(
        ([0], np.cumsum(comp_nb))
    )[:ncomp].astype(np.int64)
    sched_off = np.fromiter(
        ((comp_off[c] + b) * 64 for c, b in sched), dtype=np.int64, count=M
    )
    total = int(sum(comp_nb))
    flat = np.zeros((N, total * 64), dtype=np.int64)

    # flat views: 1-D ``take``/scatter beats 2-D fancy indexing, and the
    # loop below runs once per Huffman SYMBOL — its numpy dispatch count
    # is the whole cost model
    Wstride = W.shape[1]
    Wf = W.ravel()
    dc_sym_f, dc_len_f = dc_sym.ravel(), dc_len.ravel()
    ac_sym_f, ac_len_f = ac_sym.ravel(), ac_len.ravel()
    flat_f = flat.ravel()
    row_w = total * 64

    # per-stream state, kept COMPACTED to active streams; a stream that
    # diverges (invalid code / DC category / run overflow) is flagged
    # in ``err`` and ejected by forcing its schedule index to M
    sid = np.flatnonzero(~err).astype(np.int64)
    pos = np.zeros(sid.size, dtype=np.int64)
    m = np.zeros(sid.size, dtype=np.int64)
    k = np.zeros(sid.size, dtype=np.int64)
    in_ac = np.zeros(sid.size, dtype=bool)
    prev_dc = np.zeros((sid.size, ncomp), dtype=np.int64)
    one = np.int64(1)
    while sid.size:
        wbase = sid * Wstride
        win = (
            Wf.take(wbase + np.minimum(pos >> 3, max_i))
            >> (16 - (pos & 7))
        ) & 0xFFFF
        ci = sched_ci.take(m)
        lut = ci * 65536 + win
        # mode snapshot BEFORE the DC step flips streams to AC: a
        # stream decodes exactly ONE symbol per iteration
        start_ac = in_ac.copy()
        dix = np.flatnonzero(~start_ac)
        if dix.size:
            ln = dc_len_f.take(lut.take(dix))
            size = dc_sym_f.take(lut.take(dix))
            bd = (ln == 0) | (size > 11)
            if bd.any():
                size = np.where(bd, 0, size)
                b = dix[bd]
                err[sid.take(b)] = True
                m[b] = M  # eject through the finished path
            p2 = pos.take(dix) + ln
            v = (
                Wf.take(wbase.take(dix) + np.minimum(p2 >> 3, max_i))
                >> (32 - (p2 & 7) - size)
            ) & ((one << size) - 1)
            half = (one << size) >> 1  # size 0 -> 0: extend(0,0)=0 holds
            c_d = ci.take(dix)
            dcv = prev_dc[dix, c_d] + v - (v < half) * (2 * half - 1)
            prev_dc[dix, c_d] = dcv
            # min() clamp: ejected (err) streams carry m == M; their
            # row is garbage by contract and never served
            flat_f[
                sid.take(dix) * row_w
                + sched_off.take(np.minimum(m.take(dix), M - 1))
            ] = dcv
            pos[dix] = p2 + size
            in_ac[dix] = True
            k[dix] = 1
        aix = np.flatnonzero(start_ac)
        if aix.size:
            ln = ac_len_f.take(lut.take(aix))
            rs = ac_sym_f.take(lut.take(aix))
            bd = ln == 0
            if bd.any():
                rs = np.where(bd, 0, rs)  # forced EOB keeps math valid
                b = aix[bd]
                err[sid.take(b)] = True
                m[b] = M
            p2 = pos.take(aix) + ln
            eob = rs == 0
            zrl = rs == 0xF0
            other = ~(eob | zrl)
            kk = k.take(aix) + np.where(zrl, 16, other * (rs >> 4))
            overrun = other & (kk > 63)  # "AC run past end of block"
            if overrun.any():
                b = aix[overrun]
                err[sid.take(b)] = True
                m[b] = M
                other = other & ~overrun
            size = other * (rs & 15)
            v = (
                Wf.take(wbase.take(aix) + np.minimum(p2 >> 3, max_i))
                >> (32 - (p2 & 7) - size)
            ) & ((one << size) - 1)
            half = (one << size) >> 1
            val = v - (v < half) * (2 * half - 1)
            wsel = np.flatnonzero(other)
            asel = aix.take(wsel)
            flat_f[
                sid.take(asel) * row_w
                + sched_off.take(m.take(asel))
                + np.minimum(kk.take(wsel), 63)
            ] = val.take(wsel)
            kk = kk + other
            blk_done = eob | (kk > 63)
            pos[aix] = p2 + size
            k[aix] = kk * ~blk_done
            m[aix] += blk_done
            in_ac[aix] = ~blk_done
        finished = m >= M
        if finished.any():
            # the scalar reader checks stream truncation once, at the
            # end of the schedule — replicate exactly (ejected err
            # streams pass through here too; err is already set)
            err[sid[finished & (pos > real_bits.take(sid))]] = True
            keep = ~finished
            sid, pos, m, k, in_ac = (
                sid[keep], pos[keep], m[keep], k[keep], in_ac[keep]
            )
            prev_dc = prev_dc[keep]
    return flat, err, comp_off, comp_nb


def jpeg_decode_batch(payloads):
    """Decode MANY independent baseline JPEGs (the cross-stream hot
    path: a whole Arrow batch of stills, or every frame of every video
    in a batch).  Payloads sharing an identical pre-scan header (same
    dims/sampling/tables) are grouped; groups of >= ``_LOCKSTEP_MIN``
    entropy-decode in lockstep (one vectorized step per Huffman symbol
    across all streams) and reconstruct in one batched dequant+IDCT per
    slab; smaller groups and any stream the lockstep flags take the
    scalar per-payload path, which also reproduces exact per-payload
    errors.  Returns decoded arrays in input order; raises the
    earliest-index payload's error, matching a caller that decodes
    sequentially."""
    n = len(payloads)
    out: list = [None] * n
    errors: dict = {}
    groups: dict = {}
    for idx in range(n):
        buf = bytes(payloads[idx])
        try:
            state = _jpeg_parse_header(buf)
        except Exception as e:  # noqa: BLE001 — re-raised by index below
            errors[idx] = e
            continue
        groups.setdefault(id(state), (state, []))[1].append((idx, buf))

    def _scalar(idx, buf):
        try:
            h, w, samp, comp_coefs, qs = _jpeg_parse_coefs(buf)
            out[idx] = _jpeg_reconstruct(
                [c[None] for c in comp_coefs], qs, h, w, samp
            )[0]
        except Exception as e:  # noqa: BLE001 — re-raised by index below
            errors[idx] = e

    for state, members in groups.values():
        (qtabs, htabs, comps, samps, h, w, scan_comps, scan_start,
         samp) = state
        if len(members) < _LOCKSTEP_MIN:
            for idx, buf in members:
                _scalar(idx, buf)
            continue
        qs = []
        for ci in range(len(scan_comps)):
            q = qtabs.get(comps[ci][1])
            if q is None:
                qs = None
                break
            qs.append(q)
        if qs is None:
            for idx, buf in members:  # missing DQT: scalar raises it
                _scalar(idx, buf)
            continue
        # slab the group so the lockstep working set stays bounded:
        # the window matrix costs ~40 bytes per payload byte (int64
        # windows + transients) and the coefficient matrix 512 bytes
        # per 8x8 block per stream
        mcu = 16 if samp == "420" else 8
        blocks = (h // mcu) * (w // mcu) * (6 if samp == "420" else len(scan_comps))
        per_stream = 40 * max(len(b) for _, b in members) + 512 * blocks
        slab_n = int(_LOCKSTEP_MAX_BYTES // max(per_stream, 1))
        if slab_n < _LOCKSTEP_MIN:
            for idx, buf in members:  # huge payloads: scalar path
                _scalar(idx, buf)
            continue
        for s0 in range(0, len(members), slab_n):
            slab = members[s0 : s0 + slab_n]
            bufs = [b for _, b in slab]
            try:
                flat, err, comp_off, comp_nb = _decode_group_lockstep(
                    bufs, state
                )
            except Exception:  # noqa: BLE001 — per-payload retry decides
                for idx, buf in slab:
                    _scalar(idx, buf)
                continue
            ok = np.flatnonzero(~err)
            if ok.size:
                coefs3 = flat.reshape(len(bufs), -1, 64)
                # reconstruct in CACHE-RESIDENT slabs: the dequant+IDCT+
                # color chain allocates ~10 float64 temporaries per
                # plane, so one giant batch falls off the memory-
                # bandwidth cliff (the r12 session measured exactly this
                # on the encode side) while per-payload calls pay numpy
                # dispatch ~50x per tiny frame.  ~2 MB of plane data per
                # slab keeps both small.
                rs_n = max(8, int((2 << 20) // max(h * w * 8, 1)))
                for r0 in range(0, ok.size, rs_n):
                    sel = ok[r0 : r0 + rs_n]
                    comp_coefs = [
                        np.ascontiguousarray(
                            coefs3[
                                sel, comp_off[ci] : comp_off[ci] + comp_nb[ci]
                            ]
                        )
                        for ci in range(len(comp_nb))
                    ]
                    recon = _jpeg_reconstruct(comp_coefs, qs, h, w, samp)
                    for r, j in enumerate(sel):
                        out[slab[j][0]] = recon[r]
            for j in np.flatnonzero(err):
                _scalar(*slab[j])
    if errors:
        raise errors[min(errors)]
    return out


def jpeg_decode_frames(payloads):
    """Decode a list of SAME-SHAPE baseline JPEGs (an MJPG video's
    frames) through :func:`jpeg_decode_batch` (same-header frames
    entropy-decode in lockstep and reconstruct batched); raises
    ValueError if shapes differ.  Adaptive-quality MJPG (per-frame DQT)
    lands in different header groups and decodes per group."""
    arrs = jpeg_decode_batch(payloads)
    shp = arrs[0].shape
    if any(a.shape != shp for a in arrs[1:]):
        raise ValueError("jpeg_decode_frames requires same-shape frames")
    return np.stack(arrs)


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
