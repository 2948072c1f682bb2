"""Baseline JPEG (ITU-T T.81 / JFIF) codec — pure stdlib + NumPy.

The last hash-fallback image modality becomes REAL: a full baseline
decoder (marker walk, DQT/DHT/SOF0/SOS/DRI parsing, canonical Huffman
decode with byte-stuffing and restart markers, dequantize, de-zigzag,
vectorized float64 IDCT, nearest-neighbor chroma upsample, JFIF
YCbCr->RGB) plus the matching encoder used by test fixtures and the
closed-form synthetic corpus. The reference has no image operators;
the format knowledge is the public T.81 spec. Anything the decoder
does not support (progressive SOF2, 12-bit precision, arithmetic
coding) is REJECTED with ValueError, never mis-decoded — same
quarantine contract as ``media._parse_png``.

Oracle determinism (how a lossy codec gets a value hash): with
all-ones quantization tables, an image whose 8x8 blocks are each
CONSTANT quantizes to a single exact-integer DC coefficient per block
(the float64 forward-DCT error is ~1e-13, far under the 0.5 rounding
radius) and zero AC, so decode returns the source plane values
EXACTLY. ``synth_jpeg`` builds such block-constant YCbCr planes from
a closed-form formula in (id, block), and the DuckDB oracle replays
the pixel values through the same JFIF color-convert arithmetic
(float64 on both engines — see ``workload.media_decode_jpeg``).
Compressed bytes never reach the oracle.

Scale notes: decode is map-only (rides ``media.decode_media``'s
mapInPandas seam — payloads never shuffle). Huffman decode is a
per-block Python loop (fine at the thumbnail scale this tier
exercises; a libjpeg-turbo/Pillow backend plugs into the same
``media._try_decode_pixels`` seam for bulk crawls); the IDCT is one
vectorized einsum per component.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """Natural (row*8+col) indices in zigzag scan order, derived from
    the T.81 diagonal-walk definition rather than transcribed."""
    out = []
    for d in range(15):
        rows = range(max(0, d - 7), min(d, 7) + 1)
        for r in (rows if d % 2 else reversed(list(rows))):
            out.append(r * 8 + (d - r))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

#: orthonormal 8-point DCT-II matrix: A[u, x] = C(u)/2 cos((2x+1)u pi/16).
#: Forward blockwise DCT = A f A^T, inverse = A^T F A (A is orthogonal).
_A = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])

#: all-ones quantization table: block-constant inputs round-trip
#: exactly (see module docstring); used by synth/test fixtures.
Q_ONES = np.ones((8, 8), dtype=np.int64)


def demo_quant(strength: int = 4) -> np.ndarray:
    """A non-trivial deterministic quantization table for lossy-path
    tests: 1 + strength*(r + c) — low frequencies kept finer, like the
    Annex K tables, without transcribing 128 spec constants."""
    r, c = np.mgrid[0:8, 0:8]
    return (1 + strength * (r + c)).astype(np.int64)


def _huff_spec(nsyms: int) -> tuple[list[int], list[int]]:
    """Flat canonical Huffman spec: all ``nsyms`` symbols at one code
    length L with 2^L > nsyms, leaving the all-ones code unused (T.81
    requires it free for padding). Compression is irrelevant here —
    correctness and decoder generality are what the tables exercise;
    the decoder reads ANY valid DHT."""
    length = 1
    while (1 << length) <= nsyms:
        length += 1
    bits = [0] * 17
    bits[length] = nsyms
    return bits, list(range(nsyms))


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG code assignment: symbol -> (length, code)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


#: the baseline AC alphabet: EOB, ZRL, and (run 0..15, size 1..10) —
#: 162 symbols, the same set the Annex K tables cover (a DHT length
#: count is one byte, so a flat 256-symbol table would be invalid).
_AC_ALPHABET = sorted([0x00, 0xF0]
                      + [r * 16 + s for r in range(16)
                         for s in range(1, 11)])

_DC_BITS, _DC_VALS = _huff_spec(12)     # DC categories 0..11
_AC_BITS, _AC_VALS = _huff_spec(len(_AC_ALPHABET))
_AC_VALS = _AC_ALPHABET


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (0xFF -> 0xFF
    0x00) and 1-padding to the byte boundary on flush."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:
                    self.buf.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """MSB-first reader over stuffing-stripped entropy bytes."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("JPEG entropy data exhausted")
        b = (self.buf[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(value: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit magnitude field to its signed
    coefficient value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(BY*8, BX*8) float plane -> (BY, BX, 64) quantized zigzag ints."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coeff = np.einsum("ux,ijxy,vy->ijuv", _A, blocks, _A)
    quant = np.round(coeff / qtab).astype(np.int64)
    return quant.reshape(by, bx, 64)[:, :, ZIGZAG]


def _pad_to(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Edge-replicate a plane up to (rows, cols)."""
    h, w = plane.shape
    return np.pad(plane, ((0, rows - h), (0, cols - w)), mode="edge")


def _encode_block(w: _BitWriter, zz: np.ndarray, dc_pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    diff = int(zz[0]) - dc_pred
    size = abs(diff).bit_length()
    length, code = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            length, code = ac_codes[0xF0]          # ZRL
            w.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        length, code = ac_codes[run * 16 + size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        length, code = ac_codes[0x00]              # EOB
        w.write(code, length)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def encode_jpeg_planes(planes: list[np.ndarray],
                       sampling: list[tuple[int, int]],
                       size: tuple[int, int],
                       quant: list[np.ndarray] | None = None,
                       restart_interval: int = 0) -> bytes:
    """Encode component planes (each at its OWN resolution) as a
    baseline JFIF stream. ``planes[i]`` must be ceil(W*h_i/hmax) x
    ceil(H*v_i/vmax); ``size`` = (W, H) of the image. One plane =
    grayscale; three = YCbCr. ``quant`` gives [luma, chroma] tables
    (natural order; default all-ones for the exact block-constant
    round-trip). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (decoder-generality fixture)."""
    w_img, h_img = size
    n = len(planes)
    if n not in (1, 3) or len(sampling) != n:
        raise ValueError("expected 1 or 3 planes with matching sampling")
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    for i, (p, (h, v)) in enumerate(zip(planes, sampling)):
        cw = -(-w_img * h // hmax)
        ch = -(-h_img * v // vmax)
        if p.shape != (ch, cw):
            raise ValueError(
                f"plane {i} is {p.shape}, expected {(ch, cw)}")
    if quant is None:
        quant = [Q_ONES, Q_ONES]
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    zz = []
    for p, (h, v) in zip(planes, sampling):
        padded = _pad_to(p.astype(np.float64), mcus_y * v * 8,
                         mcus_x * h * 8)
        zz.append(_fdct_quant(padded, quant[0 if not zz else 1]))

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytearray()
    for tid in range(min(n, 2)):
        dqt.append(tid)                                # Pq=0 | Tq
        dqt += bytes(int(x) for x in
                     quant[tid].reshape(64)[ZIGZAG])   # zigzag order
    out += _seg(0xDB, bytes(dqt))
    sof = bytearray([8]) + h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big")
    sof.append(n)
    for i, (h, v) in enumerate(sampling):
        sof += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    out += _seg(0xC0, bytes(sof))
    dht = bytearray()
    for tid in range(min(n, 2)):
        dht += bytes([tid]) + bytes(_DC_BITS[1:]) + bytes(_DC_VALS)
        dht += bytes([0x10 | tid]) + bytes(_AC_BITS[1:]) + bytes(_AC_VALS)
    out += _seg(0xC4, bytes(dht))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([n])
    for i in range(n):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += b"\x00\x3F\x00"
    out += _seg(0xDA, bytes(sos))

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_BITS, _AC_VALS)
    writer = _BitWriter()
    preds = [0] * n
    total_mcus = mcus_x * mcus_y
    rst = 0
    for m in range(total_mcus):
        my, mx = divmod(m, mcus_x)
        for ci, (h, v) in enumerate(sampling):
            for by in range(v):
                for bx in range(h):
                    preds[ci] = _encode_block(
                        writer, zz[ci][my * v + by][mx * h + bx],
                        preds[ci], dc_codes, ac_codes)
        if restart_interval and (m + 1) % restart_interval == 0 \
                and m + 1 < total_mcus:
            writer.flush()
            writer.buf += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            preds = [0] * n
    writer.flush()
    out += writer.buf
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """JFIF RGB -> YCbCr, floor(x+0.5) rounding, uint8."""
    r = arr[..., 0].astype(np.float64)
    g = arr[..., 1].astype(np.float64)
    b = arr[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def encode_jpeg(arr: np.ndarray, subsample: bool = True,
                quant: list[np.ndarray] | None = None,
                restart_interval: int = 0) -> bytes:
    """uint8 (H, W, 3) RGB or (H, W) grayscale -> baseline JFIF bytes.
    Color goes through JFIF YCbCr; ``subsample`` picks 4:2:0 (2x2 box
    mean chroma downsample) vs 4:4:4."""
    if arr.ndim == 2:
        return encode_jpeg_planes([arr], [(1, 1)],
                                  (arr.shape[1], arr.shape[0]),
                                  quant=quant,
                                  restart_interval=restart_interval)
    h, w = arr.shape[:2]
    ycc = rgb_to_ycbcr(arr).astype(np.float64)
    if not subsample:
        return encode_jpeg_planes(
            [ycc[..., 0], ycc[..., 1], ycc[..., 2]],
            [(1, 1), (1, 1), (1, 1)], (w, h), quant=quant,
            restart_interval=restart_interval)
    padded = np.pad(ycc, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    ph, pw = padded.shape[:2]
    quads = padded.reshape(ph // 2, 2, pw // 2, 2, 3)
    sub = np.floor(quads.mean(axis=(1, 3)) + 0.5)
    return encode_jpeg_planes(
        [ycc[..., 0], sub[..., 1], sub[..., 2]],
        [(2, 2), (1, 1), (1, 1)], (w, h), quant=quant,
        restart_interval=restart_interval)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _decode_lookup(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol map for _BitReader.read_huffman."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _idct_blocks(coeff: np.ndarray) -> np.ndarray:
    """(N, 8, 8) dequantized coefficients -> (N, 8, 8) uint8 samples
    (one einsum; floor(x+0.5) rounding, clamped)."""
    f = np.einsum("xu,nuv,yv->nxy", _A.T, coeff, _A.T) + 128.0
    return np.clip(np.floor(f + 0.5), 0, 255).astype(np.uint8)


def _parse_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (H, W, 3) RGB (grayscale output is
    channel-replicated). General over the baseline feature set: any
    valid DQT/DHT tables, 1 or 3 components, sampling factors 1..4
    with integer upsample ratios, restart markers. Progressive /
    extended / arithmetic variants raise ValueError."""
    if data[:3] != b"\xFF\xD8\xFF":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    dri = 0
    pos = 2
    scan = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI before SOS: invalid
            raise ValueError("JPEG ended before scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                            # standalone markers
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        ln = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + ln]
        if ln < 2 or len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("unsupported 16-bit quant table")
                if i + 65 > len(seg):
                    raise ValueError("truncated DQT")
                tab = np.frombuffer(seg[i + 1:i + 65],
                                    dtype=np.uint8).astype(np.int64)
                qt[tq] = tab[UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits = [0] + list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT")
                huff[(cls, tid)] = _decode_lookup(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:                    # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("unsupported JPEG sample precision")
            h_img = int.from_bytes(seg[1:3], "big")
            w_img = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if h_img <= 0 or w_img <= 0 or ncomp not in (1, 3):
                raise ValueError("unsupported JPEG geometry")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                h, v = hv >> 4, hv & 15
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError("bad JPEG sampling factors")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            sof = (w_img, h_img, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline JPEG (SOF0) is supported")
        elif marker == 0xDD:                    # DRI
            dri = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:                    # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 15))
            scan = (scan_comps, pos + ln)
            break
        pos += ln
    if sof is None or scan is None:
        raise ValueError("missing JPEG SOF/SOS")
    w_img, h_img, comps = sof
    scan_comps, dpos = scan
    if len(scan_comps) != len(comps):
        raise ValueError("JPEG partial scans unsupported")
    # coeffs/preds below are indexed by scan position but allocated and
    # consumed (zip(comps, coeffs)) in SOF order — a spec-invalid stream
    # whose SOS reorders components would decode with swapped channels,
    # so it quarantines instead (rejected, never mis-decoded)
    if [sc[0] for sc in scan_comps] != [c["id"] for c in comps]:
        raise ValueError("JPEG SOS component order differs from SOF")
    by_id = {c["id"]: c for c in comps}
    order = []
    for cid, td, ta in scan_comps:
        if cid not in by_id:
            raise ValueError("JPEG scan references unknown component")
        c = by_id[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG scan references missing Huffman table")
        if c["tq"] not in qt:
            raise ValueError("JPEG component references missing quant table")
        order.append((c, huff[(0, td)], huff[(1, ta)]))

    # entropy segment: strip stuffing, split at restart markers
    chunks: list[bytes] = []
    cur = bytearray()
    i = dpos
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else None
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
            continue
        if nxt is not None and 0xD0 <= nxt <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            i += 2
            continue
        break
    chunks.append(bytes(cur))
    if data[i:i + 2] != b"\xFF\xD9":
        raise ValueError("JPEG scan not terminated by EOI")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    total_mcus = mcus_x * mcus_y
    coeffs = [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8),
                       dtype=np.float64) for c in comps]
    preds = [0] * len(comps)
    chunk_i = 0
    reader = _BitReader(chunks[0])
    for m in range(total_mcus):
        if dri and m and m % dri == 0:
            chunk_i += 1
            if chunk_i >= len(chunks):
                raise ValueError("missing JPEG restart marker")
            reader = _BitReader(chunks[chunk_i])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (c, dc_tab, ac_tab) in enumerate(order):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    size = reader.read_huffman(dc_tab)
                    preds[ci] += _extend(reader.read_bits(size), size)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.read_huffman(ac_tab)
                        if rs == 0x00:          # EOB
                            break
                        run, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if run != 15:
                                raise ValueError("bad JPEG AC symbol")
                            k += 16             # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC run overflows block")
                        zz[k] = _extend(reader.read_bits(sz), sz)
                        k += 1
                    block = (zz[UNZIGZAG].reshape(8, 8)
                             * qt[c["tq"]]).astype(np.float64)
                    coeffs[ci][my * c["v"] + by, mx * c["h"] + bx] = block

    planes = []
    for c, co in zip(comps, coeffs):
        brows, bcols = co.shape[:2]
        px = _idct_blocks(co.reshape(-1, 8, 8))
        plane = (px.reshape(brows, bcols, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(brows * 8, bcols * 8))
        cw = -(-w_img * c["h"] // hmax)
        ch = -(-h_img * c["v"] // vmax)
        plane = plane[:ch, :cw]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer JPEG upsample ratio")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h_img, :w_img])

    if len(planes) == 1:
        return np.stack([planes[0]] * 3, axis=-1)
    # JFIF YCbCr -> RGB; expression shape mirrored EXACTLY by the
    # DuckDB oracle (same float64 literals, same association order,
    # floor(x+0.5) then clamp) so block-constant corpora value-hash.
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64)
    cr = planes[2].astype(np.float64)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Synthetic corpora (closed-form oracles — see workload.media_decode_jpeg)
# ---------------------------------------------------------------------------

def synth_jpeg(spark, n: int = 24):
    """Deterministic REAL baseline-JPEG color corpus: image ``id`` is
    16 x (16*(id%2+1)) YCbCr 4:2:0 with BLOCK-CONSTANT planes — luma
    block ``k`` (raster order, ``wb = W/8`` per row) is
    ``(id*37 + k*11) % 251``; the chroma blocks of MCU ``m`` are
    ``Cb = (id*53 + m*17) % 251`` / ``Cr = (id*29 + m*23) % 251``.
    With the all-ones quant tables every plane value survives
    encode->decode EXACTLY (DC-only blocks — module docstring), so a
    DuckDB oracle replays the decoded RGB through the same JFIF
    conversion arithmetic. Generated via mapInPandas like
    ``media.synth_png`` (entropy coding has no Column expression)."""
    import pandas as pd
    from collections.abc import Iterator

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                w = 16 * (i % 2 + 1)
                wb = w // 8
                yv = ((i * 37 + np.arange(2 * wb) * 11) % 251) \
                    .reshape(2, wb).astype(np.float64)
                y_plane = np.repeat(np.repeat(yv, 8, 0), 8, 1)
                mx = wb // 2
                cbv = ((i * 53 + np.arange(mx) * 17) % 251) \
                    .reshape(1, mx).astype(np.float64)
                crv = ((i * 29 + np.arange(mx) * 23) % 251) \
                    .reshape(1, mx).astype(np.float64)
                cb_plane = np.repeat(np.repeat(cbv, 8, 0), 8, 1)
                cr_plane = np.repeat(np.repeat(crv, 8, 0), 8, 1)
                payload = encode_jpeg_planes(
                    [y_plane, cb_plane, cr_plane],
                    [(2, 2), (1, 1), (1, 1)], (w, 16))
                out.append((f"jpg_{i}", "image", payload, "image/jpeg",
                            w, 16, 0, {"source": "synthetic-jpeg"}))
            yield pd.DataFrame(out, columns=[
                "media_id", "modality", "payload", "mime_type",
                "width", "height", "duration_ms", "metadata"])

    return spark.range(n).mapInPandas(gen, (
        "media_id STRING, modality STRING, payload BINARY, "
        "mime_type STRING, width INT, height INT, duration_ms LONG, "
        "metadata MAP<STRING,STRING>"))


def synth_jpeg_gray(spark, n: int = 16, id_mod: int | None = None,
                    bump: tuple[int, int] | None = None,
                    id_prefix: str = "jpgg_"):
    """Deterministic REAL grayscale baseline-JPEG corpus (the
    1-component SOF path): fixed 32x16, luma block ``k`` (4 per row) =
    ``(eid*37 + k*11) % 251``. Same near-dup knobs as ``synth_ppm``:
    ``id_mod`` collapses ids to residue classes (byte-identical
    duplicates), ``bump=(k0, delta)`` retouches block ``k0`` before
    the modulus — both closed-form for the dHash oracle
    (workload.media_dhash_jpeg)."""
    import pandas as pd
    from collections.abc import Iterator

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                eid = i % id_mod if id_mod else i
                ks = np.arange(8)
                vals = eid * 37 + ks * 11
                if bump:
                    vals = vals + np.where(ks == bump[0], bump[1], 0)
                yv = (vals % 251).reshape(2, 4).astype(np.float64)
                y_plane = np.repeat(np.repeat(yv, 8, 0), 8, 1)
                payload = encode_jpeg_planes([y_plane], [(1, 1)], (32, 16))
                out.append((f"{id_prefix}{i}", "image", payload,
                            "image/jpeg", 32, 16, 0,
                            {"source": "synthetic-jpeg"}))
            yield pd.DataFrame(out, columns=[
                "media_id", "modality", "payload", "mime_type",
                "width", "height", "duration_ms", "metadata"])

    return spark.range(n).mapInPandas(gen, (
        "media_id STRING, modality STRING, payload BINARY, "
        "mime_type STRING, width INT, height INT, duration_ms LONG, "
        "metadata MAP<STRING,STRING>"))
