"""Pure-numpy baseline JPEG (ITU-T T.81 / JFIF) codec.

Closes the last *image* gap in the multimodal plug point
(`multimodal._decode_image_bytes`): this container has no PIL/cv2, so
round 2 established JPEG as codec-blocked and round 3/4 made every
non-entropy-coded format (PNG/GIF/PNM/BMP/WAV) real. Baseline JPEG's
entropy coder, however, is just canonical Huffman over zig-zagged
quantized 8x8 DCT blocks — implementable with stdlib + numpy, like the
PNG path. Reference parity: the reference engine (graphiti) has no
image pipeline at all; this module serves the *training-data-pipeline*
multimodal requirement, mirroring what a real crawl pass needs (JPEG is
the dominant lossy web image format).

Scope (documented, spec-cited):
- DECODE: baseline sequential DCT (SOF0/SOF1) AND progressive DCT
  (SOF2, T.81 G.1.2: spectral selection + successive approximation —
  DC/AC first scans, DC bit-refinement, AC refinement with EOB runs and
  buffered correction bits, interleaved DC / non-interleaved AC scan
  geometry), 8-bit samples, 1 or 3 components, any sampling factors up
  to 4:2:0, generic DQT/DHT table parsing (so files from ANY conformant
  encoder decode, not just ours), restart markers (DRI/RSTn),
  byte-stuffing. Arithmetic coding and hierarchical mode raise
  ``ValueError``.
- ENCODE (test-support, like multimodal.encode_png/encode_gif): SOI /
  JFIF APP0 / DQT / SOF0 / DHT / [DRI] / SOS / EOI with grayscale,
  4:4:4 or 4:2:0 color; plus a progressive (SOF2) encoder with two
  scan scripts ("standard" successive-approximation / "simple"
  spectral-selection-only) and per-scan restart markers, emitting the
  exact baseline coefficients so progressive decode is testable
  bit-for-bit against baseline decode. Huffman tables are generated canonically from
  (BITS, HUFFVAL) rather than copied from Annex K — any prefix-valid
  table is spec-conformant because the tables travel IN the file; only
  the compression ratio differs, never correctness. This also keeps the
  decoder honest: it must parse tables generically.

Like the other pure-python decoders this is a correctness-first
reference implementation: per-block Python loops are fine at test
scale, and at 100 TB the decode stage is embarrassingly parallel inside
``mapInPandas`` anyway (swap in PIL/libjpeg-turbo on a real cluster at
the same plug point for throughput).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- zigzag

def _zigzag_order() -> np.ndarray:
    """Standard JPEG zig-zag scan order as flat indices into an 8x8
    block (T.81 Figure 5): walk anti-diagonals, alternating direction."""
    order = []
    for d in range(15):
        ij = [(i, d - i) for i in range(8) if 0 <= d - i < 8]
        if d % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in ij)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()            # block_flat[ZIGZAG] -> zigzag vector
UNZIGZAG = np.argsort(ZIGZAG)       # zigzag vector[UNZIGZAG] -> block_flat

# ------------------------------------------------------------------ DCT

def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis A with A[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
    forward: F = A @ f @ A.T, inverse: f = A.T @ F @ A (A orthogonal)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0, :] = 0.5 / np.sqrt(2.0)
    return a


DCT_A = _dct_matrix()


def fdct2(block: np.ndarray) -> np.ndarray:
    return DCT_A @ block @ DCT_A.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return DCT_A.T @ coef @ DCT_A


# -------------------------------------------------------- huffman tables

class HuffTable:
    """Canonical JPEG Huffman table from (BITS, HUFFVAL) — T.81 C.2."""

    def __init__(self, bits: list[int], huffval: list[int]):
        assert len(bits) == 16 and sum(bits) == len(huffval)
        self.bits = list(bits)
        self.huffval = list(huffval)
        # canonical code assignment: codes of length L are consecutive,
        # starting from (prev_start + prev_count) << 1
        self.enc: dict[int, tuple[int, int]] = {}   # symbol -> (code, length)
        self.dec: dict[tuple[int, int], int] = {}   # (length, code) -> symbol
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = huffval[k]
                self.enc[sym] = (code, length)
                self.dec[(length, code)] = sym
                code += 1
                k += 1
            code <<= 1


def _flat_table(symbols: list[int]) -> HuffTable:
    """All-symbols-at-one-length canonical table: the shortest length L
    with 2**L > len(symbols) (strict, so the all-ones code stays unused
    as T.81 requires). Compression-naive, conformance-exact."""
    length = 1
    while (1 << length) <= len(symbols):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return HuffTable(bits, symbols)


DC_SYMBOLS = list(range(12))                       # category 0..11
AC_SYMBOLS = [0x00, 0xF0] + [                      # EOB, ZRL,
    (run << 4) | size for run in range(16) for size in range(1, 11)]

ENC_DC_TABLE = _flat_table(DC_SYMBOLS)
ENC_AC_TABLE = _flat_table(AC_SYMBOLS)

# -------------------------------------------------------------- bit I/O

class BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:            # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def pad_align(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1-bits

    def write_marker(self, marker: int) -> None:
        self.pad_align()
        self.out += bytes((0xFF, marker))


class BitReader:
    """Entropy-segment bit reader: un-stuffs FF00, stops at markers,
    surfaces RSTn for restart-interval handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None  # pending non-RST marker

    def _fill(self) -> None:
        d = self.data
        if self.pos + 1 >= len(d):
            raise EOFError
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:                 # stuffed literal FF
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:       # RST inside _fill = error;
                raise ValueError("unexpected restart marker mid-symbol")
            else:
                self.marker = nxt           # EOI / next segment
                raise EOFError
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read(self, length: int) -> int:
        while self._n < length:
            self._fill()
        self._n -= length
        v = (self._acc >> self._n) & ((1 << length) - 1)
        return v

    def read_huff(self, table: HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.dec.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def sync_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self._acc, self._n = 0, 0
        d = self.data
        # tolerate pad bits already consumed; expect FF Dx next
        if d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        if d[self.pos + 1] != 0xD0 + (n % 8):
            raise ValueError("restart marker out of sequence")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size`-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------- encode

def _quant_table(quality: int) -> np.ndarray:
    """Deterministic frequency-weighted quant table (1 + (u+v) * step).
    Any positive table is conformant — it travels in the DQT segment;
    smaller = higher fidelity. quality 1..100 like libjpeg's convention
    (100 => all-ones => only DCT rounding loss)."""
    step = max(0.0, (100 - quality) / 10.0)
    u = np.arange(8).reshape(8, 1)
    v = np.arange(8).reshape(1, 8)
    q = np.floor(1 + (u + v) * step)
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(bw: BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int) -> int:
    coef = np.round(fdct2(block.astype(np.float64) - 128.0) / q).astype(np.int64)
    zz = coef.flatten()[ZIGZAG]
    # baseline coefficient range is 11 bits DC / 10 bits AC (T.81 F.1.1.4)
    np.clip(zz[1:], -1023, 1023, out=zz[1:])
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = ENC_DC_TABLE.enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ENC_AC_TABLE.enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ENC_AC_TABLE.enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ENC_AC_TABLE.enc[0x00]
        bw.write(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, t: HuffTable) -> bytes:
    return bytes([tc << 4 | th]) + bytes(t.bits) + bytes(t.huffval)


def encode_jpeg(img: np.ndarray, quality: int = 95,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """uint8 array -> baseline JFIF bytes. 2-D => grayscale; (h, w, 3)
    => RGB with '444' or '420' chroma subsampling. Test-support encoder
    (same role as multimodal.encode_png)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = _quant_table(quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        if subsampling == "444":
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            def down2(p: np.ndarray) -> np.ndarray:
                ph = p[:p.shape[0] // 2 * 2, :p.shape[1] // 2 * 2]
                if ph.size == 0:  # degenerate tiny image: just sample
                    return p[::2, ::2]
                d = ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean((1, 3))
                # pad back out if odd source dims lost a row/col
                th, tw = (p.shape[0] + 1) // 2, (p.shape[1] + 1) // 2
                out = np.empty((th, tw))
                out[:d.shape[0], :d.shape[1]] = d
                if d.shape[0] < th:
                    out[-1, :d.shape[1]] = p[-1, ::2][:d.shape[1]]
                if d.shape[1] < tw:
                    out[:, -1] = out[:, d.shape[1] - 1]
                return out
            planes, samp = [y, down2(cb), down2(cr)], [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsampling {subsampling!r} not supported")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        pp = np.empty((ph, pw))
        pp[:p.shape[0], :p.shape[1]] = p
        pp[p.shape[0]:, :p.shape[1]] = p[-1:, :]          # edge replicate
        pp[:, p.shape[1]:] = pp[:, p.shape[1] - 1:p.shape[1]]
        padded.append(pp)

    out = bytearray(b"\xff\xd8")                           # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in q.flatten()[ZIGZAG]))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes((ci + 1, sh << 4 | sv, 0))
    out += _seg(0xC0, bytes(sof))
    out += _seg(0xC4, _dht_payload(0, 0, ENC_DC_TABLE))
    out += _seg(0xC4, _dht_payload(1, 0, ENC_AC_TABLE))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes((ci + 1, 0x00))                       # DC tbl 0, AC tbl 0
    sos += bytes((0, 63, 0))
    out += _seg(0xDA, bytes(sos))

    bw = BitWriter()
    preds = [0] * len(planes)
    rst_n = 0
    since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_rst == restart_interval:
                bw.write_marker(0xD0 + (rst_n % 8))
                rst_n += 1
                since_rst = 0
                preds = [0] * len(planes)
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        preds[ci] = _encode_block(
                            bw, p[y0:y0 + 8, x0:x0 + 8], q, preds[ci])
            since_rst += 1
    bw.pad_align()
    out += bw.out
    out += b"\xff\xd9"                                     # EOI
    return bytes(out)


# --------------------------------------------------------------- decode

def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> uint8 grayscale (luma) 2-D
    array, matching the other `_decode_*_bytes` contracts in
    multimodal.py. Generic DQT/DHT parsing; SOF0/SOF1 decode in one
    pass at first SOS, SOF2 accumulates coefficient bits across all
    scans and reconstructs at EOI (T.81 G.1.2)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], HuffTable] = {}
    frame = None            # (h, w, comps) ; comps = [(cid, sh, sv, tq)]
    progressive = False
    store: dict[int, np.ndarray] | None = None  # cid -> (bv, bh, 64) zigzag
    restart_interval = 0
    n = len(content)

    while pos < n:
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:                                  # EOI
            if progressive and store is not None:
                return _reconstruct_progressive(frame, store, qtables)
            raise ValueError("JPEG has no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:     # TEM/RSTn: bare
            continue
        (seglen,) = struct.unpack_from(">H", content, pos)
        body = content[pos + 2:pos + seglen]
        if marker == 0xDB:                                  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    vals = np.frombuffer(body[i:i + 128], dtype=">u2")
                    i += 128
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals                           # de-zigzag
                qtables[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:                                # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                htables[(tc, th)] = HuffTable(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):                  # SOF0/1/2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline/progressive Huffman JPEG "
                             "(SOF0/SOF1/SOF2) is supported "
                             "(lossless/arithmetic/hierarchical are not)")
        elif marker == 0xDD:                                # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                                # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = []                                    # (cid, td, ta)
            for c in range(ns):
                cid, tt = body[1 + 2 * c:3 + 2 * c]
                scan_sel.append((cid, tt >> 4, tt & 0xF))
            if not progressive:
                return _decode_scan(content, pos + seglen, frame, scan_sel,
                                    qtables, htables, restart_interval)
            ss, se, a = body[1 + 2 * ns:4 + 2 * ns]
            if store is None:
                store = _alloc_store(frame)
            pos = _decode_progressive_scan(
                content, pos + seglen, frame, scan_sel, ss, se,
                a >> 4, a & 0xF, store, htables, restart_interval)
            continue
        # APPn / COM / everything else: skip
        pos += seglen
    raise ValueError("JPEG truncated before SOS"
                     if store is None else "progressive JPEG missing EOI")


def _decode_scan(data: bytes, pos: int, frame, scan_sel, qtables, htables,
                 restart_interval: int) -> np.ndarray:
    fh, fw, comps = frame
    byid = {cid: (sh, sv, tq) for cid, sh, sv, tq in comps}
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    if len(scan_sel) != len(comps):
        raise ValueError("partial (non-interleaved multi-scan) JPEG "
                         "not supported in baseline decoder")
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    single = len(comps) == 1
    if single:
        # single-component scan: plain block raster, no MCU padding
        mcux = (fw + 7) // 8
        mcuy = (fh + 7) // 8

    planes: dict[int, np.ndarray] = {}
    geo: dict[int, tuple[int, int]] = {}
    for cid, sh, sv, _ in comps:
        if single:
            sh = sv = 1
        planes[cid] = np.zeros((mcuy * sv * 8, mcux * sh * 8))
        geo[cid] = (sh, sv)

    br = BitReader(data, pos)
    preds = {cid: 0 for cid, *_ in comps}
    since_rst = 0
    rst_n = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and since_rst == restart_interval:
                    br.sync_restart(rst_n)
                    rst_n += 1
                    since_rst = 0
                    preds = {cid: 0 for cid in preds}
                for cid, td, ta in scan_sel:
                    sh, sv = geo[cid]
                    tq = byid[cid][2]
                    q = qtables[tq]
                    dct_tbl = htables[(0, td)]
                    act_tbl = htables[(1, ta)]
                    for by in range(sv):
                        for bx in range(sh):
                            zz = np.zeros(64, dtype=np.int64)
                            s = br.read_huff(dct_tbl)
                            diff = _extend(br.read(s), s) if s else 0
                            preds[cid] += diff
                            zz[0] = preds[cid]
                            k = 1
                            while k <= 63:
                                rs = br.read_huff(act_tbl)
                                if rs == 0x00:               # EOB
                                    break
                                if rs == 0xF0:               # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0xF
                                if k > 63:
                                    raise ValueError("AC index overrun")
                                zz[k] = _extend(br.read(size), size)
                                k += 1
                            coef = np.zeros(64, dtype=np.float64)
                            coef[ZIGZAG] = zz                # de-zigzag
                            block = idct2((coef.reshape(8, 8) * q)
                                          .astype(np.float64)) + 128.0
                            y0 = (my * sv + by) * 8
                            x0 = (mx * sh + bx) * 8
                            planes[cid][y0:y0 + 8, x0:x0 + 8] = block
                since_rst += 1
    except EOFError:
        raise ValueError("JPEG scan truncated") from None

    luma_cid = comps[0][0]
    luma = planes[luma_cid][:fh, :fw]
    return np.clip(np.round(luma), 0, 255).astype(np.uint8)


# -------------------------------------------------- progressive decode

def _frame_geometry(frame):
    """MCU grid + per-component block extents. Returns (mcux, mcuy,
    hmax, vmax, per_cid) with per_cid[cid] = (sh, sv, tq, bw, bh) where
    (bw, bh) is the NON-interleaved block count (T.81 A.2.2: blocks
    covering ceil(dim * s / smax) samples — no MCU padding)."""
    fh, fw, comps = frame
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    per = {}
    for cid, sh, sv, tq in comps:
        cw = (fw * sh + hmax - 1) // hmax
        ch = (fh * sv + vmax - 1) // vmax
        per[cid] = (sh, sv, tq, (cw + 7) // 8, (ch + 7) // 8)
    return mcux, mcuy, hmax, vmax, per


def _alloc_store(frame) -> dict[int, np.ndarray]:
    """Zig-zag-order coefficient accumulator per component, sized to the
    full interleaved MCU grid (DC scans cover the padding blocks)."""
    mcux, mcuy, _, _, per = _frame_geometry(frame)
    return {cid: np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int64)
            for cid, (sh, sv, _, _, _) in per.items()}


def _refine_nonzero(coef_row: np.ndarray, k: int, br: BitReader,
                    p1: int, m1: int) -> None:
    """AC refinement correction bit for an already-nonzero coefficient
    (T.81 G.1.2.3 / CCITT correction procedure)."""
    if br.read(1) and (coef_row[k] & p1) == 0:
        coef_row[k] += p1 if coef_row[k] >= 0 else m1


def _decode_progressive_scan(data: bytes, pos: int, frame, scan_sel,
                             ss: int, se: int, ah: int, al: int,
                             store, htables, restart_interval: int) -> int:
    """Consume one progressive scan's entropy segment, updating `store`
    in place; returns the byte position of the next marker. DC scans
    (Ss=0) may be interleaved; AC scans are single-component by spec."""
    mcux, mcuy, _, _, per = _frame_geometry(frame)
    br = BitReader(data, pos)
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if not dc_scan and len(scan_sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    interleaved = dc_scan and len(scan_sel) > 1
    p1, m1 = 1 << al, -(1 << al)

    if interleaved:
        units = mcuy * mcux
    else:
        cid = scan_sel[0][0]
        bw, bh = per[cid][3], per[cid][4]
        units = bw * bh

    preds = {cid: 0 for cid, *_ in scan_sel}
    eobrun = 0
    since_rst = 0
    rst_n = 0
    try:
        for u in range(units):
            if restart_interval and since_rst == restart_interval:
                br.sync_restart(rst_n)
                rst_n += 1
                since_rst = 0
                preds = {c: 0 for c in preds}
                eobrun = 0
            if dc_scan:
                blocks = []           # (cid, by, bx) coded this unit
                if interleaved:
                    my, mx = divmod(u, mcux)
                    for cid, td, _ in scan_sel:
                        sh, sv = per[cid][0], per[cid][1]
                        blocks += [(cid, td, my * sv + by, mx * sh + bx)
                                   for by in range(sv) for bx in range(sh)]
                else:
                    cid, td, _ = scan_sel[0]
                    blocks = [(cid, td, u // per[cid][3], u % per[cid][3])]
                for cid, td, by, bx in blocks:
                    row = store[cid][by, bx]
                    if ah == 0:                      # DC first (G.1.2.1)
                        s = br.read_huff(htables[(0, td)])
                        preds[cid] += _extend(br.read(s), s) if s else 0
                        row[0] = preds[cid] << al
                    elif br.read(1):                 # DC refinement bit
                        row[0] |= p1
            else:
                cid, _, ta = scan_sel[0]
                bw = per[cid][3]
                row = store[cid][u // bw, u % bw]
                tbl = htables[(1, ta)]
                if ah == 0:                          # AC first (G.1.2.2)
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            rs = br.read_huff(tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r != 15:          # EOBn
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += br.read(r)
                                    break
                                k += 16              # ZRL
                                continue
                            k += r
                            if k > se:
                                raise ValueError("AC index overrun")
                            row[k] = _extend(br.read(s), s) << al
                            k += 1
                else:                                # AC refine (G.1.2.3)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = br.read_huff(tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r != 15:          # EOBn: rest is below
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += br.read(r)
                                    break
                                s = 0                # ZRL: 16 zero-history
                            elif s != 1:
                                raise ValueError("bad AC refinement size")
                            else:
                                s = p1 if br.read(1) else m1
                            while k <= se:           # advance r zero-history
                                if row[k] != 0:
                                    _refine_nonzero(row, k, br, p1, m1)
                                else:
                                    r -= 1
                                    if r < 0:
                                        break
                                k += 1
                            if s and k <= se:
                                row[k] = s
                            k += 1
                    if eobrun > 0:                   # finish block: bits only
                        while k <= se:
                            if row[k] != 0:
                                _refine_nonzero(row, k, br, p1, m1)
                            k += 1
                        eobrun -= 1
            since_rst += 1
    except EOFError:
        raise ValueError("progressive scan truncated") from None

    # resync to next marker (encoder byte-aligns before markers; skip
    # any pad byte the bit reader stopped inside)
    p = br.pos
    while p + 1 < len(data) and not (
            data[p] == 0xFF and data[p + 1] not in (0x00,)):
        p += 1
    return p


def _reconstruct_progressive(frame, store, qtables) -> np.ndarray:
    """Dequantize + IDCT the LUMA component of the accumulated
    coefficient store (output contract is grayscale, so chroma blocks
    are entropy-consumed but never inverse-transformed)."""
    fh, fw, comps = frame
    _, _, hmax, vmax, per = _frame_geometry(frame)
    cid, sh, sv, tq = comps[0]
    q = qtables[tq]
    zz = store[cid]                       # (bv, bh, 64) zigzag order
    blocks = zz[..., UNZIGZAG].reshape(*zz.shape[:2], 8, 8) * q
    pix = np.matmul(DCT_A.T, np.matmul(blocks.astype(np.float64),
                                       DCT_A)) + 128.0
    bv, bh = blocks.shape[:2]
    plane = pix.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8)
    if (sh, sv) != (hmax, vmax):
        raise ValueError("luma must have the max sampling factor")
    return np.clip(np.round(plane[:fh, :fw]), 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive encode

# AC table for progressive scans additionally needs the EOBn symbols
# (r << 4 for r = 1..14, T.81 G.1.2.2); EOB0 = 0x00 is already present.
PROG_AC_SYMBOLS = sorted(set(AC_SYMBOLS) | {r << 4 for r in range(15)})
ENC_PROG_AC_TABLE = _flat_table(PROG_AC_SYMBOLS)


class _ScanWriter(BitWriter):
    """BitWriter plus the EOB-run + buffered-correction-bit state that
    progressive AC scans thread across blocks (jpeg spec G.1.2.2-3)."""

    def __init__(self) -> None:
        super().__init__()
        self.eobrun = 0
        self.pending: list[int] = []      # correction bits awaiting flush

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, ln = ENC_PROG_AC_TABLE.enc[r << 4]
            self.write(code, ln)
            if r:
                self.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.write(b, 1)
        self.pending = []


def _encode_dc_scan(sw: _ScanWriter, coefs, order, al: int, ah: int,
                    n_comps: int) -> None:
    preds = [0] * n_comps
    for ci, by, bx in order:
        dc = int(coefs[ci][by, bx, 0])
        if ah == 0:                                  # first scan
            t = dc >> al
            diff = t - preds[ci]
            preds[ci] = t
            s = _category(diff)
            code, ln = ENC_DC_TABLE.enc[s]
            sw.write(code, ln)
            if s:
                sw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        else:                                        # refinement bit
            sw.write((dc >> al) & 1, 1)


def _encode_ac_first_block(sw: _ScanWriter, zz: np.ndarray,
                           ss: int, se: int, al: int) -> None:
    run = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = -((-v) >> al) if v < 0 else v >> al
        if t == 0:
            run += 1
            continue
        sw.flush_eobrun()
        while run > 15:
            code, ln = ENC_PROG_AC_TABLE.enc[0xF0]
            sw.write(code, ln)
            run -= 16
        s = _category(t)
        code, ln = ENC_PROG_AC_TABLE.enc[(run << 4) | s]
        sw.write(code, ln)
        sw.write(t if t >= 0 else t + (1 << s) - 1, s)
        run = 0
        wrote = True
    if run > 0 or not wrote:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _encode_ac_refine_block(sw: _ScanWriter, zz: np.ndarray,
                            ss: int, se: int, al: int) -> None:
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1                          # last newly-significant index
    for i, t in enumerate(absv):
        if t == 1:
            eob = ss + i
    run = 0
    bits: list[int] = []                  # this block's buffered bits
    for i, t in enumerate(absv):
        k = ss + i
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            sw.flush_eobrun()
            code, ln = ENC_PROG_AC_TABLE.enc[0xF0]
            sw.write(code, ln)
            run -= 16
            for b in bits:
                sw.write(b, 1)
            bits = []
        if t > 1:                         # history coefficient: buffer bit
            bits.append(t & 1)
            continue
        sw.flush_eobrun()                 # newly significant (t == 1)
        code, ln = ENC_PROG_AC_TABLE.enc[(run << 4) | 1]
        sw.write(code, ln)
        sw.write(0 if int(zz[k]) < 0 else 1, 1)
        for b in bits:
            sw.write(b, 1)
        bits = []
        run = 0
    if run > 0 or bits:
        sw.eobrun += 1
        sw.pending += bits
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 95,
                            subsampling: str = "444",
                            script: str = "standard",
                            restart_interval: int = 0) -> bytes:
    """uint8 array -> progressive (SOF2) JFIF bytes. Two scan scripts
    (real-world encoders vary here, so the decoder must not depend on
    one shape): "standard" = spectral selection + successive
    approximation (DC first at Al=1, AC bands 1-5 / 6-63 at Al=2, AC
    refine to Al=1, DC refine, AC refine to Al=0 — every progressive
    decode path); "simple" = spectral selection only, no refinement
    (DC at Al=0, one full-band AC scan per component — the shape
    minimal progressive encoders emit). Quantized coefficients are
    identical to :func:`encode_jpeg`'s, so decode(progressive) ==
    decode(baseline) exactly for both scripts."""
    base = encode_jpeg(np.asarray(img), quality=quality,
                       subsampling=subsampling)
    # reuse the tested baseline path to produce the coefficient store:
    # re-encode = decode our own baseline bytes down to coefficients
    coefs, frame, q = _coefficients_from_baseline(base)
    fh, fw, comps = frame
    mcux, mcuy, _, _, per = _frame_geometry(frame)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in q.flatten()[ZIGZAG]))
    sof = bytearray(struct.pack(">BHHB", 8, fh, fw, len(comps)))
    for cid, sh, sv, tq in comps:
        sof += bytes((cid, sh << 4 | sv, tq))
    out += _seg(0xC2, bytes(sof))
    out += _seg(0xC4, _dht_payload(0, 0, ENC_DC_TABLE))
    out += _seg(0xC4, _dht_payload(1, 0, ENC_PROG_AC_TABLE))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    cindex = {cid: i for i, (cid, *_ ) in enumerate(comps)}
    # interleaved MCU order over every (padding-included) block
    dc_order = []
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, sh, sv, _ in comps:
                dc_order += [(cindex[cid], my * sv + by, mx * sh + bx)
                             for by in range(sv) for bx in range(sh)]

    def sos(scan_comps: list[int], ss: int, se: int, ah: int, al: int,
            body_bits: bytes) -> None:
        hdr = bytearray([len(scan_comps)])
        for cid in scan_comps:
            hdr += bytes((cid, 0x00))
        hdr += bytes((ss, se, ah << 4 | al))
        out.extend(_seg(0xDA, bytes(hdr)))
        out.extend(body_bits)

    def dc_bits(ah: int, al: int) -> bytes:
        # restart semantics (T.81 E.2.4): each interval encodes with
        # fresh DC predictors, byte-aligned, separated by cycling RSTn —
        # so per-interval _encode_dc_scan calls (fresh preds each) are
        # exactly the spec'd reset.
        sw = _ScanWriter()
        per_mcu = sum(sh * sv for _, sh, sv, _ in comps)
        chunk = (restart_interval or mcux * mcuy) * per_mcu
        for i, at in enumerate(range(0, len(dc_order), chunk)):
            if i:
                sw.write_marker(0xD0 + (i - 1) % 8)
            _encode_dc_scan(sw, coefs, dc_order[at:at + chunk],
                            al, ah, len(comps))
        sw.pad_align()
        return bytes(sw.out)

    def ac_bits(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        cid, sh, sv, _ = comps[ci]
        bw, bh = per[cid][3], per[cid][4]
        blocks = [coefs[ci][by, bx] for by in range(bh) for bx in range(bw)]
        chunk = restart_interval or len(blocks)
        sw = _ScanWriter()
        for i, at in enumerate(range(0, len(blocks), chunk)):
            if i:
                sw.flush_eobrun()
                sw.write_marker(0xD0 + (i - 1) % 8)
            for zz in blocks[at:at + chunk]:
                if ah == 0:
                    _encode_ac_first_block(sw, zz, ss, se, al)
                else:
                    _encode_ac_refine_block(sw, zz, ss, se, al)
        sw.flush_eobrun()
        sw.pad_align()
        return bytes(sw.out)

    all_cids = [cid for cid, *_ in comps]
    if script == "simple":
        sos(all_cids, 0, 0, 0, 0, dc_bits(0, 0))         # DC, full precision
        for ci in range(len(comps)):
            sos([comps[ci][0]], 1, 63, 0, 0, ac_bits(ci, 1, 63, 0, 0))
    elif script == "standard":
        sos(all_cids, 0, 0, 0, 1, dc_bits(0, 1))         # DC first
        for ci in range(len(comps)):
            sos([comps[ci][0]], 1, 5, 0, 2, ac_bits(ci, 1, 5, 0, 2))
            sos([comps[ci][0]], 6, 63, 0, 2, ac_bits(ci, 6, 63, 0, 2))
        for ci in range(len(comps)):
            sos([comps[ci][0]], 1, 63, 2, 1, ac_bits(ci, 1, 63, 2, 1))
        sos(all_cids, 0, 0, 1, 0, dc_bits(1, 0))         # DC refine
        for ci in range(len(comps)):
            sos([comps[ci][0]], 1, 63, 1, 0, ac_bits(ci, 1, 63, 1, 0))
    else:
        raise ValueError(f"unknown scan script {script!r}")
    out += b"\xff\xd9"
    return bytes(out)


def _coefficients_from_baseline(base: bytes):
    """Entropy-decode our own baseline bytes back to quantized zigzag
    coefficients: (list-per-component (bv, bh, 64) arrays, frame, luma
    quant table). Guarantees the progressive re-encode carries EXACTLY
    the coefficients the baseline file does."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], HuffTable] = {}
    frame = None
    restart_interval = 0
    while True:
        marker = base[pos + 1]
        pos += 2
        (seglen,) = struct.unpack_from(">H", base, pos)
        body = base[pos + 2:pos + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                tq = body[i] & 0xF
                vals = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals
                qtables[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                htables[(tc, th)] = HuffTable(bits, list(body[i + 17:i + 17 + nv]))
                i += 17 + nv
        elif marker in (0xC0, 0xC1):
            _, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fh, fw, comps)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            break
        pos += seglen

    fh, fw, comps = frame
    mcux, mcuy, _, _, per = _frame_geometry(frame)
    coefs = [np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int64)
             for _, sh, sv, _ in comps]
    br = BitReader(base, pos + seglen)
    preds = [0] * len(comps)
    since_rst = rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_rst == restart_interval:
                br.sync_restart(rst_n)
                rst_n += 1
                since_rst = 0
                preds = [0] * len(comps)
            for ci, (cid, sh, sv, _) in enumerate(comps):
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        s = br.read_huff(htables[(0, 0)])
                        preds[ci] += _extend(br.read(s), s) if s else 0
                        zz[0] = preds[ci]
                        k = 1
                        while k <= 63:
                            rs = br.read_huff(htables[(1, 0)])
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            zz[k] = _extend(br.read(size), size)
                            k += 1
            since_rst += 1
    return coefs, frame, qtables[comps[0][3]]
