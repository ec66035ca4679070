"""Pure-Python/numpy baseline JPEG codec (grayscale, single scan) — the
dependency-free compressed-image modality the container can't get from
PIL/cv2 (neither ships). Retires the former ``decode_image_real``
integration stub (VERDICT r5 item 7): FFD8-magic payloads now decode
in-repo.

Scope (and honest limits): baseline DCT (SOF0), 8-bit, single component,
no subsampling, no restart markers — the shape our own encoder emits and
the common grayscale-scan subset of real-world files. Progressive
(SOF2), multi-component color, and arithmetic coding raise a typed
``ValueError`` naming the unsupported feature.

Determinism note for the oracle-checked query (plans/textops.py): with
an ALL-ONES quantization table, a FLAT 8×8 block has exactly one
non-zero DCT coefficient — the DC term 8·(level − 128), an integer —
so quantize → dequantize → IDCT reproduces the block bit-exactly.
The ``multimodal_jpeg_features`` payloads are built from flat blocks
(one per source byte), which makes decoded pixel statistics pure
integer arithmetic a SQL oracle can replay, while still driving the
full entropy-coding path (canonical Huffman DC/AC, zigzag, byte
stuffing, marker framing). Non-flat content round-trips within a small
float-rounding error bound (tests pin it).

No reference twin: the reference ingests only fastText ``.vec`` text
(``/root/reference/src/main.rs:11-40``); this is part of the multimodal
pipeline surface (SURVEY §2.2).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_jpeg_gray",
    "decode_jpeg_gray",
    "ZIGZAG",
]

# ---------------------------------------------------------------------------
# shared constants

# zigzag order: index i of the scan → (row, col) in the 8×8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16),
# c(0) = 1/√2. FDCT: S = A s Aᵀ ; IDCT: s = Aᵀ S A.
def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = np.arange(8)[:, None]
    A = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    A[0, :] *= 1.0 / np.sqrt(2.0)
    return A


_A = _dct_matrix()

# Canonical Huffman tables written into the stream's DHT segments (the
# decoder reads whatever tables the stream carries — these are OURS, not
# Annex K's, chosen so every symbol has a fixed short length and the
# all-ones code stays unused as the spec requires):
#   DC: 12 category symbols (0..11), all at length 4  (codes 0000..1011)
#   AC: 162 (run,size) symbols, all at length 8       (codes 0..161)
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]  # 12 @ len 4
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]  # 162 @ len 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


def _category(v: int) -> int:
    """JPEG magnitude category: number of bits in |v| (0 for v == 0)."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing

class _BitWriter:
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
            if byte == 0xFF:  # byte stuffing: FF in entropy data → FF 00
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy data exhausted mid-scan")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: dangling 0xFF in entropy data")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(
                    f"jpeg: unexpected marker 0xFF{marker:02X} inside scan "
                    "(restart markers are not supported)"
                )
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, n: int) -> int:
    """JPEG EXTEND: map the n-bit amplitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# ---------------------------------------------------------------------------
# encoder

def encode_jpeg_gray(pixels: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode an 8-bit grayscale image (height and width multiples of 8)
    as a baseline JFIF stream: SOI, APP0, DQT, SOF0, DHT×2, SOS, entropy
    data, EOI. ``quant`` is an 8×8 table (default all-ones — lossless
    for flat blocks, near-lossless otherwise)."""
    px = np.asarray(pixels, dtype=np.float64)
    h, w = px.shape
    if h % 8 or w % 8:
        raise ValueError("jpeg: dimensions must be multiples of 8")
    q = (
        np.ones((8, 8), dtype=np.int64)
        if quant is None
        else np.asarray(quant, dtype=np.int64)
    )

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT: precision 0, table id 0, zigzag order
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))
    # SOF0: 8-bit, 1 component, sampling 1×1, quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    # DHT: class 0 (DC) id 0, class 1 (AC) id 0
    for cls, bits, syms in ((0, _DC_BITS, _DC_SYMBOLS), (1, _AC_BITS, _AC_SYMBOLS)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(syms), cls << 4)
        out += bytes(bits) + bytes(syms)
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"

    bw = _BitWriter()
    prev_dc = 0
    # batched FDCT (r15, guide §4.2): one matmul pair over EVERY block
    # instead of a per-block 8×8 matmul inside a Python loop — the dot
    # products are fixed-length-8, so the batched form is bit-identical
    # to the per-block form (pinned by the byte-equality A/B in
    # tests/test_pipeline_ops.py via the flat-block round trip and
    # verified against the pre-r15 encoder on random content)
    nby, nbx = h // 8, w // 8
    blocks = (
        px.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    S_all = _A @ blocks @ _A.T
    zzs = np.round(S_all / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
    write = bw.write
    for zz in zzs:
        # DC: difference coding
        dc = int(zz[0])
        diff = dc - prev_dc
        prev_dc = dc
        cat = _category(diff)
        code, length = _DC_ENC[cat]
        write(code, length)
        if cat:
            amp = diff if diff >= 0 else diff + (1 << cat) - 1
            write(amp, cat)
        # AC: visit only the NONZERO coefficients (flat-block payloads
        # have none) — zero runs come from index gaps, identical symbol
        # stream to the 63-iteration scan
        last = 0
        for j in np.flatnonzero(zz[1:]):
            i = int(j) + 1
            run = i - last - 1
            while run > 15:
                c, ln = _AC_ENC[0xF0]  # ZRL
                write(c, ln)
                run -= 16
            v = int(zz[i])
            size = _category(v)
            if size > 10:
                raise ValueError("jpeg: AC coefficient out of baseline range")
            c, ln = _AC_ENC[(run << 4) | size]
            write(c, ln)
            amp = v if v >= 0 else v + (1 << size) - 1
            write(amp, size)
            last = i
        if last < 63:
            c, ln = _AC_ENC[0x00]  # EOB
            write(c, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder

def _read_huffman_table(payload: bytes, off: int) -> tuple[int, dict[tuple[int, int], int], int]:
    if off + 17 > len(payload):
        raise ValueError("jpeg: truncated DHT segment")
    tc_th = payload[off]
    bits = list(payload[off + 1 : off + 17])
    n = sum(bits)
    if off + 17 + n > len(payload):
        raise ValueError("jpeg: truncated DHT symbol list")
    syms = list(payload[off + 17 : off + 17 + n])
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            dec[(length, code)] = syms[k]
            code += 1
            k += 1
        code <<= 1
    return tc_th, dec, off + 17 + n


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code in scan")


# 16-bit-lookahead huffman LUT (r15, guide §4.2): every canonical code is
# ≤ 16 bits, so a 65536-entry (symbol, length) table decodes one symbol
# per O(1) lookup instead of one dict probe per BIT. Entries no code
# covers hold symbol −1 → "invalid huffman code in scan", the same error
# the bit-serial walk raised. Cached per table content: every image our
# encoder emits shares the two spec-default tables.
_LUT_CACHE: dict = {}


def _decode_lut(dec: "dict[tuple[int, int], int]"):
    key = tuple(sorted(dec.items()))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.full(65536, -1, dtype=np.int32)
    lng = np.zeros(65536, dtype=np.int32)
    for (length, code), s in dec.items():
        start = code << (16 - length)
        span = 1 << (16 - length)
        sym[start : start + span] = s
        lng[start : start + span] = length
    _LUT_CACHE[key] = (sym, lng)
    return sym, lng


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to a uint8 array. Raises typed
    ``ValueError`` for non-JPEG input and for features outside the
    supported subset (progressive, color, restart intervals)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI marker (not a JPEG payload)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = -1
    qid = dc_id = ac_id = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("jpeg: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {pos}")
        marker = data[pos + 1]
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        payload = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if 0xE0 <= marker <= 0xEF or marker == 0xFE:
            continue  # APPn / COM
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables not supported")
                if off + 65 > len(payload):
                    raise ValueError("jpeg: truncated DQT segment")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    payload[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                quant[tq] = tbl.reshape(8, 8)
                off += 65
            continue
        if marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(payload):
                tc_th, table, off = _read_huffman_table(payload, off)
                (huff_dc if tc_th >> 4 == 0 else huff_ac)[tc_th & 0x0F] = table
            continue
        if marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack(">BHHB", payload[0:6])
            if ncomp != 1:
                raise ValueError(
                    f"jpeg: {ncomp}-component color decode not supported "
                    "(grayscale single-scan only)"
                )
            if payload[7] != 0x11:
                raise ValueError("jpeg: chroma subsampling not supported")
            qid = payload[8]
            continue
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"jpeg: SOF{marker - 0xC0} (non-baseline/progressive) not supported"
            )
        if marker == 0xDD:
            raise ValueError("jpeg: restart intervals not supported")
        if marker == 0xDA:  # SOS → entropy data follows
            dc_id = payload[2] >> 4
            ac_id = payload[2] & 0x0F
            break
        raise ValueError(f"jpeg: unsupported marker 0xFF{marker:02X}")

    if h < 0 or qid not in quant or dc_id not in huff_dc or ac_id not in huff_ac:
        raise ValueError("jpeg: scan started before SOF/DQT/DHT were seen")
    if h % 8 or w % 8:
        raise ValueError("jpeg: non-multiple-of-8 dimensions not supported")

    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("jpeg: missing EOI marker")
    # --- entropy decode (r15 rewrite, guide §4.2): destuff + validate the
    # whole scan vectorized, precompute a sliding 16-bit lookahead, and
    # decode one huffman symbol per O(1) LUT probe instead of one dict
    # probe per bit. Symbol stream, coefficients, and error classes are
    # identical to the retired bit-serial _BitReader walk (which remains
    # above for reference/fallback use).
    scan = np.frombuffer(data[pos:end], dtype=np.uint8)
    ff = np.flatnonzero(scan == 0xFF)
    if ff.size:
        if int(ff[-1]) == scan.size - 1:
            raise ValueError("jpeg: dangling 0xFF in entropy data")
        nxt = scan[ff + 1]
        bad = nxt != 0x00
        if bad.any():
            raise ValueError(
                f"jpeg: unexpected marker 0xFF{int(nxt[bad][0]):02X} inside "
                "scan (restart markers are not supported)"
            )
        destuffed = np.delete(scan, ff + 1)
    else:
        destuffed = scan
    nbits = int(destuffed.size) * 8
    # 16-bit lookahead per bit position, built BYTEWISE (ADVICE r15):
    # the previous construction unpacked the scan to an int64 bit array
    # and ran a sliding-window matmul — ~130 bytes of temporaries per
    # scan byte, hundreds of MB on a multi-MB foreign scan. This packs
    # the same values as uint16 via 8 strided slice assignments over a
    # 24-bit byte window (~18 bytes per scan byte): for bit position
    # p = 8i + r, bits [p, p+16) live inside bytes i..i+2, so
    # vals16[p] = (w24[i] >> (8 - r)) & 0xFFFF. Two appended zero bytes
    # reproduce the old zero-padding past the scan end.
    bpad = np.concatenate([destuffed, np.zeros(2, dtype=np.uint8)]).astype(
        np.int32
    )
    w24 = (bpad[:-2] << 16) | (bpad[1:-1] << 8) | bpad[2:]
    vals16 = np.empty(nbits, dtype=np.uint16)
    for r in range(8):
        vals16[r::8] = ((w24 >> (8 - r)) & 0xFFFF).astype(np.uint16)

    q = quant[qid]
    dc_sym, dc_len = _decode_lut(huff_dc[dc_id])
    ac_sym, ac_len = _decode_lut(huff_ac[ac_id])
    nby, nbx = h // 8, w // 8
    nblocks = nby * nbx
    zza = np.zeros((nblocks, 64), dtype=np.int64)
    prev_dc = 0
    p = 0
    for b in range(nblocks):
        if p >= nbits:
            raise ValueError("jpeg: entropy data exhausted mid-scan")
        v = vals16[p]
        cat = int(dc_sym[v])
        ln = int(dc_len[v])
        if cat < 0:
            raise ValueError("jpeg: invalid huffman code in scan")
        if p + ln > nbits:
            raise ValueError("jpeg: entropy data exhausted mid-scan")
        p += ln
        if cat:
            if p + cat > nbits:
                raise ValueError("jpeg: entropy data exhausted mid-scan")
            prev_dc += _extend(int(vals16[p]) >> (16 - cat), cat)
            p += cat
        row = zza[b]
        row[0] = prev_dc
        i = 1
        while i < 64:
            if p >= nbits:
                raise ValueError("jpeg: entropy data exhausted mid-scan")
            v = vals16[p]
            sym = int(ac_sym[v])
            ln = int(ac_len[v])
            if sym < 0:
                raise ValueError("jpeg: invalid huffman code in scan")
            if p + ln > nbits:
                raise ValueError("jpeg: entropy data exhausted mid-scan")
            p += ln
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            i += run
            if i > 63:
                raise ValueError("jpeg: AC run past block end")
            if p + size > nbits:
                raise ValueError("jpeg: entropy data exhausted mid-scan")
            row[i] = _extend(int(vals16[p]) >> (16 - size), size)
            p += size
            i += 1
    # batched dequantize + IDCT (bit-identical to the per-block form:
    # fixed-length-8 dot products), then stitch blocks back to the image
    coeffs_all = np.zeros((nblocks, 64), dtype=np.int64)
    coeffs_all[:, ZIGZAG] = zza
    S_all = coeffs_all.reshape(-1, 8, 8) * q
    blocks = _A.T @ S_all @ _A
    img = blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    return np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
