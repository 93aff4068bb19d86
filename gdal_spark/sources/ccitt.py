"""CCITT Group 4 (ITU-T T.6) decoder, from scratch, stdlib-only.

The 2-D MMR coding scheme TIFF Compression=4 uses (frmts/gtiff via
libtiff's tif_fax3.c in the reference): every line is coded against
the previous (reference) line with vertical (V0, VR1-3, VL1-3),
horizontal (H + two 1-D run-length words) and pass (P) modes; the
run-length words are the T.4 modified-Huffman white/black tables
(terminating 0-63 + makeup 64-1728 per colour + the shared extended
makeups 1792-2560). The first reference line is an imaginary all-white
line. Bit order is MSB-first (TIFF FillOrder 1).

Rows are represented as changing-element (transition) lists — the same
representation the coder itself is defined over — and expanded to 0/1
pixels only at the end.

G4 data cannot be split WITHIN a strip (each line needs the previous
line), so the tiff source decodes one strip per InputPartition like
every other codec; parallelism comes from the strip/tile layout, which
is exactly libtiff's constraint too.
"""

from __future__ import annotations

from bisect import bisect_right

# T.4 modified-Huffman run-length codes as (bitstring -> run) maps,
# keyed by (bits, width) for the table-free reader below.
_WHITE_CODES = {
    (0b00110101, 8): 0, (0b000111, 6): 1, (0b0111, 4): 2,
    (0b1000, 4): 3, (0b1011, 4): 4, (0b1100, 4): 5, (0b1110, 4): 6,
    (0b1111, 4): 7, (0b10011, 5): 8, (0b10100, 5): 9,
    (0b00111, 5): 10, (0b01000, 5): 11, (0b001000, 6): 12,
    (0b000011, 6): 13, (0b110100, 6): 14, (0b110101, 6): 15,
    (0b101010, 6): 16, (0b101011, 6): 17, (0b0100111, 7): 18,
    (0b0001100, 7): 19, (0b0001000, 7): 20, (0b0010111, 7): 21,
    (0b0000011, 7): 22, (0b0000100, 7): 23, (0b0101000, 7): 24,
    (0b0101011, 7): 25, (0b0010011, 7): 26, (0b0100100, 7): 27,
    (0b0011000, 7): 28, (0b00000010, 8): 29, (0b00000011, 8): 30,
    (0b00011010, 8): 31, (0b00011011, 8): 32, (0b00010010, 8): 33,
    (0b00010011, 8): 34, (0b00010100, 8): 35, (0b00010101, 8): 36,
    (0b00010110, 8): 37, (0b00010111, 8): 38, (0b00101000, 8): 39,
    (0b00101001, 8): 40, (0b00101010, 8): 41, (0b00101011, 8): 42,
    (0b00101100, 8): 43, (0b00101101, 8): 44, (0b00000100, 8): 45,
    (0b00000101, 8): 46, (0b00001010, 8): 47, (0b00001011, 8): 48,
    (0b01010010, 8): 49, (0b01010011, 8): 50, (0b01010100, 8): 51,
    (0b01010101, 8): 52, (0b00100100, 8): 53, (0b00100101, 8): 54,
    (0b01011000, 8): 55, (0b01011001, 8): 56, (0b01011010, 8): 57,
    (0b01011011, 8): 58, (0b01001010, 8): 59, (0b01001011, 8): 60,
    (0b00110010, 8): 61, (0b00110011, 8): 62, (0b00110100, 8): 63,
    # makeup
    (0b11011, 5): 64, (0b10010, 5): 128, (0b010111, 6): 192,
    (0b0110111, 7): 256, (0b00110110, 8): 320, (0b00110111, 8): 384,
    (0b01100100, 8): 448, (0b01100101, 8): 512, (0b01101000, 8): 576,
    (0b01100111, 8): 640, (0b011001100, 9): 704,
    (0b011001101, 9): 768, (0b011010010, 9): 832,
    (0b011010011, 9): 896, (0b011010100, 9): 960,
    (0b011010101, 9): 1024, (0b011010110, 9): 1088,
    (0b011010111, 9): 1152, (0b011011000, 9): 1216,
    (0b011011001, 9): 1280, (0b011011010, 9): 1344,
    (0b011011011, 9): 1408, (0b010011000, 9): 1472,
    (0b010011001, 9): 1536, (0b010011010, 9): 1600,
    (0b011000, 6): 1664, (0b010011011, 9): 1728,
}

_BLACK_CODES = {
    (0b0000110111, 10): 0, (0b010, 3): 1, (0b11, 2): 2, (0b10, 2): 3,
    (0b011, 3): 4, (0b0011, 4): 5, (0b0010, 4): 6, (0b00011, 5): 7,
    (0b000101, 6): 8, (0b000100, 6): 9, (0b0000100, 7): 10,
    (0b0000101, 7): 11, (0b0000111, 7): 12, (0b00000100, 8): 13,
    (0b00000111, 8): 14, (0b000011000, 9): 15,
    (0b0000010111, 10): 16, (0b0000011000, 10): 17,
    (0b0000001000, 10): 18, (0b00001100111, 11): 19,
    (0b00001101000, 11): 20, (0b00001101100, 11): 21,
    (0b00000110111, 11): 22, (0b00000101000, 11): 23,
    (0b00000010111, 11): 24, (0b00000011000, 11): 25,
    (0b000011001010, 12): 26, (0b000011001011, 12): 27,
    (0b000011001100, 12): 28, (0b000011001101, 12): 29,
    (0b000001101000, 12): 30, (0b000001101001, 12): 31,
    (0b000001101010, 12): 32, (0b000001101011, 12): 33,
    (0b000011010010, 12): 34, (0b000011010011, 12): 35,
    (0b000011010100, 12): 36, (0b000011010101, 12): 37,
    (0b000011010110, 12): 38, (0b000011010111, 12): 39,
    (0b000001101100, 12): 40, (0b000001101101, 12): 41,
    (0b000011011010, 12): 42, (0b000011011011, 12): 43,
    (0b000001010100, 12): 44, (0b000001010101, 12): 45,
    (0b000001010110, 12): 46, (0b000001010111, 12): 47,
    (0b000001100100, 12): 48, (0b000001100101, 12): 49,
    (0b000001010010, 12): 50, (0b000001010011, 12): 51,
    (0b000000100100, 12): 52, (0b000000110111, 12): 53,
    (0b000000111000, 12): 54, (0b000000100111, 12): 55,
    (0b000000101000, 12): 56, (0b000001011000, 12): 57,
    (0b000001011001, 12): 58, (0b000000101011, 12): 59,
    (0b000000101100, 12): 60, (0b000001011010, 12): 61,
    (0b000001100110, 12): 62, (0b000001100111, 12): 63,
    # makeup
    (0b0000001111, 10): 64, (0b000011001000, 12): 128,
    (0b000011001001, 12): 192, (0b000001011011, 12): 256,
    (0b000000110011, 12): 320, (0b000000110100, 12): 384,
    (0b000000110101, 12): 448, (0b0000001101100, 13): 512,
    (0b0000001101101, 13): 576, (0b0000001001010, 13): 640,
    (0b0000001001011, 13): 704, (0b0000001001100, 13): 768,
    (0b0000001001101, 13): 832, (0b0000001110010, 13): 896,
    (0b0000001110011, 13): 960, (0b0000001110100, 13): 1024,
    (0b0000001110101, 13): 1088, (0b0000001110110, 13): 1152,
    (0b0000001110111, 13): 1216, (0b0000001010010, 13): 1280,
    (0b0000001010011, 13): 1344, (0b0000001010100, 13): 1408,
    (0b0000001010101, 13): 1472, (0b0000001011010, 13): 1536,
    (0b0000001011011, 13): 1600, (0b0000001100100, 13): 1664,
    (0b0000001100101, 13): 1728,
}

# extended makeups shared by both colours (T.4 table 3)
_EXT_MAKEUP = {
    (0b00000001000, 11): 1792, (0b00000001100, 11): 1856,
    (0b00000001101, 11): 1920, (0b000000010010, 12): 1984,
    (0b000000010011, 12): 2048, (0b000000010100, 12): 2112,
    (0b000000010101, 12): 2176, (0b000000010110, 12): 2240,
    (0b000000010111, 12): 2304, (0b000000011100, 12): 2368,
    (0b000000011101, 12): 2432, (0b000000011110, 12): 2496,
    (0b000000011111, 12): 2560,
}

_WHITE = dict(_WHITE_CODES)
_WHITE.update(_EXT_MAKEUP)
_BLACK = dict(_BLACK_CODES)
_BLACK.update(_EXT_MAKEUP)
_MAX_BITS = 13


class _Bits:
    """MSB-first bit reader (TIFF FillOrder 1)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0           # bit position
        self.n = len(data) * 8

    def peek(self, k: int) -> int:
        v = 0
        p = self.pos
        for _ in range(k):
            if p < self.n:
                v = (v << 1) | ((self.d[p >> 3] >> (7 - (p & 7))) & 1)
            else:
                v <<= 1
            p += 1
        return v

    def skip(self, k: int):
        self.pos += k

    def exhausted(self) -> bool:
        return self.pos >= self.n


def _read_run(bits: _Bits, table: dict) -> int:
    """One complete run length: zero or more makeup codes (≥ 64,
    chainable for runs > 2560) followed by one terminating code."""
    total = 0
    while True:
        for width in range(2, _MAX_BITS + 1):
            code = bits.peek(width)
            run = table.get((code, width))
            if run is not None:
                bits.skip(width)
                total += run
                if run < 64:
                    return total
                break
        else:
            raise ValueError(
                f"undecodable MH code at bit {bits.pos}")


def g4_decode(data: bytes, w: int, h: int) -> list:
    """Decode one G4-coded strip into h rows of transition lists;
    expand with g4_rows_to_bits. White pel = 0, black = 1."""
    bits = _Bits(data)
    ref = [w, w]            # imaginary all-white reference line
    out = []
    for _y in range(h):
        cur = []
        a0, color = -1, 0   # start before first pel, white
        while a0 < w:
            # b1: first changing element on ref right of a0 whose
            # colour (the pel to its right) is opposite to `color`
            i = bisect_right(ref, a0)
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            if bits.exhausted():
                raise ValueError("G4 stream ended mid-image")
            if bits.peek(1) == 1:                     # V0
                bits.skip(1)
                a1 = b1
            elif bits.peek(3) == 0b011:               # VR1
                bits.skip(3)
                a1 = b1 + 1
            elif bits.peek(3) == 0b010:               # VL1
                bits.skip(3)
                a1 = b1 - 1
            elif bits.peek(3) == 0b001:               # H
                bits.skip(3)
                a0s = max(a0, 0)
                t1, t2 = (_WHITE, _BLACK) if color == 0 \
                    else (_BLACK, _WHITE)
                r1 = _read_run(bits, t1)
                r2 = _read_run(bits, t2)
                cur.append(a0s + r1)
                cur.append(a0s + r1 + r2)
                a0 = a0s + r1 + r2
                continue
            elif bits.peek(4) == 0b0001:              # Pass
                bits.skip(4)
                a0 = b2
                continue
            elif bits.peek(6) == 0b000011:            # VR2
                bits.skip(6)
                a1 = b1 + 2
            elif bits.peek(6) == 0b000010:            # VL2
                bits.skip(6)
                a1 = b1 - 2
            elif bits.peek(7) == 0b0000011:           # VR3
                bits.skip(7)
                a1 = b1 + 3
            elif bits.peek(7) == 0b0000010:           # VL3
                bits.skip(7)
                a1 = b1 - 3
            else:
                # EOFB (000000000001 000000000001) or padding
                raise ValueError(
                    f"unexpected G4 mode code at bit {bits.pos} "
                    f"(row {_y})")
            cur.append(a1)
            a0 = a1
            color ^= 1
        # normalize: drop transitions past w, close the line
        cur = [min(t, w) for t in cur]
        out.append(cur)
        ref = cur + [w, w]
    return out


_WHITE_ENC = {run: (code, width)
              for (code, width), run in _WHITE.items()}
_BLACK_ENC = {run: (code, width)
              for (code, width), run in _BLACK.items()}


class _BitsOut:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int):
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.n = 0
        return bytes(self.buf)


def _put_run(out: _BitsOut, run: int, table: dict):
    while run >= 64:
        mk = min(2560, (run >> 6) << 6)
        out.put(*table[mk])
        run -= mk
    out.put(*table[run])


def g4_encode(bits_arr, w: int = None) -> bytes:
    """Encode a 0/1 array (h, w) as a CCITT G4 strip — the inverse of
    g4_decode. Pure T.6: for each pair (b1, b2, a1) emit pass when
    b2 < a1, vertical when |a1-b1| ≤ 3, else horizontal with two MH
    runs. Ends with EOFB. Verified by round-trip through the
    published-pinned decoder (slim_g4 checksum 3322)."""
    import numpy as np
    a = np.asarray(bits_arr, dtype=np.uint8)
    h, w = a.shape
    out = _BitsOut()
    ref = [w, w]
    for y in range(h):
        row = a[y]
        # transition positions of the coding line
        tr = list(np.flatnonzero(np.diff(
            np.concatenate(([0], row.astype(np.int8))))) )
        cur = [int(t) for t in tr]
        a0, color = -1, 0
        ci = 0                    # next coding transition index
        while a0 < w:
            a1 = cur[ci] if ci < len(cur) else w
            i = bisect_right(ref, a0)
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            if b2 < a1:
                out.put(0b0001, 4)                   # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                d = a1 - b1
                code = {0: (0b1, 1), 1: (0b011, 3), 2: (0b000011, 6),
                        3: (0b0000011, 7), -1: (0b010, 3),
                        -2: (0b000010, 6), -3: (0b0000010, 7)}[d]
                out.put(*code)
                a0 = a1
                color ^= 1
                ci += 1
            else:                                    # horizontal
                a2 = cur[ci + 1] if ci + 1 < len(cur) else w
                out.put(0b001, 3)
                a0s = max(a0, 0)
                t1, t2 = (_WHITE_ENC, _BLACK_ENC) if color == 0 \
                    else (_BLACK_ENC, _WHITE_ENC)
                _put_run(out, a1 - a0s, t1)
                _put_run(out, a2 - a1, t2)
                a0 = a2
                ci += 2
        ref = cur + [w, w]
    out.put(0b000000000001, 12)                      # EOFB
    out.put(0b000000000001, 12)
    return out.done()


def g4_rows_to_bits(rows: list, w: int):
    """Transition lists -> uint8 (h, w) 0/1 array."""
    import numpy as np
    h = len(rows)
    a = np.zeros((h, w), dtype=np.uint8)
    for y, tr in enumerate(rows):
        for k in range(0, len(tr) - 1, 2):
            a[y, tr[k]:tr[k + 1]] = 1
        if len(tr) % 2 == 1:
            a[y, tr[-1]:] = 1
    return a
