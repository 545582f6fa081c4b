"""Bitstream primitives: MSB-first bit reader/writer + Exp-Golomb.

Equivalent surface to the reference's GetBitContext (libavcodec/get_bits.h)
and golomb.h, re-done as plain Python over bytes for the host front-end.
"""


class BitReader:
    """MSB-first bit reader over a bytes-like RBSP payload."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0              # bit position
        self.nbits = 8 * len(data)

    def u(self, n: int) -> int:
        """Read n bits unsigned (n may be 0)."""
        if n == 0:
            return 0
        pos = self.pos
        end = pos + n
        if end > self.nbits:
            raise EOFError("bitstream overrun")
        # gather the bytes covering [pos, end)
        first = pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        total = (last - first) * 8
        chunk >>= total - (end - first * 8)
        self.pos = end
        return chunk & ((1 << n) - 1)

    def u1(self) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise EOFError("bitstream overrun")
        self.pos = pos + 1
        return (self.data[pos >> 3] >> (7 - (pos & 7))) & 1

    def ue(self) -> int:
        """Unsigned Exp-Golomb (ue(v))."""
        zeros = 0
        while self.u1() == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("invalid exp-golomb code")
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.u(zeros)

    def se(self) -> int:
        """Signed Exp-Golomb (se(v))."""
        k = self.ue()
        if k & 1:
            return (k + 1) >> 1
        return -(k >> 1)

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def byte_aligned(self) -> bool:
        return (self.pos & 7) == 0

    def bits_left(self) -> int:
        return self.nbits - self.pos

    def more_rbsp_data(self) -> bool:
        """True if there is RBSP data before the rbsp_trailing_bits."""
        left = self.bits_left()
        if left <= 0:
            return False
        # find last set bit in remaining data (the rbsp_stop_one_bit)
        save = self.pos
        # scan from the end
        for bit in range(self.nbits - 1, self.pos - 1, -1):
            if (self.data[bit >> 3] >> (7 - (bit & 7))) & 1:
                self.pos = save
                return bit > self.pos
        self.pos = save
        return False


class BitWriter:
    """MSB-first bit writer producing an RBSP payload (no emulation bytes)."""

    __slots__ = ("_bits", "_nbits", "_buf")

    def __init__(self):
        self._buf = bytearray()
        self._bits = 0       # pending bits, MSB-aligned within _nbits
        self._nbits = 0

    def u(self, value: int, n: int):
        if n == 0:
            return
        assert 0 <= value < (1 << n), (value, n)
        self._bits = (self._bits << n) | value
        self._nbits += n
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._bits >> self._nbits) & 0xFF)
        self._bits &= (1 << self._nbits) - 1

    def u1(self, value: int):
        self.u(value & 1, 1)

    def ue(self, value: int):
        assert value >= 0
        v = value + 1
        nbits = v.bit_length()
        self.u(0, nbits - 1)
        self.u(v, nbits)

    def se(self, value: int):
        if value <= 0:
            self.ue(-2 * value)
        else:
            self.ue(2 * value - 1)

    def align_zero(self):
        if self._nbits:
            self.u(0, 8 - self._nbits)

    def rbsp_trailing_bits(self):
        self.u1(1)
        self.align_zero()

    def byte_aligned(self) -> bool:
        return self._nbits == 0

    @property
    def bitpos(self) -> int:
        return len(self._buf) * 8 + self._nbits

    def get_bytes(self) -> bytes:
        assert self._nbits == 0, "unaligned bitstream"
        return bytes(self._buf)
