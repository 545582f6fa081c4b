"""CABAC binary arithmetic coder (decoder + encoder).

Decoder follows spec 9.3.4.3 exactly (range/offset with bitwise renorm) —
behaviorally identical to the reference's get_cabac/get_cabac_bypass
(libavcodec/cabac_functions.h), just unoptimized.  Encoder follows the
normative encoding process (spec annex C / HM TEncBinCABAC structure) and is
used only by the test-stream generator.
"""

from .tables import LPS_RANGE, TRANS_IDX_LPS, TRANS_IDX_MPS, RENORM
from .contexts import ContextSet


class CabacDecoder:
    __slots__ = ("data", "nbits", "bitpos", "range", "offset", "ctx")

    def __init__(self, data: bytes, ctx: ContextSet = None):
        self.data = data
        self.nbits = len(data) * 8
        self.bitpos = 0
        self.ctx = ctx
        self.init_engine()

    def init_engine(self):
        """spec 9.3.2.5: byte-align then read 9 bits of offset."""
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()

    def _bit(self) -> int:
        p = self.bitpos
        if p >= self.nbits:
            # past-the-end bits read as 0 (matches reference overread behavior)
            self.bitpos = p + 1
            return 0
        self.bitpos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def decode_bin(self, ctx_idx: int) -> int:
        st = self.ctx.state[ctx_idx]
        mps = self.ctx.mps[ctx_idx]
        lps = LPS_RANGE[st][(self.range >> 6) & 3]
        self.range -= lps
        if self.offset >= self.range:
            bin_val = 1 - mps
            self.offset -= self.range
            self.range = lps
            if st == 0:
                self.ctx.mps[ctx_idx] = 1 - mps
            self.ctx.state[ctx_idx] = TRANS_IDX_LPS[st]
        else:
            bin_val = mps
            self.ctx.state[ctx_idx] = TRANS_IDX_MPS[st]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return int(bin_val)

    def decode_bypass(self) -> int:
        self.offset = (self.offset << 1) | self._bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_bypass_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return 0

    @property
    def consumed_bytes(self) -> int:
        """Bytes consumed so far (rounded up), for entry-point bookkeeping."""
        return (self.bitpos + 7) >> 3

    # -- PCM (spec 7.3.8.7 pcm_sample / 9.3.1 re-initialization) ------------
    #
    # After pcm_flag decodes as 1 (terminate bin, no renorm), the PCM payload
    # starts at the next byte boundary: the encoder's flush (terminate-1 shift
    # + remaining low bits + stop bit + alignment zeros) writes exactly
    # ceil(consumed_bits/8)*8 bits, because encoder renorm output and decoder
    # renorm consumption track the same range trajectory.  Mirrors the
    # reference's skip_bytes() position recovery (cabac_functions.h).

    def pcm_align(self):
        self.bitpos = (self.bitpos + 7) & ~7

    def read_raw(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self._bit()
        return v

    def pcm_reinit(self):
        """Byte-align past the PCM payload and re-init the arithmetic engine
        (contexts are NOT reset; spec 9.3.1)."""
        self.pcm_align()
        self.init_engine()


class CabacEncoder:
    """Arithmetic encoder producing a byte-aligned CABAC payload."""

    __slots__ = ("low", "range", "bits_left", "num_buffered", "buffered_byte",
                 "out", "ctx", "_rawacc", "_rawn")

    def __init__(self, ctx: ContextSet = None):
        self.ctx = ctx
        self.out = bytearray()
        self._rawacc = 0
        self._rawn = 0
        self._reset_engine()

    def _reset_engine(self):
        self.low = 0
        self.range = 510
        self.bits_left = 23
        self.num_buffered = 0
        self.buffered_byte = 0xFF

    def _write_out(self):
        lead = self.low >> (24 - self.bits_left)
        self.bits_left += 8
        self.low &= (0xFFFFFFFF >> self.bits_left)
        if lead == 0xFF:
            self.num_buffered += 1
        elif self.num_buffered > 0:
            carry = lead >> 8
            self.out.append((self.buffered_byte + carry) & 0xFF)
            fill = (0xFF + carry) & 0xFF
            for _ in range(self.num_buffered - 1):
                self.out.append(fill)
            self.buffered_byte = lead & 0xFF
            self.num_buffered = 1
        else:
            self.num_buffered = 1
            self.buffered_byte = lead & 0xFF
            assert lead < 0x100, "carry with no buffered byte"

    def _test_write(self):
        if self.bits_left < 12:
            self._write_out()

    def encode_bin(self, ctx_idx: int, bin_val: int):
        st = self.ctx.state[ctx_idx]
        mps = self.ctx.mps[ctx_idx]
        lps = LPS_RANGE[st][(self.range >> 6) & 3]
        self.range -= lps
        if bin_val != mps:
            nbits = RENORM[lps >> 3]
            self.low = (self.low + self.range) << nbits
            self.range = lps << nbits
            if st == 0:
                self.ctx.mps[ctx_idx] = 1 - mps
            self.ctx.state[ctx_idx] = TRANS_IDX_LPS[st]
            self.bits_left -= nbits
            self._test_write()
        else:
            self.ctx.state[ctx_idx] = TRANS_IDX_MPS[st]
            if self.range >= 256:
                return
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
            self._test_write()

    def encode_bypass(self, bin_val: int):
        self.low <<= 1
        if bin_val:
            self.low += self.range
        self.bits_left -= 1
        self._test_write()

    def encode_bypass_bits(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.encode_bypass((value >> i) & 1)

    def encode_terminate(self, bin_val: int):
        self.range -= 2
        if bin_val:
            self.low += self.range
            self.low <<= 7
            self.range = 2 << 7
            self.bits_left -= 7
        elif self.range >= 256:
            return
        else:
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
        self._test_write()

    def finish(self) -> bytes:
        """Flush; returns the byte-aligned payload.

        Caller must have encoded end_of_slice terminate bin = 1 immediately
        before (spec 9.3.4.4.5 then rbsp stop bit handled by caller's writer).
        """
        self._flush_stop_align()
        return bytes(self.out)

    # -- PCM -----------------------------------------------------------------

    def pcm_begin(self):
        """Flush the arithmetic coder to a byte boundary after pcm_flag was
        encoded as terminate-1 (HM encodePCMAlignBits: finish + stop bit +
        zero alignment), keeping contexts for the post-PCM restart."""
        self._flush_stop_align()
        self._reset_engine()

    def write_raw(self, value: int, n: int):
        self._rawacc = (self._rawacc << n) | (value & ((1 << n) - 1))
        self._rawn += n
        while self._rawn >= 8:
            self._rawn -= 8
            self.out.append((self._rawacc >> self._rawn) & 0xFF)
        self._rawacc &= (1 << self._rawn) - 1

    def pcm_end(self):
        if self._rawn:
            self.out.append((self._rawacc << (8 - self._rawn)) & 0xFF)
            self._rawacc = self._rawn = 0

    def _flush_stop_align(self):
        if (self.low >> (32 - self.bits_left)) != 0:
            self.out.append((self.buffered_byte + 1) & 0xFF)
            for _ in range(self.num_buffered - 1):
                self.out.append(0x00)
            self.low -= 1 << (32 - self.bits_left)
        else:
            if self.num_buffered > 0:
                self.out.append(self.buffered_byte)
            for _ in range(self.num_buffered - 1):
                self.out.append(0xFF)
        bits = 24 - self.bits_left
        val = self.low >> 8
        # write remaining `bits` bits MSB-first, then pad with the stop pattern
        acc = val & ((1 << bits) - 1) if bits > 0 else 0
        pending = bits
        bitbuf = []
        for i in range(pending - 1, -1, -1):
            bitbuf.append((acc >> i) & 1)
        # terminate-1 path already aligned low; add trailing '1' stop bit + align
        bitbuf.append(1)
        while len(bitbuf) % 8:
            bitbuf.append(0)
        for i in range(0, len(bitbuf), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bitbuf[i + j]
            self.out.append(b)
