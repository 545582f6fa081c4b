"""Direction-agnostic CABAC IO: one syntax walker serves decode and encode.

In decode mode, calls read from a CabacDecoder and return the value.
In encode mode, the caller supplies the value; it is written and returned.
This guarantees the encoder and decoder traverse identical syntax.
"""


class CabacIO:
    __slots__ = ("dec", "enc")

    def __init__(self, dec=None, enc=None):
        assert (dec is None) != (enc is None)
        self.dec = dec
        self.enc = enc

    @property
    def decoding(self):
        return self.dec is not None

    def bin(self, ctx_idx: int, value=None) -> int:
        if self.dec is not None:
            return self.dec.decode_bin(ctx_idx)
        self.enc.encode_bin(ctx_idx, value)
        return value

    def bypass(self, value=None) -> int:
        if self.dec is not None:
            return self.dec.decode_bypass()
        self.enc.encode_bypass(value)
        return value

    def bypass_bits(self, n: int, value=None) -> int:
        if self.dec is not None:
            return self.dec.decode_bypass_bits(n)
        self.enc.encode_bypass_bits(value, n)
        return value

    def terminate(self, value=None) -> int:
        if self.dec is not None:
            return self.dec.decode_terminate()
        self.enc.encode_terminate(value)
        return value

    def pcm_begin(self):
        if self.dec is not None:
            self.dec.pcm_align()
        else:
            self.enc.pcm_begin()

    def pcm_bits(self, n: int, value=None) -> int:
        if self.dec is not None:
            return self.dec.read_raw(n)
        self.enc.write_raw(value, n)
        return value

    def pcm_end(self):
        if self.dec is not None:
            self.dec.pcm_reinit()
        else:
            self.enc.pcm_end()

    def tr_unary(self, cmax: int, ctx_fn, value=None) -> int:
        """Truncated-unary with per-bin context index from ctx_fn(i)."""
        if self.dec is not None:
            i = 0
            while i < cmax and self.bin(ctx_fn(i)):
                i += 1
            return i
        for i in range(value):
            self.bin(ctx_fn(i), 1)
        if value < cmax:
            self.bin(ctx_fn(value), 0)
        return value

    def tr_unary_bypass(self, cmax: int, value=None) -> int:
        if self.dec is not None:
            i = 0
            while i < cmax and self.bypass():
                i += 1
            return i
        for _ in range(value):
            self.bypass(1)
        if value < cmax:
            self.bypass(0)
        return value
