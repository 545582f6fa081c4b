"""Selective encryption of CABAC bypass bins (reference crypto.cpp +
hevc_cabac.c:984-1330 encrypted variants).

The reference scrambles a subset of bypass-coded syntax (MVD suffixes and
signs, coefficient remaining-level suffixes and signs) with an AES-128-CFB
keystream so the bitstream stays format-conformant but decodes to garbage
without the key.  The keystream generator encrypts an incrementing 16-byte
counter through a STATEFUL CFB cipher (crypto.cpp:41-59 Decrypt_counter with
AESEncryptionStreamMode) and get_key() drains bits from the resulting block
starting at byte 15, low bits first (crypto.cpp:63-100) — replicated here
exactly, including the demo key/iv/counter (crypto.cpp:18).

Every transform preserves the rice/EG code class of the symbol (only suffix
bits inside a fixed prefix change), so encrypted streams parse identically;
`prev_pos` chains the previous raw suffix into each step (hevc.h:1318).
"""

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

# hevc.h:486-493
HEVC_CRYPTO_OFF = 0
HEVC_CRYPTO_MVS = 1 << 0
HEVC_CRYPTO_MV_SIGNS = 1 << 1
HEVC_CRYPTO_TRANSF_COEFFS = 1 << 2
HEVC_CRYPTO_TRANSF_COEFF_SIGNS = 1 << 3
HEVC_CRYPTO_ON = (1 << 4) - 1

_INIT_VAL = (201, 75, 219, 152, 6, 245, 237, 107, 179, 194, 81, 29, 66, 98,
             198, 0, 16, 213, 27, 56, 255, 127, 242, 112, 97, 126, 197, 204,
             25, 59, 38, 30)


class HevcCrypto:
    """AES-CFB keystream + prev_pos chain (one per decoder/encoder)."""

    def __init__(self, key=None, iv=None, counter=None):
        self.key = bytes(key) if key else bytes(_INIT_VAL[16:32])
        self.iv = bytes(iv) if iv else bytes(_INIT_VAL[0:16])
        self.counter = bytearray(counter) if counter else \
            bytearray(_INIT_VAL[5:21])
        self._enc = Cipher(algorithms.AES(self.key),
                           modes.CFB(self.iv)).encryptor()
        self.buf = bytearray(16)        # out_stream_counter
        self.avail = 0
        self.idx = 0
        self.idx_pos = 0
        self.prev_pos = 0

    def _refill(self):
        self.buf[:] = self._enc.update(bytes(self.counter))
        self.avail = 128
        self.idx = 15
        self.idx_pos = 8
        self.counter[0] = (self.counter[0] + 1) & 0xFF

    def get_key(self, nb_bits: int) -> int:
        """crypto.cpp:63-100 get_key, bit-for-bit."""
        if nb_bits <= 0 or nb_bits > 32:
            return 0
        if not self.avail:
            self._refill()
        if self.avail >= nb_bits:
            self.avail -= nb_bits
        else:
            self.avail = 0
        key = 0
        while nb_bits:
            nb = self.idx_pos if nb_bits >= self.idx_pos else nb_bits
            key = (key << nb) + (self.buf[self.idx] & ((1 << nb) - 1))
            self.buf[self.idx] >>= nb
            nb_bits -= nb
            if self.idx and nb == self.idx_pos:
                self.idx -= 1
                self.idx_pos = 8
            else:
                self.idx_pos -= nb
                if nb_bits:
                    self._refill()
                    self.avail -= nb_bits
        return key


def _xform_suffix(prefix, suffix, rice, base, prev, key_fn, encrypt):
    """Shared rice-suffix transform (coeff_abs_level_remaining_decode_enc,
    hevc_cabac.c:1137-1310).  Returns (new_suffix, new_prev) for prefix < 3.

    Decrypt: suffix' = (suffix + M - ((prev^key) & m)) & m (additive cases)
    or bit-cipher XOR; encrypt applies the inverse so that decrypting the
    produced suffix recovers the original.  prev always becomes the RAW
    (encrypted-domain) suffix — identical on both sides because the encoder
    chains on its own output.
    """
    cn = (prefix << rice) + suffix

    def add(nbits, lo_bits):
        # additive cipher over the low lo_bits of suffix (suffix < 2^lo_bits
        # in every call site), key width nbits
        key = key_fn(nbits)
        m = (1 << lo_bits) - 1
        b = (prev ^ key) & m
        if encrypt:
            new = (suffix + b) & m
            return new, new
        new = (suffix + m + 1 - b) & m
        return new, suffix

    def xor_bit(keep_mask):
        key = key_fn(1)
        b = (prev ^ key) & 1
        new = (suffix & keep_mask) | ((suffix & 1) ^ b)
        return new, (new if encrypt else suffix)

    if rice == 1:
        if not (base == 2 and prefix == 2):     # cn_enc in {4,5} <=> prefix 2
            return xor_bit(~1 & 0x3F)
    elif rice == 2:
        if base == 1:
            return add(2, 2)
        if base == 2:
            if prefix <= 1:                     # cn <= 7
                return add(2, 2)
            if suffix < 2:                      # cn 8,9 (branch on raw bits)
                key = key_fn(1)
                b = (prev ^ key) & 1
                if encrypt:
                    new = (suffix + b) & 1
                    return new, new
                return (suffix + 2 - b) & 1, suffix
            # cn 10,11: untouched, no key
        else:                                   # base >= 3
            if prefix <= 1:
                return add(2, 2)
            return xor_bit(2)                   # cn 8..11: bit0 cipher
    elif rice == 3:
        if base == 1:
            return add(3, 3)
        if base == 2:
            if prefix <= 1:                     # cn <= 15
                return add(3, 3)
            if suffix <= 3:                     # cn 16..19
                return add(2, 2)
            if suffix <= 5:                     # cn 20,21: 4 + bit cipher
                key = key_fn(1)
                b = (prev ^ key) & 1
                new = 4 + ((suffix & 1) ^ b)
                return new, (new if encrypt else suffix)
            # cn 22,23: untouched
        else:
            if prefix <= 1:
                return add(3, 3)
            if suffix <= 3:
                return add(2, 2)
            return xor_bit(6)                   # cn 20..23
    elif rice == 4:
        if base == 1:
            return add(4, 4)
        if base == 2:
            if prefix <= 1:                     # cn <= 31
                return add(4, 4)
            if suffix <= 7:                     # cn 32..39
                return add(3, 3)
            if suffix <= 11:                    # cn 40..43: 8 + additive 2
                key = key_fn(2)
                b = (prev ^ key) & 3
                if encrypt:
                    new = 8 + (((suffix & 3) + b) & 3)
                    return new, new
                return 8 + (((suffix & 3) + 4 - b) & 3), suffix
            if suffix <= 13:                    # cn 44,45: 12 + bit cipher
                key = key_fn(1)
                b = (prev ^ key) & 1
                new = 12 + ((suffix & 1) ^ b)
                return new, (new if encrypt else suffix)
            # cn 46,47: untouched
        else:
            if prefix <= 1:
                return add(4, 4)
            if suffix <= 7:
                return add(3, 3)
            if suffix <= 11:
                key = key_fn(2)
                b = (prev ^ key) & 3
                if encrypt:
                    new = 8 + (((suffix & 3) + b) & 3)
                    return new, new
                return 8 + (((suffix & 3) + 4 - b) & 3), suffix
            return xor_bit(14)                  # cn 44..47
    return suffix, prev                         # rice 0 / untouched classes


def xform_remaining_suffix(crypto: HevcCrypto, prefix, suffix, rice, base,
                           encrypt):
    """Rice-class (prefix < 3) remaining-level suffix transform."""
    new, prev = _xform_suffix(prefix, suffix, rice, base, crypto.prev_pos,
                              crypto.get_key, encrypt)
    crypto.prev_pos = prev
    return new


def xform_eg_suffix(crypto: HevcCrypto, suffix, nbits, encrypt):
    """EG-class (prefix >= 3) suffix transform (hevc_cabac.c:1311-1319);
    also the MVD suffix transform (mvd_decode_enc, hevc_cabac.c:1200-1223)."""
    if nbits <= 0:
        # the reference still runs the chain with a 0-bit suffix: the masked
        # result is 0 and prev_pos becomes the (zero) suffix
        crypto.prev_pos = 0
        return 0
    key = crypto.get_key(nbits)
    mask = (1 << nbits) - 1
    if encrypt:
        new = (suffix + (crypto.prev_pos ^ key)) & mask
        crypto.prev_pos = new
        return new
    new = (suffix - (crypto.prev_pos ^ key)) & mask
    crypto.prev_pos = suffix
    return new


def xform_signs(crypto: HevcCrypto, signs, nbits):
    """XOR cipher of coefficient sign bits (coeff_sign_flag_decode,
    hevc_cabac.c:1360-1370); involutive."""
    if nbits <= 0:
        return signs
    return signs ^ crypto.get_key(nbits)


def xform_sign_bit(crypto: HevcCrypto, bit):
    """MV sign flip (hevc_cabac.c:1969-1986); involutive."""
    return bit ^ (crypto.get_key(1) & 1)
