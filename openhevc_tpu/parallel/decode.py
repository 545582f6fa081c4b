"""Multi-device decode: closed-GOP segments in parallel across the dp axis.

The reference's frame-level parallelism clones the decoder per pthread and
pipelines packets through the clones with progress waits
(pthread_frame.c:325-513).  The TPU-native equivalent decodes INDEPENDENT
random-access segments concurrently: the stream parser splits at IRAP
boundaries whose segments share no DPB state (IDR/BLA close the GOP), each
segment's host front-end runs on its own thread (the C CABAC front-end
releases the GIL), and its fused frame_step dispatches pin to one device of
the mesh's dp axis.  Reference frames never cross devices — the DPB of a
segment lives on its device — so no collectives are needed on this axis;
the sp axis (spatial sharding with halo collectives) composes underneath
via parallel/mesh.py.

Bit-exactness vs serial decode is enforced by tests on the virtual CPU mesh.
"""

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax

from ..bitstream import nal as nalmod
from ..parser import HevcParser, split_ps


def split_closed_gops(data: bytes):
    """Split an annex-B stream into independently decodable byte ranges:
    a new segment starts at each IDR/BLA access unit (CRA leaves RASL
    dependencies, so CRA does not split).  -> [(offset, size)]."""
    infos = HevcParser().iter_access_units(data)
    segs = []
    start = None
    for info in infos:
        t = info.nal_type
        is_close = t in (nalmod.NAL_IDR_W_RADL, nalmod.NAL_IDR_N_LP,
                         nalmod.NAL_BLA_W_LP, nalmod.NAL_BLA_W_RADL,
                         nalmod.NAL_BLA_N_LP)
        if is_close and start is not None:
            segs.append((start, info.offset - start))
            start = info.offset
        elif start is None:
            start = info.offset
    if start is not None and start < len(data):
        segs.append((start, len(data) - start))
    return segs


class MeshDecoder:
    """Decode closed-GOP segments concurrently, one device per segment
    (round-robin over the mesh's dp axis)."""

    def __init__(self, devices=None, check_md5=False, use_native=True,
                 backend_factory=None):
        self.devices = list(devices if devices is not None else jax.devices())
        self.check_md5 = check_md5
        self.use_native = use_native
        self.backend_factory = backend_factory
        self.md5_ok = 0
        self.md5_fail = 0

    def _decode_segment(self, seg_bytes, device):
        from ..decoder.frontend import Decoder
        if self.backend_factory is not None:
            backend = self.backend_factory()
        else:
            from ..tpu import TpuBackend
            backend = TpuBackend()
        dec = Decoder(backend=backend, check_md5=self.check_md5,
                      use_native=self.use_native)
        with jax.default_device(device):
            frames = dec.decode_stream(seg_bytes)
            # materialize on host before the device moves to the next segment
            for f in frames:
                f.planes = [np.asarray(p, dtype=np.int32)
                            for p in f.host_planes()]
                f.wire = None
        return frames, dec.md5_ok, dec.md5_fail

    def _decode_pipelined(self, data: bytes):
        """Open-GOP multi-device decode: DEPENDENT frames pipeline across
        the dp axis round-robin, reference planes transferring explicitly
        producer-device -> consumer-device (the reference overlaps
        dependent frames across frame-threads with per-row progress waits,
        pthread_frame.c:325-513; here the async dispatch queue plus the
        device_put ref edges give the same overlap without locks)."""
        from ..decoder.frontend import Decoder
        if self.backend_factory is not None:
            backend = self.backend_factory()
        else:
            from ..tpu import TpuBackend
            backend = TpuBackend(device_schedule=self.devices)
        dec = Decoder(backend=backend, check_md5=self.check_md5,
                      use_native=self.use_native)
        frames = dec.decode_stream(data)
        for f in frames:
            f.planes = [np.asarray(p, dtype=np.int32)
                        for p in f.host_planes()]
            f.wire = None
        self.md5_ok += dec.md5_ok
        self.md5_fail += dec.md5_fail
        return frames

    def decode_stream(self, data: bytes, max_workers=None):
        """-> frames in output order (segments concatenated in stream
        order; POC order within each segment, like the serial decoder)."""
        segs = split_closed_gops(data)
        if not segs:
            return []
        if len(segs) == 1 and len(self.devices) > 1:
            # one open GOP (CRA/RASL chains can't split): pipeline
            # dependent frames across devices instead
            return self._decode_pipelined(data)
        # segments after the first need the leading parameter sets
        # (real streams repeat PS at IRAPs; generated ones may not)
        ps = data[:split_ps(data)]

        def seg_bytes(i, off, size):
            raw = data[off:off + size]
            return raw if i == 0 or not ps else ps + raw

        n_dev = len(self.devices)
        workers = max_workers or min(len(segs), n_dev)
        results = [None] * len(segs)
        if workers <= 1 or len(segs) == 1:
            for i, (off, size) in enumerate(segs):
                results[i] = self._decode_segment(
                    seg_bytes(i, off, size), self.devices[i % n_dev])
        else:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                futs = [
                    ex.submit(self._decode_segment, seg_bytes(i, off, size),
                              self.devices[i % n_dev])
                    for i, (off, size) in enumerate(segs)]
                results = [f.result() for f in futs]
        out = []
        for frames, ok, fail in results:
            out.extend(frames)
            self.md5_ok += ok
            self.md5_fail += fail
        return out
