"""libOpenHevc-compatible public API.

Mirrors the reference wrapper surface (gpac/modules/openhevc_dec/
openHevcWrapper.h:79-98) so players built against openHEVC map 1:1:

  libOpenHevcInit / StartDecoder / Decode / GetPictureInfo / GetOutput(Cpy) /
  SetCheckMD5 / SetTemporalLayer_id / SetActiveDecoders / SetViewLayers /
  Flush / Close / Version

The object-style OpenHevcDecoder is the idiomatic Python surface; the
module-level libOpenHevc* functions provide the exact legacy call shape
(handle-based).  A C ABI shim over these lands with the native front-end.
"""

from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .. import __version__
from ..bitstream import nal as nalmod
from ..bitstream.nal import split_annexb
from ..decoder.frontend import Frontend
from ..decoder.refs import DPB, Frame
from ..decoder import recon_np

YUV420 = 0
YUV422 = 1
YUV444 = 2


@dataclass
class FrameInfo:
    nYPitch: int = 0
    nUPitch: int = 0
    nVPitch: int = 0
    nBitDepth: int = 8
    nWidth: int = 0
    nHeight: int = 0
    chromat_format: int = YUV420
    sample_aspect_ratio: tuple = (0, 1)
    frameRate: tuple = (0, 1)
    display_picture_number: int = 0
    flag: int = 0
    nTimeStamp: int = 0


@dataclass
class OutputFrame:
    pvY: np.ndarray = None
    pvU: np.ndarray = None
    pvV: np.ndarray = None
    frameInfo: FrameInfo = field(default_factory=FrameInfo)


class OpenHevcDecoder:
    """HEVC decoder with the reference wrapper's lifecycle.

    One instance decodes one layer; SHVC layered decode chains a second
    instance internally (set_active_decoders/set_view_layers, mirroring the
    reference wrapper's MAX_DECODERS=2 chain, openHevcWrapper.c:106-133)."""

    def __init__(self, nb_threads: int = 1, thread_type: int = 1,
                 backend: str = "auto", layer_id: int = 0):
        self.nb_threads = nb_threads
        self.thread_type = thread_type
        self._backend_kind = backend
        self._backend = None
        self._started = False
        self._check_md5 = False
        self._temporal_layer_id = 7
        self._output_queue = deque()        # bounded: consumed frames leave
        self._current: Optional[Frame] = None
        self._reorder: List[Frame] = []
        self.dpb = DPB()
        # nb_threads drives host-parallel WPP substream entropy decode
        # (the wrapper's av_opt_set("threads"), openHevcWrapper.c:80-90)
        self.fe = Frontend(dpb=self.dpb, layer_id=layer_id,
                           parse_threads=max(1, nb_threads))
        self.md5_log: List[tuple] = []
        self.md5_ok = 0
        self.md5_fail = 0
        self.error_count = 0
        from ..log import DecodeStats
        self.stats = DecodeStats()
        # SHVC layering (only meaningful on the layer-0 handle)
        self._el: Optional["OpenHevcDecoder"] = None
        self._active_layer = 0
        self._view_layer = 0
        self._last_frame: Optional[Frame] = None    # decode-order latest

    # -- lifecycle ---------------------------------------------------------

    def start(self):
        if self._backend_kind == "tpu" or self._backend_kind == "auto":
            try:
                from ..tpu import TpuBackend
                self._backend = TpuBackend()
            except Exception:
                if self._backend_kind == "tpu":
                    raise
                self._backend = None
        # the C++ CABAC front-end is ~100x the Python walker; default on,
        # falling back to the Python walker if the self-build fails
        try:
            from ..native import get_lib
            get_lib()
            self.fe.use_native = True
        except Exception:
            self.fe.use_native = False
        self._started = True
        if self._el is not None and not self._el._started:
            self._el.start()

    def copy_extradata(self, extradata: bytes):
        """hvcC or annex-B parameter sets (libOpenHevcCopyExtraData).

        hvcC extradata also switches the decoder into NALFF mode: later
        samples carry ISO length-prefixed NALUs, as a GPAC/MP4 demuxer
        delivers them (the reference's is_nalff path, hevc.c:2860)."""
        if extradata[:1] in (b"\x01",):
            self._nalff = (extradata[21] & 3) + 1
            for nal_bytes in _parse_hvcc(extradata):
                for nal in split_annexb(b"\x00\x00\x01" + nal_bytes):
                    self.fe.decode_nal(nal)
        else:
            for nal in split_annexb(extradata):
                self.fe.decode_nal(nal)

    def decode(self, data: bytes, pts: int = 0) -> int:
        """Decode one AU (annex-B). Returns got_picture (reference
        libOpenHevcDecode semantics; len 0 flushes)."""
        assert self._started, "call start() first"
        if not data:
            return self._flush_one()
        if getattr(self, "_nalff", 0) and not (
                data[:3] == b"\x00\x00\x01" or data[:4] == b"\x00\x00\x00\x01"):
            # ISO length-prefixed sample (GPAC/MP4 path) -> annex-B
            ls = self._nalff
            pos = 0
            parts = []
            while pos + ls <= len(data):
                n = int.from_bytes(data[pos:pos + ls], "big")
                pos += ls
                parts.append(b"\x00\x00\x01" + data[pos:pos + n])
                pos += n
            data = b"".join(parts)
        self.stats.aus += 1
        self.stats.bytes_in += len(data)
        got = 0

        def emit(plan):
            try:
                frame = self._reconstruct(plan)
            except Exception:
                self.error_count += 1
                return 0
            self.stats.frames_decoded += 1
            self.dpb.add(frame)
            self._reorder.append(frame)
            self._last_frame = frame
            return 1

        for nal in split_annexb(data):
            if nal.layer_id != self.fe.layer_id and \
                    nal.type not in (nalmod.NAL_VPS, nalmod.NAL_SPS):
                continue        # other layers' NALs (hevc.c:3303)
            if nalmod.is_vcl(nal.type):
                if nal.temporal_id > self._temporal_layer_id:
                    continue
                if nal.rbsp[0] >> 7:            # first slice of a picture
                    plan = self.fe.end_picture()
                    if plan is not None:
                        got = emit(plan)
                    is_bla = (nalmod.NAL_BLA_W_LP <= nal.type
                              <= nalmod.NAL_BLA_N_LP)
                    if nalmod.is_idr(nal.type) or is_bla:
                        # POC reset (seq_decode bump, hevc.c:561-566):
                        # the old sequence drains first — or is dropped
                        # when no_output_of_prior_pics_flag is set
                        # (hevc_refs.c:186-196)
                        if self._prior_pics_discarded(nal):
                            self._reorder = []
                        else:
                            self._drain_reorder()
                        if nalmod.is_idr(nal.type):
                            self.dpb.clear()
            # bitstream errors poison only the current picture; decode
            # continues like the reference without AV_EF_EXPLODE
            # (hevc.c:3496-3499)
            try:
                plan = self.fe.decode_nal(nal)
            except Exception:
                self.error_count += 1
                self.fe._cur = None
                plan = None
            if plan is not None:
                got = emit(plan)
        try:
            plan = self.fe.end_picture()
        except Exception:
            self.error_count += 1
            plan = None
        if plan is not None:
            got = emit(plan)
        if got:
            self._bump()
        got_out = self._pop_output()
        # SHVC: feed the same AU to the chained EL decoder (the wrapper's
        # libOpenHevcDecode loop, openHevcWrapper.c:117-134); the display
        # layer's got_picture wins
        if self._el is not None and self._active_layer >= 1:
            got_el = self._el.decode(data, pts)
            return got_el if self._view_layer >= 1 else got_out
        return got_out

    def _pop_output(self) -> int:
        if self._output_queue:
            self._current = self._output_queue.popleft()
            if self._check_md5:
                self._verify_md5(self._current)
            return 1
        return 0

    def _reconstruct(self, plan) -> Frame:
        if self._backend is not None:
            if getattr(self._backend, "ctb_log2", None) is None:
                self._backend.ctb_log2 = self.fe.sps.log2_ctb_size
            planes, wire = self._backend.decode_frame(plan, self.dpb)
            # the API surface hands out host ndarrays: fetch through the
            # narrow wire buffer (bit-packed for 10/12-bit, see
            # Frame.host_planes), then keep host copies (refs included —
            # the API decoder is host-centric, unlike the pipeline)
            tmp = Frame(poc=plan.poc, planes=list(planes), wire=wire,
                        bit_depth=plan.bit_depth,
                        wire_fmt=getattr(self._backend, "wire_fmt", None),
                        fetch_cb=getattr(self._backend, "observe_output",
                                         None))
            planes = [p.astype(np.int32) for p in tmp.host_planes()]
        else:
            planes = recon_np.execute_plan(plan, dpb=self.dpb)
            recon_np.deblock_frame(plan, planes)
            planes = recon_np.sao_frame(plan, planes,
                                        1 << self.fe.sps.log2_ctb_size)
        return Frame(poc=plan.poc, planes=planes,
                     mvf_mv=plan.mvf_mv, mvf_poc=plan.mvf_poc,
                     mvf_pred=plan.mvf_pred, mvf_ref_idx=plan.mvf_ref_idx,
                     rpl=plan.rpl, rpl_lt=plan.rpl_lt, md5=plan.md5)

    def _bump(self):
        """Output reorder: emit frames once the reorder buffer exceeds the
        SPS reorder depth (reference ff_hevc_output_frame, hevc_refs.c:182)."""
        sps = self.fe.sps
        max_reorder = sps.num_reorder_pics[-1] if sps else 0
        self._reorder.sort(key=lambda f: f.poc)
        while len(self._reorder) > max_reorder:
            self._output_queue.append(self._reorder.pop(0))

    def _prior_pics_discarded(self, nal) -> bool:
        """no_output_of_prior_pics_flag of the IRAP slice header (peeked
        before the picture decodes; only the flag's byte region is read)."""
        try:
            from .. import bitstream
            from ..bitstream.bits import BitReader
            r = BitReader(nal.rbsp)
            r.u1()                              # first_slice_in_pic
            return bool(r.u1())                 # no_output_of_prior_pics
        except Exception:
            return False

    def _drain_reorder(self):
        self._reorder.sort(key=lambda f: f.poc)
        self._output_queue.extend(self._reorder)
        self._reorder = []

    def _flush_one(self) -> int:
        if self._el is not None and self._view_layer >= 1:
            got = self._el._flush_one()
            self._drain_reorder()
            self._pop_output()      # keep BL draining in lock-step
            return got
        self._drain_reorder()
        return self._pop_output()

    # -- output ------------------------------------------------------------

    def _view(self) -> "OpenHevcDecoder":
        """Decoder whose output is displayed (display_layer selection)."""
        if self._el is not None and self._view_layer >= 1:
            return self._el
        return self

    def get_picture_info(self) -> FrameInfo:
        if self._view() is not self:
            return self._el.get_picture_info()
        sps = self.fe.sps
        f = FrameInfo()
        if sps is None or self._current is None:
            return f
        # conformance-window cropping
        l, r, t, b = sps.conf_win
        sub_w = 2 if sps.chroma_format_idc in (1, 2) else 1
        sub_h = 2 if sps.chroma_format_idc == 1 else 1
        f.nWidth = sps.width - (l + r) * sub_w
        f.nHeight = sps.height - (t + b) * sub_h
        f.nBitDepth = sps.bit_depth
        f.chromat_format = {1: YUV420, 2: YUV422, 3: YUV444}[sps.chroma_format_idc]
        f.nYPitch = f.nWidth
        f.nUPitch = f.nWidth // (2 if sps.chroma_format_idc in (1, 2) else 1)
        f.nVPitch = f.nUPitch
        f.display_picture_number = self._current.poc
        if sps.vui is not None:
            f.sample_aspect_ratio = (sps.vui.sar_num, sps.vui.sar_den)
            if sps.vui.num_units_in_tick:
                f.frameRate = (sps.vui.time_scale, sps.vui.num_units_in_tick)
            f.flag = sps.vui.field_seq  # progressive/interlaced hint
        return f

    def get_picture_info_cpy(self) -> FrameInfo:
        """libOpenHevcGetPictureInfoCpy analog (openHevcWrapper.c:245):
        pitches in BYTES of the packed copy-out layout — chroma pitch
        truncates odd widths (width>>1) and >8-bit doubles every pitch."""
        f = self.get_picture_info()
        hi = 1 if f.nBitDepth > 8 else 0
        if f.chromat_format == YUV444:
            cpitch = f.nWidth
        else:
            cpitch = f.nWidth >> 1      # floor: odd widths drop a column
        f.nYPitch = f.nWidth << hi
        f.nUPitch = f.nVPitch = cpitch << hi
        return f

    def get_output(self, copy: bool = False) -> Optional[OutputFrame]:
        if self._view() is not self:
            return self._el.get_output(copy=copy)
        if self._current is None:
            return None
        sps = self.fe.sps
        info = self.get_picture_info()
        l, r, t, b = sps.conf_win
        sub = 2 if sps.chroma_format_idc == 1 else 1
        y, u, v = self._current.planes
        y = np.asarray(y)[t * sub:(sps.height - b * sub) or None,
                          l * sub:(sps.width - r * sub) or None]
        u = np.asarray(u)[t:(u.shape[0] - b) or None, l:(u.shape[1] - r) or None]
        v = np.asarray(v)[t:(v.shape[0] - b) or None, l:(v.shape[1] - r) or None]
        dt = np.uint16 if sps.bit_depth > 8 else np.uint8
        if copy:
            # copy-out layout parity (libOpenHevcGetOutputCpy,
            # openHevcWrapper.c:354-397): rows are dst-pitch bytes of the
            # source rows, so odd-width 4:2:0/4:2:2 chroma drops its last
            # column (nUPitch = width>>1 floor)
            info = self.get_picture_info_cpy()
            hi = 1 if sps.bit_depth > 8 else 0
            cw = info.nUPitch >> hi     # chroma width in samples
            u = u[:, :cw]
            v = v[:, :cw]
        out = OutputFrame(pvY=y.astype(dt), pvU=u.astype(dt), pvV=v.astype(dt),
                          frameInfo=info)
        return out

    # -- knobs --------------------------------------------------------------

    def set_debug_mode(self, val: int):
        """libOpenHevcSetDebugMode analog (openHevcWrapper.c:400-404)."""
        from ..log import set_debug_mode
        set_debug_mode(int(val))

    def get_stats(self) -> dict:
        """Decode counters for observability (SURVEY §5 metrics)."""
        s = self.stats.as_dict()
        s["errors"] = self.error_count
        s["md5_ok"] = self.md5_ok
        s["md5_fail"] = self.md5_fail
        if self._el is not None:
            s["enhancement_layer"] = self._el.get_stats()
        return s

    def set_check_md5(self, val: bool):
        self._check_md5 = bool(val)
        if self._el is not None:
            self._el.set_check_md5(val)

    def set_temporal_layer_id(self, tid: int):
        self._temporal_layer_id = tid
        if self._el is not None:
            self._el.set_temporal_layer_id(tid)

    def set_active_decoders(self, n: int):
        """Highest decoded layer (libOpenHevcSetActiveDecoders).  n >= 1
        chains an enhancement-layer decoder fed the same AUs, with the
        upsampled BL picture as its inter-layer reference."""
        self._active_layer = max(0, int(n))
        if self._active_layer >= 1 and self._el is None:
            el = OpenHevcDecoder(self.nb_threads, self.thread_type,
                                 backend=self._backend_kind, layer_id=1)
            el._check_md5 = self._check_md5
            el._temporal_layer_id = self._temporal_layer_id
            # synchronous BL-before-EL: by the time the EL decoder parses
            # its slices of an AU, this decoder has finished that AU's
            # picture (decode() ends the open picture at AU end)
            el.fe.il_source = lambda: self._last_frame
            if self._started:
                el.start()
            self._el = el

    def set_view_layers(self, n: int):
        """Displayed layer (libOpenHevcSetViewLayers)."""
        self._view_layer = max(0, int(n))
        if self._view_layer >= 1:
            self.set_active_decoders(max(self._active_layer,
                                         self._view_layer))

    def flush(self):
        self._drain_reorder()
        self.dpb.clear()
        if self._el is not None:
            self._el.flush()

    def close(self):
        self.dpb.clear()
        self._output_queue.clear()
        if self._el is not None:
            self._el.close()

    def _verify_md5(self, frame):
        """Compare each plane hash against the decoded-picture-hash SEI
        (reference verify_md5/compare_md5, hevc.c:4045-4169).  Frames that
        carried no hash SEI are logged but not counted."""
        from ..decoder.sei import plane_md5
        bd = self.fe.sps.bit_depth
        for i, p in enumerate(frame.planes):
            got = plane_md5(np.asarray(p), bd)
            if frame.md5 is None:
                self.md5_log.append((frame.poc, i, got.hex(), None))
                continue
            ok = got == frame.md5[i]
            self.md5_log.append((frame.poc, i, got.hex(), ok))
            if ok:
                self.md5_ok += 1
            else:
                self.md5_fail += 1


def _parse_hvcc(data: bytes):
    """Minimal hvcC (ISO 14496-15) parameter-set extraction."""
    pos = 22
    num_arrays = data[pos]
    pos += 1
    out = []
    for _ in range(num_arrays):
        pos += 1                      # array_completeness/NAL type
        n = int.from_bytes(data[pos:pos + 2], "big")
        pos += 2
        for _ in range(n):
            ln = int.from_bytes(data[pos:pos + 2], "big")
            pos += 2
            out.append(data[pos:pos + ln])
            pos += ln
    return out


# ---------------------------------------------------------------------------
# legacy handle-based surface (openHevcWrapper.h parity)
# ---------------------------------------------------------------------------

def libOpenHevcInit(nb_pthreads: int, thread_type: int) -> OpenHevcDecoder:
    return OpenHevcDecoder(nb_pthreads, thread_type)


def libOpenHevcStartDecoder(handle: OpenHevcDecoder) -> int:
    handle.start()
    return 1


def libOpenHevcDecode(handle, buf: bytes, nal_len: int = None, pts: int = 0) -> int:
    data = buf[:nal_len] if (buf is not None and nal_len is not None) else (buf or b"")
    return handle.decode(data, pts)


def libOpenHevcGetPictureInfo(handle) -> FrameInfo:
    return handle.get_picture_info()


def libOpenHevcGetOutput(handle, got_picture: int = 1) -> Optional[OutputFrame]:
    return handle.get_output(copy=False)


def libOpenHevcGetOutputCpy(handle, got_picture: int = 1) -> Optional[OutputFrame]:
    return handle.get_output(copy=True)


def libOpenHevcSetCheckMD5(handle, val: int):
    handle.set_check_md5(val)


def libOpenHevcSetDebugMode(handle, val: int):
    handle.set_debug_mode(val)


def libOpenHevcSetTemporalLayer_id(handle, val: int):
    handle.set_temporal_layer_id(val)


def libOpenHevcSetActiveDecoders(handle, val: int):
    handle.set_active_decoders(val)


def libOpenHevcSetViewLayers(handle, val: int):
    handle.set_view_layers(val)


def libOpenHevcFlush(handle):
    handle.flush()


def libOpenHevcClose(handle):
    handle.close()


def libOpenHevcVersion(handle=None) -> str:
    return f"openhevc_tpu {__version__}"
