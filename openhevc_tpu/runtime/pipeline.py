"""Pipelined decode: the TPU-native equivalent of the reference's frame
threads (pthread_frame.c; SURVEY.md §2.3).

The reference clones the decoder context per worker and synchronizes on
per-row progress counters.  Here the split is cleaner because the two-phase
design already separates the sequential host work from the batched device
work:

  parser thread:  NAL demux + CABAC decode -> FramePlan queue.
                  TMVP needs only the *motion field* of earlier frames,
                  which the parse itself produces — so the parser runs
                  ahead of reconstruction with a motion-only DPB.
  main thread:    plan -> prepare() -> one fused frame_step dispatch.
                  MC needs decoded *pixels*, so dispatch stays in order
                  with its own pixel DPB.

The C front-end releases the GIL during the CTU walk, so parse and the
host-side prepare genuinely overlap.
"""

import queue
import threading

import numpy as np

from ..bitstream import nal as nalmod
from ..bitstream.nal import split_annexb
from ..decoder.frontend import Frontend, Decoder
from ..decoder.refs import DPB, Frame
from ..decoder import recon_np


class PipelinedDecoder:
    """Two-stage pipelined decoder; same results as Decoder.decode_stream."""

    def __init__(self, backend=None, check_md5=True, use_native=True,
                 depth=4, resilient=False, dispatch_ahead=2,
                 parse_threads=1, prefetch_wire=True):
        self.backend = backend
        self.check_md5 = check_md5
        self.use_native = use_native
        # False = HBM-resident serving: downstream consumers read the
        # decoded planes on device, so don't start host wire transfers
        self.prefetch_wire = prefetch_wire
        self.parse_threads = parse_threads
        self.depth = depth
        self.resilient = resilient          # drop broken pictures, continue
        # frames are held back until `dispatch_ahead` newer frames have been
        # dispatched: the consumer's blocking host fetch (wire transfer) then
        # overlaps with device execution of the frames behind it
        import os as _os
        _da = _os.environ.get("OPENHEVC_DISPATCH_AHEAD", "")
        if _da.isdigit():
            dispatch_ahead = int(_da)
        self.dispatch_ahead = dispatch_ahead if backend is not None else 0
        self.dpb = DPB()                    # pixel DPB (reconstruction)
        self.md5_ok = 0
        self.md5_fail = 0
        self.error_count = 0
        from ..log import DecodeStats
        self.stats = DecodeStats()

    def decode_stream(self, data: bytes):
        """Decode a whole stream -> frames in output order (list)."""
        return list(self.frames(data))

    def frames(self, data: bytes, max_tid=7, max_frames=0):
        """Generator yielding frames in output (bump) order with bounded
        memory: the reorder buffer holds at most sps_num_reorder_pics frames
        and the pixel DPB is pruned by each picture's RPS."""
        plans_q = queue.Queue(maxsize=self.depth)
        parse_dpb = DPB()                   # motion-only DPB (parse-ahead)
        fe = Frontend(dpb=parse_dpb, use_native=self.use_native,
                      parse_threads=self.parse_threads)
        err = []
        stop = threading.Event()

        def emit_plan(plan, idr):
            # register a motion-only stub so later TMVP parses resolve
            parse_dpb.add(Frame(poc=plan.poc, planes=None,
                                mvf_mv=plan.mvf_mv, mvf_poc=plan.mvf_poc,
                                mvf_pred=plan.mvf_pred,
                                mvf_ref_idx=plan.mvf_ref_idx,
                                rpl=plan.rpl, rpl_lt=plan.rpl_lt))
            while not stop.is_set():
                try:
                    plans_q.put((plan, idr), timeout=0.2)
                    return
                except queue.Full:
                    pass

        def parser():
            try:
                pending_idr = False
                for nal in split_annexb(data):
                    if stop.is_set():
                        break
                    if nal.layer_id != fe.layer_id and \
                            nal.type not in (nalmod.NAL_VPS, nalmod.NAL_SPS):
                        continue    # other layers (SHVC EL NALs)
                    if nalmod.is_vcl(nal.type):
                        if nal.temporal_id > max_tid:
                            continue
                        if nal.rbsp[0] >> 7:
                            plan = fe.end_picture()
                            if plan is not None:
                                emit_plan(plan, pending_idr)
                            pending_idr = nalmod.is_idr(nal.type)
                            if pending_idr:
                                parse_dpb.clear()
                    if self.resilient:
                        # bitstream errors poison only the current picture
                        # (reference continues without AV_EF_EXPLODE)
                        try:
                            fe.decode_nal(nal)
                        except Exception:
                            self.error_count += 1
                            fe._cur = None
                    else:
                        fe.decode_nal(nal)
                if not stop.is_set():
                    try:
                        plan = fe.end_picture()
                    except Exception:
                        if not self.resilient:
                            raise
                        self.error_count += 1
                        plan = None
                    if plan is not None:
                        emit_plan(plan, pending_idr)
            except Exception as e:          # surfaced on the main thread
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        plans_q.put(None, timeout=0.2)
                        break
                    except queue.Full:
                        pass

        t = threading.Thread(target=parser, daemon=True)
        t.start()

        # third stage: reconstruction/dispatch runs on its OWN thread so the
        # consumer's blocking host fetch (host_planes: the D2H wire wait,
        # GIL released) overlaps the next frames' prepare() — without this
        # the fetch wait and the host plan compilation serialize on the one
        # thread and the wire never hides (the reference's analog is the
        # frame-thread handoff at ff_thread_finish_setup, hevc.c:3271)
        out_q = queue.Queue(maxsize=max(2, self.dispatch_ahead + 1))

        def put_out(f):
            while not stop.is_set():
                try:
                    out_q.put(f, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def dispatcher():
            import os as _os
            import time as _time
            from ..log import logger as _log
            reorder = []                    # frames awaiting output, by POC
            # group uploads: batch a few queued frames' plan blobs into ONE
            # host->device transfer (tunnel H2D rate ~doubles at 8 MB vs
            # 2 MB chunks).  Draining with get_nowait keeps this stall-free:
            # group size shrinks naturally when the parser is the laggard.
            group_n = 1
            be = self.backend
            if be is not None and hasattr(be, "prepare_host"):
                genv = _os.environ.get("OPENHEVC_H2D_GROUP", "")
                if genv.isdigit():
                    group_n = max(1, int(genv))
                else:
                    import jax as _jax
                    group_n = 4 if _jax.default_backend() != "cpu" else 1
            done = False
            try:
                while not done:
                    item = plans_q.get()
                    if item is None:
                        break
                    items = [item]
                    # while the d5 output-wire probe is unresolved, prepare
                    # ONE frame at a time: the probe resolves (below) before
                    # any later frame's profile is built, so the compiled
                    # shape sequence is a pure function of the stream — not
                    # of thread timing (a cold run previously churned
                    # through unrepeatable escape-cap shape variants, each
                    # a full fused-step XLA compile)
                    probing = (be is not None and self.prefetch_wire
                               and getattr(be, "_dwire", False) is None)
                    while len(items) < (1 if probing else group_n):
                        try:
                            nxt = plans_q.get_nowait()
                        except queue.Empty:
                            break
                        if nxt is None:
                            done = True
                            break
                        items.append(nxt)
                    if group_n > 1 and len(items) > 1:
                        preps = [be.prepare_host(p) for (p, _) in items]
                        blob_devs = be.upload_group(preps)
                    else:
                        preps = [None] * len(items)
                        blob_devs = [None] * len(items)
                    for (plan, is_idr), prep, bdev in zip(items, preps,
                                                          blob_devs):
                        if is_idr:
                            reorder.sort(key=lambda f: f.poc)
                            for f in reorder:
                                if not put_out(f):
                                    return
                            reorder = []
                            self.dpb.clear()
                        _t0 = _time.monotonic()
                        frame = self._reconstruct(plan, prep, bdev)
                        self.stats.frames_decoded += 1
                        self.stats.decode_time_s += _time.monotonic() - _t0
                        _log.debug("decoded poc %d type %d in %.1f ms",
                                   plan.poc, plan.slice_type,
                                   (_time.monotonic() - _t0) * 1e3)
                        self.dpb.add(frame)
                        if probing:
                            # resolve the probe HERE, synchronously: fetch
                            # the first frame's planes (cached on the Frame,
                            # so the consumer's own host_planes() is free)
                            # and let observe_output decide the d5 wire +
                            # its sticky caps before frame 1 is prepared
                            frame.host_planes()
                            probing = False
                        if plan.ref_keep is not None:
                            self.dpb.retain(set(plan.ref_keep) | {plan.poc})
                        if self.check_md5 and plan.md5 is not None:
                            self._verify_md5(frame, plan.md5, plan.bit_depth)
                        reorder.append(frame)
                        reorder.sort(key=lambda f: f.poc)
                        while len(reorder) > plan.num_reorder_pics:
                            if not put_out(reorder.pop(0)):
                                return
                        if stop.is_set():
                            return
                reorder.sort(key=lambda f: f.poc)
                for f in reorder:
                    if not put_out(f):
                        return
            except Exception as e:          # surfaced on the main thread
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        out_q.put(None, timeout=0.2)
                        break
                    except queue.Full:
                        pass

        td = threading.Thread(target=dispatcher, daemon=True)
        td.start()

        emitted = 0
        try:
            while True:
                f = out_q.get()
                if f is None:
                    break
                yield f
                emitted += 1
                if max_frames and emitted >= max_frames:
                    return
            if err:
                # unblock the producer threads before joining: the parser
                # may be spinning on a full plans_q after the dispatcher
                # died mid-stream
                stop.set()
            t.join()
            td.join()
            if err:
                raise err[0]
        finally:
            stop.set()

    def _reconstruct(self, plan, prep=None, blob_dev=None) -> Frame:
        wire = None
        if self.backend is not None:
            if getattr(self.backend, "ctb_log2", None) is None:
                self.backend.ctb_log2 = plan.log2_ctb_size
            if prep is not None:
                planes, wire = self.backend.decode_prepared(
                    prep, blob_dev, self.dpb)
            else:
                planes, wire = self.backend.decode_frame(plan, self.dpb)
            if not self.prefetch_wire:
                pass
            elif isinstance(wire, tuple):
                # chunked big-frame wire (frame_step splits >6 MB fetches)
                for w in wire:
                    if hasattr(w, "copy_to_host_async"):
                        w.copy_to_host_async()
            elif hasattr(wire, "copy_to_host_async"):
                # start the device->host wire transfer now: it streams
                # behind the async dispatch queue while the host parses
                # ahead, so the consumer's host_planes() is a wait, not a
                # cold 1.5 B/px fetch over the (slow) TPU link
                wire.copy_to_host_async()
        else:
            planes = recon_np.execute_plan(plan, dpb=self.dpb)
            recon_np.deblock_frame(plan, planes)
            planes = recon_np.sao_frame(plan, planes,
                                        1 << plan.log2_ctb_size)
        return Frame(poc=plan.poc, planes=planes, wire=wire,
                     mvf_mv=plan.mvf_mv, mvf_poc=plan.mvf_poc,
                     mvf_pred=plan.mvf_pred, mvf_ref_idx=plan.mvf_ref_idx,
                     rpl=plan.rpl, rpl_lt=plan.rpl_lt, md5=plan.md5,
                     bit_depth=plan.bit_depth, conf_win=plan.conf_win,
                     chroma_format_idc=plan.chroma_format_idc,
                     wire_fmt=getattr(self.backend, "wire_fmt", None),
                     fetch_cb=getattr(self.backend, "observe_output", None))

    def _verify_md5(self, frame, expected, bit_depth):
        from ..decoder.sei import plane_md5
        for c, hp in enumerate(frame.host_planes()):
            got = plane_md5(hp, bit_depth)
            if got == expected[c]:
                self.md5_ok += 1
                self.stats.md5_ok += 1
            else:
                self.md5_fail += 1
                self.stats.md5_fail += 1
