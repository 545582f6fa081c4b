"""TPU back-end orchestrator: executes a compiled FramePlan on device.

decode_frame() = MC wave + intra/residual waves + deblock + SAO, all as
jit-compiled batched kernels over HBM-resident frame planes.  Bit-exact with
the NumPy scalar pipeline (recon_np), which the tests enforce.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.plan import FramePlan
from .plan_compile import compile_plan, pad_batch
from .wavefront import schedule_slots, run_slots
from .residual import residual_batch, scatter_add_residual
from .intra import intra_batch
from .mc import mc_batch, mc_combine_scatter
from . import deblock as dbk
from .sao import sao_plane, build_sao_maps

_QP_C = jnp.asarray([29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37],
                    jnp.int32)


def _scatter_set(plane, xs, ys, vals, valid):
    """Write disjoint blocks (padding rows duplicate a valid block; they
    contribute zero via the difference trick, so duplicates are safe)."""
    n = vals.shape[1]
    h, w = plane.shape
    gy = ys[:, None, None] + jnp.arange(n)[None, :, None]
    gx = xs[:, None, None] + jnp.arange(n)[None, None, :]
    flat_idx = (gy * w + gx).reshape(-1)
    flat = plane.reshape(-1)
    cur = flat[flat_idx]
    vmask = jnp.repeat(valid, n * n)
    delta = jnp.where(vmask, vals.reshape(-1), cur) - jnp.where(vmask, cur, cur)
    return flat.at[flat_idx].add(delta).reshape(h, w)


class TpuBackend:
    def __init__(self, ctb_log2=None):
        self.ctb_log2 = ctb_log2

    def decode_frame(self, plan: FramePlan, dpb):
        cp = compile_plan(plan)
        bd = plan.bit_depth
        hs = 1 if plan.chroma_format_idc in (1, 2) else 0
        vs = 1 if plan.chroma_format_idc == 1 else 0
        shapes = [(plan.height, plan.width),
                  (plan.height >> vs, plan.width >> hs),
                  (plan.height >> vs, plan.width >> hs)]
        planes = [jnp.zeros(s, jnp.int32) for s in shapes]

        # ---- wave 0: motion compensation ----
        if cp.inter:
            refs = [jnp.stack([jnp.asarray(dpb.get(p).planes[c], jnp.int32)
                               for p in cp.ref_pocs]) for c in range(3)]
            for (w, h), batch in sorted(cp.inter.items()):
                b, valid = pad_batch(batch)
                valid = jnp.asarray(valid)
                for c in range(3):
                    sh = hs if c else 0
                    sv = vs if c else 0
                    xs = jnp.asarray(b["xs"] >> sh)
                    ys = jnp.asarray(b["ys"] >> sv)
                    wc, hc = w >> sh, h >> sv
                    val0 = mc_batch(refs[c], jnp.asarray(b["s0"]), xs, ys,
                                    jnp.asarray(b["mvx0"]), jnp.asarray(b["mvy0"]),
                                    wc, hc, c == 0, bd)
                    val1 = mc_batch(refs[c], jnp.asarray(b["s1"]), xs, ys,
                                    jnp.asarray(b["mvx1"]), jnp.asarray(b["mvy1"]),
                                    wc, hc, c == 0, bd)
                    planes[c] = mc_combine_scatter(planes[c], xs, ys, val0, val1,
                                                   jnp.asarray(b["pf"]), valid,
                                                   wc, hc, bd)

        # ---- intra + residual slots: one fused scan ----
        T, caps, data = schedule_slots(plan)
        if data:
            keys = tuple(sorted(data.keys()))
            jdata = jax.tree_util.tree_map(jnp.asarray, data)
            planes = list(run_slots(tuple(planes), jdata, keys, bd,
                                    bool(plan.strong_intra_smoothing)))

        planes = self._filters(plan, planes, bd)
        return planes

    # ------------------------------------------------------------- filters

    def _filters(self, plan, planes, bd):
        if not plan.deblock_disable:
            # pad to luma multiples of 16 (chroma 8) so the edge-window
            # reshapes are exact; padded regions carry BS 0 (no-ops)
            ph = -plan.height % 16
            pw = -plan.width % 16

            def padmap(m, dy, dx):
                return np.pad(m, ((0, dy), (0, dx)))

            vbs = jnp.asarray(padmap(plan.vertical_bs, ph // 4, pw // 8)
                              .astype(np.int32))
            hbs = jnp.asarray(padmap(plan.horizontal_bs, ph // 8, pw // 4)
                              .astype(np.int32))
            qp_map = jnp.asarray(padmap(plan.qp_map, ph // 8, pw // 8)
                                 .astype(np.int32))
            nfm0 = (plan.no_filter_map if plan.no_filter_map is not None
                    else np.zeros((plan.height // 4, plan.width // 4), np.int32))
            nfm = jnp.asarray(padmap(nfm0, ph // 4, pw // 4).astype(np.int32))

            def pad_pl(p, dy, dx):
                return jnp.pad(p, ((0, dy), (0, dx))) if (dy or dx) else p

            luma = pad_pl(planes[0], ph, pw)
            luma = dbk.deblock_luma_vertical(luma, vbs, qp_map,
                                             plan.beta_offset,
                                             plan.tc_offset, nfm, bd)
            luma = dbk.deblock_luma_horizontal(luma, hbs, qp_map,
                                               plan.beta_offset,
                                               plan.tc_offset, nfm, bd)
            planes[0] = luma[:plan.height, :plan.width]
            if plan.chroma_format_idc == 1:
                for c in (1, 2):
                    off = plan.cb_qp_offset if c == 1 else plan.cr_qp_offset
                    ch, cw = planes[c].shape
                    pl = pad_pl(planes[c], ph // 2, pw // 2)
                    pl = dbk.deblock_chroma_vertical(
                        pl, vbs, qp_map, off, plan.tc_offset, nfm, _QP_C, bd)
                    pl = dbk.deblock_chroma_horizontal(
                        pl, hbs, qp_map, off, plan.tc_offset, nfm, _QP_C, bd)
                    planes[c] = pl[:ch, :cw]

        if plan.sao is not None and (plan.sao_luma or plan.sao_chroma):
            ctb = 1 << (self.ctb_log2 or 6)
            out = []
            for c in range(3):
                cs = ctb >> (1 if c and plan.chroma_format_idc == 1 else 0)
                tm, bm, em, om = build_sao_maps(plan, c, cs, planes[c].shape)
                filt = sao_plane(planes[c], jnp.asarray(tm), jnp.asarray(bm),
                                 jnp.asarray(em), jnp.asarray(om), bd)
                out.append(filt)
            # restore pcm/transquant-bypass pixels
            if plan.no_filter_map is not None and plan.no_filter_map.any():
                for c in range(3):
                    sh = 1 if (c and plan.chroma_format_idc == 1) else 0
                    rep = 4 >> sh
                    mask = np.repeat(np.repeat(plan.no_filter_map, rep, 0),
                                     rep, 1)[:planes[c].shape[0], :planes[c].shape[1]]
                    out[c] = jnp.where(jnp.asarray(mask.astype(bool)),
                                       planes[c], out[c])
            planes = out
        return planes
