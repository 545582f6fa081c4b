"""Whole-frame deblocking on TPU (exact int32, jit-compiled).

Spec 8.7.2 as two data-parallel passes: all vertical edges, then all
horizontal edges (legal because BS is precomputed by the front-end; the
reference achieves the same order CTB-by-CTB).

Layout: every filter tap is a STRIDED VIEW of the plane (stride 8 along the
cross-edge axis), so all arithmetic runs on (H, ne)- or (ne, W)-shaped
arrays whose minor dims fill the vector registers.  The earlier
block-gather formulation ((nr, ne, 8, 8) tiles) left the 8-wide window on
the lane dimension and relayout-ed on every sub-index; the strided form is
>2x faster at 1080p and needs no full-plane transpose for the horizontal
pass (reference SIMD analog: x86/hevc_deblock.asm keeps lines in registers
the same way).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model.filters import BETA_TABLE, TC_TABLE

_BETA = jnp.asarray(np.asarray(BETA_TABLE), jnp.int32)
_TC = jnp.asarray(np.asarray(TC_TABLE), jnp.int32)


def _take4(x, axis, k):
    """Element k of each 4-group along `axis` (length -> length/4)."""
    if axis == 0:
        return x.reshape(x.shape[0] // 4, 4, x.shape[1])[:, k]
    return x.reshape(x.shape[0], x.shape[1] // 4, 4)[..., k]


def _bcast4(x, axis):
    """Broadcast per-4-group values back to per-line (length*4)."""
    if axis == 0:
        a, b = x.shape
        return jnp.broadcast_to(x[:, None, :], (a, 4, b)).reshape(a * 4, b)
    a, b = x.shape
    return jnp.broadcast_to(x[..., None], (a, b, 4)).reshape(a, b * 4)


def _bcast2(x, axis):
    """Broadcast per-8-group values to per-4-group (length*2)."""
    if axis == 0:
        a, b = x.shape
        return jnp.broadcast_to(x[:, None, :], (a, 2, b)).reshape(a * 2, b)
    a, b = x.shape
    return jnp.broadcast_to(x[..., None], (a, b, 2)).reshape(a, b * 2)


def _luma_filter(taps, tc4, beta4, no_p4, no_q4, axis, bit_depth):
    """Shared luma edge filter.

    taps: (p3, p2, p1, p0, q0, q1, q2, q3), each (A, B); the line axis
    (`axis`) runs along the edge.  tc4/beta4/no_p4/no_q4 are per-4-line
    params with the line axis reduced by 4.  Returns the six filtered taps
    (p2..q2).  Integer semantics match hevcdsp_template.c:~1500-1700.
    """
    p3, p2, p1, p0, q0, q1, q2, q3 = taps
    maxv = (1 << bit_depth) - 1
    beta4 = beta4 << (bit_depth - 8)
    tc4 = tc4 << (bit_depth - 8)

    dp = jnp.abs(p2 - 2 * p1 + p0)
    dq = jnp.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = _take4(dp, axis, 0), _take4(dp, axis, 3)
    dq0, dq3 = _take4(dq, axis, 0), _take4(dq, axis, 3)
    d0, d3 = dp0 + dq0, dp3 + dq3
    active4 = (d0 + d3 < beta4) & (tc4 > 0)

    beta3, beta2 = beta4 >> 3, beta4 >> 2
    tc25 = (tc4 * 5 + 1) >> 1
    sd = jnp.abs(p3 - p0) + jnp.abs(q3 - q0)
    pq = jnp.abs(p0 - q0)
    strong4 = ((_take4(sd, axis, 0) < beta3) & (_take4(pq, axis, 0) < tc25) &
               (_take4(sd, axis, 3) < beta3) & (_take4(pq, axis, 3) < tc25) &
               ((d0 << 1) < beta2) & ((d3 << 1) < beta2))
    nd_p4 = (dp0 + dp3) < ((beta4 + (beta4 >> 1)) >> 3)
    nd_q4 = (dq0 + dq3) < ((beta4 + (beta4 >> 1)) >> 3)

    tc = _bcast4(tc4, axis)
    tc2b = tc << 1
    sp0 = p0 + jnp.clip(((p2 + 2*p1 + 2*p0 + 2*q0 + q1 + 4) >> 3) - p0, -tc2b, tc2b)
    sp1 = p1 + jnp.clip(((p2 + p1 + p0 + q0 + 2) >> 2) - p1, -tc2b, tc2b)
    sp2 = p2 + jnp.clip(((2*p3 + 3*p2 + p1 + p0 + q0 + 4) >> 3) - p2, -tc2b, tc2b)
    sq0 = q0 + jnp.clip(((p1 + 2*p0 + 2*q0 + 2*q1 + q2 + 4) >> 3) - q0, -tc2b, tc2b)
    sq1 = q1 + jnp.clip(((p0 + q0 + q1 + q2 + 2) >> 2) - q1, -tc2b, tc2b)
    sq2 = q2 + jnp.clip(((2*q3 + 3*q2 + q1 + q0 + p0 + 4) >> 3) - q2, -tc2b, tc2b)

    tch = tc >> 1
    delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    apply_n = jnp.abs(delta0) < 10 * tc
    d0c = jnp.clip(delta0, -tc, tc)
    np0 = jnp.clip(p0 + d0c, 0, maxv)
    nq0 = jnp.clip(q0 - d0c, 0, maxv)
    np1 = jnp.clip(p1 + jnp.clip((((p2 + p0 + 1) >> 1) - p1 + d0c) >> 1,
                                 -tch, tch), 0, maxv)
    nq1 = jnp.clip(q1 + jnp.clip((((q2 + q0 + 1) >> 1) - q1 - d0c) >> 1,
                                 -tch, tch), 0, maxv)

    nop = _bcast4(no_p4, axis).astype(bool)
    noq = _bcast4(no_q4, axis).astype(bool)
    s = _bcast4(strong4 & active4, axis)
    nrm = _bcast4((~strong4) & active4, axis) & apply_n
    ndp = _bcast4(nd_p4, axis)
    ndq = _bcast4(nd_q4, axis)
    fp0 = jnp.where(s & ~nop, sp0, jnp.where(nrm & ~nop, np0, p0))
    fp1 = jnp.where(s & ~nop, sp1, jnp.where(nrm & ~nop & ndp, np1, p1))
    fp2 = jnp.where(s & ~nop, sp2, p2)
    fq0 = jnp.where(s & ~noq, sq0, jnp.where(nrm & ~noq, nq0, q0))
    fq1 = jnp.where(s & ~noq, sq1, jnp.where(nrm & ~noq & ndq, nq1, q1))
    fq2 = jnp.where(s & ~noq, sq2, q2)
    return fp2, fp1, fp0, fq0, fq1, fq2


@partial(jax.jit, static_argnames=("bit_depth",))
def deblock_luma_vertical(luma, vbs, qp_map, beta_off, tc_off, nfm,
                          bit_depth=8):
    """All vertical luma edges. luma (H, W); vbs (H/4, W/8); qp_map
    (H/8, W/8); nfm (H/4, W/4) no-filter map (pcm/bypass).
    beta_off/tc_off: scalars or (H/8, ne) per-edge maps."""
    h, w = luma.shape
    ne = w // 8 - 1
    if ne <= 0:
        return luma
    bs4 = vbs[:, 1:ne + 1]                                   # (h/4, ne)
    qp8 = (qp_map[:, 0:ne] + qp_map[:, 1:ne + 1] + 1) >> 1   # (h/8, ne)
    bo8 = jnp.broadcast_to(jnp.asarray(beta_off), qp8.shape)
    to8 = jnp.broadcast_to(jnp.asarray(tc_off), qp8.shape)
    qp4 = _bcast2(qp8, 0)
    beta4 = _BETA[jnp.clip(qp4 + _bcast2(bo8, 0), 0, 51)]
    tc4 = jnp.where(bs4 > 0,
                    _TC[jnp.clip(qp4 + 2 * (bs4 - 1) + _bcast2(to8, 0),
                                 0, 53)], 0)
    no_p4 = nfm[:, 1:2 * ne:2]
    no_q4 = nfm[:, 2:2 * ne + 2:2]

    taps = tuple(luma[:, co:co + 8 * ne:8] for co in range(4, 12))
    outs = _luma_filter(taps, tc4, beta4, no_p4, no_q4, 0, bit_depth)
    out = luma
    for co, v in zip(range(5, 11), outs):
        out = out.at[:, co:co + 8 * ne:8].set(v)
    return out


@partial(jax.jit, static_argnames=("bit_depth",))
def deblock_luma_horizontal(luma, hbs, qp_map, beta_off, tc_off, nfm,
                            bit_depth=8):
    """All horizontal luma edges; hbs (H/8, W/4).
    beta_off/tc_off: scalars or (ne, W/8) per-edge maps."""
    h, w = luma.shape
    ne = h // 8 - 1
    if ne <= 0:
        return luma
    bs4 = hbs[1:ne + 1, :]                                   # (ne, w/4)
    qp8 = (qp_map[0:ne, :] + qp_map[1:ne + 1, :] + 1) >> 1   # (ne, w/8)
    bo8 = jnp.broadcast_to(jnp.asarray(beta_off), qp8.shape)
    to8 = jnp.broadcast_to(jnp.asarray(tc_off), qp8.shape)
    qp4 = _bcast2(qp8, 1)
    beta4 = _BETA[jnp.clip(qp4 + _bcast2(bo8, 1), 0, 51)]
    tc4 = jnp.where(bs4 > 0,
                    _TC[jnp.clip(qp4 + 2 * (bs4 - 1) + _bcast2(to8, 1),
                                 0, 53)], 0)
    yq2 = jnp.arange(1, ne + 1) * 2
    no_p4 = nfm[yq2 - 1, :]                                  # (ne, w/4)
    no_q4 = nfm[yq2, :]

    taps = tuple(luma[ro:ro + 8 * ne:8, :] for ro in range(4, 12))
    outs = _luma_filter(taps, tc4, beta4, no_p4, no_q4, 1, bit_depth)
    out = luma
    for ro, v in zip(range(5, 11), outs):
        out = out.at[ro:ro + 8 * ne:8, :].set(v)
    return out


def _chroma_filter(taps, tc4, no_p4, no_q4, axis, bit_depth):
    """Chroma edge filter: taps (p1, p0, q0, q1) each (A, B); tc4/no_*4
    per-4-line.  Matches hevc_loop_filter_chroma (hevcdsp_template.c)."""
    p1, p0, q0, q1 = taps
    maxv = (1 << bit_depth) - 1
    tc = _bcast4(tc4 << (bit_depth - 8), axis)
    delta = jnp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tc, tc)
    active = tc > 0
    nop = _bcast4(no_p4, axis).astype(bool)
    noq = _bcast4(no_q4, axis).astype(bool)
    fp0 = jnp.where(active & ~nop, jnp.clip(p0 + delta, 0, maxv), p0)
    fq0 = jnp.where(active & ~noq, jnp.clip(q0 - delta, 0, maxv), q0)
    return fp0, fq0


def _chroma_qpc(qpj, qp_off, qpc_table, four20):
    qpi = jnp.clip(qpj + qp_off, 0, 57)
    if four20:
        return jnp.where(qpi < 30, qpi, jnp.where(qpi > 43, qpi - 6,
                         qpc_table[jnp.clip(qpi - 30, 0, 13)]))
    return jnp.minimum(qpi, 51)          # chroma_tc, hevc_filter.c:76-85


@partial(jax.jit, static_argnames=("bit_depth", "c_off", "hsub", "vsub",
                                   "four20"))
def deblock_chroma_vertical(pl, vbs, qp_map, qp_off, tc_off, nfm, qpc_table,
                            bit_depth=8, c_off=0, hsub=2, vsub=2, four20=True):
    """Chroma vertical edges on the chroma 8-grid (luma 8*hsub grid).
    pl (H>>vs, W>>hs).  tc_off: scalar or (ch/4, ne) per-group map."""
    ch, cw = pl.shape
    ne = cw // 8 - 1
    if ne <= 0:
        return pl
    # per chroma-4-row group g (luma y4 = vsub*g), edge e (luma x8 = hsub*(e+1))
    g = jnp.arange(ch // 4)
    ex = (jnp.arange(ne) + 1) * hsub
    y4 = vsub * g
    bs4 = vbs[y4[:, None], ex[None, :]]                      # (ch/4, ne)
    qy = y4 >> 1
    qpj = (qp_map[qy[:, None], ex[None, :] - 1] +
           qp_map[qy[:, None], ex[None, :]] + 1) >> 1
    to4 = jnp.broadcast_to(jnp.asarray(tc_off), qpj.shape)
    qpc = _chroma_qpc(qpj, qp_off, qpc_table, four20)
    tc4 = jnp.where(bs4 == 2, _TC[jnp.clip(qpc + 2 + to4, 0, 53)], 0)
    x4 = ex * 2
    no_p4 = nfm[y4[:, None], (x4 - 1)[None, :]]
    no_q4 = nfm[y4[:, None], x4[None, :]]

    taps = tuple(pl[:, co:co + 8 * ne:8] for co in range(6, 10))
    fp0, fq0 = _chroma_filter(taps, tc4, no_p4, no_q4, 0, bit_depth)
    out = pl.at[:, 7:7 + 8 * ne:8].set(fp0)
    return out.at[:, 8:8 + 8 * ne:8].set(fq0)


@partial(jax.jit, static_argnames=("bit_depth", "c_off", "hsub", "vsub",
                                   "four20"))
def deblock_chroma_horizontal(pl, hbs, qp_map, qp_off, tc_off, nfm, qpc_table,
                              bit_depth=8, c_off=0, hsub=2, vsub=2,
                              four20=True):
    """Chroma horizontal edges.  tc_off: scalar or (ne, cw/4) map."""
    ch, cw = pl.shape
    ne = ch // 8 - 1
    if ne <= 0:
        return pl
    ey = (jnp.arange(ne) + 1) * vsub                         # luma y8
    c4 = jnp.arange(cw // 4)
    x4l = hsub * c4                                          # luma x4
    bs4 = hbs[ey[:, None], x4l[None, :]]                     # (ne, cw/4)
    qx = x4l >> 1
    qpj = (qp_map[(ey - 1)[:, None], qx[None, :]] +
           qp_map[ey[:, None], qx[None, :]] + 1) >> 1
    to4 = jnp.broadcast_to(jnp.asarray(tc_off), qpj.shape)
    qpc = _chroma_qpc(qpj, qp_off, qpc_table, four20)
    tc4 = jnp.where(bs4 == 2, _TC[jnp.clip(qpc + 2 + to4, 0, 53)], 0)
    y4l = ey * 2
    no_p4 = nfm[(y4l - 1)[:, None], x4l[None, :]]
    no_q4 = nfm[y4l[:, None], x4l[None, :]]

    taps = tuple(pl[ro:ro + 8 * ne:8, :] for ro in range(6, 10))
    fp0, fq0 = _chroma_filter(taps, tc4, no_p4, no_q4, 1, bit_depth)
    out = pl.at[7:7 + 8 * ne:8, :].set(fp0)
    return out.at[8:8 + 8 * ne:8, :].set(fq0)
