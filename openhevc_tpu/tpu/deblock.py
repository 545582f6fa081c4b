"""Whole-frame deblocking on TPU (exact int32, jit-compiled).

Spec 8.7.2 as two data-parallel passes: all vertical edges, then all
horizontal edges (legal because BS is precomputed by the front-end; the
reference achieves the same order CTB-by-CTB).  Each 8x8 window around an
edge is independent, so the entire pass is one vectorized computation.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model.filters import BETA_TABLE, TC_TABLE

_BETA = jnp.asarray(np.asarray(BETA_TABLE), jnp.int32)
_TC = jnp.asarray(np.asarray(TC_TABLE), jnp.int32)


def _filter_luma_blocks(blk, tc2, beta, no_p, no_q, bit_depth):
    """blk (..., 8, 8): last axis crosses the edge (P3..P0 Q0..Q3), second-to-
    last runs along it (two 4-line halves).  tc2 (..., 2), beta (...,),
    no_p/no_q (..., 2).  Returns filtered blocks."""
    maxv = (1 << bit_depth) - 1
    beta = beta << (bit_depth - 8)
    tc = tc2 << (bit_depth - 8)

    P = blk[..., 3::-1]      # P0..P3 at indices 0..3
    Q = blk[..., 4:]

    def col(a, i):
        return a[..., i]

    out = blk
    halves = []
    for j in (0, 1):
        r = slice(4 * j, 4 * j + 4)
        p = P[..., r, :]
        q = Q[..., r, :]
        dp0 = jnp.abs(p[..., 0, 2] - 2 * p[..., 0, 1] + p[..., 0, 0])
        dq0 = jnp.abs(q[..., 0, 2] - 2 * q[..., 0, 1] + q[..., 0, 0])
        dp3 = jnp.abs(p[..., 3, 2] - 2 * p[..., 3, 1] + p[..., 3, 0])
        dq3 = jnp.abs(q[..., 3, 2] - 2 * q[..., 3, 1] + q[..., 3, 0])
        d0, d3 = dp0 + dq0, dp3 + dq3
        tcj = tc[..., j]
        active = (d0 + d3 < beta) & (tcj > 0)

        beta3, beta2 = beta >> 3, beta >> 2
        tc25 = (tcj * 5 + 1) >> 1
        strong = ((jnp.abs(p[..., 0, 3] - p[..., 0, 0]) +
                   jnp.abs(q[..., 0, 3] - q[..., 0, 0]) < beta3) &
                  (jnp.abs(p[..., 0, 0] - q[..., 0, 0]) < tc25) &
                  (jnp.abs(p[..., 3, 3] - p[..., 3, 0]) +
                   jnp.abs(q[..., 3, 3] - q[..., 3, 0]) < beta3) &
                  (jnp.abs(p[..., 3, 0] - q[..., 3, 0]) < tc25) &
                  ((d0 << 1) < beta2) & ((d3 << 1) < beta2))

        p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
        q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        tc_b = tcj[..., None]

        # strong filter
        tc2_b = tc_b << 1
        sp0 = p0 + jnp.clip(((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3) - p0, -tc2_b, tc2_b)
        sp1 = p1 + jnp.clip(((p2 + p1 + p0 + q0 + 2) >> 2) - p1, -tc2_b, tc2_b)
        sp2 = p2 + jnp.clip(((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3) - p2, -tc2_b, tc2_b)
        sq0 = q0 + jnp.clip(((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3) - q0, -tc2_b, tc2_b)
        sq1 = q1 + jnp.clip(((p0 + q0 + q1 + q2 + 2) >> 2) - q1, -tc2_b, tc2_b)
        sq2 = q2 + jnp.clip(((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3) - q2, -tc2_b, tc2_b)

        # normal filter
        nd_p = (dp0 + dp3 < ((beta + (beta >> 1)) >> 3))
        nd_q = (dq0 + dq3 < ((beta + (beta >> 1)) >> 3))
        tch = tc_b >> 1
        delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        apply_n = jnp.abs(delta0) < 10 * tc_b
        d0c = jnp.clip(delta0, -tc_b, tc_b)
        np0 = jnp.clip(p0 + d0c, 0, maxv)
        nq0 = jnp.clip(q0 - d0c, 0, maxv)
        dp1 = jnp.clip(((((p2 + p0 + 1) >> 1) - p1 + d0c) >> 1), -tch, tch)
        np1 = jnp.clip(p1 + dp1, 0, maxv)
        dq1 = jnp.clip(((((q2 + q0 + 1) >> 1) - q1 - d0c) >> 1), -tch, tch)
        nq1 = jnp.clip(q1 + dq1, 0, maxv)

        nop = no_p[..., j, None].astype(bool)
        noq = no_q[..., j, None].astype(bool)
        s = strong[..., None] & active[..., None]
        nrm = (~strong)[..., None] & active[..., None] & apply_n

        fp0 = jnp.where(s & ~nop, sp0, jnp.where(nrm & ~nop, np0, p0))
        fp1 = jnp.where(s & ~nop, sp1,
                        jnp.where(nrm & ~nop & nd_p[..., None], np1, p1))
        fp2 = jnp.where(s & ~nop, sp2, p2)
        fq0 = jnp.where(s & ~noq, sq0, jnp.where(nrm & ~noq, nq0, q0))
        fq1 = jnp.where(s & ~noq, sq1,
                        jnp.where(nrm & ~noq & nd_q[..., None], nq1, q1))
        fq2 = jnp.where(s & ~noq, sq2, q2)

        half = jnp.stack([p3, fp2, fp1, fp0, fq0, fq1, fq2, q3], axis=-1)
        halves.append(half)
    return jnp.concatenate(halves, axis=-2)


def _filter_chroma_blocks(blk, tc2, no_p, no_q, bit_depth):
    """blk (..., 8, 4): last axis = P1 P0 Q0 Q1."""
    maxv = (1 << bit_depth) - 1
    tc = tc2 << (bit_depth - 8)
    halves = []
    for j in (0, 1):
        b = blk[..., 4 * j:4 * j + 4, :]
        p1, p0, q0, q1 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        tcj = tc[..., j, None]
        delta = jnp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tcj, tcj)
        active = tcj > 0
        nop = no_p[..., j, None].astype(bool)
        noq = no_q[..., j, None].astype(bool)
        fp0 = jnp.where(active & ~nop, jnp.clip(p0 + delta, 0, maxv), p0)
        fq0 = jnp.where(active & ~noq, jnp.clip(q0 - delta, 0, maxv), q0)
        halves.append(jnp.stack([p1, fp0, fq0, q1], axis=-1))
    return jnp.concatenate(halves, axis=-2)


@partial(jax.jit, static_argnames=("bit_depth",))
def deblock_luma_vertical(luma, vbs, qp_map, beta_off, tc_off, nfm, bit_depth=8):
    """All vertical luma edges. luma (H, W); vbs (H/4, W/8); qp_map (H/8, W/8);
    nfm (H/4, W/4) no-filter map (pcm/bypass)."""
    h, w = luma.shape
    ne = w // 8 - 1
    if ne <= 0:
        return luma
    nr = h // 8
    # blocks (nr, ne, 8, 8): rows x cross-edge cols
    a = luma[:, 4:w - 4].reshape(h, ne, 8)
    blk = a.reshape(nr, 8, ne, 8).transpose(0, 2, 1, 3)
    bs = vbs.reshape(nr, 2, ne + 1)[:, :, 1:].transpose(0, 2, 1)      # (nr, ne, 2)
    qp = (qp_map[:, 0:ne] + qp_map[:, 1:ne + 1] + 1) >> 1             # (nr, ne)
    # offsets may be scalars or per-edge (nr, ne) maps (multi-slice frames)
    beta_off = jnp.broadcast_to(jnp.asarray(beta_off), qp.shape)
    tc_off = jnp.broadcast_to(jnp.asarray(tc_off), qp.shape)
    beta = _BETA[jnp.clip(qp + beta_off, 0, 51)]
    tcv = jnp.where(bs > 0, _TC[jnp.clip(qp[..., None] + 2 * (bs - 1) +
                                         tc_off[..., None], 0, 53)], 0)
    # no_p at (x-1, y + 4j), no_q at (x, y + 4j)
    nf = nfm.reshape(nr, 2, w // 4)
    xq = (jnp.arange(ne) + 1) * 2                                     # x/4
    no_p = nf[:, :, :].transpose(0, 2, 1)[:, xq - 1, :]               # (nr, ne, 2)... cols are x/4
    no_q = nf.transpose(0, 2, 1)[:, xq, :]
    out_blk = _filter_luma_blocks(blk, tcv, beta, no_p, no_q, bit_depth)
    a2 = out_blk.transpose(0, 2, 1, 3).reshape(h, ne, 8).reshape(h, ne * 8)
    return luma.at[:, 4:w - 4].set(a2)


@partial(jax.jit, static_argnames=("bit_depth",))
def deblock_luma_horizontal(luma, hbs, qp_map, beta_off, tc_off, nfm, bit_depth=8):
    h, w = luma.shape
    ne = h // 8 - 1
    if ne <= 0:
        return luma
    nc = w // 8
    lt = luma.T                                                        # (W, H)
    a = lt[:, 4:h - 4].reshape(w, ne, 8)
    blk = a.reshape(nc, 8, ne, 8).transpose(0, 2, 1, 3)                # (nc, ne, 8, 8)
    # hbs (H/8, W/4): bs at (y=8(e+1), x=8c + 4j) -> hbs[e+1, 2c + j]
    bs = hbs[1:, :].reshape(ne, nc, 2).transpose(1, 0, 2)              # (nc, ne, 2)
    qp = ((qp_map[0:ne, :] + qp_map[1:ne + 1, :] + 1) >> 1).T          # (nc, ne)
    beta_off = jnp.broadcast_to(jnp.asarray(beta_off), qp.shape)
    tc_off = jnp.broadcast_to(jnp.asarray(tc_off), qp.shape)
    beta = _BETA[jnp.clip(qp + beta_off, 0, 51)]
    tcv = jnp.where(bs > 0, _TC[jnp.clip(qp[..., None] + 2 * (bs - 1) +
                                         tc_off[..., None], 0, 53)], 0)
    # no_p at (x + 4j, y-1), no_q at (x + 4j, y)
    yq = (jnp.arange(ne) + 1) * 2
    nf = nfm.reshape(h // 4, nc, 2)                                    # (y4, x8, j)
    no_p = nf[yq - 1, :, :].transpose(1, 0, 2)                         # (nc, ne, 2)
    no_q = nf[yq, :, :].transpose(1, 0, 2)
    out_blk = _filter_luma_blocks(blk, tcv, beta, no_p, no_q, bit_depth)
    a2 = out_blk.transpose(0, 2, 1, 3).reshape(w, ne * 8)
    return luma.at[4:h - 4, :].set(a2.T)


@partial(jax.jit, static_argnames=("bit_depth", "c_off", "hsub", "vsub",
                                   "four20"))
def deblock_chroma_vertical(pl, vbs, qp_map, qp_off, tc_off, nfm, qpc_table,
                            bit_depth=8, c_off=0, hsub=2, vsub=2, four20=True):
    """Chroma vertical edges on the chroma 8-grid (luma 8*hsub grid).
    pl (H>>vs, W>>hs); hsub/vsub = chroma subsampling factors (2 or 1)."""
    ch, cw = pl.shape
    ne = cw // 8 - 1
    if ne <= 0:
        return pl
    nr = ch // 8
    a = pl[:, 4:cw - 4].reshape(ch, ne, 8)[..., 2:6]                   # P1P0Q0Q1
    blk = a.reshape(nr, 8, ne, 4).transpose(0, 2, 1, 3)
    # luma coords: x = 8*hsub*(e+1), y = vsub*(8r + 4j)
    ex = (jnp.arange(ne) + 1) * hsub                                   # x/8
    ey = jnp.arange(nr)
    y4_0 = 2 * vsub * ey                                               # y/4, j=0
    y4_1 = 2 * vsub * ey + vsub
    bs0 = vbs[y4_0[:, None], ex[None, :]]
    bs1 = vbs[y4_1[:, None], ex[None, :]]
    bs = jnp.stack([bs0, bs1], axis=-1)
    qy0 = y4_0 >> 1
    qy1 = y4_1 >> 1
    qp0 = (qp_map[qy0[:, None], ex[None, :] - 1] + qp_map[qy0[:, None], ex[None, :]] + 1) >> 1
    qp1 = (qp_map[qy1[:, None], ex[None, :] - 1] + qp_map[qy1[:, None], ex[None, :]] + 1) >> 1
    qpj = jnp.stack([qp0, qp1], axis=-1)
    qpi = jnp.clip(qpj + qp_off, 0, 57)
    if four20:
        qpc = jnp.where(qpi < 30, qpi, jnp.where(qpi > 43, qpi - 6,
                        qpc_table[jnp.clip(qpi - 30, 0, 13)]))
    else:
        qpc = jnp.minimum(qpi, 51)      # chroma_tc, hevc_filter.c:76-85
    tc_off = jnp.broadcast_to(jnp.asarray(tc_off), qpc.shape)
    tcv = jnp.where(bs == 2, _TC[jnp.clip(qpc + 2 + tc_off, 0, 53)], 0)
    # pcm/bypass masks at luma 4x4
    x4 = ex * 2
    y4 = jnp.stack([y4_0, y4_1], axis=-1)                              # (nr, 2)
    no_p = nfm[y4[:, None, :], (x4 - 1)[None, :, None]]
    no_q = nfm[y4[:, None, :], x4[None, :, None]]
    out_blk = _filter_chroma_blocks(blk, tcv, no_p, no_q, bit_depth)
    full = pl[:, 4:cw - 4].reshape(nr, 8, ne, 8).transpose(0, 2, 1, 3)
    full = full.at[..., 2:6].set(out_blk)
    a2 = full.transpose(0, 2, 1, 3).reshape(ch, ne * 8)
    return pl.at[:, 4:cw - 4].set(a2)


@partial(jax.jit, static_argnames=("bit_depth", "c_off", "hsub", "vsub",
                                   "four20"))
def deblock_chroma_horizontal(pl, hbs, qp_map, qp_off, tc_off, nfm, qpc_table,
                              bit_depth=8, c_off=0, hsub=2, vsub=2,
                              four20=True):
    ch, cw = pl.shape
    ne = ch // 8 - 1
    if ne <= 0:
        return pl
    nc = cw // 8
    plt = pl.T
    a = plt[:, 4:ch - 4].reshape(cw, ne, 8)[..., 2:6]
    blk = a.reshape(nc, 8, ne, 4).transpose(0, 2, 1, 3)                # (nc, ne, 8, 4)
    # luma coords: y = 8*vsub*(e+1), x = hsub*(8c + 4j)
    ey = (jnp.arange(ne) + 1) * vsub                                   # y/8
    ec = jnp.arange(nc)
    x4_0 = 2 * hsub * ec
    x4_1 = 2 * hsub * ec + hsub
    bs0 = hbs[ey[:, None], x4_0[None, :]]
    bs1 = hbs[ey[:, None], x4_1[None, :]]
    bs = jnp.stack([bs0, bs1], axis=-1).transpose(1, 0, 2)             # (nc, ne, 2)
    qx0 = x4_0 >> 1
    qx1 = x4_1 >> 1
    qp0 = (qp_map[ey[:, None] - 1, qx0[None, :]] + qp_map[ey[:, None], qx0[None, :]] + 1) >> 1
    qp1 = (qp_map[ey[:, None] - 1, qx1[None, :]] + qp_map[ey[:, None], qx1[None, :]] + 1) >> 1
    qpj = jnp.stack([qp0, qp1], axis=-1).transpose(1, 0, 2)
    qpi = jnp.clip(qpj + qp_off, 0, 57)
    if four20:
        qpc = jnp.where(qpi < 30, qpi, jnp.where(qpi > 43, qpi - 6,
                        qpc_table[jnp.clip(qpi - 30, 0, 13)]))
    else:
        qpc = jnp.minimum(qpi, 51)
    tc_off = jnp.broadcast_to(jnp.asarray(tc_off), qpc.shape)
    tcv = jnp.where(bs == 2, _TC[jnp.clip(qpc + 2 + tc_off, 0, 53)], 0)
    y4 = ey * 2
    x4 = jnp.stack([x4_0, x4_1], axis=-1)                              # (nc, 2)
    no_p = nfm[(y4 - 1)[None, :, None], x4[:, None, :]]
    no_q = nfm[y4[None, :, None], x4[:, None, :]]
    out_blk = _filter_chroma_blocks(blk, tcv, no_p, no_q, bit_depth)
    full = plt[:, 4:ch - 4].reshape(nc, 8, ne, 8).transpose(0, 2, 1, 3)
    full = full.at[..., 2:6].set(out_blk)
    a2 = full.transpose(0, 2, 1, 3).reshape(cw, ne * 8)
    return pl.at[4:ch - 4, :].set(a2.T)
