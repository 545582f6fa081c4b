"""Fused deblock(V,H)+SAO: ONE Pallas kernel pass per plane.

The XLA formulation (tpu/deblock.py + tpu/sao.py) is a dozen whole-plane
HLO stages: strided tap views, six strided scatter-writes per direction,
per-pixel SAO map expansion — each a full HBM round trip plus relayouts
(the reference dedicates x86/hevc_deblock.asm:1-914 and hevc_sao_sse.c:1-524
to exactly this stage).  This kernel streams the plane through VMEM once:
row bands load with an 8-row halo, the vertical then horizontal edge
filters and SAO run on the VMEM-resident band, and one band of final
pixels stores back — one HBM read + one write per plane total.

Formulation: "compute at every position".  For the V pass the taps p3..q3
are whole-band lane rotations of the band (T[k][y,x] = B[y,x+k]) and the
edge-filter dataflow (identical to tpu/deblock.py::_luma_filter, itself
bit-exact vs hevcdsp_template.c) evaluates at EVERY lane x as if an edge
were based there; a final select keeps, for each output lane, the filtered
value rolled from its edge's base lane (x%8 gives the role: 5/6/7 =
p2/p1/p0 of the edge to the right, 0/1/2 = q0/q1/q2 of the edge at x-x%8).
Inactive bases (tc=0) reproduce the input exactly, so the redundant
evaluation needs no masking; what it buys is zero transposes and zero
strided scatters.  The H pass is the sublane-axis mirror over the V-pass
output; SAO follows on the deblocked band (its one-pixel halo is already
resident and deblock-final, because each band recomputes its boundary
edges from the 8-row halo).

Per-edge parameters (tc, beta, no-filter flags, derived from BS maps, QP
averaging and the chroma QP table) are (H/4, W/8)-sized — 64x smaller than
pixels — and are built in XLA by build_luma_grids/build_chroma_grids with
the exact indexing of tpu/deblock.py, then expanded in-kernel: sublane
axis by broadcast+reshape, lane axis by 128-lane-chunk dynamic_gather
(Mosaic's gather is single-vreg along the gather dim).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.filters import BETA_TABLE, TC_TABLE

HALO = 8


# ---------------------------------------------------------------------------
# XLA-side per-edge parameter grids (edge-base aligned, padded geometry)
# ---------------------------------------------------------------------------

def build_luma_grids(vbs, hbs, qp_map, beta_off, tc_off, nfm, bd, Hp, Wp):
    """-> ((v_tc, v_beta, v_nop, v_noq), (h_tc, h_beta, h_nop, h_noq)).

    V grids: ((Hp+16)/4, Wp/8), column k = edge at x = 8k (col 0 zero), two
    extra zero group-rows above/below for the band halo.  H grids:
    (Hp/8 + 1, Wp/4), row k = edge at y = 8k (row 0 zero).  beta/tc are
    bit-depth scaled; zero tc disables the edge.  Indexing matches
    tpu/deblock.py::deblock_luma_{vertical,horizontal}.
    beta_off/tc_off: scalars, or (v_map, h_map) tuples of per-edge maps
    (multi-slice pictures; frame_step's b_lv/b_lh expansion).
    """
    beta_t = jnp.asarray(np.asarray(BETA_TABLE), jnp.int32)
    tc_t = jnp.asarray(np.asarray(TC_TABLE), jnp.int32)
    bo_v, bo_h = (beta_off if isinstance(beta_off, tuple)
                  else (beta_off, beta_off))
    to_v, to_h = (tc_off if isinstance(tc_off, tuple)
                  else (tc_off, tc_off))

    def b2(x, axis):
        a, b = x.shape
        if axis == 0:
            return jnp.broadcast_to(x[:, None, :], (a, 2, b)).reshape(2 * a, b)
        return jnp.broadcast_to(x[..., None], (a, b, 2)).reshape(a, 2 * b)

    ne = Wp // 8 - 1
    bs4 = vbs[:, 1:ne + 1]
    qp8 = (qp_map[:, 0:ne] + qp_map[:, 1:ne + 1] + 1) >> 1
    bo8 = jnp.broadcast_to(jnp.asarray(bo_v), qp8.shape)
    to8 = jnp.broadcast_to(jnp.asarray(to_v), qp8.shape)
    qp4 = b2(qp8, 0)
    beta4 = beta_t[jnp.clip(qp4 + b2(bo8, 0), 0, 51)] << (bd - 8)
    tc4 = jnp.where(bs4 > 0,
                    tc_t[jnp.clip(qp4 + 2 * (bs4 - 1) + b2(to8, 0), 0, 53)],
                    0) << (bd - 8)
    nop4 = nfm[:, 1:2 * ne:2]
    noq4 = nfm[:, 2:2 * ne + 2:2]

    def vfin(g):
        return jnp.pad(g, ((HALO // 4, HALO // 4), (1, 0)))

    neh = Hp // 8 - 1
    bs4h = hbs[1:neh + 1, :]
    qp8h = (qp_map[0:neh, :] + qp_map[1:neh + 1, :] + 1) >> 1
    bo8h = jnp.broadcast_to(jnp.asarray(bo_h), qp8h.shape)
    to8h = jnp.broadcast_to(jnp.asarray(to_h), qp8h.shape)
    qp4h = b2(qp8h, 1)
    beta4h = beta_t[jnp.clip(qp4h + b2(bo8h, 1), 0, 51)] << (bd - 8)
    tc4h = jnp.where(bs4h > 0,
                     tc_t[jnp.clip(qp4h + 2 * (bs4h - 1) + b2(to8h, 1),
                                   0, 53)], 0) << (bd - 8)
    yq2 = jnp.arange(1, neh + 1) * 2
    nop4h = nfm[yq2 - 1, :]
    noq4h = nfm[yq2, :]

    def hfin(g):
        return jnp.pad(g, ((1, 0), (0, 0)))

    return ((vfin(tc4), vfin(beta4), vfin(nop4), vfin(noq4)),
            (hfin(tc4h), hfin(beta4h), hfin(nop4h), hfin(noq4h)))


def _chroma_qpc(qpj, qp_off, qpc_table, four20):
    qpi = jnp.clip(qpj + qp_off, 0, 57)
    if four20:
        return jnp.where(qpi < 30, qpi, jnp.where(qpi > 43, qpi - 6,
                         qpc_table[jnp.clip(qpi - 30, 0, 13)]))
    return jnp.minimum(qpi, 51)


def build_chroma_grids(vbs, hbs, qp_map, qp_off, tc_off_v, tc_off_h, nfm,
                       qpc_table, bd, Hc, Wc, hsub, vsub, four20):
    """Chroma-plane grids: ((v_tc, v_nop, v_noq), (h_tc, h_nop, h_noq)) in
    the same padded layout; matches deblock_chroma_{vertical,horizontal}."""
    tc_t = jnp.asarray(np.asarray(TC_TABLE), jnp.int32)
    ne = Wc // 8 - 1
    g = jnp.arange(Hc // 4)
    ex = (jnp.arange(ne) + 1) * hsub
    y4 = vsub * g
    bs4 = vbs[y4[:, None], ex[None, :]]
    qy = y4 >> 1
    qpj = (qp_map[qy[:, None], ex[None, :] - 1] +
           qp_map[qy[:, None], ex[None, :]] + 1) >> 1
    to4 = jnp.broadcast_to(jnp.asarray(tc_off_v), qpj.shape)
    qpc = _chroma_qpc(qpj, qp_off, qpc_table, four20)
    tc4 = jnp.where(bs4 == 2, tc_t[jnp.clip(qpc + 2 + to4, 0, 53)],
                    0) << (bd - 8)
    x4 = ex * 2
    nop4 = nfm[y4[:, None], (x4 - 1)[None, :]]
    noq4 = nfm[y4[:, None], x4[None, :]]

    def vfin(gg):
        return jnp.pad(gg, ((HALO // 4, HALO // 4), (1, 0)))

    neh = Hc // 8 - 1
    ey = (jnp.arange(neh) + 1) * vsub
    c4 = jnp.arange(Wc // 4)
    x4l = hsub * c4
    bs4h = hbs[ey[:, None], x4l[None, :]]
    qx = x4l >> 1
    qpjh = (qp_map[(ey - 1)[:, None], qx[None, :]] +
            qp_map[ey[:, None], qx[None, :]] + 1) >> 1
    to4h = jnp.broadcast_to(jnp.asarray(tc_off_h), qpjh.shape)
    qpch = _chroma_qpc(qpjh, qp_off, qpc_table, four20)
    tc4h = jnp.where(bs4h == 2, tc_t[jnp.clip(qpch + 2 + to4h, 0, 53)],
                     0) << (bd - 8)
    y4l = ey * 2
    nop4h = nfm[(y4l - 1)[:, None], x4l[None, :]]
    noq4h = nfm[y4l[:, None], x4l[None, :]]

    def hfin(gg):
        return jnp.pad(gg, ((1, 0), (0, 0)))

    return ((vfin(tc4), vfin(nop4), vfin(noq4)),
            (hfin(tc4h), hfin(nop4h), hfin(noq4h)))


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _lroll(v, k):
    """out[:, x] = v[:, (x + k) mod W]; wraparound only touches tc=0 pads."""
    if k == 0:
        return v
    L = v.shape[1]
    return pltpu.roll(v, (L - k) % L, axis=1)


def _sshift(v, k, ri):
    """out[y] = v[y + k] with zero fill at the band boundary (boundary rows
    are halo whose edge params are zero, so the fill is never consumed)."""
    if k == 0:
        return v
    R = v.shape[0]
    rolled = pltpu.roll(v, (R - k) % R, axis=0)
    if k > 0:
        return jnp.where(ri < R - k, rolled, 0)
    return jnp.where(ri >= -k, rolled, 0)


def _erep_rows(g, k):
    """Element-wise row repeat: out[y] = g[y // k]."""
    a, b = g.shape
    return jnp.broadcast_to(g[:, None, :], (a, k, b)).reshape(a * k, b)


def _erep_lanes(g, lg2, Wp):
    """Element-wise lane repeat x(1<<lg2): out[:, x] = g[:, x >> lg2], via
    128-lane chunks (Mosaic dynamic_gather is single-vreg along lanes).
    The sublane dim must be >= 8: Mosaic's gather lowering rejects a
    size-1 sublane dim (SAO grids pre-expand in XLA instead)."""
    R = g.shape[0]
    sw = 128 >> lg2
    idx = lax.broadcasted_iota(jnp.int32, (R, 128), 1) >> lg2
    chunks = []
    for c in range(Wp // 128):
        src = g[:, sw * c: sw * (c + 1)]
        t = pltpu.repeat(src, 1 << lg2, axis=1)
        chunks.append(jnp.take_along_axis(t, idx, axis=1,
                                          mode="promise_in_bounds"))
    return jnp.concatenate(chunks, axis=1)


def _luma_edge(taps, tc, beta, nop, noq, grp0, grp3, maxv):
    """hevcdsp_template.c luma edge filter at every position; identical
    dataflow to tpu/deblock.py::_luma_filter (oracle-verified)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = taps
    dp = jnp.abs(p2 - 2 * p1 + p0)
    dq = jnp.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = grp0(dp), grp3(dp)
    dq0, dq3 = grp0(dq), grp3(dq)
    d0, d3 = dp0 + dq0, dp3 + dq3
    active = (d0 + d3 < beta) & (tc > 0)

    beta3, beta2 = beta >> 3, beta >> 2
    tc25 = (tc * 5 + 1) >> 1
    sd = jnp.abs(p3 - p0) + jnp.abs(q3 - q0)
    pq = jnp.abs(p0 - q0)
    strong = ((grp0(sd) < beta3) & (grp0(pq) < tc25) &
              (grp3(sd) < beta3) & (grp3(pq) < tc25) &
              ((d0 << 1) < beta2) & ((d3 << 1) < beta2))
    nd_p = (dp0 + dp3) < ((beta + (beta >> 1)) >> 3)
    nd_q = (dq0 + dq3) < ((beta + (beta >> 1)) >> 3)

    tc2b = tc << 1
    sp0 = p0 + jnp.clip(((p2 + 2*p1 + 2*p0 + 2*q0 + q1 + 4) >> 3) - p0,
                        -tc2b, tc2b)
    sp1 = p1 + jnp.clip(((p2 + p1 + p0 + q0 + 2) >> 2) - p1, -tc2b, tc2b)
    sp2 = p2 + jnp.clip(((2*p3 + 3*p2 + p1 + p0 + q0 + 4) >> 3) - p2,
                        -tc2b, tc2b)
    sq0 = q0 + jnp.clip(((p1 + 2*p0 + 2*q0 + 2*q1 + q2 + 4) >> 3) - q0,
                        -tc2b, tc2b)
    sq1 = q1 + jnp.clip(((p0 + q0 + q1 + q2 + 2) >> 2) - q1, -tc2b, tc2b)
    sq2 = q2 + jnp.clip(((2*q3 + 3*q2 + q1 + q0 + p0 + 4) >> 3) - q2,
                        -tc2b, tc2b)

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

    nopb = nop != 0
    noqb = noq != 0
    s = strong & active
    nrm = (~strong) & active & apply_n
    fp0 = jnp.where(s & ~nopb, sp0, jnp.where(nrm & ~nopb, np0, p0))
    fp1 = jnp.where(s & ~nopb, sp1, jnp.where(nrm & ~nopb & nd_p, np1, p1))
    fp2 = jnp.where(s & ~nopb, sp2, p2)
    fq0 = jnp.where(s & ~noqb, sq0, jnp.where(nrm & ~noqb, nq0, q0))
    fq1 = jnp.where(s & ~noqb, sq1, jnp.where(nrm & ~noqb & nd_q, nq1, q1))
    fq2 = jnp.where(s & ~noqb, sq2, q2)
    return fp2, fp1, fp0, fq0, fq1, fq2


def _chroma_edge(taps, tc, nop, noq, maxv):
    p1, p0, q0, q1 = taps
    delta = jnp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tc, tc)
    active = tc > 0
    fp0 = jnp.where(active & (nop == 0), jnp.clip(p0 + delta, 0, maxv), p0)
    fq0 = jnp.where(active & (noq == 0), jnp.clip(q0 - delta, 0, maxv), q0)
    return fp0, fq0


# (offset from edge base, x%8 that owns it)
_LUMA_ROLES = ((-3, 5), (-2, 6), (-1, 7), (0, 0), (1, 1), (2, 2))
_CHROMA_ROLES = ((-1, 7), (0, 0))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _kernel(plane_h, vg0_h, vg1_h, vg2_h, vg3_h, hg0_h, hg1_h, hg2_h, hg3_h,
            tm_h, bm_h, em_h, om_h, rs_h, out_h,
            band, vg, hg, sg, om_s, rsb, sems,
            *, S, Wp, luma, bd, deblock_on, sao_on,
            has_restore, H, W):
    i = pl.program_id(0)
    R = S + 2 * HALO
    maxv = (1 << bd) - 1
    ng = 4 if luma else 3
    vsrcs = (vg0_h, vg1_h, vg2_h, vg3_h)[:ng]
    hsrcs = (hg0_h, hg1_h, hg2_h, hg3_h)[:ng]
    # per-band grid windows arrive pre-banded from XLA in 8-row-aligned
    # strides (Mosaic HBM slices must align to the (8, 128) tiling)
    Rv8 = -(-(R // 4) // 8) * 8
    Rh8 = -(-(S // 8 + 1) // 8) * 8

    cps = [pltpu.make_async_copy(plane_h.at[pl.ds(i * S, R)], band,
                                 sems.at[0])]
    if deblock_on:
        for gi in range(ng):
            cps.append(pltpu.make_async_copy(
                vsrcs[gi].at[pl.ds(i * Rv8, Rv8)], vg.at[gi],
                sems.at[1 + gi]))
            cps.append(pltpu.make_async_copy(
                hsrcs[gi].at[pl.ds(i * Rh8, Rh8)], hg.at[gi],
                sems.at[5 + gi]))
    if sao_on:
        for k, src in enumerate((tm_h, bm_h, em_h)):
            cps.append(pltpu.make_async_copy(src.at[pl.ds(i * 8, 8)],
                                             sg.at[k], sems.at[9 + k]))
        cps.append(pltpu.make_async_copy(om_h.at[pl.ds(i * 8, 8)], om_s,
                                         sems.at[12]))
        if has_restore:
            cps.append(pltpu.make_async_copy(rs_h.at[pl.ds(i * S, S)], rsb,
                                             sems.at[13]))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    B = band[...]
    ri = lax.broadcasted_iota(jnp.int32, (R, Wp), 0)
    li = lax.broadcasted_iota(jnp.int32, (R, Wp), 1)
    ri4, ri8 = ri & 3, ri & 7
    li4, li8 = li & 3, li & 7

    if deblock_on:
        # ---- vertical edges: per-4-line groups run along rows ----
        grp0 = lambda v: _grp(v, 0, ri4, lambda a, k: _sshift(a, k, ri))
        grp3 = lambda v: _grp(v, 3, ri4, lambda a, k: _sshift(a, k, ri))

        def vexp(g):
            return _erep_lanes(_erep_rows(g[0:R // 4], 4), 3, Wp)
        if luma:
            taps = tuple(_lroll(B, k) for k in range(-4, 4))
            outs = _luma_edge(taps, vexp(vg[0]), vexp(vg[1]), vexp(vg[2]),
                              vexp(vg[3]), grp0, grp3, maxv)
            roles = _LUMA_ROLES
        else:
            taps = tuple(_lroll(B, k) for k in range(-2, 2))
            outs = _chroma_edge(taps, vexp(vg[0]), vexp(vg[1]), vexp(vg[2]),
                                maxv)
            roles = _CHROMA_ROLES
        Bv = B
        for (off, role), f in zip(roles, outs):
            Bv = jnp.where(li8 == role, _lroll(f, -off), Bv)

        # ---- horizontal edges: the sublane mirror over Bv ----
        grp0 = lambda v: _grp(v, 0, li4, _lroll)
        grp3 = lambda v: _grp(v, 3, li4, _lroll)

        def hexp(g):
            rows = jnp.concatenate(
                [jnp.zeros((1, g.shape[1]), jnp.int32), g[0:S // 8 + 1]],
                axis=0)
            return _erep_lanes(_erep_rows(rows, 8), 2, Wp)
        if luma:
            taps = tuple(_sshift(Bv, k, ri) for k in range(-4, 4))
            outs = _luma_edge(taps, hexp(hg[0]), hexp(hg[1]), hexp(hg[2]),
                              hexp(hg[3]), grp0, grp3, maxv)
            roles = _LUMA_ROLES
        else:
            taps = tuple(_sshift(Bv, k, ri) for k in range(-2, 2))
            outs = _chroma_edge(taps, hexp(hg[0]), hexp(hg[1]), hexp(hg[2]),
                                maxv)
            roles = _CHROMA_ROLES
        Bd = Bv
        for (off, role), f in zip(roles, outs):
            Bd = jnp.where(ri8 == role, _sshift(f, -off, ri), Bd)
    else:
        Bd = B

    if sao_on:
        src = Bd
        # SAO rows arrive lane-expanded and 8-row-banded from XLA; only
        # the sublane broadcast happens here (Mosaic rejects both gathers
        # and lane broadcasts with a size-1 sublane dim)
        def sexp(row):
            return jnp.broadcast_to(row[0:1], (R, Wp))
        tm = sexp(sg[0][...])
        bm = sexp(sg[1][...])
        em = sexp(sg[2][...])
        offk = [sexp(om_s[:, k * Wp:(k + 1) * Wp]) for k in range(5)]
        band_idx = ((src >> (bd - 5)) - bm) & 31
        boff = jnp.zeros_like(src)
        for k in range(4):
            boff = boff + jnp.where(band_idx == k, offk[k + 1], 0)
        band_out = jnp.clip(src + boff, 0, maxv)

        frow = ri + i * S - HALO
        border_x = (li == 0) | (li == W - 1)
        border_y = (frow == 0) | (frow == H - 1)
        edge_out = src
        for cls, (dx, dy) in enumerate(((-1, 0), (0, -1), (-1, -1),
                                        (1, -1))):
            n0 = _lroll(_sshift(src, dy, ri), dx) if dy else _lroll(src, dx)
            n1 = _lroll(_sshift(src, -dy, ri), -dx) if dy \
                else _lroll(src, -dx)
            s2 = jnp.sign(src - n0) + jnp.sign(src - n1)
            off = jnp.where(s2 == -2, offk[1],
                  jnp.where(s2 == -1, offk[2],
                  jnp.where(s2 == 1, offk[3],
                  jnp.where(s2 == 2, offk[4], 0))))
            filt = jnp.clip(src + off, 0, maxv)
            if cls != 1:
                filt = jnp.where(border_x, src, filt)
            if cls != 0:
                filt = jnp.where(border_y, src, filt)
            edge_out = jnp.where(em == cls, filt, edge_out)

        out = jnp.where(tm == 1, band_out,
                        jnp.where(tm == 2, edge_out, src))
        if has_restore:
            # transquant-bypass/PCM cells keep the pre-SAO (deblocked)
            # samples (restore_tqb_pixels, hevc_filter.c:163)
            band[0:S, :] = jnp.where(rsb[...] != 0, src[HALO:HALO + S],
                                     out[HALO:HALO + S])
        else:
            band[0:S, :] = out[HALO:HALO + S]
    else:
        band[0:S, :] = Bd[HALO:HALO + S]

    ocp = pltpu.make_async_copy(band.at[pl.ds(0, S)],
                                out_h.at[pl.ds(i * S, S)], sems.at[14])
    ocp.start()
    ocp.wait()


def _grp(v, pick, idx4, shift):
    """Broadcast each 4-group's element `pick` (0/3) across the group along
    the axis that `shift` moves."""
    out = jnp.zeros_like(v)
    for r in range(4):
        out = jnp.where(idx4 == r, shift(v, pick - r), out)
    return out


def _band_rows(Wp, ctb):
    """Band height: VMEM-bounded ((S+16)*Wp*4 <= ~640KB), multiple of 8,
    dividing the ctb row height so a band never crosses a SAO CTB row."""
    S = ctb
    while S > 8 and (S + 2 * HALO) * Wp * 4 > 640 * 1024:
        S //= 2
    return max(S, 8)


def fused_filter_plane(plane, vgrids, hgrids, sao_grids, restore, *,
                       luma, bd, deblock_on, sao_on, csx, csy, H, W,
                       interpret=False):
    """plane (H, W) int32 -> deblocked+SAO plane (H, W) int32.

    vgrids/hgrids: outputs of build_{luma,chroma}_grids (None when
    deblock_on is False).  sao_grids: (tm, bm, em, om5) per-CTB grids for
    this plane, om5 laid out (rows, 5*cols); None when sao_on is False.
    restore: optional (H, W) int8/bool SAO restore mask.  csx/csy: CTB
    footprint on this plane.
    """
    Wp = -(-W // 128) * 128
    S = _band_rows(Wp, csy)
    Hp = -(-H // S) * S
    nb = Hp // S
    R = S + 2 * HALO

    plane_p = jnp.pad(plane.astype(jnp.int32),
                      ((HALO, HALO + Hp - H), (0, Wp - W)))
    zg = jnp.zeros((1, 1), jnp.int32)
    ng = 4 if luma else 3
    if deblock_on:
        # grids were built at (H-padded-to-8, W) geometry; pad to the band
        # geometry (extra rows/cols are zero -> no filtering there), then
        # pre-band into 8-row-aligned per-band windows: Mosaic HBM slices
        # must align to the (8, 128) tiling, and the natural band windows
        # (R/4 and S/8+1 rows) don't
        Rv8 = -(-((S + 2 * HALO) // 4) // 8) * 8
        rv = jnp.clip(jnp.arange(nb)[:, None] * (S // 4)
                      + jnp.arange(Rv8)[None, :],
                      0, (Hp + 2 * HALO) // 4 - 1)
        Rh8 = -(-(S // 8 + 1) // 8) * 8
        rh = jnp.clip(jnp.arange(nb)[:, None] * (S // 8)
                      + jnp.arange(Rh8)[None, :], 0, Hp // 8)
        # column counts pad to 128 too: sliced HBM memrefs must align to
        # the (8, 128) tiling in BOTH dims
        Wv = -(-(Wp // 8) // 128) * 128
        Wh = -(-(Wp // 4) // 128) * 128
        vgs = [jnp.pad(g, ((0, (Hp + 2 * HALO) // 4 - g.shape[0]),
                           (0, Wv - g.shape[1])))[rv]
               .reshape(nb * Rv8, Wv) for g in vgrids]
        hgs = [jnp.pad(g, ((0, Hp // 8 + 1 - g.shape[0]),
                           (0, Wh - g.shape[1])))[rh]
               .reshape(nb * Rh8, Wh) for g in hgrids]
    else:
        vgs, hgs = [], []
        Rv8 = Rh8 = 8
        Wv = Wh = 128
    vgs = vgs + [zg] * (4 - len(vgs))
    hgs = hgs + [zg] * (4 - len(hgs))

    if sao_on:
        tm, bm, em, om5 = sao_grids
        grp = Hp // csy + 1
        gcp = Wp // csx

        def sp(g):
            g = jnp.pad(g.astype(jnp.int32),
                        ((0, grp - g.shape[0]), (0, gcp - g.shape[1])))
            # lane-expand in XLA (out[:, x] = g[:, x >> log2(csx)]): the
            # per-CTB grids are tiny, and Mosaic rejects in-kernel gathers
            # and lane broadcasts on their size-1 per-band sublane dim
            return jnp.broadcast_to(g[:, :, None],
                                    (grp, gcp, csx)).reshape(grp, Wp)
        # band the per-CTB rows too (one row per band, 8-replicated for
        # the aligned DMA; bands never cross a SAO CTB row by _band_rows)
        gr = jnp.arange(nb) * S // csy

        def band8(g):
            return jnp.broadcast_to(g[gr][:, None, :],
                                    (nb, 8, g.shape[1])) \
                .reshape(nb * 8, g.shape[1])
        tm, bm, em = band8(sp(tm)), band8(sp(bm)), band8(sp(em))
        # om5 is (rows, 5, cols) -> (nb*8, 5*Wp) with per-k contiguity
        om5 = band8(jnp.concatenate(
            [sp(om5[:, k, :]) for k in range(5)], axis=1))
        wexp = Wp
    else:
        tm = bm = em = zg
        om5 = jnp.zeros((1, 5), jnp.int32)
        wexp = 1
    has_restore = restore is not None
    if has_restore:
        rs = jnp.pad(restore.astype(jnp.int32),
                     ((0, Hp - H), (0, Wp - W)))
    else:
        rs = zg

    kern = functools.partial(
        _kernel, S=S, Wp=Wp, luma=luma, bd=bd, deblock_on=deblock_on,
        sao_on=sao_on, has_restore=has_restore, H=H, W=W)
    scratch = [
        pltpu.VMEM((R, Wp), jnp.int32),
        pltpu.VMEM((ng, Rv8, Wv), jnp.int32),
        pltpu.VMEM((ng, Rh8, Wh), jnp.int32),
        pltpu.VMEM((3, 8, wexp), jnp.int32),
        pltpu.VMEM((8, 5 * wexp), jnp.int32),
        pltpu.VMEM((S, Wp), jnp.int32),
        pltpu.SemaphoreType.DMA((15,)),
    ]
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 14,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
        # the filter dataflow keeps ~30 live (R, Wp) vectors at the SAO
        # stage; the 16M default scoped-vmem limit rejects 64-row bands
        # at 1080p+ (measured 21.4M) — v5e has 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(plane_p, *vgs, *hgs, tm, bm, em, om5, rs)
    return out[:H, :W]
