"""Pallas TPU kernel for the iterative ellipsoidal inertia loop.

Replaces the XLA ``lax.while_loop`` inside ``inertia_tensor_multi``
(``ops/inertia.py``) on TPU.  Why a kernel: the XLA loop pays three
costs the kernel does not —

 - every iteration re-streams the (C, K) masks / weights / positions
   from HBM through the while boundary (measured ~12 ms per iteration
   on the B=2048 DMO bench bucket); the kernel keeps them VMEM-resident
   for the whole loop;
 - the fused XLA body issues ~1 vector op/cycle; Mosaic schedules the
   same arithmetic several-fold denser (measured ~6x per element on an
   isolated probe);
 - the XLA while iterates until the LAST (halo, lane, config) lane of
   the whole bucket converges — a global barrier over ~65k lanes.
   Here each halo's kernel instance stops iterating once ITS configs
   are done, and each config stops paying its (K,) ellipsoid pass the
   moment it converges (``@pl.when`` predication).

Semantics are identical to the jnp path (same update equations, same
TOL / per-config limit / degenerate rules — see
``inertia_tensor_multi``).  The 3x3 eigensolver is a fixed-sweep cyclic
Jacobi in f32, validated to give identical iteration counts and final
tensors against the f64 trigonometric solver on randomized triaxial
profiles (incl. 1e-2.5 flattenings).  Reference algorithm:
``SOAP/property_calculation/inertia_tensors.py:19-132``.

Layout: one kernel instance = one HALO.  The config axis lives in
VECTOR LANES (C <= 128) — all per-config "tiny" math (Jacobi rotations,
axis ratios, convergence logic) is (128,)-row arithmetic shared by
every config at once.  The engine evaluates whole spec FAMILIES (8 SO
densities, 8 aperture radii) under a lane vmap; a ``custom_vmap`` rule
FOLDS that axis into the config lanes (masks become bits l*C+c of the
multi-word mask plane) instead of spawning one kernel instance per
(halo, lane) — an 8-lane family then pays the per-instance operand DMA
and the per-iteration config math ONCE per halo instead of 8 times,
and the 128 lanes of the config rows actually fill up.  The heavy (K,)
ellipsoid test + moment reduction runs per config as a fori over
(RB, 128) row blocks bounded by that config's OCCUPIED PREFIX: the
engine's bucket rows are radius-sorted, so an aperture/SO selection
mask is dense in a prefix of the rows — a 50 kpc lane inside a K=65536
candidate set touches only its own few blocks instead of the whole
bucket.  The caller passes ceil(last_selected/RB*128) per config
(radii row 1); position products are formed in-block (no K-sized
product scratch, so the VMEM cap is set by the operand planes alone).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOL = 1.0e-4
_SWEEPS = 3  # cyclic Jacobi sweeps (3 reproduces the f64 reference
# solver's iteration counts and tensors on randomized triaxial
# profiles — see tests/test_eigh.py)
RB = 8  # sublane rows per heavy-pass block (dynamic-slice aligned)

#: max folded configs: lanes of one vector row
MAX_C = 128

# state-row indices in the (24, 128) scratch
_VAL = 0  # 0-2: eigenvalues ascending
_VEC = 3  # 3-11: eigenvector columns, V[i][j] at row 3 + 3*i + j
_TEN = 12  # 12-17: tensor flat [xx, xy, xz, yy, yz, zz]
_OLDQ = 18
_DONE = 19

# radii_ref row indices
_R_ROW = 0  # sphere radius per config lane
_NBLK_ROW = 1  # occupied-prefix bound, in RB-row blocks
_BM_ROW = 2  # 2-3: per-block min radius (256 block lanes)
_RED_ROW = 4  # reduced (1/r^2) flag per config lane
_LIM_ROW = 5  # per-config iteration limit


def _jacobi3_rows(a, v):
    """Cyclic Jacobi on (128,)-lane rows.

    ``a`` = [a00, a01, a02, a11, a12, a22]; ``v`` = 3x3 nested list of
    rows with v[i][j] = V[i, j].  Mutates copies; returns (w ascending
    as 3 rows, v) with A = V diag(w) V^T.
    """
    one = jnp.float32(1.0)
    a00, a01, a02, a11, a12, a22 = a
    for _ in range(_SWEEPS):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            if (p, q) == (0, 1):
                app, aqq, apq = a00, a11, a01
            elif (p, q) == (0, 2):
                app, aqq, apq = a00, a22, a02
            else:
                app, aqq, apq = a11, a22, a12
            denom = 2.0 * apq
            safe = jnp.abs(denom) > 0.0
            tau = (aqq - app) / jnp.where(safe, denom, one)
            big = jnp.abs(tau) > jnp.float32(1e18)
            tau_n = jnp.where(big, one, tau)  # overflow guard for tau^2
            sign_tau = jnp.where(tau >= 0.0, one, -one)
            t = jnp.where(
                big,
                0.5 / jnp.where(big, tau, one),
                sign_tau / (jnp.abs(tau_n) + jnp.sqrt(one + tau_n * tau_n)),
            )
            t = jnp.where(safe, t, 0.0)
            c = jax.lax.rsqrt(one + t * t)
            s = t * c
            cc, ss, cs = c * c, s * s, c * s
            new_pp = cc * app - 2.0 * cs * apq + ss * aqq
            new_qq = ss * app + 2.0 * cs * apq + cc * aqq
            zero = jnp.zeros_like(apq)
            if (p, q) == (0, 1):
                a02, a12 = c * a02 - s * a12, s * a02 + c * a12
                a00, a11, a01 = new_pp, new_qq, zero
            elif (p, q) == (0, 2):
                a01, a12 = c * a01 - s * a12, s * a01 + c * a12
                a00, a22, a02 = new_pp, new_qq, zero
            else:
                a01, a02 = c * a01 - s * a02, s * a01 + c * a02
                a11, a22, a12 = new_pp, new_qq, zero
            for i in range(3):
                vip, viq = v[i][p], v[i][q]
                v[i][p] = c * vip - s * viq
                v[i][q] = s * vip + c * viq
    w = [a00, a11, a22]

    def swap(i, j):
        gt = w[i] > w[j]
        w[i], w[j] = jnp.where(gt, w[j], w[i]), jnp.where(gt, w[i], w[j])
        for r in range(3):
            vi, vj = v[r][i], v[r][j]
            v[r][i] = jnp.where(gt, vj, vi)
            v[r][j] = jnp.where(gt, vi, vj)

    swap(0, 1)
    swap(1, 2)
    swap(0, 1)
    return w, v


def _inertia_kernel(
    C: int,  # static: number of live config lanes
    max_iterations: int,
    rb: int,  # static: sublane rows per heavy-pass block
    streaming: bool,  # static: operands in HBM, blocks DMA'd to VMEM
    batched: bool,  # static: grid (B,) with a leading halo axis on the
    # HBM operands (ANY-space operands cannot be grid-blocked, so the
    # halo axis is indexed inside the DMA sources instead)
    pos_ref,  # (3, KR, 128) f32 (VMEM, or HBM when streaming)
    w_ref,  # (1, KR, 128) f32: SHARED per-particle weights
    mw_ref,  # (W, KR, 128) i32: mask bits (config c = word c//32 bit c%32)
    radii_ref,  # (8, 128) f32: see _*_ROW indices
    done0_ref,  # (8, 128) f32, row 0: 1.0 where done at start (~enough)
    out_ref,  # (8, 128) f32, rows 0-5: final tensor flat per config lane
    st_ref,  # scratch (24, 128) f32: iteration state rows
    tn_ref,  # scratch (8, 128) f32: this iteration's normalized tensor
    pbuf=None,  # streaming scratch (6, rb, 128) f32: 2 slots x 3 planes
    wbuf=None,  # streaming scratch (2, rb, 128) f32
    mbuf=None,  # streaming scratch (2, rb, 128) i32: this config's word
    sems=None,  # streaming DMA semaphores (6,)
):
    one = jnp.float32(1.0)
    tiny = jnp.float32(1e-37)

    R_row = radii_ref[_R_ROW]
    nblk_row = radii_ref[_NBLK_ROW]
    # per-block MINIMUM radius (radius-sorted callers only; -inf
    # otherwise, which disables the dynamic ellipsoid-extent bound)
    bm0 = radii_ref[_BM_ROW]
    bm1 = radii_ref[_BM_ROW + 1]
    red_row = radii_ref[_RED_ROW]
    limit_row = radii_ref[_LIM_ROW]
    lane = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
    zero_row = jnp.zeros_like(R_row)
    one_row = jnp.ones_like(R_row)

    # init state
    for r in range(3):
        st_ref[_VAL + r] = one_row
    for i in range(3):
        for j in range(3):
            st_ref[_VEC + 3 * i + j] = one_row if i == j else zero_row
    for r in range(6):
        st_ref[_TEN + r] = zero_row
    st_ref[_OLDQ] = jnp.full_like(R_row, 1000.0)
    st_ref[_DONE] = done0_ref[0]
    tn_ref[...] = jnp.zeros_like(tn_ref)

    def body(i, carry):
        done = st_ref[_DONE]
        n_active = jnp.sum(jnp.where(lane < C, one_row - done, 0.0))

        @pl.when(n_active > 0.0)
        def _():
            val = [st_ref[_VAL + r] for r in range(3)]
            active = done < 0.5
            q_now = jnp.sqrt(val[1] / jnp.maximum(val[2], tiny))
            converged = (
                jnp.abs(st_ref[_OLDQ] - q_now) / jnp.maximum(q_now, tiny)
                < jnp.float32(TOL)
            )
            # ellipsoid axes and quadratic form Q = V diag(1/axis^2) V^T
            ssr = jnp.sqrt(val[0] / jnp.maximum(val[2], tiny))
            spr = jnp.sqrt(val[0] / jnp.maximum(val[1], tiny))

            def cbrt(v):  # Mosaic has no cbrt; args are >= 0 here
                return jnp.exp(jnp.log(jnp.maximum(v, tiny)) / 3.0)

            ax0 = R_row * cbrt(ssr * spr)
            ax1 = R_row * cbrt(q_now / jnp.maximum(spr, tiny))
            ax2 = R_row / jnp.maximum(cbrt(q_now * ssr), tiny)
            # longest semi-axis: no particle beyond it can satisfy the
            # ellipsoid test, so on radius-sorted rows the heavy pass
            # stops at the first block whose min radius exceeds it
            amax_row = jnp.maximum(ax0, jnp.maximum(ax1, ax2))
            ia = [
                one / jnp.maximum(ax0 * ax0, tiny),
                one / jnp.maximum(ax1 * ax1, tiny),
                one / jnp.maximum(ax2 * ax2, tiny),
            ]
            vec = [
                [st_ref[_VEC + 3 * ii + jj] for jj in range(3)]
                for ii in range(3)
            ]
            qq = {}
            for ii in range(3):
                for jj in range(ii, 3):
                    acc = vec[ii][0] * vec[jj][0] * ia[0]
                    acc = acc + vec[ii][1] * vec[jj][1] * ia[1]
                    acc = acc + vec[ii][2] * vec[jj][2] * ia[2]
                    qq[(ii, jj)] = acc * (
                        one if ii == jj else jnp.float32(2.0)
                    )

            # per-config heavy pass as a DYNAMIC fori over config lanes
            # (a Python unroll would bloat the kernel ~Cx: folded
            # families carry up to 128 configs), each predicated on the
            # config being live; a fori over RB-row blocks bounded by
            # the config's occupied prefix (block accumulator planes,
            # ONE cross-lane reduction per moment after the loop)
            def per_config(c, carry2):
                onehot = (lane == c).astype(jnp.float32)
                run_c = jnp.sum(onehot * (one_row - done)) > 0.0

                @pl.when(run_c)
                def _():
                    q00 = jnp.sum(qq[(0, 0)] * onehot)
                    q01 = jnp.sum(qq[(0, 1)] * onehot)
                    q02 = jnp.sum(qq[(0, 2)] * onehot)
                    q11 = jnp.sum(qq[(1, 1)] * onehot)
                    q12 = jnp.sum(qq[(1, 2)] * onehot)
                    q22 = jnp.sum(qq[(2, 2)] * onehot)
                    amax_c = jnp.sum(amax_row * onehot)
                    red_c = jnp.sum(red_row * onehot) > 0.5
                    nblk_dyn = (
                        jnp.sum(jnp.where(bm0 <= amax_c, 1.0, 0.0))
                        + jnp.sum(jnp.where(bm1 <= amax_c, 1.0, 0.0))
                    ).astype(jnp.int32)
                    nblk = jnp.minimum(
                        jnp.sum(nblk_row * onehot).astype(jnp.int32),
                        nblk_dyn,
                    )
                    word = c // jnp.int32(32)
                    bit = c - word * jnp.int32(32)

                    def moments(xs, ys, zs, wb, acc):
                        rr = (
                            xs * (q00 * xs + q01 * ys + q02 * zs)
                            + ys * (q11 * ys + q12 * zs)
                            + q22 * zs * zs
                        )
                        inside = rr <= one
                        wn = jnp.where(inside, wb, 0.0)
                        # reduced: w / max(r^2, 1e-8-ish) — matches the
                        # host ``1 / where(isclose(r2, 0), 1, r2)`` rule
                        r2 = xs * xs + ys * ys + zs * zs
                        wi = jnp.where(
                            red_c,
                            wn
                            / jnp.where(r2 <= jnp.float32(1e-8), one, r2),
                            wn,
                        )
                        return (
                            acc[0] + wi * xs * xs,
                            acc[1] + wi * xs * ys,
                            acc[2] + wi * xs * zs,
                            acc[3] + wi * ys * ys,
                            acc[4] + wi * ys * zs,
                            acc[5] + wi * zs * zs,
                            acc[6] + wn,
                        )

                    def blk(b, acc):
                        r0 = b * rb
                        xs = pos_ref[0, pl.ds(r0, rb)]
                        ys = pos_ref[1, pl.ds(r0, rb)]
                        zs = pos_ref[2, pl.ds(r0, rb)]
                        mwv = mw_ref[pl.ds(word, 1), pl.ds(r0, rb), :][0]
                        sel = (
                            jax.lax.shift_right_logical(mwv, bit) & 1
                        ) == 1
                        wb = jnp.where(sel, w_ref[0, pl.ds(r0, rb)], 0.0)
                        return moments(xs, ys, zs, wb, acc)

                    # streaming: operands live in HBM; double-buffered
                    # async copies stream one (rb, 128) block per plane
                    # (x/y/z positions, weights, THIS config's mask
                    # word) into VMEM while the previous block computes
                    def dma(b, slot):
                        r0 = b * rb
                        if batched:
                            hb = pl.program_id(0)
                            src_pos = pos_ref.at[hb, :, pl.ds(r0, rb), :]
                            src_w = w_ref.at[hb, :, pl.ds(r0, rb), :]
                            src_mw = mw_ref.at[
                                hb, pl.ds(word, 1), pl.ds(r0, rb), :
                            ]
                        else:
                            src_pos = pos_ref.at[:, pl.ds(r0, rb), :]
                            src_w = w_ref.at[:, pl.ds(r0, rb), :]
                            src_mw = mw_ref.at[
                                pl.ds(word, 1), pl.ds(r0, rb), :
                            ]
                        return (
                            pltpu.make_async_copy(
                                src_pos,
                                pbuf.at[pl.ds(slot * 3, 3)],
                                sems.at[slot * 3],
                            ),
                            pltpu.make_async_copy(
                                src_w,
                                wbuf.at[pl.ds(slot, 1)],
                                sems.at[slot * 3 + 1],
                            ),
                            pltpu.make_async_copy(
                                src_mw,
                                mbuf.at[pl.ds(slot, 1)],
                                sems.at[slot * 3 + 2],
                            ),
                        )

                    def blk_stream(b, acc):
                        slot = jax.lax.rem(b, jnp.int32(2))
                        for cp in dma(b, slot):
                            cp.wait()

                        @pl.when(b + 1 < nblk)
                        def _():
                            for cp in dma(b + 1, 1 - slot):
                                cp.start()

                        xs = pbuf[pl.ds(slot * 3, 1)][0]
                        ys = pbuf[pl.ds(slot * 3 + 1, 1)][0]
                        zs = pbuf[pl.ds(slot * 3 + 2, 1)][0]
                        mwv = mbuf[pl.ds(slot, 1)][0]
                        sel = (
                            jax.lax.shift_right_logical(mwv, bit) & 1
                        ) == 1
                        wb = jnp.where(
                            sel, wbuf[pl.ds(slot, 1)][0], 0.0
                        )
                        return moments(xs, ys, zs, wb, acc)

                    zb = jnp.zeros((rb, 128), jnp.float32)
                    if streaming:

                        @pl.when(nblk > 0)
                        def _():
                            for cp in dma(jnp.int32(0), jnp.int32(0)):
                                cp.start()

                        acc = jax.lax.fori_loop(
                            jnp.int32(0), nblk, blk_stream, (zb,) * 7
                        )
                    else:
                        acc = jax.lax.fori_loop(
                            jnp.int32(0), nblk, blk, (zb,) * 7
                        )
                    inv = one / jnp.maximum(jnp.sum(acc[6]), tiny)
                    for k in range(6):
                        s_k = jnp.sum(acc[k]) * inv
                        tn_ref[k, :] = jnp.where(
                            lane == c, s_k, tn_ref[k, :]
                        )

                return carry2

            jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(C), per_config, jnp.int32(0)
            )

            t_new = [tn_ref[k, :] for k in range(6)]
            degenerate = q_now == 0.0
            t_new = [jnp.where(degenerate, 0.0, t) for t in t_new]
            stop = converged | degenerate | (
                (i.astype(jnp.float32) + one) >= limit_row
            )
            upd = active & jnp.logical_not(converged | degenerate)
            take_new = active & jnp.logical_not(converged)
            for k in range(6):
                st_ref[_TEN + k] = jnp.where(
                    take_new, t_new[k], st_ref[_TEN + k]
                )
            w3, v3 = _jacobi3_rows(
                t_new,
                [
                    [one_row if ii == jj else zero_row for jj in range(3)]
                    for ii in range(3)
                ],
            )
            for r in range(3):
                st_ref[_VAL + r] = jnp.where(
                    upd, jnp.abs(w3[r]), st_ref[_VAL + r]
                )
            for ii in range(3):
                for jj in range(3):
                    st_ref[_VEC + 3 * ii + jj] = jnp.where(
                        upd, v3[ii][jj], st_ref[_VEC + 3 * ii + jj]
                    )
            st_ref[_OLDQ] = jnp.where(upd, q_now, st_ref[_OLDQ])
            st_ref[_DONE] = jnp.where(active & stop, one_row, done)

        return carry

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(max_iterations), body, jnp.int32(0)
    )
    out_ref[...] = jnp.zeros_like(out_ref)
    for k in range(6):
        out_ref[k, :] = st_ref[_TEN + k]


def _stream_scratch(rb):
    return [
        pltpu.VMEM((6, rb, 128), jnp.float32),  # 2 slots x xyz
        pltpu.VMEM((2, rb, 128), jnp.float32),  # weights
        pltpu.VMEM((2, rb, 128), jnp.int32),  # mask word
        pltpu.SemaphoreType.DMA((6,)),
    ]


def _call(kern, interpret, rb, streaming):
    scratch = [
        pltpu.VMEM((24, 128), jnp.float32),
        pltpu.VMEM((8, 128), jnp.float32),
    ]
    operand_space = pltpu.VMEM
    if streaming:
        # the big planes stay in HBM; the kernel streams (rb, 128)
        # blocks through double-buffered VMEM scratch
        operand_space = pltpu.ANY
        scratch += _stream_scratch(rb)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=operand_space)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )


def _call_stream_batched(C, max_iterations, rb, interpret):
    """grid-(B,) streaming call: HBM operands carry a leading halo axis
    (ANY-space operands cannot be grid-blocked — the kernel indexes the
    halo inside its DMA sources via ``pl.program_id``)."""
    kern = partial(_inertia_kernel, C, max_iterations, rb, True, True)

    def call(pos3, w_row, mw, radii_rows, done0_rows):
        B = pos3.shape[0]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3
            + [
                pl.BlockSpec(
                    (None, 8, 128),
                    lambda b: (b, jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.VMEM,
                )
            ]
            * 2,
            out_specs=pl.BlockSpec(
                (None, 8, 128),
                lambda b: (b, jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((24, 128), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
            ]
            + _stream_scratch(rb),
            interpret=interpret,
        )(pos3, w_row, mw, radii_rows, done0_rows)

    return call


@functools.lru_cache(maxsize=None)
def _folding_caller(
    C: int,
    max_iterations: int,
    interpret: bool,
    rb: int = RB,
    streaming: bool = False,
):
    """A ``custom_vmap``-wrapped kernel invocation.

    The first (innermost) vmap the engine applies is the spec-family
    lane axis, under which the positions/weights/mask planes are
    UNBATCHED (shared per halo) and only the mask word, radii and done
    rows vary per lane: the vmap rule then FOLDS the L lanes into the
    config lanes of ONE kernel instance (configs l*C+c).  Any batching
    that touches the particle planes (the halo axis) falls through to
    a plain vmap of the base call, which lifts into the Pallas grid.
    """

    def base(pos3, w_row, mw, radii_row, done0_row):
        kern = partial(
            _inertia_kernel, C, max_iterations, rb, streaming, False
        )
        return _call(kern, interpret, rb, streaming)(
            pos3, w_row, mw, radii_row, done0_row
        )

    cv = jax.custom_batching.custom_vmap(base)

    @cv.def_vmap
    def rule(axis_size, in_batched, pos3, w_row, mw, radii_row, done0_row):
        pos_b, w_b, mw_b, radii_b, done_b = in_batched
        L = axis_size
        w_words = mw.shape[1] if mw_b else mw.shape[0]
        foldable = (
            not pos_b
            and not w_b
            and L * C <= MAX_C
            and w_words * 32 >= C  # sanity: words cover base configs
        )
        if not foldable:
            if streaming:
                # ANY-space operands cannot be grid-blocked by a plain
                # vmap; broadcast everything to a leading halo axis and
                # run the grid-(B,) streaming call
                def bcast(x, b):
                    return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

                out = _call_stream_batched(C, max_iterations, rb, interpret)(
                    bcast(pos3, pos_b),
                    bcast(w_row, w_b),
                    bcast(mw, mw_b),
                    bcast(radii_row, radii_b),
                    bcast(done0_row, done_b),
                )
                return out, True
            # halo-axis (or exotic) batching: plain vmap -> Pallas grid
            out = jax.vmap(
                base,
                in_axes=tuple(
                    0 if b else None for b in in_batched
                ),
            )(pos3, w_row, mw, radii_row, done0_row)
            return out, True

        CL = L * C
        W = -(-CL // 32)
        KRshape = mw.shape[-2:]
        # fold mask bits: lane l's word bits c -> folded bit l*C+c
        words = [
            jnp.zeros(KRshape, jnp.int32) for _ in range(W)
        ]
        mw_l = mw if mw_b else None
        for l in range(L):
            src = mw_l[l] if mw_b else mw  # (Wsrc, KR, 128)
            for c in range(C):
                fc = l * C + c
                w_src = src[c // 32]
                bit = (w_src >> (c % 32)) & 1
                words[fc // 32] = words[fc // 32] | (bit << (fc % 32))
        mw_f = jnp.stack(words)

        lane = jnp.arange(128)
        fold_l = lane // C  # folded lane -> source family lane
        fold_c = lane % C
        live = lane < CL

        def fold_rows(rows, rows_batched, fill=0.0):
            # rows: (8, 128) per lane (possibly batched (L, 8, 128));
            # rows 0/1/4/5 hold per-config lanes -> re-index to l*C+c
            if not rows_batched:
                rows = jnp.broadcast_to(rows, (L,) + rows.shape)
            per_cfg = rows[
                jnp.where(live, fold_l, 0), :, jnp.where(live, fold_c, 0)
            ]  # (128, 8)
            return per_cfg.T, rows

        radii_cfg, radii_all = fold_rows(radii_row, radii_b)
        radii_f = jnp.zeros((8, 128), jnp.float32)
        for r in (_R_ROW, _NBLK_ROW, _RED_ROW, _LIM_ROW):
            radii_f = radii_f.at[r].set(
                jnp.where(live, radii_cfg[r], 0.0)
            )
        # block-min rows are lane-invariant (shared positions)
        radii_f = radii_f.at[_BM_ROW : _BM_ROW + 2].set(
            radii_all[0, _BM_ROW : _BM_ROW + 2]
        )
        done_cfg, _ = fold_rows(done0_row, done_b)
        done_f = jnp.zeros((8, 128), jnp.float32)
        done_f = done_f.at[0].set(jnp.where(live, done_cfg[0], 1.0))

        folded = _folding_caller(CL, max_iterations, interpret, rb, streaming)(
            pos3, w_row, mw_f, radii_f, done_f
        )
        # unfold (8, 128) -> (L, 8, 128): lane l gets configs
        # [l*C, (l+1)*C) in its first C lanes
        pad_c = jnp.zeros((6, L, 128 - C), jnp.float32)
        t = folded[:6, : L * C].reshape(6, L, C)
        out = jnp.concatenate([t, pad_c], axis=2)  # (6, L, 128)
        out = jnp.moveaxis(out, 1, 0)  # (L, 6, 128)
        out = jnp.concatenate(
            [out, jnp.zeros((L, 2, 128), jnp.float32)], axis=1
        )
        return out, True

    return cv


def inertia_loop_pallas(
    pos3: jnp.ndarray,  # (3, KR, 128) f32, KR a multiple of rb
    w_row: jnp.ndarray,  # (1, KR, 128) f32: shared weights
    maskword: jnp.ndarray,  # (W, KR, 128) i32: bit c = config c selected
    radii_row: jnp.ndarray,  # (8, 128) f32; see _*_ROW rows
    done0_row: jnp.ndarray,  # (8, 128) f32
    reduced: Tuple[bool, ...],
    iterative: Tuple[bool, ...],
    max_iterations: int,
    interpret: bool = False,
    rb: int = RB,
    streaming: bool = False,
) -> jnp.ndarray:
    """Run the in-kernel ellipsoid loop; returns (8, 128) f32 whose rows
    0-5 hold the final flat tensors, lanes = configs.

    ``reduced``/``iterative`` are baked into ``radii_row`` rows 4-5 by
    the caller (``ops/inertia.py``); the tuples only size the config
    count.  Operand diet: the per-config masks ride as BITS of i32
    words (config c = word c//32, bit c%32) and 1/r^2 is derived
    in-kernel from the positions, so each halo instance streams
    (5 + W)*K operand words — and the caller never materializes a
    (B, lanes, C, K) HBM block at all.  Each config's heavy pass
    touches only its occupied-prefix blocks (radii row 1), so the
    per-iteration cost scales with the config's SELECTION, not the
    bucket's K.
    """
    KR = pos3.shape[1]
    assert KR % rb == 0, "pad rows to a multiple of rb"
    C = len(reduced)
    # trace in 32-bit mode: under jax_enable_x64 the pl.when-inside-fori
    # lowering emits i64 loop tokens that Mosaic cannot legalize
    # ("failed to legalize operation 'func.return'"); the kernel is pure
    # f32/i32 so the x64 context is irrelevant to its semantics
    with jax.enable_x64(False):
        return _folding_caller(
            C, int(max_iterations), interpret, int(rb), bool(streaming)
        )(pos3, w_row, maskword, radii_row, done0_row)
