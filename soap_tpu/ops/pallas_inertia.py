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
   Here each (halo, lane) kernel instance stops iterating once ITS
   configs are done, and each config stops paying its (K,) ellipsoid
   pass the moment it converges (``@pl.when`` predication).

Semantics are identical to the jnp path (same update equations, same
TOL / per-config limit / degenerate rules — see
``inertia_tensor_multi``).  The 3x3 eigensolver is a fixed-sweep cyclic
Jacobi in f32, validated to give identical iteration counts and final
tensors against the f64 trigonometric solver on randomized triaxial
profiles (incl. 1e-2.5 flattenings).  Reference algorithm:
``SOAP/property_calculation/inertia_tensors.py:19-132``.

Layout: one kernel instance = one (halo, lane) — the engine's nested
halo/lane vmaps lift the call into the Pallas grid.  The config axis
lives in VECTOR LANES (C <= 128), so all per-config "tiny" math
(Jacobi rotations, axis ratios, convergence logic) is (128,)-row
arithmetic, statically unrolled in Python.  The heavy (K,) ellipsoid
test + moment reduction runs per config as a fori over (RB, 128) row
blocks bounded by that config's OCCUPIED PREFIX: the engine's bucket
rows are radius-sorted, so an aperture/SO selection mask is dense in a
prefix of the rows — a 50 kpc lane inside a K=65536 candidate set
touches only its own few blocks instead of the whole bucket.  The
caller passes ceil(last_selected/RB*128) per config (radii row 1);
position products are formed in-block (no K-sized product scratch, so
the VMEM cap is set by the 5 operand planes alone).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOL = 1.0e-4
_SWEEPS = 4  # cyclic Jacobi sweeps (3 already reproduces f64 behavior)
RB = 8  # sublane rows per heavy-pass block (dynamic-slice aligned)

# state-row indices in the (24, 128) scratch
_VAL = 0  # 0-2: eigenvalues ascending
_VEC = 3  # 3-11: eigenvector columns, V[i][j] at row 3 + 3*i + j
_TEN = 12  # 12-17: tensor flat [xx, xy, xz, yy, yz, zz]
_OLDQ = 18
_DONE = 19


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
    reduced: Tuple[bool, ...],
    iterative: Tuple[bool, ...],
    max_iterations: int,
    pos_ref,  # (3, KR, 128) f32
    w_ref,  # (1, KR, 128) f32: SHARED per-particle weights
    mw_ref,  # (1, KR, 128) i32: per-config mask bits (bit c = config c)
    radii_ref,  # (8, 128) f32, row 0: sphere radius; row 1: prefix blocks
    done0_ref,  # (8, 128) f32, row 0: 1.0 where done at start (~enough)
    out_ref,  # (8, 128) f32, rows 0-5: final tensor flat per config lane
    st_ref,  # scratch (24, 128) f32: iteration state rows
    tn_ref,  # scratch (8, 128) f32: this iteration's normalized tensor
):
    C = len(reduced)
    one = jnp.float32(1.0)
    tiny = jnp.float32(1e-37)

    R_row = radii_ref[0]
    nblk_row = radii_ref[1]  # per-config occupied prefix, in RB-row blocks
    # rows 2-3: per-block MINIMUM radius (radius-sorted callers only;
    # -inf otherwise, which disables the dynamic ellipsoid-extent bound)
    bm0 = radii_ref[2]
    bm1 = radii_ref[3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
    onehot = [
        (lane == c).astype(jnp.float32) for c in range(C)
    ]  # scalar extraction helpers
    zero_row = jnp.zeros_like(R_row)
    one_row = jnp.ones_like(R_row)
    # per-config iteration limit as a lane row (no captured constants:
    # built from the iota so Mosaic sees only kernel-local values)
    limit_row = one_row
    for c in range(C):
        if iterative[c]:
            limit_row = jnp.where(
                lane == c, jnp.float32(max_iterations), limit_row
            )

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

            # per-config heavy pass, predicated on the config being live;
            # a fori over RB-row blocks bounded by the config's occupied
            # prefix (block accumulator planes, ONE cross-lane reduction
            # per moment after the loop)
            for c in range(C):
                run_c = jnp.sum(jnp.where(lane == c, one_row - done, 0.0)) > 0.0

                @pl.when(run_c)
                def _(c=c):
                    q00 = jnp.sum(qq[(0, 0)] * onehot[c])
                    q01 = jnp.sum(qq[(0, 1)] * onehot[c])
                    q02 = jnp.sum(qq[(0, 2)] * onehot[c])
                    q11 = jnp.sum(qq[(1, 1)] * onehot[c])
                    q12 = jnp.sum(qq[(1, 2)] * onehot[c])
                    q22 = jnp.sum(qq[(2, 2)] * onehot[c])
                    amax_c = jnp.sum(amax_row * onehot[c])
                    nblk_dyn = (
                        jnp.sum(jnp.where(bm0 <= amax_c, 1.0, 0.0))
                        + jnp.sum(jnp.where(bm1 <= amax_c, 1.0, 0.0))
                    ).astype(jnp.int32)
                    nblk = jnp.minimum(
                        jnp.sum(nblk_row * onehot[c]).astype(jnp.int32),
                        nblk_dyn,
                    )

                    def blk(b, acc):
                        r0 = b * RB
                        xs = pos_ref[0, pl.ds(r0, RB)]
                        ys = pos_ref[1, pl.ds(r0, RB)]
                        zs = pos_ref[2, pl.ds(r0, RB)]
                        rr = (
                            xs * (q00 * xs + q01 * ys + q02 * zs)
                            + ys * (q11 * ys + q12 * zs)
                            + q22 * zs * zs
                        )
                        sel = ((mw_ref[0, pl.ds(r0, RB)] >> c) & 1) == 1
                        inside = (rr <= one) & sel
                        wb = w_ref[0, pl.ds(r0, RB)]
                        wn = jnp.where(inside, wb, 0.0)
                        if reduced[c]:
                            # w / max(r^2, 1e-8-ish): matches the host
                            # ``1 / where(isclose(r2, 0), 1, r2)`` rule
                            r2 = xs * xs + ys * ys + zs * zs
                            wi = wn / jnp.where(
                                r2 <= jnp.float32(1e-8), one, r2
                            )
                        else:
                            wi = wn
                        return (
                            acc[0] + wi * xs * xs,
                            acc[1] + wi * xs * ys,
                            acc[2] + wi * xs * zs,
                            acc[3] + wi * ys * ys,
                            acc[4] + wi * ys * zs,
                            acc[5] + wi * zs * zs,
                            acc[6] + wn,
                        )

                    zb = jnp.zeros((RB, 128), jnp.float32)
                    acc = jax.lax.fori_loop(
                        jnp.int32(0), nblk, blk, (zb,) * 7
                    )
                    inv = one / jnp.maximum(jnp.sum(acc[6]), tiny)
                    for k in range(6):
                        s_k = jnp.sum(acc[k]) * inv
                        tn_ref[k, :] = jnp.where(
                            lane == c, s_k, tn_ref[k, :]
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


def inertia_loop_pallas(
    pos3: jnp.ndarray,  # (3, KR, 128) f32, KR a multiple of RB
    w_row: jnp.ndarray,  # (1, KR, 128) f32: shared weights
    maskword: jnp.ndarray,  # (1, KR, 128) i32: bit c = config c selected
    radii_row: jnp.ndarray,  # (8, 128) f32; row 1 = prefix RB-blocks
    done0_row: jnp.ndarray,  # (8, 128) f32
    reduced: Tuple[bool, ...],
    iterative: Tuple[bool, ...],
    max_iterations: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the in-kernel ellipsoid loop; returns (8, 128) f32 whose rows
    0-5 hold the final flat tensors, lanes = configs.

    Operand diet (vs the first version, which took a (C, KR, 128)
    NaN-masked weight block + a precomputed 1/r^2 plane): the per-config
    masks ride as BITS of one i32 word per element and 1/r^2 is derived
    in-kernel from the positions, so each (halo, lane) instance streams
    5*K operand words instead of (4 + C)*K — and the caller never
    materializes a (B, lanes, C, K) HBM block at all.  Each config's
    heavy pass touches only its occupied-prefix blocks (radii row 1),
    so the per-iteration cost scales with the config's SELECTION, not
    the bucket's K.
    """
    KR = pos3.shape[1]
    assert KR % RB == 0, "pad rows to a multiple of RB"
    kern = partial(
        _inertia_kernel, tuple(reduced), tuple(iterative), int(max_iterations)
    )
    # trace in 32-bit mode: under jax_enable_x64 the pl.when-inside-fori
    # lowering emits i64 loop tokens that Mosaic cannot legalize
    # ("failed to legalize operation 'func.return'"); the kernel is pure
    # f32/i32 so the x64 context is irrelevant to its semantics
    with jax.enable_x64(False):
        return _call(kern, KR, interpret)(
            pos3, w_row, maskword, radii_row, done0_row
        )


def _call(kern, KR, interpret):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((24, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )
