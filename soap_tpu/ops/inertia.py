"""Iterative ellipsoidal inertia tensors — batched fixed-iteration kernels.

Reference algorithm (``SOAP/property_calculation/inertia_tensors.py:19-132``
for 3D, ``:226-343`` for projected 2D):

 - start from a sphere (circle) of the aperture radius;
 - compute the weighted tensor I_ij = sum w_i x_i x_j / sum w (optionally
   reduced: each particle divided by its |x|^2), eigendecompose, reshape
   the selection ellipsoid to the eigenvalue axis ratios at fixed volume,
   re-select particles, iterate until the axis ratio q = sqrt(l1/l2)
   changes by < 1e-4, at most 20 iterations;
 - requires >= 20 particles inside the initial sphere, else no value;
 - non-iterative variants are the same with max_iterations = 1.

TPU-native form: ``lax.while_loop`` with a convergence mask, batched 3x3
(2x2) ``eigh`` — tiny eigenproblems are cheap on the VPU.  Output
flattening matches the reference: (xx, yy, zz, xy, xz, yz) for 3D and
(xx, yy, xy) for projected.
"""

from __future__ import annotations

import os as _os
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

TOL = 1.0e-4
MIN_PARTICLES = 20


def _pallas_inertia_mode():
    """None (XLA loop), "real" (TPU kernel), or "interpret" (CPU test
    emulation) — SOAP_TPU_PALLAS_INERTIA = auto|0|1|interpret."""
    mode = _os.environ.get("SOAP_TPU_PALLAS_INERTIA", "auto")
    if mode == "0":
        return None
    if mode in ("interpret", "1"):
        return "interpret" if mode == "interpret" else "real"
    try:
        return (
            "real"
            if jax.devices()[0].platform in ("tpu", "axon")
            else None
        )
    except Exception:
        return None


def _static_bools(arr):
    """Concrete (C,) bool array -> tuple of python bools; None if the
    values are traced (then the XLA loop handles them)."""
    try:
        return tuple(bool(v) for v in np.asarray(arr))
    except Exception:
        return None


def sym_eigh_3x3(A: jnp.ndarray):
    """Closed-form eigendecomposition of a symmetric 3x3 matrix.

    Trigonometric eigenvalue formula + cross-product eigenvectors — pure
    VPU arithmetic, replacing XLA's general ``eigh`` inside the inertia
    iteration loop (20 iterations x 8 tensor variants per halo makes the
    eigensolver the hot op).  Returns (w ascending, V columns) matching
    ``jnp.linalg.eigh`` conventions.

    The decomposition runs in float64 internally (a per-tensor scalar
    cost, negligible next to the (K,3) reductions that build the tensor)
    because float32 trigonometry limits eigenvalues to ~2e-4 relative
    accuracy — too coarse for the 1e-4 axis-ratio convergence test.
    """
    in_dtype = A.dtype
    A = A.astype(jnp.float64)
    a00, a11, a22 = A[0, 0], A[1, 1], A[2, 2]
    a01, a02, a12 = A[0, 1], A[0, 2], A[1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    p_safe = jnp.maximum(p, 1e-30)
    B = (A - q * jnp.eye(3, dtype=A.dtype)) / p_safe
    detB = (
        B[0, 0] * (B[1, 1] * B[2, 2] - B[1, 2] * B[2, 1])
        - B[0, 1] * (B[1, 0] * B[2, 2] - B[1, 2] * B[2, 0])
        + B[0, 2] * (B[1, 0] * B[2, 1] - B[1, 1] * B[2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)  # largest
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w2 - w0
    degenerate = p2 <= 1e-30 * jnp.maximum(q * q, 1e-30)
    w = jnp.stack([w0, w1, w2])
    w = jnp.where(degenerate, jnp.stack([q, q, q]), w)

    def eigenvector(lam):
        # v is orthogonal to the rows of (A - lam I); use the largest of
        # the three row cross products for numerical stability
        M = A - lam * jnp.eye(3, dtype=A.dtype)
        c0 = jnp.cross(M[0], M[1])
        c1 = jnp.cross(M[0], M[2])
        c2 = jnp.cross(M[1], M[2])
        n0 = jnp.sum(c0 * c0)
        n1 = jnp.sum(c1 * c1)
        n2 = jnp.sum(c2 * c2)
        best = jnp.argmax(jnp.stack([n0, n1, n2]))
        v = jnp.stack([c0, c1, c2])[best]
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(v * v), 1e-37))
        return v / nrm

    v0 = eigenvector(w0)
    v2 = eigenvector(w2)
    # enforce an orthonormal right-handed frame; robust when w1 is close
    # to either neighbour (v1 from cross product keeps orthogonality)
    v2 = v2 - v0 * jnp.sum(v0 * v2)
    v2 = v2 / jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2), 1e-37))
    v1 = jnp.cross(v2, v0)
    V = jnp.stack([v0, v1, v2], axis=1)
    V = jnp.where(degenerate, jnp.eye(3, dtype=A.dtype), V)
    return w.astype(in_dtype), V.astype(in_dtype)


def sym_eigh_2x2(A: jnp.ndarray):
    """Closed-form eigendecomposition of a symmetric 2x2 matrix;
    (w ascending, V columns)."""
    in_dtype = A.dtype
    A = A.astype(jnp.float64)
    a, b, d = A[0, 0], A[0, 1], A[1, 1]
    tr2 = (a + d) / 2.0
    det = a * d - b * b
    disc = jnp.sqrt(jnp.maximum(tr2 * tr2 - det, 0.0))
    w0, w1 = tr2 - disc, tr2 + disc
    # eigenvector for w1: (b, w1 - a) unless b ~ 0
    use_b = jnp.abs(b) > 1e-30
    v1 = jnp.where(
        use_b,
        jnp.stack([b, w1 - a]),
        jnp.where(a >= d, jnp.array([1.0, 0.0], A.dtype), jnp.array([0.0, 1.0], A.dtype)),
    )
    v1 = v1 / jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1), 1e-37))
    v0 = jnp.stack([-v1[1], v1[0]])
    return (
        jnp.stack([w0, w1]).astype(in_dtype),
        jnp.stack([v0, v1], axis=1).astype(in_dtype),
    )


class InertiaResult(NamedTuple):
    tensor: jnp.ndarray  # (6,) or (3,) flattened tensor
    found: jnp.ndarray  # bool: enough particles
    needs_bigger: jnp.ndarray  # bool: ellipsoid needed data beyond region


def _tensor_3d(weights, pos, reduced_norm):
    """Weighted sum of outer products, (3, 3)."""
    w = weights / jnp.where(reduced_norm is None, 1.0, 1.0)
    if reduced_norm is not None:
        w = weights / reduced_norm
    return jnp.einsum("k,ki,kj->ij", w, pos, pos)


def inertia_tensor(
    weights: jnp.ndarray,  # (K,)
    pos: jnp.ndarray,  # (K, 3) halo-relative positions
    mask: jnp.ndarray,  # (K,)
    sphere_radius: jnp.ndarray,  # scalar aperture radius R
    search_radius: jnp.ndarray | None = None,
    reduced: bool = False,
    max_iterations: int = 20,
) -> InertiaResult:
    """3D iterative weighted inertia tensor for one halo (vmap over halos)."""
    r2 = jnp.sum(pos * pos, axis=1)
    if reduced:
        # exclude particles at (numerically) zero radius
        mask = mask & ~jnp.isclose(r2, 0.0)
        norm = jnp.where(mask, r2, 1.0)
    else:
        norm = jnp.ones_like(r2)
    w_base = jnp.where(mask, weights, 0.0)

    R = sphere_radius
    init_inside = mask & (r2 <= R * R)
    n_init = jnp.sum(init_inside.astype(jnp.int32))
    enough = (jnp.sum(mask.astype(jnp.int32)) >= MIN_PARTICLES) & (
        n_init >= MIN_PARTICLES
    )

    eye = jnp.eye(3, dtype=pos.dtype)

    def compute_tensor(eig_val, eig_vec):
        q = jnp.sqrt(eig_val[1] / eig_val[2])
        s = jnp.sqrt(eig_val[0] / eig_val[2])
        p = jnp.sqrt(eig_val[0] / eig_val[1])
        axis = R * jnp.stack(
            [jnp.cbrt(s * p), jnp.cbrt(q / p), 1.0 / jnp.cbrt(q * s)]
        )
        proj = (pos @ eig_vec) / axis[None, :]
        rr = jnp.sum(proj * proj, axis=1)
        inside = mask & (rr <= 1.0)
        wsum = jnp.sum(jnp.where(inside, w_base, 0.0))
        w = jnp.where(inside, w_base, 0.0) / jnp.maximum(wsum, 1e-37)
        tensor = jnp.einsum("k,ki,kj->ij", w / norm, pos, pos)
        return tensor, q, inside

    def cond(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        return (~done) & (i < max_iterations)

    def body(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        q_now = jnp.sqrt(eig_val[1] / eig_val[2])
        converged = jnp.abs((old_q - q_now) / jnp.maximum(q_now, 1e-37)) < TOL
        tensor_new, q, inside = compute_tensor(eig_val, eig_vec)
        val, vec = sym_eigh_3x3(tensor_new)
        val = jnp.abs(val)
        # degenerate: effectively a single particle left
        degenerate = q == 0.0
        tensor_new = jnp.where(degenerate, jnp.zeros_like(tensor_new), tensor_new)
        stop = converged | degenerate
        tensor_out = jnp.where(converged, tensor, tensor_new)
        return (
            i + 1,
            jnp.where(stop, eig_val, val),
            jnp.where(stop, eig_vec, vec),
            tensor_out,
            jnp.where(stop, old_q, q_now),
            done | stop,
        )

    state = (
        jnp.int32(0),
        jnp.ones(3, pos.dtype),
        eye,
        jnp.zeros((3, 3), pos.dtype),
        jnp.float32(1000.0).astype(pos.dtype),
        ~enough,
    )
    _, _, _, tensor, _, _ = jax.lax.while_loop(cond, body, state)

    needs_bigger = (
        jnp.zeros((), bool)
        if search_radius is None
        else enough & (R > search_radius)
    )
    flat = jnp.stack(
        [
            tensor[0, 0],
            tensor[1, 1],
            tensor[2, 2],
            tensor[0, 1],
            tensor[0, 2],
            tensor[1, 2],
        ]
    )
    flat = jnp.where(enough, flat, 0.0)
    return InertiaResult(flat, enough, needs_bigger)


def inertia_tensor_multi(
    weights: jnp.ndarray,  # (K,) SHARED or (C, K) per-config weights
    pos: jnp.ndarray,  # (K, 3) halo-relative positions (SHARED)
    masks: jnp.ndarray,  # (C, K) per-config selection
    sphere_radius: jnp.ndarray,  # (C,) aperture radii
    reduced: jnp.ndarray,  # (C,) bool: 1/r^2 weighting
    iterative: jnp.ndarray,  # (C,) bool: 20 iterations vs 1
    search_radius: jnp.ndarray | None = None,  # scalar (None: no check)
    check_search: jnp.ndarray | None = None,  # (C,) bool
    max_iterations: int = 20,
    single_pass: bool = False,  # static: all configs non-iterative
    rows_radius_sorted: bool = False,  # static: rows ascending in |pos|
) -> InertiaResult:
    """All of one halo's 3D inertia configs in ONE while loop.

    Per-config semantics are identical to ``inertia_tensor``; batching
    every (species x reduced x iterative [x luminosity band]) request
    into one loop makes each iteration stream the shared positions ONCE
    for all configs (the per-config loops re-read (K, 3) positions every
    iteration) and collapses ~10 compiled while loops per DAG into one.

    Memory discipline: the tensor entries are computed as SIX fused
    elementwise-masked reductions, never a dot — a dot_general would
    materialize its (C, K) operand per vmapped halo/lane (a 21 GB
    allocation in the hydro SO family); reduce fusions rematerialize
    the producers instead.  Pass ``weights`` as (K,) whenever configs
    share one weight vector so no (C, K) weight block exists at all.
    """
    C = masks.shape[0]
    w_in = weights if weights.ndim == 2 else weights[None, :]
    r2 = jnp.sum(pos * pos, axis=1)  # (K,)
    zero_r = jnp.isclose(r2, 0.0)
    masks = masks & ~(reduced[:, None] & zero_r[None, :])

    R = sphere_radius  # (C,)
    init_inside = masks & (r2[None, :] <= (R * R)[:, None])
    n_init = jnp.sum(init_inside.astype(jnp.int32), axis=1)
    enough = (jnp.sum(masks.astype(jnp.int32), axis=1) >= MIN_PARTICLES) & (
        n_init >= MIN_PARTICLES
    )
    limit = jnp.where(iterative, max_iterations, 1)
    # reduced-weight vector SHARED across configs: wi_ck selects between
    # w_in and w_inv by the per-config ``reduced`` SCALAR, so no (C, K)
    # inv-norm block is ever materialized (the previous form carried one
    # as a loop operand — its boundary copies were a profiled hot spot)
    inv_r2 = 1.0 / jnp.where(zero_r, 1.0, r2)  # (K,)
    w_inv = w_in * inv_r2[None, :]  # same rank as w_in

    # ---- Pallas TPU path: the whole iteration loop in one kernel ----
    # (VMEM-resident operands, per-(halo, lane) early exit — see
    # ops/pallas_inertia.py).  Static per-config flags required; shared
    # (K,) weights only (the rare per-config luminosity weights keep the
    # XLA loop).
    pallas_mode = _pallas_inertia_mode()
    # K cap: the kernel's VMEM footprint is the 5 operand planes
    # (3 positions + weights + mask words) = 20 B/row-element — the
    # position-product scratch is gone (products form in-block inside
    # the prefix-bounded heavy pass), so K = 262144 fits in ~5.2 MB of
    # the 16 MB VMEM.  The giant-halo K ~ 2e6 buckets would still OOM
    # at compile, so they keep the XLA loop.  Env escape hatch for
    # experiments.
    max_k = int(_os.environ.get("SOAP_TPU_PALLAS_INERTIA_MAXK", 262144))
    from soap_tpu.ops import pallas_inertia as _pk

    # Above the VMEM cap the kernel switches to STREAMING mode: the
    # operand planes stay in HBM and the heavy pass double-buffers
    # (rb, 128) blocks through VMEM DMA scratch (real TPU only — the
    # interpret path has no DMA semantics).  The block-min bound rows
    # hold 2*128 = 256 block lanes, so rb scales with K to keep the
    # block count <= 256; rb <= 512 covers K <= 16.7M — the giant-halo
    # separate-chunks regime that previously fell back to the slow XLA
    # while loop (VERDICT r4 ask #2).
    K_in = pos.shape[0]
    vmem_fit = K_in <= max_k or pallas_mode == "interpret"
    if vmem_fit:
        pk_rb, pk_stream = _pk.RB, False
    else:
        _rb_min = -(-K_in // (256 * 128))  # rows/block for <= 256 blocks
        pk_rb = max(64, -(-_rb_min // 8) * 8)  # sublane-aligned
        pk_stream = (
            pk_rb <= 512
            and _os.environ.get("SOAP_TPU_PALLAS_INERTIA_STREAM", "1") == "1"
            and jax.devices()[0].platform != "cpu"
        )
    hard_max_k = 256 * 128 * pk_rb
    if (
        pallas_mode is not None
        and not single_pass
        and weights.ndim == 1
        and C <= _pk.MAX_C  # config lanes of one vector row
        and pos.dtype == jnp.float32
        and pos.shape[0] <= hard_max_k
        and (vmem_fit or pk_stream)
    ):
        red_static = _static_bools(reduced)
        it_static = _static_bools(iterative)
        if red_static is not None and it_static is not None:
            K = pos.shape[0]
            blk_elems = 128 * pk_rb  # heavy-pass block granularity
            Kp = -(-K // blk_elems) * blk_elems
            pos3 = jnp.pad(pos, ((0, Kp - K), (0, 0))).T.reshape(
                3, Kp // 128, 128
            )
            # per-config masks as BITS of i32 words (config c = word
            # c//32, bit c%32; padded rows stay 0 = deselected
            # everywhere); the shared weight vector rides once —
            # negative neutrino weights are fine because selection is
            # explicit, not weight-encoded
            W = -(-C // 32)
            words = []
            for w in range(W):
                mw = jnp.zeros((K,), jnp.int32)
                for c in range(w * 32, min((w + 1) * 32, C)):
                    mw = mw | (masks[c].astype(jnp.int32) << (c % 32))
                words.append(
                    jnp.pad(mw, (0, Kp - K)).reshape(Kp // 128, 128)
                )
            mw = jnp.stack(words)  # (W, KR, 128)
            w_row = jnp.pad(
                weights.astype(jnp.float32), (0, Kp - K)
            ).reshape(1, Kp // 128, 128)
            radii_row = jnp.zeros((8, 128), jnp.float32)
            radii_row = radii_row.at[_pk._R_ROW, :C].set(
                R.astype(jnp.float32)
            )
            # occupied-prefix bound per config, in RB-row blocks: bucket
            # rows arrive radius-sorted, so a selection mask is dense in
            # a prefix — the kernel's heavy pass stops at the config's
            # last selected row instead of sweeping the whole bucket
            occ = jnp.max(
                jnp.where(
                    masks, jnp.arange(K, dtype=jnp.int32)[None, :] + 1, 0
                ),
                axis=1,
            )  # (C,) index-after-last-selected
            nblk = -(-occ // blk_elems)
            radii_row = radii_row.at[_pk._NBLK_ROW, :C].set(
                nblk.astype(jnp.float32)
            )
            # reduced flag + per-config iteration limit as data rows
            # (dynamic config loop in the kernel)
            radii_row = radii_row.at[_pk._RED_ROW, :C].set(
                jnp.asarray(np.asarray(red_static, np.float32))
            )
            radii_row = radii_row.at[_pk._LIM_ROW, :C].set(
                jnp.asarray(
                    np.where(np.asarray(it_static), max_iterations, 1.0)
                    .astype(np.float32)
                )
            )
            # rows 2-3: per-block minimum radius, enabling the kernel's
            # dynamic ellipsoid-extent bound.  Only valid when rows are
            # radius-ascending; -inf otherwise (bound degenerates to the
            # static prefix).  256-block ceiling = the max_k cap.
            n_blocks = Kp // blk_elems
            if rows_radius_sorted and n_blocks <= 256:
                starts = jnp.arange(n_blocks, dtype=jnp.int32) * blk_elems
                bp = pos[jnp.minimum(starts, K - 1)]
                bmin = jnp.sqrt(jnp.sum(bp * bp, axis=1)).astype(
                    jnp.float32
                )
                bm_rows = jnp.full((2, 128), jnp.inf, jnp.float32)
                bm_rows = bm_rows.reshape(-1).at[:n_blocks].set(bmin)
                radii_row = radii_row.at[
                    _pk._BM_ROW : _pk._BM_ROW + 2
                ].set(bm_rows.reshape(2, 128))
            else:
                radii_row = radii_row.at[
                    _pk._BM_ROW : _pk._BM_ROW + 2
                ].set(jnp.full((2, 128), -jnp.inf, jnp.float32))
            done0_row = jnp.zeros((8, 128), jnp.float32)
            done0_row = done0_row.at[0].set(1.0)
            done0_row = done0_row.at[0, :C].set(
                jnp.where(enough, 0.0, 1.0)
            )
            out = _pk.inertia_loop_pallas(
                pos3,
                w_row,
                mw,
                radii_row,
                done0_row,
                red_static,
                it_static,
                max_iterations,
                interpret=(pallas_mode == "interpret"),
                rb=pk_rb,
                streaming=pk_stream,
            )
            # kernel rows [xx, xy, xz, yy, yz, zz] -> result order
            # [xx, yy, zz, xy, xz, yz]
            flat = jnp.stack(
                [out[k, :C] for k in (0, 3, 5, 1, 2, 4)], axis=1
            )
            flat = jnp.where(enough[:, None], flat, 0.0)
            if search_radius is None or check_search is None:
                needs_bigger = jnp.zeros((C,), bool)
            else:
                needs_bigger = check_search & enough & (R > search_radius)
            return InertiaResult(flat, enough, needs_bigger)

    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]

    def compute_tensor(eig_val, eig_vec):
        # eig_val (C, 3) ascending, eig_vec (C, 3, 3) columns
        q = jnp.sqrt(eig_val[:, 1] / eig_val[:, 2])
        s = jnp.sqrt(eig_val[:, 0] / eig_val[:, 2])
        p = jnp.sqrt(eig_val[:, 0] / eig_val[:, 1])
        axis = R[:, None] * jnp.stack(
            [jnp.cbrt(s * p), jnp.cbrt(q / p), 1.0 / jnp.cbrt(q * s)], axis=1
        )  # (C, 3)
        # ellipsoid test as ONE quadratic form per config:
        # rr = pos^T Q pos with Q = V diag(1/axis^2) V^T, expanded
        # directly over the raw x/y/z columns — ~14 flops per element
        # (no per-element division) vs ~27+ for the 3 explicit axis
        # projections, and every factor except the pos columns is
        # loop-varying, so nothing new gets hoisted into big loop-carried
        # buffers (an earlier shared-products variant materialized 6
        # (B, K) invariants and DOUBLED the loop's streamed bytes)
        inv_a2 = 1.0 / (axis * axis)  # (C, 3)
        Q = jnp.einsum("cib,cjb,cb->cij", eig_vec, eig_vec, inv_a2)
        q00 = Q[:, 0, 0, None]
        q11 = Q[:, 1, 1, None]
        q22 = Q[:, 2, 2, None]
        q01 = 2.0 * Q[:, 0, 1, None]
        q02 = 2.0 * Q[:, 0, 2, None]
        q12 = 2.0 * Q[:, 1, 2, None]
        xk, yk, zk = px[None, :], py[None, :], pz[None, :]
        rr = (
            xk * (q00 * xk + q01 * yk + q02 * zk)
            + yk * (q11 * yk + q12 * zk)
            + q22 * zk * zk
        )
        inside = masks & (rr <= 1.0)
        w = jnp.where(inside, w_in, 0.0)
        wi = jnp.where(inside, jnp.where(reduced[:, None], w_inv, w_in), 0.0)
        # ONE variadic reduce for the 6 tensor components + the weight
        # sum: XLA otherwise splits these into 7 separate reduce fusions,
        # each REMATERIALIZING the ~20-flop ellipsoid test per element —
        # profiled as the dominant per-iteration cost of the loop.  The
        # normalization moves outside the sum (wn = w/wsum per config is
        # a scalar factor, so sum(wn·x·x) = sum(w·x·x)/wsum exactly up
        # to f32 association).
        ops = tuple(
            wi * pos[None, :, i] * pos[None, :, j]
            for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        ) + (w,)
        zero = jnp.zeros((), pos.dtype)
        sums = jax.lax.reduce(
            ops,
            (zero,) * 7,
            lambda acc, val: tuple(a + v for a, v in zip(acc, val)),
            (1,),
        )
        inv_wsum = 1.0 / jnp.maximum(sums[6], 1e-37)  # (C,)
        xx, xy, xz, yy, yz, zz = (t * inv_wsum for t in sums[:6])
        tensor = jnp.stack(
            [
                jnp.stack([xx, xy, xz], axis=1),
                jnp.stack([xy, yy, yz], axis=1),
                jnp.stack([xz, yz, zz], axis=1),
            ],
            axis=1,
        )  # (C, 3, 3)
        return tensor, q

    def cond(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        return jnp.any(~done) & (i < max_iterations)

    def body(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        q_now = jnp.sqrt(eig_val[:, 1] / eig_val[:, 2])
        converged = (
            jnp.abs((old_q - q_now) / jnp.maximum(q_now, 1e-37)) < TOL
        )
        tensor_new, q = compute_tensor(eig_val, eig_vec)
        val, vec = jax.vmap(sym_eigh_3x3)(tensor_new)
        val = jnp.abs(val)
        degenerate = q == 0.0
        tensor_new = jnp.where(
            degenerate[:, None, None], jnp.zeros_like(tensor_new), tensor_new
        )
        stop = converged | degenerate | (i + 1 >= limit)
        active = ~done
        # per-config freeze: once done, state no longer changes
        upd = active & ~(converged | degenerate)
        tensor = jnp.where(
            (active & ~converged)[:, None, None], tensor_new, tensor
        )
        eig_val = jnp.where(upd[:, None], val, eig_val)
        eig_vec = jnp.where(upd[:, None, None], vec, eig_vec)
        old_q = jnp.where(upd, q_now, old_q)
        return (i + 1, eig_val, eig_vec, tensor, old_q, done | (active & stop))

    if single_pass:
        # every config is non-iterative (static knowledge at the call
        # site): the result is the sphere moment tensor — one streaming
        # pass, no while loop.  Inside the mixed loop these configs
        # finished after iteration 1 but kept paying the full
        # per-iteration (C, K) bandwidth until the iterative configs
        # converged.
        tensor, _ = compute_tensor(
            jnp.ones((C, 3), pos.dtype),
            jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype), (C, 3, 3)),
        )
    else:
        state = (
            jnp.int32(0),
            jnp.ones((C, 3), pos.dtype),
            jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype), (C, 3, 3)),
            jnp.zeros((C, 3, 3), pos.dtype),
            jnp.full((C,), 1000.0, pos.dtype),
            ~enough,
        )
        _, _, _, tensor, _, _ = jax.lax.while_loop(cond, body, state)

    if search_radius is None or check_search is None:
        needs_bigger = jnp.zeros((C,), bool)
    else:
        needs_bigger = check_search & enough & (R > search_radius)
    flat = jnp.stack(
        [
            tensor[:, 0, 0],
            tensor[:, 1, 1],
            tensor[:, 2, 2],
            tensor[:, 0, 1],
            tensor[:, 0, 2],
            tensor[:, 1, 2],
        ],
        axis=1,
    )  # (C, 6)
    flat = jnp.where(enough[:, None], flat, 0.0)
    return InertiaResult(flat, enough, needs_bigger)


def projected_inertia_tensor_multi(
    weights: jnp.ndarray,  # (C, K)
    pos2d: jnp.ndarray,  # (K, 2) SHARED projected positions
    masks: jnp.ndarray,  # (C, K)
    circle_radius: jnp.ndarray,  # (C,)
    reduced: jnp.ndarray,  # (C,) bool
    iterative: jnp.ndarray,  # (C,) bool
    max_iterations: int = 20,
    single_pass: bool = False,  # static: all configs non-iterative
) -> InertiaResult:
    """All of one halo's 2D (projected) inertia configs in ONE loop;
    per-config semantics identical to ``projected_inertia_tensor``.
    Same memory discipline as ``inertia_tensor_multi``: fused masked
    reductions instead of dots, (K,) shared weights supported."""
    C = masks.shape[0]
    w_in = weights if weights.ndim == 2 else weights[None, :]
    r2 = jnp.sum(pos2d * pos2d, axis=1)
    zero_r = jnp.isclose(r2, 0.0)
    masks = masks & ~(reduced[:, None] & zero_r[None, :])
    R = circle_radius

    init_inside = masks & (r2[None, :] <= (R * R)[:, None])
    enough = jnp.sum(init_inside.astype(jnp.int32), axis=1) >= MIN_PARTICLES
    limit = jnp.where(iterative, max_iterations, 1)
    # shared reduced-weight vector + shared products: same memory/flop
    # discipline as ``inertia_tensor_multi`` (no (C, K) inv-norm block,
    # quadratic-form ellipse test on shared second moments)
    inv_r2 = 1.0 / jnp.where(zero_r, 1.0, r2)  # (K,)
    w_inv = w_in * inv_r2[None, :]
    px, py = pos2d[:, 0], pos2d[:, 1]

    def compute_tensor(eig_val, eig_vec):
        q = jnp.sqrt(eig_val[:, 0] / eig_val[:, 1])
        axis = R[:, None] * jnp.stack(
            [jnp.sqrt(q), 1.0 / jnp.sqrt(q)], axis=1
        )
        # quadratic-form ellipse test expanded over the raw columns
        # (loop-varying coefficients -> no hoisted product buffers)
        inv_a2 = 1.0 / (axis * axis)  # (C, 2)
        Q = jnp.einsum("cib,cjb,cb->cij", eig_vec, eig_vec, inv_a2)
        xk, yk = px[None, :], py[None, :]
        rr = (
            xk * (Q[:, 0, 0, None] * xk + 2.0 * Q[:, 0, 1, None] * yk)
            + Q[:, 1, 1, None] * yk * yk
        )
        inside = masks & (rr <= 1.0)
        w = jnp.where(inside, w_in, 0.0)
        wi = jnp.where(inside, jnp.where(reduced[:, None], w_inv, w_in), 0.0)
        # one variadic reduce: 3 tensor components + weight sum share one
        # pass over the ellipse test (see inertia_tensor_multi)
        ops = tuple(
            wi * pos2d[None, :, i] * pos2d[None, :, j]
            for i, j in ((0, 0), (0, 1), (1, 1))
        ) + (w,)
        zero = jnp.zeros((), pos2d.dtype)
        sums = jax.lax.reduce(
            ops,
            (zero,) * 4,
            lambda acc, val: tuple(a + v for a, v in zip(acc, val)),
            (1,),
        )
        inv_wsum = 1.0 / jnp.maximum(sums[3], 1e-37)
        xx, xy, yy = (t * inv_wsum for t in sums[:3])
        tensor = jnp.stack(
            [
                jnp.stack([xx, xy], axis=1),
                jnp.stack([xy, yy], axis=1),
            ],
            axis=1,
        )
        return tensor, q

    def cond(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        return jnp.any(~done) & (i < max_iterations)

    def body(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        q_now = jnp.sqrt(eig_val[:, 0] / eig_val[:, 1])
        converged = (
            jnp.abs((old_q - q_now) / jnp.maximum(q_now, 1e-37)) < TOL
        )
        tensor_new, q = compute_tensor(eig_val, eig_vec)
        val, vec = jax.vmap(sym_eigh_2x2)(tensor_new)
        val = jnp.abs(val)
        degenerate = q == 0.0
        tensor_new = jnp.where(
            degenerate[:, None, None], jnp.zeros_like(tensor_new), tensor_new
        )
        stop = converged | degenerate | (i + 1 >= limit)
        active = ~done
        upd = active & ~(converged | degenerate)
        tensor = jnp.where(
            (active & ~converged)[:, None, None], tensor_new, tensor
        )
        eig_val = jnp.where(upd[:, None], val, eig_val)
        eig_vec = jnp.where(upd[:, None, None], vec, eig_vec)
        old_q = jnp.where(upd, q_now, old_q)
        return (i + 1, eig_val, eig_vec, tensor, old_q, done | (active & stop))

    if single_pass:
        # all configs non-iterative: the circle moment tensor, one pass
        tensor, _ = compute_tensor(
            jnp.ones((C, 2), pos2d.dtype),
            jnp.broadcast_to(jnp.eye(2, dtype=pos2d.dtype), (C, 2, 2)),
        )
    else:
        state = (
            jnp.int32(0),
            jnp.ones((C, 2), pos2d.dtype),
            jnp.broadcast_to(jnp.eye(2, dtype=pos2d.dtype), (C, 2, 2)),
            jnp.zeros((C, 2, 2), pos2d.dtype),
            jnp.full((C,), 1000.0, pos2d.dtype),
            ~enough,
        )
        _, _, _, tensor, _, _ = jax.lax.while_loop(cond, body, state)
    flat = jnp.stack(
        [tensor[:, 0, 0], tensor[:, 1, 1], tensor[:, 0, 1]], axis=1
    )
    flat = jnp.where(enough[:, None], flat, 0.0)
    return InertiaResult(flat, enough, jnp.zeros((C,), bool))


def projected_inertia_tensor(
    weights: jnp.ndarray,  # (K,)
    pos2d: jnp.ndarray,  # (K, 2) projected halo-relative positions
    mask: jnp.ndarray,
    circle_radius: jnp.ndarray,
    max_iterations: int = 20,
    reduced: bool = False,
) -> InertiaResult:
    """2D (projected) iterative inertia tensor; output (xx, yy, xy).

    Reference: ``inertia_tensors.py:226-343`` (area-preserving ellipse
    reshaping, q = sqrt(l1/l2), same convergence rule).
    """
    r2 = jnp.sum(pos2d * pos2d, axis=1)
    if reduced:
        mask = mask & ~jnp.isclose(r2, 0.0)
        norm = jnp.where(mask, r2, 1.0)
    else:
        norm = jnp.ones_like(r2)
    w_base = jnp.where(mask, weights, 0.0)
    R = circle_radius

    init_inside = mask & (r2 <= R * R)
    enough = jnp.sum(init_inside.astype(jnp.int32)) >= MIN_PARTICLES

    def compute_tensor(eig_val, eig_vec):
        q = jnp.sqrt(eig_val[0] / eig_val[1])
        axis = R * jnp.stack([jnp.sqrt(q), 1.0 / jnp.sqrt(q)])
        proj = (pos2d @ eig_vec) / axis[None, :]
        rr = jnp.sum(proj * proj, axis=1)
        inside = mask & (rr <= 1.0)
        wsum = jnp.sum(jnp.where(inside, w_base, 0.0))
        w = jnp.where(inside, w_base, 0.0) / jnp.maximum(wsum, 1e-37)
        tensor = jnp.einsum("k,ki,kj->ij", w / norm, pos2d, pos2d)
        return tensor, q

    def cond(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        return (~done) & (i < max_iterations)

    def body(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        q_now = jnp.sqrt(eig_val[0] / eig_val[1])
        converged = jnp.abs((old_q - q_now) / jnp.maximum(q_now, 1e-37)) < TOL
        tensor_new, q = compute_tensor(eig_val, eig_vec)
        val, vec = sym_eigh_2x2(tensor_new)
        val = jnp.abs(val)
        degenerate = q == 0.0
        tensor_new = jnp.where(degenerate, jnp.zeros_like(tensor_new), tensor_new)
        stop = converged | degenerate
        tensor_out = jnp.where(converged, tensor, tensor_new)
        return (
            i + 1,
            jnp.where(stop, eig_val, val),
            jnp.where(stop, eig_vec, vec),
            tensor_out,
            jnp.where(stop, old_q, q_now),
            done | stop,
        )

    state = (
        jnp.int32(0),
        jnp.ones(2, pos2d.dtype),
        jnp.eye(2, dtype=pos2d.dtype),
        jnp.zeros((2, 2), pos2d.dtype),
        jnp.float32(1000.0).astype(pos2d.dtype),
        ~enough,
    )
    _, _, _, tensor, _, _ = jax.lax.while_loop(cond, body, state)
    flat = jnp.stack([tensor[0, 0], tensor[1, 1], tensor[0, 1]])
    flat = jnp.where(enough, flat, 0.0)
    return InertiaResult(flat, enough, jnp.zeros((), bool))
