"""Which inertia path is closer to truth? f64 numpy oracle comparison.

Runs the same iterative ellipsoid algorithm in float64 numpy (trusted
oracle, mirrors ``tests/test_inertia_multi.py`` style) on a modest
(B, K) workload, then compares the XLA while-loop path and the Pallas
kernel path against it.  Large Pallas-vs-XLA diffs are acceptable IFF
both sit at comparable distance from the f64 oracle (iteration-path
divergence on a chaotic convergence boundary), not if Pallas is
systematically farther.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 1.0e-4
MIN_PARTICLES = 20


def oracle(w, pos, mask, R, reduced, iterative, max_iterations=20):
    pos = pos.astype(np.float64)
    w = w.astype(np.float64)
    r2 = np.sum(pos * pos, axis=1)
    if reduced:
        mask = mask & ~np.isclose(r2, 0.0)
        norm = np.where(mask, r2, 1.0)
    else:
        norm = np.ones_like(r2)
    inside0 = mask & (r2 <= R * R)
    if mask.sum() < MIN_PARTICLES or inside0.sum() < MIN_PARTICLES:
        return np.zeros(6)
    val = np.ones(3)
    vec = np.eye(3)
    tensor = np.zeros((3, 3))
    old_q = 1000.0
    limit = max_iterations if iterative else 1
    for i in range(limit):
        q_now = np.sqrt(val[1] / val[2])
        if abs((old_q - q_now) / max(q_now, 1e-300)) < TOL:
            break
        q = np.sqrt(val[1] / val[2])
        s = np.sqrt(val[0] / val[2])
        p = np.sqrt(val[0] / val[1])
        axis = R * np.array(
            [np.cbrt(s * p), np.cbrt(q / p), 1.0 / np.cbrt(q * s)]
        )
        proj = (pos @ vec) / axis[None, :]
        rr = np.sum(proj * proj, axis=1)
        inside = mask & (rr <= 1.0)
        if q == 0.0:
            tensor = np.zeros((3, 3))
            break
        wsel = np.where(inside, w, 0.0)
        wsum = wsel.sum()
        wn = wsel / max(wsum, 1e-300) / norm
        tensor = np.einsum("k,ki,kj->ij", wn, pos, pos)
        val_new, vec_new = np.linalg.eigh(tensor)
        val, vec = np.abs(val_new), vec_new
        old_q = q_now
    return np.array(
        [
            tensor[0, 0],
            tensor[1, 1],
            tensor[2, 2],
            tensor[0, 1],
            tensor[0, 2],
            tensor[1, 2],
        ]
    )


def make_workload(B, K, C=6, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.empty((B, K, 3), np.float32)
    for b in range(B):
        ax = np.sort(np.exp(rng.normal(0, 0.7, 3)))[::-1]
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        pos[b] = ((rng.normal(size=(K, 3)) * ax) @ Q.T).astype(np.float32)
    w = rng.lognormal(0.0, 0.2, (B, K)).astype(np.float32)
    masks = rng.random((B, C, K)) < 0.7
    rmed = np.median(np.linalg.norm(pos, axis=2), axis=1)
    R = (rmed[:, None] * np.linspace(0.6, 2.0, C)[None, :]).astype(np.float32)
    red = np.array(([False, True] * C)[:C])
    it = np.array(([True, True, False] * C)[:C])
    return pos, w, masks, R, red, it


def run(mode, pos, w, masks, R, red, it):
    os.environ["SOAP_TPU_PALLAS_INERTIA"] = mode
    import jax
    import jax.numpy as jnp

    from soap_tpu.ops import inertia as I

    fn = jax.jit(
        jax.vmap(
            lambda ww, pp, mm, rr: I.inertia_tensor_multi(
                ww, pp, mm, rr, red, it
            ).tensor
        )
    )
    args = [jnp.asarray(a) for a in (w, pos, masks, R)]
    return np.asarray(jax.block_until_ready(fn(*args)))


def main():
    B, K = int(sys.argv[1]) if len(sys.argv) > 1 else 64, (
        int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    )
    pos, w, masks, R, red, it = make_workload(B, K)
    out_x = run("0", pos, w, masks, R, red, it)
    out_p = run("1", pos, w, masks, R, red, it)
    C = R.shape[1]
    ora = np.zeros((B, C, 6))
    for b in range(B):
        for c in range(C):
            ora[b, c] = oracle(
                w[b], pos[b], masks[b, c], float(R[b, c]), red[c], it[c]
            )
    scale = np.abs(ora).max(axis=2, keepdims=True) + 1e-30
    ex = np.abs(out_x - ora) / scale
    ep = np.abs(out_p - ora) / scale
    exy = np.abs(out_x - out_p) / scale
    print(f"B={B} K={K}")
    print(
        f"  xla    vs oracle: max {ex.max():.2e}  mean {ex.mean():.2e}  "
        f"p99 {np.quantile(ex, 0.99):.2e}"
    )
    print(
        f"  pallas vs oracle: max {ep.max():.2e}  mean {ep.mean():.2e}  "
        f"p99 {np.quantile(ep, 0.99):.2e}"
    )
    print(
        f"  pallas vs xla   : max {exy.max():.2e}  mean {exy.mean():.2e}  "
        f"p99 {np.quantile(exy, 0.99):.2e}"
    )
    # where do the worst pallas-vs-oracle cases sit for xla?
    bad = np.unravel_index(np.argmax(ep.max(axis=2)), ep.shape[:2])
    print(
        f"  worst pallas case b={bad[0]} c={bad[1]}: "
        f"pallas {ep[bad].max():.2e}  xla-same-case {ex[bad].max():.2e}"
    )


if __name__ == "__main__":
    main()
