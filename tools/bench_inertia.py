"""Micro-benchmark: Pallas inertia-loop kernel vs the XLA while loop.

Replicates the bench buckets' inertia workload — B halos x K candidates,
C mixed configs, realistic convergence spread (triaxial NFW-ish clouds) —
and times `inertia_tensor_multi` under both SOAP_TPU_PALLAS_INERTIA=1
and =0 at several (B, K) bucket shapes.

Usage: python tools/bench_inertia.py [B,K ...]   (default bench shapes)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    return dt, np.asarray(out)


def main():
    shapes = [(1024, 5120), (512, 12288), (256, 24576), (128, 65536)]
    if len(sys.argv) > 1:
        shapes = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]
    for B, K in shapes:
        pos, w, masks, R, red, it = make_workload(B, K)
        t_x, out_x = run("0", pos, w, masks, R, red, it)
        t_p, out_p = run("1", pos, w, masks, R, red, it)
        scale = np.abs(out_x).max() + 1e-30
        err = np.abs(out_p - out_x).max() / scale
        print(
            f"B={B:5d} K={K:6d}: xla {t_x*1e3:8.1f} ms  "
            f"pallas {t_p*1e3:8.1f} ms  ({t_x/t_p:5.2f}x)  relerr {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
