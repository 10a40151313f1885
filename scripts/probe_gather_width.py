"""Probe: gather cost vs row width and index count; independent vs dependent."""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def device_loop_time(make_body, carry0, iters=20, reps=3):
    @jax.jit
    def run(carry):
        return lax.fori_loop(0, iters, make_body, carry)
    out = run(carry0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(carry0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    rng = np.random.default_rng(0)
    N = 360_207
    for n in (4096, 32_768):
        idx = jnp.asarray(rng.integers(0, N, n), jnp.int32)
        for width in (1, 2, 8, 32, 64, 128):
            tab = jnp.asarray(
                rng.integers(0, 1000, (N, width)), jnp.int32)

            def body(k, carry):
                return carry + tab[(idx + k) % N].sum()
            t = device_loop_time(body, jnp.zeros((), jnp.int32))
            print(f"gather n={n:>6,} width={width:>3} ({width*4:>4}B/row): "
                  f"{t*1e3:7.3f} ms ({t/n*1e9:7.1f} ns/row)")

    # 1-D table but take() along axis 0 vs fancy index — same?
    tab1 = jnp.asarray(rng.integers(0, 1000, N), jnp.int32)
    idx = jnp.asarray(rng.integers(0, N, 4096), jnp.int32)

    def body_take(k, carry):
        return carry + jnp.take(tab1, (idx + k) % N, axis=0,
                                indices_are_sorted=False,
                                unique_indices=False).sum()
    t = device_loop_time(body_take, jnp.zeros((), jnp.int32))
    print(f"jnp.take 1-D n=4096        : {t*1e3:7.3f} ms")

    # sorted indices hint
    sidx = jnp.sort(idx)

    def body_sorted(k, carry):
        return carry + jnp.take(tab1, sidx, axis=0,
                                indices_are_sorted=True).sum() + k * 0
    t = device_loop_time(body_sorted, jnp.zeros((), jnp.int32))
    print(f"jnp.take 1-D sorted hint   : {t*1e3:7.3f} ms")

    # one-hot matmul gather: onehot(B,N) @ tab — N too big; skip.

    # gather via 2-D reshaped table with width 1: (N,1)
    tab2 = tab1[:, None]

    def body_w1(k, carry):
        return carry + tab2[(idx + k) % N].sum()
    t = device_loop_time(body_w1, jnp.zeros((), jnp.int32))
    print(f"gather (N,1) table n=4096  : {t*1e3:7.3f} ms")

    # 8 independent element gathers in one body (no dependency)
    idxs = [jnp.asarray(rng.integers(0, N, 4096), jnp.int32) for _ in range(8)]

    def body_indep(k, carry):
        acc = carry
        for ix in idxs:
            acc = acc + tab1[(ix + k) % N].sum()
        return acc
    t = device_loop_time(body_indep, jnp.zeros((), jnp.int32))
    print(f"8 independent elem gathers : {t*1e3:7.3f} ms ({t/8*1e3:.3f} ea)")


if __name__ == "__main__":
    main()
