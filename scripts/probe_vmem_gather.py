"""Probe: tpu.dynamic_gather throughput inside a Pallas TPU kernel.

Mosaic lowers ``jnp.take_along_axis(x, idx, axis=0)`` with x/idx/out all
shaped (S, D) to a per-lane VMEM gather.  If it runs at ~VPU speed, the
SpMM can gather source rows from VMEM-resident slabs instead of paying
XLA's ~7.4 ns/row HBM gather.
"""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 64
G = 64   # grid steps per call


def probe(S):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    # row gather: idx broadcast across lanes
    idx_rows = jnp.asarray(rng.integers(0, S, (1, G * S)), jnp.int32)

    def kernel(x_ref, idx_ref, out_ref):
        idx = idx_ref[0, :]                       # (S,)
        idx2d = jnp.broadcast_to(idx[:, None], (S, D))
        out_ref[:] = jnp.take_along_axis(x_ref[:], idx2d, axis=0)

    def call(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((S, D), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S), lambda g: (0, g), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, D), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * S, D), jnp.float32),
        )(x, idx)

    f = jax.jit(lambda x, idx: lax.fori_loop(
        0, 10, lambda i, a: a + call(x, (idx + i) % S),
        jnp.zeros((G * S, D), jnp.float32)))
    out = f(x, idx_rows)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(x, idx_rows)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    rows = G * S
    # subtract nothing; out write is part of real usage
    print(f"S={S:6d}: {dt*1e3:7.3f} ms/call  {dt/rows*1e9:6.3f} ns/row "
          f"({rows} rows incl. out write)")
    single = jax.jit(call)(x, idx_rows)
    ref = np.asarray(x)[np.asarray(idx_rows).ravel()]
    np.testing.assert_allclose(np.asarray(single), ref, rtol=1e-6)
    print(f"S={S:6d}: correct")


if __name__ == "__main__":
    for S in (2048, 8192, 16384):
        try:
            probe(S)
        except Exception as e:
            print(f"S={S}: FAILED: {type(e).__name__}: "
                  + str(e).split(chr(10))[0][:180])
