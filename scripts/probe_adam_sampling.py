"""Probe: optax.adam vs hand-fused Adam; sampling sub-costs. Real chip."""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (  # noqa: E402
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.sampling import (  # noqa: E402
    DeviceCSR, row_contains, sample_negatives_uniform, sample_positives)


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
    U, I, D = 58_867, 261_728, 64
    params = {"user_emb": jnp.asarray(rng.standard_normal((U, D)), jnp.float32),
              "item_emb": jnp.asarray(rng.standard_normal((I, D)), jnp.float32)}
    grads = jax.tree.map(lambda x: x * 0.01, params)

    # optax adam, threaded as loop carry
    opt = optax.adam(1e-3)
    ost = opt.init(params)

    def body_optax(k, carry):
        p, o = carry
        u, o = opt.update(jax.tree.map(lambda g: g * (1 + 1e-30 * k), grads),
                          o, p)
        return optax.apply_updates(p, u), o
    t = device_loop_time(body_optax, (params, ost))
    print(f"optax.adam update        : {t*1e3:7.3f} ms")

    # hand-fused adam (no bias-correction tree ops beyond scalars)
    def body_fused(k, carry):
        p, m, v, step = carry
        step = step + 1
        b1, b2, lr, eps = 0.9, 0.999, 1e-3, 1e-8
        bc1 = 1 - b1 ** step
        bc2 = 1 - b2 ** step
        new_p, new_m, new_v = {}, {}, {}
        for key in p:
            g = grads[key] * (1 + 1e-30 * k)
            m2 = b1 * m[key] + (1 - b1) * g
            v2 = b2 * v[key] + (1 - b2) * g * g
            upd = lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            new_p[key] = p[key] - upd
            new_m[key] = m2
            new_v[key] = v2
        return new_p, new_m, new_v, step
    zeros = jax.tree.map(jnp.zeros_like, params)
    t = device_loop_time(body_fused, (params, zeros, zeros,
                                      jnp.zeros((), jnp.float32)))
    print(f"hand-fused adam          : {t*1e3:7.3f} ms")

    # ------------------------------------------------------------- sampling
    graph = synthetic_bipartite_graph(U, I, 7.9, seed=0, power=1.0)
    csr = DeviceCSR.from_host(graph.user_csr("train"), I)
    print(f"csr search_iters={csr.search_iters}")
    B = 4096
    users = jnp.asarray(rng.integers(0, U, B), jnp.int32)

    def body_pos(k, carry):
        key, acc = carry
        key, kp = jax.random.split(key)
        return key, acc + sample_positives(kp, csr, users)
    t = device_loop_time(body_pos, (jax.random.PRNGKey(0),
                                    jnp.zeros((B,), jnp.int32)))
    print(f"sample_positives         : {t*1e3:7.3f} ms")

    def body_neg(k, carry):
        key, acc = carry
        key, kn = jax.random.split(key)
        return key, acc + sample_negatives_uniform(kn, csr, users, I, rounds=8)
    t = device_loop_time(body_neg, (jax.random.PRNGKey(0),
                                    jnp.zeros((B,), jnp.int32)))
    print(f"sample_negatives (8 rnd) : {t*1e3:7.3f} ms")

    # row_contains alone on (B, 8)
    cand = jnp.asarray(rng.integers(0, I, (B, 8)), jnp.int32)

    def body_rc(k, carry):
        return carry + row_contains(csr, users, cand + k % 2).sum()
    t = device_loop_time(body_rc, jnp.zeros((), jnp.int32))
    print(f"row_contains (B,8)       : {t*1e3:7.3f} ms")

    # randint draw alone
    def body_draw(k, carry):
        key, acc = carry
        key, kd = jax.random.split(key)
        return key, acc + jax.random.randint(kd, (B, 9), 0, I).sum()
    t = device_loop_time(body_draw, (jax.random.PRNGKey(0),
                                     jnp.zeros((), jnp.int32)))
    print(f"randint (B,9)            : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
