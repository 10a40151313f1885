"""Probe: element-gather rates, sample_positives sub-pieces, slab hash membership."""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (  # noqa: E402
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.sampling import (  # noqa: E402
    DeviceCSR, row_contains, sample_positives)


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
    U, I = 58_867, 261_728
    B = 4096

    # ---- raw element-gather rates: y = tab[idx]
    for tab_n, nidx in ((360_207, 4096), (360_207, 32_768), (59_000, 4096),
                        (1_048_576, 32_768)):
        tab = jnp.asarray(rng.integers(0, 1000, tab_n), jnp.int32)
        idx = jnp.asarray(rng.integers(0, tab_n, nidx), jnp.int32)

        def body(k, carry):
            return carry + tab[(idx + k) % tab_n].sum()
        t = device_loop_time(body, jnp.zeros((), jnp.int32))
        print(f"elem gather tab={tab_n:>9,} n={nidx:>6,}: {t*1e3:7.3f} ms "
              f"({t/nidx*1e9:6.1f} ns/elt)")

    # ---- slab gather: tab2[(n,2)] with slice (P,2)
    P = 8
    size = 1_048_576
    tab2 = jnp.asarray(rng.integers(0, 1000, (size + P, 2)), jnp.int32)
    for nidx in (4096, 32_768):
        s0 = jnp.asarray(rng.integers(0, size, nidx), jnp.int32)

        def body(k, carry):
            slab = tab2[((s0 + k) % size)[:, None] + jnp.arange(P)]  # (n,P,2)
            return carry + slab.sum()
        t = device_loop_time(body, jnp.zeros((), jnp.int32))
        print(f"slab gather (P={P},2) n={nidx:>6,}: {t*1e3:7.3f} ms "
              f"({t/nidx*1e9:6.1f} ns/slab)")

    # ---- sample_positives sub-pieces
    graph = synthetic_bipartite_graph(U, I, 7.9, seed=0, power=1.0)
    host_csr = graph.user_csr("train")
    csr = DeviceCSR.from_host(host_csr, I)
    users = jnp.asarray(rng.integers(0, U, B), jnp.int32)

    def body_lo(k, carry):
        return carry + csr.indptr[(users + k) % U].sum()
    t = device_loop_time(body_lo, jnp.zeros((), jnp.int32))
    print(f"indptr[rows] (B,)           : {t*1e3:7.3f} ms")

    def body_pos(k, carry):
        key, acc = carry
        key, kp = jax.random.split(key)
        return key, acc + sample_positives(kp, csr, users)
    t = device_loop_time(body_pos, (jax.random.PRNGKey(0),
                                    jnp.zeros((B,), jnp.int32)))
    print(f"sample_positives            : {t*1e3:7.3f} ms")

    # positives without the randint (fixed offset)
    def body_pos2(k, carry):
        lo = csr.indptr[users]
        deg = csr.indptr[users + 1] - lo
        off = k % jnp.maximum(deg, 1)
        return carry + csr.indices[jnp.clip(lo + off, 0,
                                            csr.indices.shape[0] - 1)]
    t = device_loop_time(body_pos2, jnp.zeros((B,), jnp.int32))
    print(f"positives no-rng            : {t*1e3:7.3f} ms")

    # ---- exact slab-hash membership vs binary search
    E = host_csr.nnz
    mask = size - 1
    eu = np.repeat(np.arange(U, dtype=np.int64),
                   np.diff(host_csr.indptr).astype(np.int64))
    ei = host_csr.indices.astype(np.int64)

    C1, C2, C3 = np.uint32(0x85ebca6b), np.uint32(0xc2b2ae35), np.uint32(0x27d4eb2f)

    def h32_np(u, i):
        x = (u.astype(np.uint32) * C1) ^ (i.astype(np.uint32) * C2)
        x = x ^ (x >> np.uint32(15))
        x = x * C3
        x = x ^ (x >> np.uint32(13))
        return (x & np.uint32(mask)).astype(np.int64)

    home = h32_np(eu, ei)
    order = np.argsort(home, kind="stable")
    hs = home[order]
    # parking-function vectorized linear probing: pos[i] = max(hs[i],
    # pos[i-1]+1) == running max of (hs - arange) + arange
    pos = np.maximum.accumulate(hs - np.arange(E)) + np.arange(E)
    maxprobe = int((pos - hs).max())
    print(f"slab hash: load={E/size:.3f} maxprobe={maxprobe}")
    P = maxprobe + 1
    tabsz = size + maxprobe
    tab = np.full((tabsz, 2), -1, np.int32)
    tab[pos, 0] = eu[order]
    tab[pos, 1] = ei[order]
    dtab = jnp.asarray(tab)

    def h32_j(u, i):
        x = (u.astype(jnp.uint32) * C1) ^ (i.astype(jnp.uint32) * C2)
        x = x ^ (x >> 15)
        x = x * C3
        x = x ^ (x >> 13)
        return (x & jnp.uint32(mask)).astype(jnp.int32)

    def hash_contains(rows, cands):
        s0 = h32_j(rows[:, None].astype(jnp.int32), cands)        # (B,n)
        slab = dtab[s0[..., None] + jnp.arange(P)]                # (B,n,P,2)
        hit = (slab[..., 0] == rows[:, None, None]) & (
            slab[..., 1] == cands[..., None])
        return hit.any(axis=-1)

    for ncand in (2, 8, 32):
        cand = jnp.asarray(rng.integers(0, I, (B, ncand)), jnp.int32)

        def body_hc(k, carry):
            return carry + hash_contains(users, cand + k % 2).sum()
        t = device_loop_time(body_hc, jnp.zeros((), jnp.int32))
        print(f"hash_contains (B,{ncand:2d}) P={P}  : {t*1e3:7.3f} ms")

    # correctness: vs binary search on random candidates + true members
    cand = jnp.asarray(rng.integers(0, I, (B, 8)), jnp.int32)
    a = np.asarray(row_contains(csr, users, cand))
    b = np.asarray(hash_contains(users, cand))
    print(f"random agreement: {(a == b).all()} (members present: {a.sum()})")
    posx = sample_positives(jax.random.PRNGKey(1), csr, users)
    deg = np.diff(host_csr.indptr)[np.asarray(users)]
    memb = np.asarray(hash_contains(users, posx[:, None]))[:, 0]
    print(f"members found: {bool(memb[deg > 0].all())}")


if __name__ == "__main__":
    main()
