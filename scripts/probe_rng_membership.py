"""Probe: RBG vs threefry PRNG; membership-test alternatives. Real chip."""
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
    U, I = 58_867, 261_728
    B = 4096

    # ---- RNG impls: randint (B,9)
    for impl in ("threefry2x32", "rbg"):
        key0 = jax.random.key(0, impl=impl)

        def body_draw(k, carry):
            key, acc = carry
            key, kd = jax.random.split(key)
            return key, acc + jax.random.randint(kd, (B, 9), 0, I).sum()
        t = device_loop_time(body_draw, (key0, jnp.zeros((), jnp.int32)))
        print(f"randint (B,9) [{impl:12s}] : {t*1e3:7.3f} ms")

    graph = synthetic_bipartite_graph(U, I, 7.9, seed=0, power=1.0)
    host_csr = graph.user_csr("train")
    csr = DeviceCSR.from_host(host_csr, I)
    users = jnp.asarray(rng.integers(0, U, B), jnp.int32)

    # ---- full samplers with rbg keys
    for impl in ("threefry2x32", "rbg"):
        key0 = jax.random.key(0, impl=impl)

        def body_pn(k, carry):
            key, acc = carry
            key, kp, kn = jax.random.split(key, 3)
            pos = sample_positives(kp, csr, users)
            neg = sample_negatives_uniform(kn, csr, users, I, rounds=8)
            return key, acc + pos + neg
        t = device_loop_time(body_pn, (key0, jnp.zeros((B,), jnp.int32)))
        print(f"pos+neg(8)    [{impl:12s}] : {t*1e3:7.3f} ms")

    # ---- row_contains cost vs candidate count and search depth
    for ncand in (2, 8, 32):
        cand = jnp.asarray(rng.integers(0, I, (B, ncand)), jnp.int32)

        def body_rc(k, carry):
            return carry + row_contains(csr, users, cand + k % 2).sum()
        t = device_loop_time(body_rc, jnp.zeros((), jnp.int32))
        print(f"row_contains (B,{ncand:2d})       : {t*1e3:7.3f} ms")

    # ---- hash-set membership: open addressing, power-of-2 table,
    # key = user*I + item packed int64? use two int32 tables (u, i).
    E = host_csr.nnz
    size = 1 << int(np.ceil(np.log2(max(E * 2, 16))))
    mask = size - 1
    eu = np.repeat(np.arange(U, dtype=np.int64),
                   np.diff(host_csr.indptr).astype(np.int64))
    ei = host_csr.indices.astype(np.int64)
    keyv = eu * I + ei

    def h(x):
        x = (x ^ (x >> 33)) * 0xff51afd7ed558ccd
        x = (x ^ (x >> 33)) * 0xc4ceb9fe1a85ec53
        return (x ^ (x >> 33)) & mask

    slot = h(keyv).astype(np.int64)
    table = np.full(size, -1, np.int64)
    maxprobe = 0
    order = np.argsort(slot, kind="stable")
    for idx in order:
        s = int(slot[idx]); p = 0
        while table[s] != -1:
            s = (s + 1) & mask; p += 1
        table[s] = keyv[idx]
        maxprobe = max(maxprobe, p)
    print(f"hash table: size={size} load={E/size:.2f} maxprobe={maxprobe}")

    tu = jnp.asarray((table // I).astype(np.int32))
    ti = jnp.asarray((table % I).astype(np.int32))
    tvalid = jnp.asarray(table != -1)
    P = maxprobe + 1

    MULT1 = np.uint32(0x85ebca6b)
    MULT2 = np.uint32(0xc2b2ae35)

    def h32(u, i):
        # 32-bit mix of (u, i) — matches nothing above; rebuild table for it
        x = (u.astype(jnp.uint32) * MULT1) ^ (i.astype(jnp.uint32) * MULT2)
        x = x ^ (x >> 16)
        x = x * MULT1
        x = x ^ (x >> 13)
        return (x & jnp.uint32(mask)).astype(jnp.int32)

    # rebuild host table with the same 32-bit hash for honesty
    uu = eu.astype(np.uint32) * np.uint32(0x85ebca6b)
    ii = ei.astype(np.uint32) * np.uint32(0xc2b2ae35)
    x = uu ^ ii
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85ebca6b)
    x = x ^ (x >> np.uint32(13))
    slot32 = (x & np.uint32(mask)).astype(np.int64)
    table_u = np.full(size, -1, np.int32)
    table_i = np.full(size, -1, np.int32)
    maxprobe32 = 0
    order = np.argsort(slot32, kind="stable")
    for idx in order:
        s = int(slot32[idx]); p = 0
        while table_u[s] != -1:
            s = (s + 1) & mask; p += 1
        table_u[s] = eu[idx]
        table_i[s] = ei[idx]
        maxprobe32 = max(maxprobe32, p)
    print(f"hash table32: load={E/size:.2f} maxprobe={maxprobe32}")
    tu = jnp.asarray(table_u)
    ti = jnp.asarray(table_i)
    P = maxprobe32 + 1

    def hash_contains(rows, cands):
        r = rows[:, None].astype(jnp.int32)
        c = cands
        s0 = h32(r, c)
        found = jnp.zeros(c.shape, bool)
        for p in range(P):
            s = (s0 + p) & mask
            hit = (tu[s] == r) & (ti[s] == c)
            found = found | hit
        return found

    for ncand in (8,):
        cand = jnp.asarray(rng.integers(0, I, (B, ncand)), jnp.int32)

        def body_hc(k, carry):
            return carry + hash_contains(users, cand + k % 2).sum()
        t = device_loop_time(body_hc, jnp.zeros((), jnp.int32))
        print(f"hash_contains (B,{ncand}) P={P}  : {t*1e3:7.3f} ms")

    # sanity: hash vs binary search agreement
    cand = jnp.asarray(rng.integers(0, I, (B, 8)), jnp.int32)
    a = np.asarray(row_contains(csr, users, cand))
    b = np.asarray(hash_contains(users, cand))
    print(f"agreement: {(a == b).all()}  (positives present: {a.sum()})")

    # also verify on actual members
    pos = sample_positives(jax.random.key(1), csr, users)
    deg = np.diff(host_csr.indptr)[np.asarray(users)]
    memb = np.asarray(hash_contains(users, pos[:, None]))[:, 0]
    ok = memb[deg > 0].all()
    print(f"members found: {bool(ok)}")


if __name__ == "__main__":
    main()
