"""Multi-process worker for tests/test_multiprocess.py (not a test module).

Runs ONE process of an N-process jax.distributed CPU cluster (Gloo
cross-process collectives — the DCN analogue of a multi-host TPU pod,
SURVEY.md §5 "Distributed communication backend").  Each process owns 4
virtual CPU devices; the global (data, model) mesh spans all processes, so
the GSPMD train step's all-gathers/psums and the edge-sharded SpMM's
shard_map collectives genuinely cross process boundaries.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port>
Prints "[mp OK] pid=... loss=<x> spmm_err=<y>" on success.
"""

import os
import sys
from pathlib import Path

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU seat

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import jax.numpy as jnp
import numpy as np
import optax

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.operators import (
    build_edge_maps)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
    LightGCN, init_params)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.mesh import (
    make_mesh)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_spmm import (
    ShardedSpmmOperator)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharding import (
    make_sharded_train_step)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
    RecConfig)

n_global = len(jax.devices())
assert n_global == 4 * nproc, (n_global, nproc)
mesh = make_mesh(n_global)  # (data, model) spanning both processes

# identical inputs on every process (same seeds)
graph = synthetic_bipartite_graph(num_users=512, num_items=768,
                                  edges_per_user=16.0, seed=0, power=0.9)
cred = np.random.default_rng(0).uniform(0.2, 1.0,
                                        graph.num_users).astype(np.float32)
cfg = RecConfig(name="mp", propagation="gauss_seidel",
                weight_mode="cu_message", table_layout="split",
                emb_dim=32, num_layers=2, batch_size=64, spmm_backend="xla")
model = LightGCN(cfg, graph, cred)
params = init_params(jax.random.PRNGKey(0), cfg, graph.num_users,
                     graph.num_items)
optimizer = optax.adam(cfg.lr)
opt_state = optimizer.init(params)

# --- GSPMD train step over the cross-process mesh -------------------------
step, shard_state, jit_step = make_sharded_train_step(model, optimizer, mesh)
params, opt_state, p_shard, o_shard = shard_state(params, opt_state)
compiled = jit_step(p_shard, o_shard)

rng = np.random.default_rng(7)
loss = None
for t in range(3):
    users = jnp.asarray(rng.integers(0, graph.num_users, cfg.batch_size),
                        jnp.int32)
    pos = jnp.asarray(rng.integers(0, graph.num_items, cfg.batch_size),
                      jnp.int32)
    neg = jnp.asarray(rng.integers(0, graph.num_items, cfg.batch_size),
                      jnp.int32)
    params, opt_state, loss = compiled(params, opt_state, users, pos, neg)
loss = float(loss)  # replicated output: locally readable
assert np.isfinite(loss), loss

# --- edge-sharded SpMM (shard_map halo collectives) vs the XLA oracle -----
m_iu, _ = build_edge_maps(graph, "cu_message", cred=cred)
op = ShardedSpmmOperator(m_iu, mesh=mesh)
x = jnp.asarray(np.random.default_rng(3).normal(
    size=(graph.num_users, 32)).astype(np.float32))
y = jax.jit(op.apply)(x)
from jax.experimental import multihost_utils
y_local = np.asarray(multihost_utils.process_allgather(y, tiled=True))
y_local = y_local[:graph.num_items]
dense = np.zeros((graph.num_items, 32), np.float64)
np.add.at(dense, m_iu.dst,
          m_iu.w[:, None].astype(np.float64)
          * np.asarray(x, np.float64)[m_iu.src])
err = float(np.max(np.abs(np.asarray(y_local, np.float64) - dense)))
assert err < 1e-4, err

# --- the REAL trainer across the process boundary (VERDICT r4 item 5) ----
# Short RecTrainer.fit with the flagship combination: scanned epochs,
# epoch-hoisted popmix sampling, per_epoch cached propagation, full-catalog
# eval through the distributed top-k with the scaled_10m fast flags — all
# over the 2-process mesh, so the epoch scan's collectives, the eval
# merge, and the host-side metric accumulation (_Accumulator) genuinely
# run multi-controller.
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
    RecTrainer)

fit_cfg = RecConfig(name="mp_fit", propagation="gauss_seidel",
                    weight_mode="cu_message", table_layout="split",
                    negative_sampler="popmix", lambda_fair=0.1,
                    emb_dim=32, num_layers=2, batch_size=64, epochs=2,
                    eval_every=1, eval_mode="full", seed=0,
                    propagation_schedule="per_epoch",
                    eval_topk="approx", eval_score_dtype="bf16",
                    spmm_backend="xla")
trainer = RecTrainer(fit_cfg, graph, cred=cred, verbose=False, mesh=mesh)
fit = trainer.fit()
fit_losses = ",".join(f"{e.loss:.6f}" for e in fit.history)
r20 = fit.test_metrics[20]["recall"]
n20 = fit.test_metrics[20]["ndcg"]
assert all(np.isfinite(e.loss) for e in fit.history)

print(f"[mp OK] pid={pid} loss={loss:.6f} spmm_err={err:.2e} "
      f"fit_losses={fit_losses} testR20={r20:.6f} testN20={n20:.6f}",
      flush=True)
