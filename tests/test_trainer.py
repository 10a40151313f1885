"""End-to-end Stage-B training on a small synthetic graph."""

import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import get_preset
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import RecTrainer


@pytest.fixture(scope="module")
def train_graph():
    # Dense enough that every user has train interactions and signal exists.
    return synthetic_bipartite_graph(num_users=150, num_items=80,
                                     edges_per_user=20.0, seed=3, power=0.6)


def _mk(cfg, graph, cred=None, **kw):
    cfg = cfg.replace(batch_size=64, eval_every=1, sampled_negatives=20,
                      Ks=(5, 10), **kw)
    return RecTrainer(cfg, graph, cred=cred, verbose=False)


def test_vanilla_learns(train_graph):
    tr = _mk(get_preset("vanilla"), train_graph)
    params, _, key = tr.init_state()
    before = tr.evaluate(params, "val")[10]["recall"]
    res = tr.fit(epochs=25)
    assert res.best_val_recall > before + 0.05, (before, res.best_val_recall)
    assert np.isfinite(res.history[-1].loss)
    # loss decreased over training
    assert res.history[-1].loss < res.history[0].loss


@pytest.mark.parametrize("preset", ["cred_eq322", "cu_message", "degree_aware",
                                    "pop_neg"])
def test_variant_one_epoch_runs(train_graph, preset):
    cred = np.random.default_rng(0).uniform(0.1, 1.0,
                                            train_graph.num_users).astype(np.float32)
    tr = _mk(get_preset(preset), train_graph, cred=cred)
    res = tr.fit(epochs=2)
    assert np.isfinite(res.history[-1].loss)
    assert 0.0 <= res.test_metrics[10]["recall"] <= 1.0


def test_fairness_term_changes_loss(train_graph):
    cfg = get_preset("cred_eq322").replace(batch_size=64, lambda_fair=0.0)
    cfg2 = cfg.replace(lambda_fair=1.0)
    t1 = RecTrainer(cfg, train_graph, verbose=False)
    t2 = RecTrainer(cfg2, train_graph, verbose=False)
    r1 = t1.fit(epochs=1)
    r2 = t2.fit(epochs=1)
    assert abs(r1.history[0].loss - r2.history[0].loss) > 1e-6


def test_full_eval_mode(train_graph):
    tr = _mk(get_preset("vanilla"), train_graph, eval_mode="full")
    res = tr.fit(epochs=2)
    assert res.test_metrics[10]["mode"] == "full"
    assert 0.0 <= res.test_metrics[10]["recall"] <= 1.0


def test_extended_metrics(train_graph):
    cred = np.random.default_rng(1).uniform(0, 1, train_graph.num_users).astype(np.float32)
    tr = _mk(get_preset("pop_extended"), train_graph, cred=cred)
    res = tr.fit(epochs=2)
    m = res.test_metrics[10]
    for k in ("item_coverage", "avg_log_popularity", "avg_self_information",
              "cred_utility", "high_cred_recall", "low_cred_recall"):
        assert k in m, k
    assert 0.0 < m["item_coverage"] <= 1.0
    assert abs(m["cred_utility"] - float(np.mean(
        cred[tr.ctx.eval_users["test"]]))) < 1e-5


def test_per_epoch_schedule_close_to_per_batch(train_graph):
    """Fast mode (cached propagation + live ego term) must actually LEARN —
    guards the gradient path (a cached-constant propagation would silently
    reduce BPR to zero gradient)."""
    tr_fast = _mk(get_preset("vanilla"), train_graph,
                  propagation_schedule="per_epoch")
    res_fast = tr_fast.fit(epochs=25)
    tr_ref = _mk(get_preset("vanilla"), train_graph)
    res_ref = tr_ref.fit(epochs=25)
    assert res_fast.best_val_recall > 0.5 * res_ref.best_val_recall, (
        res_fast.best_val_recall, res_ref.best_val_recall)
    # the zero-gradient guard: with a cached-constant propagation the BPR
    # term is exactly log(2) ~= 0.69315 forever (only the tiny L2 term
    # moves); the live-ego path must pull it measurably below that
    assert res_fast.history[-1].loss < 0.692, res_fast.history[-1].loss
    assert res_fast.history[-1].loss < res_fast.history[0].loss - 5e-4


def test_determinism_same_seed(train_graph):
    t1 = _mk(get_preset("vanilla"), train_graph)
    t2 = _mk(get_preset("vanilla"), train_graph)
    r1 = t1.fit(epochs=3)
    r2 = t2.fit(epochs=3)
    assert r1.history[-1].loss == pytest.approx(r2.history[-1].loss, abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(list(r1.best_params.values())[0]),
        np.asarray(list(r2.best_params.values())[0]), atol=1e-6)


def test_fit_writes_metrics_jsonl(train_graph, tmp_path):
    """SURVEY §5 / VERDICT r2 weak-6: fit() with out_dir set leaves a
    machine-readable metrics.jsonl alongside the human lines."""
    import json
    tr = _mk(get_preset("vanilla"), train_graph,
             out_dir=str(tmp_path), save_best=False)
    tr.fit(epochs=3)
    lines = [json.loads(ln) for ln in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    epochs = [r for r in lines if r["event"] == "epoch"]
    tests = [r for r in lines if r["event"] == "test"]
    assert len(epochs) == 3 and len(tests) == 1
    assert all("loss" in r and "seconds" in r for r in epochs)
    assert "val" in epochs[-1] and "recall" in epochs[-1]["val"]["10"]
    assert "recall" in tests[0]["test"]["10"]


def test_checkpoint_resume(train_graph, tmp_path):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.checkpoint import (
        TrainCheckpointer)
    tr = _mk(get_preset("vanilla"), train_graph)
    ck = TrainCheckpointer(tmp_path / "ck")
    tr.fit(epochs=3, checkpointer=ck)
    assert ck.latest_step() == 3
    tr2 = _mk(get_preset("vanilla"), train_graph)
    res = tr2.fit(epochs=5, checkpointer=TrainCheckpointer(tmp_path / "ck"),
                  resume=True)
    assert res.history[0].epoch == 4
    assert res.history[-1].epoch == 5


def test_empty_eval_split_raises():
    """Reference raises on empty splits (lightgcn.py:410,469,549)."""
    import jax.numpy as jnp
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.ranking import (
        EvalContext, evaluate_sampled)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import BipartiteGraph
    import jax
    g = BipartiteGraph(
        num_users=4, num_items=4,
        train_edges=np.array([[0, 1], [0, 1]], np.int32),
        val_edges=np.zeros((2, 0), np.int32),
        test_edges=np.zeros((2, 0), np.int32))
    ctx = EvalContext.build(g)
    ue = jnp.zeros((4, 4)); ie = jnp.zeros((4, 4))
    with pytest.raises(RuntimeError, match="No users"):
        evaluate_sampled(jax.random.PRNGKey(0), ue, ie, ctx, "test")


def test_checkpoint_retention_and_cadence(tmp_path):
    """VERDICT item 6: keep-last-N + every-M cadence — a long run leaves at
    most N checkpoint dirs; skipped epochs return False."""
    import jax
    import jax.numpy as jnp
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.checkpoint import (
        TrainCheckpointer)

    ck = TrainCheckpointer(tmp_path / "ck", keep=3, every=2)
    saved = []
    for epoch in range(1, 11):
        state = {"params": {"w": jnp.ones((4, 2)) * epoch}, "epoch": epoch}
        if ck.save(epoch, state):
            saved.append(epoch)
    ck.wait()
    # orbax always saves the first step, then every `every`
    assert saved == [1, 2, 4, 6, 8, 10]
    dirs = [p for p in (tmp_path / "ck").iterdir() if p.is_dir()]
    assert len(dirs) <= 3, sorted(p.name for p in dirs)
    assert ck.latest_step() == 10
    got = ck.restore(template={"params": {"w": jnp.zeros((4, 2))}, "epoch": 0})
    assert int(got["epoch"]) == 10
    ck.close()


def test_format_metrics_block_extended_without_cred(small_graph):
    """Advisor r3: extended results computed with cred=None lack the
    cred-group fields; the formatter must not KeyError."""
    import jax
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.ranking import (
        EvalContext, evaluate_full)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
        LightGCN, init_params)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        format_metrics_block)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        RecConfig)

    cfg = RecConfig(emb_dim=8, num_layers=1)
    model = LightGCN(cfg, small_graph)
    params = init_params(jax.random.PRNGKey(0), cfg, small_graph.num_users,
                         small_graph.num_items)
    ue, ie = model.propagate(params)
    ctx = EvalContext.build(small_graph)
    res = evaluate_full(ue, ie, ctx, "test", Ks=(5,), extended=True,
                        cred=None)
    block = format_metrics_block("TEST", res)
    assert "COV=" in block and "CredU=" not in block
