"""Training-stack tests: train step descends, EMA updates, checkpoint
round trip, schedules, lossy train step, config overrides."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.models.resnet_vae import BidirectionalResNetVAE, ResNetVAEConfig
from rec_tpu.train import (CheckpointManager, ema_update, init_state,
                           make_optimizer, staircase_schedule)
from rec_tpu.train.lossless import (LosslessTrainConfig, check_finite,
                                    make_train_step)


@pytest.fixture(scope="module")
def setup():
    cfg = ResNetVAEConfig(num_res_blocks=2, deterministic_filters=12,
                          stochastic_filters=4)
    model = BidirectionalResNetVAE(cfg=cfg, coder=None)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 3) - 0.5,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    tx = make_optimizer("adamax", staircase_schedule(1e-3, 1000, 0.5))
    state = init_state(params, tx, beta=1.0)
    step = make_train_step(model, LosslessTrainConfig(lamb=0.1), tx,
                           num_pixels=256)
    return model, tx, state, step, x


def _fresh(state):
    # The jitted step donates its input state; tests sharing the fixture
    # must work on copies.
    return jax.tree_util.tree_map(jnp.copy, state)


def test_loss_decreases(setup):
    _, _, state, step, x = setup
    state = _fresh(state)
    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(30):
        state, m = step(state, x, jax.random.fold_in(key, i))
        check_finite(m)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30


def test_staircase_schedule():
    s = staircase_schedule(1e-3, 100, 0.5, num_drops=4)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(150)) == pytest.approx(5e-4)
    assert float(s(450)) == pytest.approx(1e-3 * 0.5 ** 4)
    assert float(s(10_000)) == pytest.approx(1e-3 * 0.5 ** 4)  # capped


def test_ema_moves_toward_params():
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_checkpoint_roundtrip(setup, tmp_path):
    _, _, state, step, x = setup
    state2, _ = step(_fresh(state), x, jax.random.PRNGKey(1))
    mgr = CheckpointManager(os.path.join(tmp_path, "ckpt"))
    mgr.save(jax.device_get(state2))
    restored = mgr.restore(jax.device_get(state2))
    assert restored is not None
    assert int(restored.step) == int(state2.step)
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


@pytest.mark.slow
def test_lossy_train_step():
    from rec_tpu.models.lossy import Large1LevelVAE
    from rec_tpu.train.lossy import LossyTrainConfig
    from rec_tpu.train.lossy import make_train_step as make_lossy_step

    model = Large1LevelVAE(num_filters=8)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    tx = make_optimizer("adam", staircase_schedule(1e-4, 10 ** 6, 1.0))
    state = init_state(params, tx, beta=0.01)
    step = make_lossy_step(model, LossyTrainConfig(beta=0.01), tx,
                           num_pixels=1024)
    for i in range(3):
        state, m = step(state, x, jax.random.PRNGKey(i))
    assert np.isfinite(float(m["loss"]))


def test_config_overrides():
    from rec_tpu.utils.config import apply_overrides
    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class Inner:
        a: int = 1

    @dataclasses.dataclass(frozen=True)
    class Outer:
        inner: Inner = dataclasses.field(default_factory=Inner)
        lr: float = 1e-3
        name: str = "x"

    cfg = apply_overrides(Outer(), ["lr=5e-4", "inner.a=7", "name=hello",
                                    "with"])
    assert cfg.lr == 5e-4 and cfg.inner.a == 7 and cfg.name == "hello"
    with pytest.raises(KeyError):
        apply_overrides(Outer(), ["bogus=1"])


def test_metrics_include_observability_fields(setup):
    """Per-block KL scalars, expected_max_kl, and the reconstruction for
    image summaries (ref train_generative_model.py:458-506)."""
    _, _, state, step, x = setup
    state = _fresh(state)
    _, m = step(state, x, jax.random.PRNGKey(3))
    assert m["kl_per_block"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(m["kl_per_block"])))
    assert float(m["expected_max_kl"]) >= 0.0
    assert m["reconstruction"].shape == x.shape


def test_vae_train_step_descends():
    """make_vae_train_step (model=vae branch, ref :55-68,240-294)."""
    from rec_tpu.models.mnist_vae import MNISTVAE
    from rec_tpu.train.lossless import make_vae_train_step

    model = MNISTVAE(latents=8, hidden_size=16)
    x = jnp.asarray(np.random.RandomState(1).rand(8, 28, 28, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    tx = make_optimizer("adam", staircase_schedule(3e-4, 1000, 0.5))
    state = init_state(params, tx, beta=1.0)
    step = make_vae_train_step(model, LosslessTrainConfig(lamb=0.0), tx,
                               num_pixels=784)
    losses = []
    key = jax.random.PRNGKey(9)
    for i in range(25):
        state, m = step(state, x, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert m["kl_per_block"].shape == (8,)
    assert m["reconstruction"].shape == x.shape


class TestModelConfigPersistence:
    """save/load/reconcile of the trained-architecture record
    (train/checkpoint.py): a laplace-trained checkpoint must not evaluate
    as discretized_logistic just because the param trees match."""

    def test_reconcile_overrides_and_warns(self, tmp_path, capsys):
        import dataclasses

        from rec_tpu.models.large_resnet_vae import LargeResNetVAEConfig
        from rec_tpu.train import (load_model_config, reconcile_model_config,
                                   save_model_config)

        trained = LargeResNetVAEConfig(likelihood="laplace",
                                       first_stochastic_filters=64)
        save_model_config(str(tmp_path), "large_resnet_vae", trained)
        saved = load_model_config(str(tmp_path))
        assert saved["kind"] == "large_resnet_vae"
        assert saved["cfg"]["likelihood"] == "laplace"

        requested = LargeResNetVAEConfig(likelihood="discretized_logistic")
        fixed = reconcile_model_config(str(tmp_path), "large_resnet_vae",
                                       requested)
        assert fixed.likelihood == "laplace"
        assert fixed.first_stochastic_filters == 64
        # tuple fields survive the JSON round trip
        assert fixed.kernel_size == (3, 3)
        assert "overriding" in capsys.readouterr().out

    def test_reconcile_noop_without_record_or_other_kind(self, tmp_path):
        from rec_tpu.models.resnet_vae import ResNetVAEConfig
        from rec_tpu.train import reconcile_model_config, save_model_config

        cfg = ResNetVAEConfig()
        assert reconcile_model_config(str(tmp_path), "resnet_vae",
                                      cfg) == cfg
        save_model_config(str(tmp_path), "large_resnet_vae",
                          {"level_1_filters": 7})
        assert reconcile_model_config(str(tmp_path), "resnet_vae",
                                      cfg) == cfg

    def test_dict_config_round_trip(self, tmp_path):
        from rec_tpu.train import load_model_config, save_model_config

        save_model_config(str(tmp_path), "large_level_2_vae",
                          {"level_1_filters": 196, "loss_fn": "mse",
                           "beta": 0.01})
        saved = load_model_config(str(tmp_path))
        assert saved["cfg"]["level_1_filters"] == 196


def test_restore_params_ignores_optimizer_structure(tmp_path):
    """Eval restore must survive a checkpoint written with a DIFFERENT
    optimizer tree (e.g. training added gradient clipping, which wraps
    opt_state in an optax.chain level) — the exact failure that broke
    compression_performance on the clipped h512 checkpoint."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rec_tpu.train import (CheckpointManager, init_state, make_optimizer,
                               staircase_schedule)

    params = {"params": {"w": jnp.arange(4.0), "b": jnp.ones(())}}
    tx = make_optimizer("adam", staircase_schedule(1e-3, 100, 0.5),
                        clip_norm=1.0)
    state = init_state(params, tx, beta=1.0)
    state = state.replace(step=jnp.asarray(7, jnp.int32)) \
        if hasattr(state, "replace") else state._replace(
            step=jnp.asarray(7, jnp.int32))
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(state)

    restored = ckpt.restore_params(params)
    assert restored is not None and restored["step"] == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["params"]["w"]),
                                  np.arange(4.0))
    np.testing.assert_array_equal(
        np.asarray(restored["ema_params"]["params"]["b"]), 1.0)
