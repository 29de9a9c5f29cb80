"""TrainableBatchNorm (backbone norm_eval=False — from-scratch training):
batch statistics in train mode, running averages in eval, stats updated with
torch momentum 0.1, and checkpoint-compatible naming with FrozenBatchNorm."""

import numpy as np

import jax
import jax.numpy as jnp

from occnet_tpu.models.resnet import FrozenBatchNorm, TrainableBatchNorm


def test_trainable_bn_train_normalises_batch():
    rng = np.random.RandomState(0)
    x = jnp.asarray(50.0 + 10.0 * rng.randn(4, 8, 8, 16).astype(np.float32))
    bn = TrainableBatchNorm(16)
    vars0 = bn.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    y, mut = bn.apply(vars0, x, train=True, mutable=["batch_stats"])
    y = np.asarray(y).reshape(-1, 16)
    # normalised by the batch statistics: ~zero mean, unit var
    np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(y.var(0), 1.0, atol=1e-2)
    # running stats moved toward the batch stats by momentum 0.1
    m = np.asarray(mut["batch_stats"]["mean"])
    np.testing.assert_allclose(m, 0.1 * np.asarray(x).reshape(-1, 16).mean(0),
                               rtol=1e-4)


def test_trainable_bn_eval_uses_running_stats():
    x = jnp.asarray(np.full((2, 4, 4, 8), 7.0, np.float32))
    bn = TrainableBatchNorm(8)
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # init stats are mean 0 / var 1 -> eval output equals the input
    y = bn.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), 7.0, atol=1e-4)


def test_bn_param_names_match_frozen():
    x = jnp.zeros((1, 2, 2, 4))
    vf = FrozenBatchNorm(4).init({"params": jax.random.PRNGKey(0)}, x)
    vt = TrainableBatchNorm(4).init({"params": jax.random.PRNGKey(0)}, x,
                                    train=False)
    assert set(vf["params"]) == set(vt["params"]) == {"scale", "bias"}
    assert set(vf["batch_stats"]) == set(vt["batch_stats"]) == {"mean",
                                                                "var"}
