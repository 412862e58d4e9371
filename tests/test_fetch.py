"""utils.fetch.device_fetch_tree: fused single-transfer pytree fetch."""

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from druglamp_tpu.utils.fetch import device_fetch_tree


def test_device_fetch_tree_matches_per_leaf():
    r = np.random.RandomState(0)
    tree = {
        "f32": jnp.asarray(r.randn(7, 3).astype(np.float32)),
        "bf16": jnp.asarray(r.randn(5, 2).astype(ml_dtypes.bfloat16)),
        "i32": jnp.asarray(r.randint(-9, 9, (4,)).astype(np.int32)),
        "i8": jnp.asarray(r.randint(-9, 9, (6,)).astype(np.int8)),
        "u8": jnp.asarray(r.randint(0, 255, (3, 3)).astype(np.uint8)),
        "bool": jnp.asarray(r.rand(5) > 0.5),
        "scalar": jnp.float32(3.25),
        "nested": {"a": jnp.arange(5, dtype=jnp.uint32),
                   "none": None},
    }
    got = device_fetch_tree(tree)
    want = jax.tree.map(np.asarray, tree)
    flat_g, def_g = jax.tree.flatten(got)
    flat_w, def_w = jax.tree.flatten(want)
    assert def_g == def_w
    for g, w in zip(flat_g, flat_w):
        assert g.dtype == w.dtype
        assert g.shape == w.shape
        np.testing.assert_array_equal(g, w)


def test_device_fetch_tree_train_state_shape():
    """The real consumer: a TrainState-like tree incl. optimizer namedtuples."""
    import optax

    from druglamp_tpu.train.state import TrainState

    params = {"w": jnp.asarray(np.random.randn(8, 4).astype(np.float32)),
              "b": jnp.zeros((4,), jnp.float32)}
    state = TrainState.create({"params": params, "batch_stats": {}},
                              use_ssl=False, use_cm=False)
    tree = {"params": state.params, "opt_cls": state.opt_cls,
            "step": state.step}
    got = device_fetch_tree(tree)
    want = jax.tree.map(np.asarray, tree)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(g, w)


def test_device_fetch_empty_tree():
    assert device_fetch_tree({}) == {}
