"""Orbax checkpoint round-trip."""
import jax
import numpy as np
import optax

from textgcn_tpu.models.gcn import gcn_init
from textgcn_tpu.train.checkpoint import restore_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    params = gcn_init(jax.random.PRNGKey(0), 10, 8, 3)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    path = save_checkpoint(
        str(tmp_path / "ckpt"), params, opt_state, metadata={"epoch": 7}
    )
    restored = restore_checkpoint(path)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["gc1"]["w"]),
        np.asarray(params["gc1"]["w"]),
    )
    assert int(restored["metadata"]["epoch"]) == 7
    # structure of opt state preserved
    flat_a = jax.tree_util.tree_leaves(restored["opt_state"])
    flat_b = jax.tree_util.tree_leaves(opt_state)
    assert len(flat_a) == len(flat_b)
