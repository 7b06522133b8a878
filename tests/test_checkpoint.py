"""CheckpointManager (orbax) save/restore/retention tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientdet_tpu.utils.checkpoint import (
    CheckpointManager,
    load_params,
    save_params,
)


def make_state(x):
    return {
        "params": {"w": np.full((4, 4), float(x), np.float32)},
        "step": np.asarray(x, np.int32),
    }


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(1, make_state(1))
        mgr.save(2, make_state(2))
        assert mgr.latest_step() == 2
        got = mgr.restore(make_state(0))
        np.testing.assert_allclose(got["params"]["w"], 2.0)
        got1 = mgr.restore(make_state(0), step=1)
        np.testing.assert_allclose(got1["params"]["w"], 1.0)

    def test_keep_limit(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
        for i in range(1, 5):
            mgr.save(i, make_state(i))
        assert mgr.latest_step() == 4
        with pytest.raises(Exception):
            mgr.restore(make_state(0), step=1)  # pruned

    def test_restore_missing_raises(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            mgr.restore(make_state(0))

    def test_restore_partial_params_only(self, tmp_path):
        """Inference loaders (Predictor.from_checkpoint) pull just
        params+batch_stats out of a full TrainState snapshot — no
        optimizer template needed."""
        mgr = CheckpointManager(str(tmp_path / "ck"))
        full = {
            "step": np.asarray(7),
            "params": {"w": np.full((2, 3), 4.0, np.float32)},
            "batch_stats": {"mean": np.arange(3, dtype=np.float32)},
            "opt_state": {"mu": np.ones(5, np.float32)},
        }
        mgr.save(7, full)
        sub = {
            "params": {"w": np.zeros((2, 3), np.float32)},
            "batch_stats": {"mean": np.zeros(3, np.float32)},
        }
        got = mgr.restore_partial(sub)
        np.testing.assert_allclose(got["params"]["w"], 4.0)
        np.testing.assert_allclose(
            got["batch_stats"]["mean"], [0.0, 1.0, 2.0]
        )
        assert "opt_state" not in got

    def test_legacy_snapshot_without_lr_scale(self, tmp_path):
        """A snapshot written before TrainState grew lr_scale must restore
        into the new template, with lr_scale backfilled to the template's
        value (1.0)."""
        import flax

        @flax.struct.dataclass
        class OldState:
            step: jax.Array
            params: dict

        @flax.struct.dataclass
        class NewState:
            step: jax.Array
            params: dict
            lr_scale: jax.Array = None

        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(
            3,
            OldState(
                step=jnp.asarray(3),
                params={"w": jnp.full((2, 2), 7.0)},
            ),
        )
        template = NewState(
            step=jnp.asarray(0),
            params={"w": jnp.zeros((2, 2))},
            lr_scale=jnp.ones(()),
        )
        got = mgr.restore(template)
        np.testing.assert_allclose(np.asarray(got.params["w"]), 7.0)
        assert int(got.step) == 3
        np.testing.assert_allclose(np.asarray(got.lr_scale), 1.0)


def test_params_only_roundtrip(tmp_path):
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_params(str(tmp_path / "p"), params)
    got = load_params(str(tmp_path / "p"), {"a": np.zeros((2, 3), np.float32)})
    np.testing.assert_allclose(got["a"], params["a"])
