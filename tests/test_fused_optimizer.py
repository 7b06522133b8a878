"""fused_optimizer (optax.flatten over the update chain) — fast tier.

The flag changes the opt_state pytree structure. It was built to remove
the ~26 ms/step leaf-wise Adam tax at D0/b128, but the on-chip A/B
measured the flatten/unflatten copies costing MORE (497 vs 525 img/s), so
it defaults OFF (docs/DESIGN.md 6f). These tests pin that the flattened
chain is
mathematically IDENTICAL to the leaf-wise one across every chain variant
we ship, and that the structure contract (flat vector state) holds.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientdet_tpu.configs import TrainConfig
from efficientdet_tpu.train_lib import make_optimizer


def tree():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return {
        "backbone": {"w": jax.random.normal(ks[0], (7, 3)),
                     "b": jax.random.normal(ks[1], (3,))},
        "head": {"w": jax.random.normal(ks[2], (3, 5)),
                 "scale": jax.random.normal(ks[3], ())},
    }


def run_steps(tc, params, n=4, seed=1):
    tx = make_optimizer(tc)
    state = tx.init(params)
    for i in range(n):
        grads = jax.tree.map(
            lambda p, key=jax.random.fold_in(jax.random.PRNGKey(seed), i):
                jax.random.normal(jax.random.fold_in(key, hash(p.shape) % 97),
                                  p.shape),
            params,
        )
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params


CHAINS = [
    dict(),
    dict(weight_decay=1e-4),
    dict(grad_clip_norm=0.5),
    dict(weight_decay=1e-4, grad_clip_norm=0.5),
    dict(grad_accum_steps=2),
    dict(lr_schedule="cosine", warmup_steps=2, epochs=1, steps_per_epoch=8),
]


@pytest.mark.parametrize("kw", CHAINS, ids=[str(sorted(c)) for c in CHAINS])
def test_fused_matches_leafwise(kw):
    base = TrainConfig(**kw)
    p0 = tree()
    fused = run_steps(dataclasses.replace(base, fused_optimizer=True), p0)
    leaf = run_steps(dataclasses.replace(base, fused_optimizer=False), p0)
    flat_f = jax.tree_util.tree_leaves(fused)
    flat_l = jax.tree_util.tree_leaves(leaf)
    for a, b in zip(flat_f, flat_l):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7
        )


def test_fused_state_is_flat():
    """The point of the flag: Adam moments live in ONE flat vector, not a
    leaf-per-parameter tree (the per-leaf dispatch was the 26 ms)."""
    p0 = tree()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(p0))
    tx = make_optimizer(TrainConfig(fused_optimizer=True))
    state = tx.init(p0)
    big = [
        x for x in jax.tree_util.tree_leaves(state)
        if hasattr(x, "size") and x.size == n_params
    ]
    # mu and nu, each one flat (n_params,) vector
    assert len(big) == 2
    assert all(x.ndim == 1 for x in big)

    leaf_state = make_optimizer(TrainConfig(fused_optimizer=False)).init(p0)
    leaf_big = [
        x for x in jax.tree_util.tree_leaves(leaf_state)
        if hasattr(x, "size") and x.size == n_params
    ]
    assert not leaf_big  # leaf-wise keeps per-parameter moments


def test_snapshot_compat_rule():
    """Restore paths must reproduce the snapshot's opt_state structure:
    absent config or absent field -> leaf-wise (pre-flag snapshots); the
    field wins when present. New runs default leaf-wise too — the on-chip
    A/B measured flatten 5% SLOWER (docs/DESIGN.md 6f)."""
    from efficientdet_tpu.configs import train_config_from_snapshot

    assert train_config_from_snapshot(None).fused_optimizer is False
    assert train_config_from_snapshot(
        {"train": {"batch_size": 4}}
    ).fused_optimizer is False
    assert train_config_from_snapshot(
        {"train": {"batch_size": 4, "fused_optimizer": True}}
    ).fused_optimizer is True
    assert TrainConfig().fused_optimizer is False


def test_updates_stay_tree_shaped():
    """Wrappers outside optax.flatten (freeze-backbone zeroing, lr_scale
    multiply, MultiSteps) consume tree-shaped updates — the flatten
    boundary must hand trees back."""
    p0 = tree()
    tx = make_optimizer(TrainConfig(fused_optimizer=True))
    state = tx.init(p0)
    grads = jax.tree.map(jnp.ones_like, p0)
    updates, _ = tx.update(grads, state, p0)
    assert jax.tree_util.tree_structure(updates) == \
        jax.tree_util.tree_structure(p0)
    assert all(
        u.shape == p.shape
        for u, p in zip(jax.tree_util.tree_leaves(updates),
                        jax.tree_util.tree_leaves(p0))
    )
