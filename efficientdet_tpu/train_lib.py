"""Jit-compiled training step: the reference's per-step hot loop, fused.

The reference's training step (SURVEY.md SS3.1) split work between host
Python (generator preprocessing + Cython anchor matching) and the TF runtime
(forward/backward). Here the ENTIRE step — anchor matching, focal +
smooth-L1 losses, forward, backward, optimiser update, BN running-stat
update — is one jitted XLA program (north star, BASELINE.json:5), and it
pjit-shards over a data mesh (see ``parallel/``).

State layout follows Flax conventions: ``TrainState`` carries params,
batch_stats, opt_state and step. Batches are dicts of fixed-shape arrays:
``images`` (B,S,S,3) normalised, ``gt_boxes`` (B,G,4), ``gt_labels`` (B,G)
int32 with -1 padding.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from efficientdet_tpu.anchors import anchor_targets_batch_compact, anchors_for_shape
from efficientdet_tpu.configs import TrainConfig
from efficientdet_tpu.losses import detection_loss, detection_loss_from_levels
from efficientdet_tpu.models.detector import EfficientDet
from efficientdet_tpu.ops.preprocess import preprocess_batch_fixed


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA of params for eval (0 decay = disabled, mirrors reference absence).
    ema_params: Optional[Any] = None
    # ReduceLROnPlateau multiplier. A traced scalar INSIDE the state so the
    # host can drop the LR (state.replace(lr_scale=...)) without recompiling
    # the jitted step — for Adam, scaling the final updates is exactly
    # scaling the learning rate (VERDICT r1 weak #6: rebuilding the step per
    # plateau cost minutes of XLA compile at D4+remat).
    lr_scale: Optional[jax.Array] = None


def make_learning_rate_fn(config: TrainConfig):
    """LR schedule: constant (reference Adam 1e-3) or warmup+cosine."""
    base = config.learning_rate
    if config.lr_schedule == "constant":
        if config.warmup_steps > 0:
            return optax.linear_schedule(0.0, base, config.warmup_steps)
        return lambda step: base
    if config.lr_schedule == "cosine":
        total = config.epochs * config.steps_per_epoch
        return optax.warmup_cosine_decay_schedule(
            0.0, base, max(config.warmup_steps, 1), max(total, 2)
        )
    raise ValueError(f"unknown lr_schedule {config.lr_schedule!r}")


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Adam(1e-3) as the reference compiles; optional clip/decay extras."""
    lr = make_learning_rate_fn(config)
    txs = []
    if config.grad_clip_norm > 0:
        txs.append(optax.clip_by_global_norm(config.grad_clip_norm))
    if config.weight_decay > 0:
        txs.append(optax.add_decayed_weights(config.weight_decay))
    txs.append(optax.adam(lr))
    tx = optax.chain(*txs)
    if config.fused_optimizer:
        # One flat update instead of ~360 leaf-wise kLoop fusions — see
        # TrainConfig.fused_optimizer for the trace numbers. Outside-the-
        # flatten wrappers (MultiSteps below, the freeze-backbone gradient
        # zeroing and lr_scale multiply in make_train_step) all operate on
        # tree-shaped updates, which optax.flatten preserves at the
        # boundary.
        tx = optax.flatten(tx)
    if config.grad_accum_steps > 1:
        # Micro-batching: accumulate k gradients before one Adam update, so
        # the effective batch is k * batch_size without k-times the
        # activation HBM. One chip trains D0 at the reference's 8-GPU
        # effective batch this way.
        tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum_steps)
    return tx


def create_train_state(
    model: EfficientDet,
    config: TrainConfig,
    rng: jax.Array,
    image_size: Optional[int] = None,
) -> TrainState:
    size = image_size or model.config.image_size
    if config.freeze_backbone:
        # Zero out backbone updates via masked optimiser (see make_train_step).
        pass
    tx = make_optimizer(config)

    def _init(rng):
        variables = model.init(
            rng, jnp.zeros((1, size, size, 3), jnp.float32)
        )
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            ema_params=params if config.ema_decay > 0 else None,
            lr_scale=jnp.ones((), jnp.float32),
        )

    # ONE compiled program for the whole init (params + optimizer zeros):
    # eager init dispatches hundreds of ops one-by-one, which on a relayed
    # device costs minutes of per-op round-trips (measured: the D0 eager
    # init dominated a whole bench run's wall time; jitted it is seconds
    # warm / one ordinary compile cold)
    return jax.jit(_init)(rng)


def make_eval_loss_fn(
    model: EfficientDet,
    config: TrainConfig,
    image_size: Optional[int] = None,
):
    """Pure validation-loss fn (reference --compute-val-loss): same losses,
    eval-mode forward (running BN stats, no drop-connect), no update."""
    cfg = model.config
    size = image_size or cfg.image_size
    anchors = jnp.asarray(anchors_for_shape((size, size), cfg.anchor))

    def eval_loss(state: TrainState, batch: Dict[str, jax.Array]):
        cls_t, box_t, state_t = anchor_targets_batch_compact(
            anchors,
            batch["gt_boxes"],
            batch["gt_labels"],
            config.positive_iou,
            config.negative_iou,
        )
        images = batch["images"]
        if images.dtype == jnp.uint8:
            images = preprocess_batch_fixed(images, dtype=jnp.float32)
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
            return_raw_levels=config.per_level_loss,
        )
        if config.per_level_loss:
            total, aux = detection_loss_from_levels(
                *outputs, cls_t, box_t, state_t,
                num_anchors=cfg.num_anchors_per_cell,
                alpha=config.focal_alpha, gamma=config.focal_gamma,
                sigma=config.huber_sigma,
            )
        else:
            total, aux = detection_loss(
                *outputs, cls_t, box_t, state_t,
                alpha=config.focal_alpha, gamma=config.focal_gamma,
                sigma=config.huber_sigma,
            )
        return {"val_loss": total, **{f"val_{k}": v for k, v in aux.items()}}

    return eval_loss


def make_train_step(
    model: EfficientDet,
    config: TrainConfig,
    image_size: Optional[int] = None,
):
    """Build the pure (state, batch, rng) -> (state, metrics) step function.

    Not jitted here: the caller wraps it in ``jax.jit`` (single device) or
    pjit with shardings (``parallel.sharded_train_step``).
    """
    cfg = model.config
    size = image_size or cfg.image_size
    anchors = jnp.asarray(anchors_for_shape((size, size), cfg.anchor))
    tx = make_optimizer(config)

    backbone_frozen = config.freeze_backbone

    def loss_fn(params, batch_stats, batch, rng):
        images = batch["images"]
        gt_boxes, gt_labels = batch["gt_boxes"], batch["gt_labels"]
        if config.device_augment:
            # random affine + colour fused into the step (ops/augment.py):
            # the host only decodes + letterboxes.
            from efficientdet_tpu.ops.augment import augment_batch_device

            rng, aug_rng = jax.random.split(rng)
            images, gt_boxes, gt_labels = augment_batch_device(
                aug_rng,
                images,
                gt_boxes,
                gt_labels,
                extents=batch.get("extents"),
                color=config.device_augment_color,
            )
        if images.dtype != jnp.float32 or config.device_augment:
            # fused normalise inside the step (north star: one XLA program)
            images = preprocess_batch_fixed(images, dtype=jnp.float32)
        cls_t, box_t, state_t = anchor_targets_batch_compact(
            anchors,
            gt_boxes,
            gt_labels,
            config.positive_iou,
            config.negative_iou,
        )
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            return_raw_levels=config.per_level_loss,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if config.per_level_loss:
            cls_levels, box_levels = outputs
            total, aux = detection_loss_from_levels(
                cls_levels,
                box_levels,
                cls_t,
                box_t,
                state_t,
                num_anchors=cfg.num_anchors_per_cell,
                alpha=config.focal_alpha,
                gamma=config.focal_gamma,
                sigma=config.huber_sigma,
            )
        else:
            cls_logits, box_preds = outputs
            total, aux = detection_loss(
                cls_logits,
                box_preds,
                cls_t,
                box_t,
                state_t,
                alpha=config.focal_alpha,
                gamma=config.focal_gamma,
                sigma=config.huber_sigma,
            )
        aux["num_positives"] = jnp.mean(jnp.sum(state_t == 1.0, axis=1))
        return total, (aux, mutated["batch_stats"])

    def train_step(
        state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (total, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, step_rng)

        if backbone_frozen:
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: jnp.zeros_like(g)
                if any(getattr(p, "key", None) == "backbone" for p in path)
                else g,
                grads,
            )

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if state.lr_scale is not None:
            # Equivalent to scaling Adam's lr: the update direction
            # m̂/(√v̂+ε) and the opt_state are lr-independent.
            updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if state.ema_params is not None:
            d = config.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params, new_params
            )
        metrics = {
            "loss": total,
            "grad_norm": optax.global_norm(grads),
            **aux,
        }
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
            lr_scale=state.lr_scale,
        )
        return new_state, metrics

    return train_step
