"""Detection losses: focal classification + smooth-L1 box regression.

Pure-function rebuild of the reference's ``losses.py`` (SURVEY.md SS2
"Losses"): ``focal(alpha=0.25, gamma=2.0)`` on sigmoid logits normalised by
the positive-anchor count, and ``smooth_l1(sigma=3.0)`` over positive anchors
only. The reference smuggled the anchor state through an extra target
channel; here it is an explicit ``anchor_state`` tensor in {-1, 0, 1}.

Everything is jit/grad-compatible and batched: inputs carry a leading batch
dimension and the normaliser is the BATCH-GLOBAL positive-anchor count, as
the reference computes it (keras-retinanet lineage: ``tf.gather_nd`` over
the whole (B, A) tensor, then ``K.sum(loss) / max(1, total_positives)`` —
Keras' final scalar mean is a no-op). An earlier revision normalised per
image and averaged, which up-weights sparsely-annotated images relative to
the reference (round-3 review finding); under pjit the global sum spans the
whole sharded batch, so the semantics are shard-count-invariant either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def focal_loss(
    cls_logits: jax.Array,
    cls_targets: jax.Array,
    anchor_state: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Sigmoid focal loss, normalised by the batch-total positive count.

    Args:
      cls_logits: (B, A, C) raw logits.
      cls_targets: (B, A, C) float one-hot targets (zeros for negatives), OR
        (B, A) int32 matched class labels (-1 = no class), the compact form
        from ``anchors.anchor_targets_compact``. With labels the one-hot is
        generated on the fly by an iota-compare that XLA fuses into this
        loss's elementwise chain — the (B, A, C) tensor (~1.1 GB/step at
        D0/b64) never reaches HBM, in either the forward or backward pass.
      anchor_state: (B, A) in {-1 ignore, 0 negative, 1 positive}.
    Returns scalar loss.
    """
    num_pos = jnp.sum((anchor_state == 1.0).astype(jnp.float32))  # scalar
    normalizer = jnp.maximum(num_pos, 1.0)
    include = (anchor_state != -1.0).astype(jnp.float32)  # ignore state -1

    if cls_targets.ndim == cls_logits.ndim - 1:
        # Compact int labels: shared custom-VJP path (_focal_sum) — one
        # fused forward reduction and one hand-written fused backward, the
        # SAME formula the per-level loss uses.
        per_image = _focal_sum(
            cls_logits, cls_targets.astype(jnp.int32), include, alpha, gamma
        )
        return jnp.sum(per_image) / normalizer

    # Dense float one-hot targets: same elementwise formula via the shared
    # helper (one copy of the focal math for every caller).
    loss = _focal_elementwise(cls_logits, cls_targets, alpha, gamma)
    loss = loss * include[..., None]
    return jnp.sum(loss) / normalizer


def smooth_l1_loss(
    box_preds: jax.Array,
    box_targets: jax.Array,
    anchor_state: jax.Array,
    sigma: float = 3.0,
) -> jax.Array:
    """Smooth-L1 (Huber) regression loss over positive anchors only.

    Args:
      box_preds: (B, A, 4) predicted encoded deltas.
      box_targets: (B, A, 4) encoded targets.
      anchor_state: (B, A).
    Returns scalar loss.
    """
    loss = _huber_elementwise(box_preds, box_targets, sigma)  # (B, A, 4)
    positive = (anchor_state == 1.0).astype(jnp.float32)
    loss = loss * positive[..., None]
    normalizer = jnp.maximum(jnp.sum(positive), 1.0)  # batch-global
    return jnp.sum(loss) / normalizer


def _focal_elementwise(
    cls_logits: jax.Array,
    cls_targets: jax.Array,
    alpha: float,
    gamma: float,
) -> jax.Array:
    """Per-element focal loss (B, ..., C); targets may be compact labels."""
    cls_logits = cls_logits.astype(jnp.float32)
    p = jax.nn.sigmoid(cls_logits)
    if cls_targets.ndim == cls_logits.ndim - 1:
        labels = cls_targets.astype(jnp.int32)[..., None]
        c = cls_logits.shape[-1]
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (1,) * (labels.ndim - 1) + (c,), labels.ndim - 1
        )
        t = (labels == iota).astype(jnp.float32)  # fused, never materialised
    else:
        t = cls_targets.astype(jnp.float32)
    alpha_factor = jnp.where(t == 1.0, alpha, 1.0 - alpha)
    focal_weight = jnp.where(t == 1.0, 1.0 - p, p) ** gamma
    bce = jnp.maximum(cls_logits, 0.0) - cls_logits * t + jnp.log1p(
        jnp.exp(-jnp.abs(cls_logits))
    )
    return alpha_factor * focal_weight * bce


def _focal_grad_elementwise(x, onehot, alpha, gamma):
    """d(focal)/d(logit), elementwise, f32.

    With p_t = sigmoid(s*x), s = +1 for the target class else -1, and
    L = -log(p_t) = softplus(-s*x):

        d focal / dx = -s * alpha_t * (1-p_t)^gamma * [(1-p_t) + gamma*p_t*L]

    (gamma=0 recovers the BCE gradient alpha_t * (p - t).) Written out so
    the backward pass is ONE fused elementwise expression over the logits —
    autodiff of the one-hot formulation materialises (B,H,W,A,C)-sized f32
    focal and s32 one-hot temps in HBM (the two largest allocations in the
    D4/b32 OOM dump, ~5 GB). The one-hot mask is consumed EXACTLY ONCE
    (a single select between the positive/negative branches): referencing
    it from several subexpressions made XLA materialise the broadcast
    compare as an s32 (B,H,W,A,C) temp instead of fusing it.
    """
    p = jax.nn.sigmoid(x)
    sp_neg = jax.nn.softplus(-x)  # -log(p)
    sp_pos = jax.nn.softplus(x)   # -log(1-p)
    one_m = 1.0 - p
    grad_pos = -alpha * one_m ** gamma * (one_m + gamma * p * sp_neg)
    grad_neg = (1.0 - alpha) * p ** gamma * (p + gamma * one_m * sp_pos)
    return jnp.where(onehot, grad_pos, grad_neg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _focal_sum(cl, labels, include, alpha, gamma):
    """sum_{...,c} focal(cl, onehot(labels)) * include  -> (B,).

    Rank-generic: used on (B, A, C) concat logits and (B, H, W, A, C)
    per-level conv-layout logits — BOTH loss paths share this one
    forward/backward formula, so their gradients are bit-comparable
    (tests compare whole Adam steps across the two paths).

    cl: (B, ..., C) logits (any float dtype; math in f32).
    labels: (B, ...) int32 matched class (-1 = none).
    include: (B, ...) f32 {0,1} (anchor_state != -1).
    """
    focal = _focal_elementwise(cl, labels, alpha, gamma)
    return jnp.sum(
        jnp.sum(focal, axis=-1) * include,
        axis=tuple(range(1, include.ndim)),
    )


def _focal_sum_fwd(cl, labels, include, alpha, gamma):
    return _focal_sum(cl, labels, include, alpha, gamma), (cl, labels, include)


def _focal_sum_bwd(alpha, gamma, res, g):
    cl, labels, include = res
    x = cl.astype(jnp.float32)
    onehot = labels[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (1,) * labels.ndim + (cl.shape[-1],), labels.ndim
    )
    d = _focal_grad_elementwise(x, onehot, alpha, gamma)
    gx = g.reshape(g.shape + (1,) * (include.ndim - 1))
    d = d * (include * gx)[..., None]
    return d.astype(cl.dtype), None, None


_focal_sum.defvjp(_focal_sum_fwd, _focal_sum_bwd)


def _huber_elementwise(
    box_preds: jax.Array, box_targets: jax.Array, sigma: float
) -> jax.Array:
    sigma_sq = sigma ** 2
    diff = jnp.abs(
        box_preds.astype(jnp.float32) - box_targets.astype(jnp.float32)
    )
    return jnp.where(
        diff < 1.0 / sigma_sq,
        0.5 * sigma_sq * diff ** 2,
        diff - 0.5 / sigma_sq,
    )


def detection_loss_from_levels(
    cls_levels,
    box_levels,
    cls_targets: jax.Array,
    box_targets: jax.Array,
    anchor_state: jax.Array,
    num_anchors: int,
    alpha: float = 0.25,
    gamma: float = 2.0,
    sigma: float = 3.0,
):
    """:func:`detection_loss` consuming PER-LEVEL head conv outputs directly.

    Same math as concatenating levels into (B, A_total, C)/(B, A_total, 4)
    and calling :func:`detection_loss` — but the concatenated tensors never
    exist. The D4/b16 OOM dump showed the concat build as two of the largest
    allocations in the train step (reshape copy 576 MB + dynamic-update-
    slice 767 MB for class logits alone): the loss here reduces each level
    in (a bitcast view of) its conv layout, so those copies and their
    backward twins disappear.

    Args:
      cls_levels: list of (B, H, W, A*C) raw head outputs, level-major order
        matching ``anchors_for_shape``.
      box_levels: list of (B, H, W, A*4).
      cls_targets: (B, A_total) compact int labels (-1 = none).
      box_targets: (B, A_total, 4) encoded deltas.
      anchor_state: (B, A_total) in {-1, 0, 1}.
      num_anchors: anchors per cell (A).
    """
    bsz = anchor_state.shape[0]
    num_pos = jnp.sum((anchor_state == 1.0).astype(jnp.float32))  # scalar
    normalizer = jnp.maximum(num_pos, 1.0)

    def level_sums(cl, bl, off):
        b, h, w, ac = cl.shape
        a = num_anchors
        c = ac // a
        n = h * w * a
        labels = cls_targets[:, off : off + n].reshape(b, h, w, a)
        state = anchor_state[:, off : off + n].reshape(b, h, w, a)
        include = (state != -1.0).astype(jnp.float32)
        positive = (state == 1.0).astype(jnp.float32)

        # (B,H,W,A*C) -> (B,H,W,A,C) splits only the minor dim: a bitcast
        # view, no relayout. The focal chain + one-hot iota-compare + the
        # include mask fuse into one reduction over the conv-layout tensor;
        # the custom VJP keeps the BACKWARD equally fused (hand-written
        # elementwise d/dlogit instead of autodiffed one-hot temps).
        cls_sum = _focal_sum(
            cl.reshape(b, h, w, a, c), labels.astype(jnp.int32), include,
            alpha, gamma,
        )  # (B,)

        bt = box_targets[:, off : off + n].reshape(b, h, w, a, 4)
        huber = _huber_elementwise(bl.reshape(b, h, w, a, 4), bt, sigma)
        box_sum = jnp.sum(
            jnp.sum(huber, axis=4) * positive, axis=(1, 2, 3)
        )
        return cls_sum, box_sum, n

    # The focal term's backward is a hand-written fused elementwise pass
    # (the _focal_sum custom VJP) — no checkpoint needed; the remaining
    # huber autodiff residuals are (B,H,W,A,4)-sized, negligible.
    off = 0
    cls_total = jnp.zeros((bsz,), jnp.float32)
    box_total = jnp.zeros((bsz,), jnp.float32)
    for cl, bl in zip(cls_levels, box_levels):
        csum, bsum, _ = level_sums(cl, bl, off)
        cls_total = cls_total + csum
        box_total = box_total + bsum
        off += cl.shape[1] * cl.shape[2] * num_anchors

    cls_loss = jnp.sum(cls_total) / normalizer
    box_loss = jnp.sum(box_total) / normalizer
    return cls_loss + box_loss, {"cls_loss": cls_loss, "box_loss": box_loss}


def detection_loss(
    cls_logits: jax.Array,
    box_preds: jax.Array,
    cls_targets: jax.Array,
    box_targets: jax.Array,
    anchor_state: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
    sigma: float = 3.0,
):
    """Total = focal + smooth-L1 (unit weights, as the reference compiles).

    The focal term is wrapped in ``jax.checkpoint``: autodiff otherwise
    saves a (B, A, C)-sized focal intermediate for the backward pass
    (~1.1 GB write + re-read per step at D0/b128, device trace); remat
    recomputes it from the logits — which the head keeps live anyway —
    inside the fused backward pass.
    """
    cls_loss = jax.checkpoint(
        lambda l, t, s: focal_loss(l, t, s, alpha, gamma)
    )(cls_logits, cls_targets, anchor_state)
    box_loss = smooth_l1_loss(box_preds, box_targets, anchor_state, sigma)
    return cls_loss + box_loss, {"cls_loss": cls_loss, "box_loss": box_loss}
