"""Mesh construction and pjit-sharded entry points.

The reference's only parallelism was optional single-host multi-GPU data
parallelism hidden inside Keras (SURVEY.md SS2 "Parallelism: DP", SS5
"Distributed communication backend"). The TPU-native build makes it
first-class: a 1-D ``jax.sharding.Mesh`` over the slice's chips, batches
sharded over the ``data`` axis, params/optimizer state replicated, and XLA
emitting the gradient ``psum`` and output ``all_gather`` collectives over
ICI — no NCCL/MPI analog is hand-written, by design.

The mesh is built with a (1, N) shape reserving a leading ``model`` axis of
size 1 so tensor-parallel sharding can be added later without breaking the
API (SURVEY.md SS2: "the mesh API must not preclude adding a 'model' axis").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from efficientdet_tpu.configs import EvalConfig, TrainConfig
from efficientdet_tpu.models.detector import EfficientDet, predict_pipeline
from efficientdet_tpu.train_lib import TrainState, make_train_step

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallelism: int = 1,
) -> Mesh:
    """1-D data mesh (optionally x model) over the given/all devices.

    On a v5e slice the devices enumerate along ICI, so a 1-D mesh keeps the
    gradient all-reduce on ICI links (DCN would only appear across slices).
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallelism:
        raise ValueError(f"{n} devices not divisible by model={model_parallelism}")
    arr = np.asarray(devices).reshape(model_parallelism, n // model_parallelism)
    return Mesh(arr, (MODEL_AXIS, DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device_put a host batch with the leading axis split over ``data``.

    Under multi-process JAX (multi-host pods), each process passes its
    LOCAL batch (a disjoint dataset shard — ``batch_iterator``'s
    shard_index/shard_count) and the per-process arrays assemble into one
    global array spanning the mesh: global batch = sum of local batches.
    Single-process: a plain sharded device_put.
    """
    sh = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), batch)


def make_sharded_train_step(
    model: EfficientDet,
    config: TrainConfig,
    mesh: Mesh,
    image_size: Optional[int] = None,
    donate_state: bool = True,
):
    """Data-parallel jitted train step.

    Params/opt-state replicated (P()), batch sharded over ``data``. XLA
    inserts the gradient psum over ICI automatically from the shardings —
    the jitted function body is the plain single-device step.
    """
    step_fn = make_train_step(model, config, image_size)
    repl = replicate(mesh)
    data = data_sharding(mesh)

    # Sharding pytree prefixes: `repl` broadcasts over the whole TrainState,
    # `data` over every batch leaf (images/gt_boxes/gt_labels and any
    # extras like the device-augment extents — all carry a leading batch
    # axis).
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_sharded_predict_fn(
    model: EfficientDet,
    mesh: Mesh,
    eval_config: EvalConfig = EvalConfig(),
    preprocess: bool = True,
):
    """Data-parallel batched inference (BASELINE.json configs 2/3/5).

    Images shard over ``data``; every device runs preprocess -> forward ->
    decode -> NMS on its sub-batch; outputs stay sharded (callers gather with
    ``jax.device_get`` which performs the all-gather implicitly).

    The body runs under ``shard_map`` (not bare pjit) so the Pallas NMS
    suppression kernel — a custom call XLA cannot auto-partition — executes
    per device on its local sub-batch. Predict has no cross-device
    communication at all, so shard_map costs nothing.
    """

    def local(variables, images):
        return predict_pipeline(
            model, variables, images, eval_config, preprocess=preprocess
        )

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )

    @jax.jit
    def predict(variables, images):
        return shmapped(variables, images)

    return predict


def make_spatial_predict_fn(
    model: EfficientDet,
    mesh: Mesh,
    eval_config: EvalConfig = EvalConfig(),
    preprocess: bool = True,
):
    """Spatially-partitioned inference: shard the CONV GRID, not the batch.

    The convnet analog of sequence/context parallelism (SURVEY.md §5
    "Long-context"): activation memory grows quadratically in image side
    exactly as KV memory grows in context length, and the lever is the
    same — split the big axis over chips. Here the image HEIGHT dim is
    sharded over the mesh's data axis; XLA GSPMD partitions every conv and
    pooling op spatially, inserting halo exchanges over ICI at the shard
    seams (the convnet's ring-attention). Params are replicated. After the
    heads, outputs are re-replicated and decode + NMS run on the gathered
    logits (their data-dependent gathers don't partition spatially).

    Use when ONE image is too large for a chip's HBM (ultra-high-res D7+),
    or to cut single-image latency; for throughput, batch data-parallelism
    (``make_sharded_predict_fn``) is the right tool. Bit-identical to
    single-device predict (tested on the virtual mesh).
    """
    from efficientdet_tpu.anchors import anchors_for_shape
    from efficientdet_tpu.ops.nms import batched_filter_from_logits
    from efficientdet_tpu.ops.preprocess import preprocess_batch_fixed

    spatial = NamedSharding(mesh, P(None, DATA_AXIS))  # (B, H, W, C): shard H
    repl = replicate(mesh)

    def run(variables, images):
        size = images.shape[1]
        if preprocess:
            images = preprocess_batch_fixed(images, dtype=model.dtype)
        images = jax.lax.with_sharding_constraint(images, spatial)
        # GSPMD partitions every conv/pool spatially between these two
        # constraints (halo exchanges over ICI at the shard seams).
        cls_logits, box_deltas = model.apply(variables, images, train=False)
        cls_logits = jax.lax.with_sharding_constraint(cls_logits, repl)
        box_deltas = jax.lax.with_sharding_constraint(box_deltas, repl)
        anchors = jnp.asarray(
            anchors_for_shape((size, size), model.config.anchor)
        )
        return batched_filter_from_logits(
            anchors, box_deltas, cls_logits, (size, size), eval_config
        )

    return jax.jit(run, in_shardings=(repl, spatial), out_shardings=repl)


def make_spatial_train_step(
    model: EfficientDet,
    config: TrainConfig,
    mesh: Mesh,
    image_size: Optional[int] = None,
    donate_state: bool = True,
):
    """Spatially-partitioned TRAINING: shard the conv grid, not the batch.

    The training-side counterpart of :func:`make_spatial_predict_fn` and
    the convnet analog of context/sequence-parallel training (SURVEY.md §5
    "Long-context"): the batch is replicated but every activation is split
    along image HEIGHT over the mesh, so per-chip activation memory — the
    thing that forces rematerialisation at D4+ — drops by the mesh size.
    GSPMD partitions each conv forward AND backward spatially (halo
    exchanges over ICI at the shard seams), inserts the cross-shard psums
    for BatchNorm statistics and the loss/gradient reductions, and keeps
    params + optimizer state replicated, so the update is bit-for-bit the
    single-device update (tested on the virtual mesh).

    Use when per-chip HBM, not throughput, is the binding constraint
    (ultra-high-res D5–D7 training, or D4 without remat); for throughput,
    batch data-parallelism (:func:`make_sharded_train_step`) is strictly
    better — halos cost ICI traffic every conv, a pure-DP step none.
    Composes with ``config.device_augment`` (the warp's gathers re-gather
    rows over ICI once per step, before the conv stack).
    """
    step_fn = make_train_step(model, config, image_size)
    repl = replicate(mesh)
    spatial = NamedSharding(mesh, P(None, DATA_AXIS))  # (B, H, W, 3)

    def spatial_batch_sharding(batch: Dict[str, Any]):
        return {
            k: (spatial if k == "images" else repl) for k in batch
        }

    def step(state, batch, rng):
        batch = dict(batch)
        batch["images"] = jax.lax.with_sharding_constraint(
            batch["images"], spatial
        )
        return step_fn(state, batch, rng)

    jitted = jax.jit(
        step,
        in_shardings=None,  # derived from args; constraint pins the grid
        donate_argnums=(0,) if donate_state else (),
    )

    def run(state, batch, rng):
        batch = {
            k: jax.device_put(
                jnp.asarray(v),
                spatial if k == "images" else repl,
            )
            for k, v in batch.items()
        }
        return jitted(state, batch, rng)

    run.spatial_batch_sharding = spatial_batch_sharding
    return run
