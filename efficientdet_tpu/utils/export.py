"""Serialized-model export: the reference's shipped-prediction-model analog.

The reference distributes trained detectors as Keras ``.h5`` files that
``inference.py`` reloads without the training code (SURVEY.md §3.2). The
TPU-native equivalent is a :mod:`jax.export` artifact: the ENTIRE fused
serving program — uint8 normalise → backbone/BiFPN/heads → box decode →
clip → per-class NMS — serialized as StableHLO with the trained parameters
baked in as constants. The artifact reloads with ``jax.export.deserialize``
alone: no efficientdet_tpu package, no flax, no model-building code on the
serving fleet. Ship bytes, not a Python environment.

Portability is decided at EXPORT time, because the Pallas kernels
(ops/nms_pallas.py, ops/head_pallas.py) select on ``jax.default_backend()``
during tracing:

* exporting on CPU (or any non-TPU backend) traces the pure-XLA paths →
  the artifact is plain StableHLO, loadable on every JAX backend;
* exporting on TPU traces the Mosaic kernels → the artifact carries
  ``tpu_custom_call`` ops (allowed via a custom-call safety check) and runs
  on TPU runtimes with a compatible libtpu only. This is the fast serving
  artifact; pass ``platforms=("cpu",)`` under ``jax.default_device`` /
  ``JAX_PLATFORMS=cpu`` to trade the kernels for portability.

Input contract matches :class:`efficientdet_tpu.serve.BatchingPredictor`:
a fixed-shape uint8 letterboxed canvas batch ``(B, S, S, 3)``; outputs are
``(boxes (B, D, 4) xyxy in canvas pixels, scores (B, D), classes (B, D)
int32, num_valid (B,) int32)`` — the caller divides boxes by its letterbox
scale, exactly as the serve collector does.

CLI::

    python -m efficientdet_tpu.utils.export --phi 0 --checkpoint ckpt/ \
        --batch-size 8 --output d0_serving.jaxexp
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

SUFFIX = ".jaxexp"


def export_predictor(
    model,
    variables,
    eval_config=None,
    batch_size: int = 8,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the fused serving program with ``variables`` baked in.

    Args:
      model: an :class:`~efficientdet_tpu.models.detector.EfficientDet`.
      variables: trained ``{"params", "batch_stats"}`` (closed over — they
        become constants in the serialized module).
      eval_config: :class:`~efficientdet_tpu.configs.EvalConfig` for the
        NMS stage (defaults to serving defaults).
      batch_size: static batch of the exported program (one program per
        batch size, the same static-shape discipline as the live path).
      platforms: lowering platforms for the artifact, e.g. ``("tpu",)`` or
        ``("tpu", "cpu")``. Default: the current default backend.

    Returns a :class:`jax.export.Exported`; serialize with
    :func:`save_exported` / ``.serialize()``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jx

    from efficientdet_tpu.configs import EvalConfig
    from efficientdet_tpu.models.detector import predict_pipeline

    ec = eval_config or EvalConfig()
    size = model.config.image_size

    def serve_fn(images):
        return predict_pipeline(model, variables, images, ec)

    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    targets = tuple(platforms) if platforms else (jx.default_export_platform(),)
    if "tpu" in targets:
        # Mosaic kernels lower to a custom call jax.export does not list as
        # stable; the artifact is tied to a compatible libtpu, which is the
        # deal serving fleets already accept for speed.
        kwargs["disabled_checks"] = [
            jx.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
    return jx.export(jax.jit(serve_fn), **kwargs)(spec)


def save_exported(exported, path: str) -> None:
    """Write an :class:`jax.export.Exported` to ``path`` (one artifact file)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load_serving_fn(path: str):
    """Reload an exported artifact as a callable — NO model code needed.

    Returns ``fn(images uint8 (B, S, S, 3)) -> (boxes, scores, classes,
    num_valid)``. The call is jitted (the rehydrated program compiles once
    per process on the serving backend).
    """
    import jax
    from jax import export as jx

    with open(path, "rb") as f:
        exported = jx.deserialize(f.read())
    return jax.jit(exported.call)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Export a serving artifact (StableHLO, params baked in)."
    )
    p.add_argument("--phi", type=int, default=0, choices=range(8))
    p.add_argument("--checkpoint", default=None, help="orbax params dir")
    p.add_argument("--num-classes", type=int, default=90)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--score-threshold", type=float, default=0.01)
    p.add_argument("--no-fuse-bn", action="store_true",
                   help="skip BatchNorm inference folding")
    p.add_argument(
        "--platforms", default=None,
        help="comma list, e.g. tpu,cpu (default: current backend)",
    )
    p.add_argument("--output", required=True, help=f"path ({SUFFIX})")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import efficientdet_tpu as ed
    from efficientdet_tpu.configs import EvalConfig
    from efficientdet_tpu.models.detector import fuse_for_inference

    model, cfg = ed.build_efficientdet(
        args.phi,
        num_classes=args.num_classes,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        image_size=args.image_size,
    )
    size = cfg.image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
    )
    if args.checkpoint:
        import numpy as np

        from efficientdet_tpu.utils.checkpoint import load_params

        variables = load_params(
            args.checkpoint, jax.tree.map(np.asarray, variables)
        )
    else:
        print("warning: no --checkpoint, exporting random weights")
    if not args.no_fuse_bn:
        model, variables = fuse_for_inference(model, variables)

    platforms = args.platforms.split(",") if args.platforms else None
    exported = export_predictor(
        model,
        variables,
        eval_config=EvalConfig(score_threshold=args.score_threshold),
        batch_size=args.batch_size,
        platforms=platforms,
    )
    save_exported(exported, args.output)
    import os

    print(
        f"wrote {args.output} ({os.path.getsize(args.output) / 1e6:.1f} MB, "
        f"D{args.phi} {size}px b{args.batch_size} "
        f"platforms={list(exported.platforms)})"
    )


if __name__ == "__main__":
    main()
