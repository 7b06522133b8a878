"""AOT model export: one deployable file for the serving host.

The reference's deployment story is "ship the trained ``.h5`` and run it
with this repo's Python model code" (lineage ``inference.py``; SURVEY.md
L8). The TPU-native equivalent goes further: ``jax.export`` serializes
the ENTIRE jitted predict program — uint8 preprocess → BN-fused forward
→ decode → NMS — as versioned, backward-compatible StableHLO. The
serving host needs jax and this loader, *no model-construction code*:
the artifact pins the exact compiled semantics (anchor layout, NMS
thresholds, head front-end) at export time, so a serving fleet cannot
drift from the evaluated model even if the package version under it
changes.

Artifact format (one zip, extension ``.edz`` by convention):

  manifest.json      format/jax versions, ModelConfig essentials,
                     EvalConfig, batch size, lowering platforms, and the
                     dtype/shape/tree-path of every weight tensor
  program.stablehlo  jax.export serialization of predict(variables, images)
  vars/<i>.bin       raw little-endian bytes of each weight leaf

Weights ride as program *inputs* (not baked-in constants) so the blob
stays small and the same program text can be re-exported across
checkpoints; the loader closes the restored pytree over ``Exported.call``
and returns a plain ``predict(images)``.

CLI (mirrors evaluate.py's snapshot resolution):

  python -m efficientdet_tpu.export --snapshot ckpts/ --batch 8 --out d0.edz
  python -m efficientdet_tpu.export --phi 0 --batch 1 --out d0.edz  # random init
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import zipfile

FORMAT_VERSION = 1
_PROGRAM_NAME = "program.stablehlo"
_MANIFEST_NAME = "manifest.json"


def _flatten_variables(variables):
    """Flatten a nested-dict pytree to (paths, leaves); paths are str lists."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    paths = []
    leaves = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if not hasattr(k, "key") or not isinstance(k.key, str):
                raise TypeError(
                    "export supports nested-dict variables with str keys; "
                    f"got key entry {k!r}"
                )
            parts.append(k.key)
        paths.append(parts)
        leaves.append(leaf)
    del treedef
    return paths, leaves


def _unflatten_variables(paths, leaves):
    root: dict = {}
    for parts, leaf in zip(paths, leaves):
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return root


def export_predict(
    model,
    variables,
    batch_size: int,
    *,
    eval_config=None,
    preprocess: bool = True,
    fuse: bool = True,
    platforms=None,
):
    """Export the full predict pipeline; returns (Exported, variables).

    ``variables`` are returned because ``fuse=True`` folds BatchNorms into
    conv weights (the production inference path, ``fuse_for_inference``)
    and the FUSED tree is what the exported program takes as input.
    ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` for an artifact loadable on both.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from efficientdet_tpu.configs import EvalConfig
    from efficientdet_tpu.models.detector import (
        fuse_for_inference,
        predict_pipeline,
    )

    if eval_config is None:
        eval_config = EvalConfig()
    if fuse and not model.fuse_bn:
        model, variables = fuse_for_inference(model, variables)
    size = model.config.image_size

    @jax.jit
    def predict(variables, images):
        return predict_pipeline(
            model, variables, images, eval_config, preprocess=preprocess
        )

    img_dtype = jnp.uint8 if preprocess else model.dtype
    img_spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), img_dtype)
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables,
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    targets = (
        tuple(platforms) if platforms else (jex.default_export_platform(),)
    )
    if "tpu" in targets:
        # The Pallas kernels (ops/nms_pallas.py, ops/head_pallas.py) lower
        # to a Mosaic custom call jax.export does not list as stable; the
        # artifact is then tied to a compatible libtpu — the deal serving
        # fleets already accept for speed. CPU-platform exports trace the
        # pure-XLA paths and stay fully portable.
        kwargs["disabled_checks"] = [
            jex.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
    exported = jex.export(predict, **kwargs)(var_specs, img_spec)
    return exported, variables


def save_exported(
    path: str,
    model,
    variables,
    batch_size: int,
    *,
    eval_config=None,
    preprocess: bool = True,
    fuse: bool = True,
    platforms=None,
    extra_meta=None,
) -> dict:
    """Export and write the one-file serving artifact; returns the manifest."""
    import jax
    import numpy as np

    from efficientdet_tpu.configs import EvalConfig

    if eval_config is None:
        eval_config = EvalConfig()
    exported, variables = export_predict(
        model,
        variables,
        batch_size,
        eval_config=eval_config,
        preprocess=preprocess,
        fuse=fuse,
        platforms=platforms,
    )
    paths, leaves = _flatten_variables(variables)
    cfg = model.config
    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "batch_size": batch_size,
        "preprocess": preprocess,
        "fused_bn": bool(fuse or model.fuse_bn),
        "model": {
            "phi": cfg.phi,
            "image_size": cfg.image_size,
            "num_classes": cfg.num_classes,
            "weighted_bifpn": cfg.weighted_bifpn,
        },
        "eval_config": dataclasses.asdict(eval_config),
        "dtype": str(model.dtype.__name__ if hasattr(model.dtype, "__name__")
                     else np.dtype(model.dtype).name),
        "variables": [
            {
                "path": parts,
                "dtype": np.asarray(leaf).dtype.name,
                "shape": list(np.shape(leaf)),
            }
            for parts, leaf in zip(paths, leaves)
        ],
    }
    if extra_meta:
        manifest["extra"] = dict(extra_meta)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MANIFEST_NAME, json.dumps(manifest, indent=1))
        zf.writestr(_PROGRAM_NAME, bytes(exported.serialize()))
        for i, leaf in enumerate(leaves):
            arr = np.asarray(leaf)
            zf.writestr(f"vars/{i}.bin", arr.tobytes())
    return manifest


def load_exported(path: str):
    """Load an ``.edz`` artifact; returns ``(predict, manifest)``.

    ``predict(images)`` is jitted with the restored weights closed over
    (so repeat calls hit jax's compiled-call cache) and returns
    ``(boxes, scores, classes, num_valid)`` exactly as
    :func:`efficientdet_tpu.make_predict_fn` does.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jex

    with zipfile.ZipFile(path, "r") as zf:
        manifest = json.loads(zf.read(_MANIFEST_NAME))
        if manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest['format_version']} is newer than "
                f"this loader ({FORMAT_VERSION})"
            )
        exported = jex.deserialize(bytearray(zf.read(_PROGRAM_NAME)))
        leaves = []
        for i, spec in enumerate(manifest["variables"]):
            buf = zf.read(f"vars/{i}.bin")
            arr = np.frombuffer(buf, dtype=jnp.dtype(spec["dtype"])).reshape(
                spec["shape"]
            )
            leaves.append(arr)
    variables = _unflatten_variables(
        [spec["path"] for spec in manifest["variables"]], leaves
    )
    variables = jax.tree.map(jnp.asarray, variables)

    call = jax.jit(exported.call)

    def predict(images):
        return call(variables, images)

    return predict, manifest


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export a one-file AOT serving artifact (.edz)"
    )
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--snapshot", help="checkpoint dir written by train.py")
    p.add_argument("--phi", type=int, default=None, help="D0..D7 (no snapshot)")
    p.add_argument("--num-classes", type=int, default=90)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--weighted-bifpn", action="store_true", default=None)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument(
        "--platforms",
        default=None,
        help="comma-separated lowering platforms, e.g. tpu,cpu "
        "(default: current backend)",
    )
    p.add_argument(
        "--exact-eval",
        action="store_true",
        help="use EvalConfig.exact (parity eval) instead of serving defaults",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp

    import efficientdet_tpu as ed
    from efficientdet_tpu.configs import (
        EvalConfig,
        train_config_from_snapshot,
    )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    saved_cfg = None
    if args.snapshot:
        cfg_path = os.path.join(args.snapshot, "train_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                saved_cfg = json.load(f)
    from efficientdet_tpu.evaluate import resolve_model_args

    phi, weighted, image_size = resolve_model_args(
        saved_cfg, args.phi, args.weighted_bifpn, args.image_size,
        args.num_classes,
    )
    if phi is None:
        # Neither --phi nor a snapshot train_config.json supplied the model
        # scale — fail with a usable CLI error instead of an opaque KeyError
        # inside ModelConfig.for_phi(None).
        raise SystemExit(
            "error: no model scale: pass --phi 0..7, or --snapshot with a "
            "train_config.json that records phi"
            + (
                f" ({args.snapshot}/train_config.json is missing or has no "
                "model.phi)" if args.snapshot else ""
            )
        )
    model, cfg = ed.build_efficientdet(
        phi,
        num_classes=args.num_classes,
        weighted_bifpn=weighted,
        dtype=dtype,
        image_size=image_size,
    )
    if args.snapshot:
        from efficientdet_tpu.train_lib import create_train_state
        from efficientdet_tpu.utils.checkpoint import CheckpointManager

        tc = train_config_from_snapshot(saved_cfg)
        state = create_train_state(model, tc, jax.random.PRNGKey(0))
        state = CheckpointManager(args.snapshot).restore(state)
        params = (
            state.ema_params
            if args.use_ema and state.ema_params is not None
            else state.params
        )
        variables = {"params": params, "batch_stats": state.batch_stats}
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )

    eval_cfg = (
        EvalConfig.exact(args.num_classes) if args.exact_eval else EvalConfig()
    )
    platforms = args.platforms.split(",") if args.platforms else None
    manifest = save_exported(
        args.out,
        model,
        variables,
        args.batch,
        eval_config=eval_cfg,
        platforms=platforms,
    )
    size_mb = os.path.getsize(args.out) / 1e6
    print(
        json.dumps(
            {
                "event": "exported",
                "out": args.out,
                "mb": round(size_mb, 2),
                "platforms": manifest["platforms"],
                "model": manifest["model"],
                "batch_size": manifest["batch_size"],
            }
        )
    )


if __name__ == "__main__":
    main()
