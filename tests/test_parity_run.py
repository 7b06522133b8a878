"""Drive tools/parity_run.py end-to-end on synthetic automl-style weights.

VERDICT r2 next #9: the weights-day runbook itself must be tested so it
cannot rot — this builds a slim detector, exports its variables through
``export_detector_tf_style`` (the exact {tf_name: array} shape an official
checkpoint dump has), writes them to .npz, and runs the real
``parity_run.main`` over a 2-image synthetic COCO set: strict full-coverage
import -> exact COCO eval -> one JSON parity line.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # full predict compile: full-tier only

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture
def coco_dir(tmp_path):
    img_dir = tmp_path / "val2017"
    img_dir.mkdir()
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    images, anns = [], []
    rng = np.random.RandomState(0)
    for i, (w, h) in enumerate([(96, 64), (64, 96)], start=1):
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:012d}.jpg")
        images.append(
            {"id": i, "width": w, "height": h, "file_name": f"{i:012d}.jpg"}
        )
        anns.append({"id": i, "image_id": i, "category_id": 3,
                     "bbox": [5, 5, 30, 30], "area": 900, "iscrowd": 0})
    cats = [{"id": 3, "name": "car"}, {"id": 17, "name": "cat"}]
    with open(ann_dir / "instances_val2017.json", "w") as f:
        json.dump(
            {"images": images, "annotations": anns, "categories": cats}, f
        )
    return str(tmp_path)


def test_parity_run_end_to_end(tmp_path, coco_dir, capsys):
    import dataclasses

    import parity_run
    from efficientdet_tpu.configs import ModelConfig
    from efficientdet_tpu.models.detector import EfficientDet
    from efficientdet_tpu.utils.convert import export_detector_tf_style

    # The same slim shape parity_run builds from its shrink flags below.
    cfg = dataclasses.replace(
        ModelConfig.for_phi(0, num_classes=2, image_size=128),
        bifpn_width=8, bifpn_depth=1, head_depth=1,
    )
    model = EfficientDet(config=cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(7), jnp.zeros((1, 128, 128, 3))
    )
    tf_vars = export_detector_tf_style(variables, cfg)
    weights = tmp_path / "synthetic_d0.npz"
    np.savez(weights, **tf_vars)

    parity_run.main([
        "--weights", str(weights),
        "--coco-path", coco_dir,
        "--phi", "0",
        "--num-classes", "2",
        "--image-size", "128",
        "--bifpn-width", "8",
        "--bifpn-depth", "1",
        "--head-depth", "1",
        "--batch-size", "2",
        "--dtype", "f32",
        "--paper-ap", "0.0",
    ])
    out = capsys.readouterr().out
    assert "strict full-coverage import ok" in out
    parity_lines = [
        json.loads(ln) for ln in out.splitlines()
        if ln.startswith("{") and '"parity"' in ln
    ]
    assert len(parity_lines) == 1
    rec = parity_lines[0]
    assert rec["phi"] == 0 and rec["images"] == 2
    assert np.isfinite(rec["AP"]) and "within_0.2" in rec
    assert rec["delta"] == rec["AP"] - rec["paper_AP"]

    # The import is not a no-op: weights round-tripped from the EXPORTED
    # archive, so a second import must be idempotent and a perturbed
    # archive must fail the strict shape gate.
    bad = dict(tf_vars)
    k = sorted(bad)[0]
    bad[k] = bad[k].reshape(-1)[: max(bad[k].size - 1, 1)]
    bad_path = tmp_path / "bad.npz"
    np.savez(bad_path, **bad)
    with pytest.raises(Exception):
        parity_run.main([
            "--weights", str(bad_path),
            "--coco-path", coco_dir,
            "--phi", "0", "--num-classes", "2", "--image-size", "128",
            "--bifpn-width", "8", "--bifpn-depth", "1", "--head-depth", "1",
            "--batch-size", "2", "--dtype", "f32", "--paper-ap", "0.0",
        ])


def test_parity_run_model_classes_exceed_dataset(tmp_path, coco_dir, capsys):
    """The real weights-day shape: a 90-class automl-convention model on a
    dataset that annotates fewer categories (here 4-class vs 2 categories
    with non-contiguous ids {3, 17}). The drill must use the
    category_id = label + 1 mapping and drop unannotated labels instead of
    KeyError-ing on the dataset's contiguous 80-label map."""
    import dataclasses

    import parity_run
    from efficientdet_tpu.configs import ModelConfig
    from efficientdet_tpu.models.detector import EfficientDet
    from efficientdet_tpu.utils.convert import export_detector_tf_style

    cfg = dataclasses.replace(
        ModelConfig.for_phi(0, num_classes=4, image_size=128),
        bifpn_width=8, bifpn_depth=1, head_depth=1,
    )
    model = EfficientDet(config=cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 128, 128, 3))
    )
    weights = tmp_path / "synthetic_4c.npz"
    np.savez(weights, **export_detector_tf_style(variables, cfg))

    parity_run.main([
        "--weights", str(weights),
        "--coco-path", coco_dir,
        "--phi", "0",
        "--num-classes", "4",
        "--image-size", "128",
        "--bifpn-width", "8", "--bifpn-depth", "1", "--head-depth", "1",
        "--batch-size", "2", "--dtype", "f32", "--paper-ap", "0.0",
    ])
    out = capsys.readouterr().out
    assert "label map: automl 90-id convention" in out
    assert "1/4 labels have annotated categories" in out
    rec = [
        json.loads(ln) for ln in out.splitlines()
        if ln.startswith("{") and '"parity"' in ln
    ][-1]
    assert np.isfinite(rec["AP"])  # eval completed, no KeyError
