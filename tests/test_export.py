"""AOT export artifact (efficientdet_tpu/export.py) — fast tier.

The artifact must reproduce the live predict path exactly (same program,
weights as inputs), carry a manifest the serving host can trust, and
reject artifacts newer than the loader.
"""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientdet_tpu.export import (
    FORMAT_VERSION,
    load_exported,
    save_exported,
)
from efficientdet_tpu.models.detector import fuse_for_inference, make_predict_fn


@pytest.fixture(scope="module")
def artifact(slim_d0, tmp_path_factory):
    model, cfg, variables = slim_d0
    path = str(tmp_path_factory.mktemp("export") / "slim_d0.edz")
    manifest = save_exported(path, model, variables, batch_size=2)
    return path, manifest, model, variables


def test_roundtrip_matches_live_predict(artifact):
    path, _, model, variables = artifact
    images = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (2, 128, 128, 3)), jnp.uint8
    )

    predict, manifest = load_exported(path)
    boxes, scores, classes, n = predict(images)

    fused_model, fused_vars = fuse_for_inference(model, variables)
    ref = make_predict_fn(fused_model)(fused_vars, images)

    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref[1]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(classes), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref[3]))
    assert boxes.shape[0] == 2 and boxes.shape[2] == 4


def test_manifest_records_model_identity(artifact):
    path, manifest, model, _ = artifact
    assert manifest["format_version"] == FORMAT_VERSION
    assert manifest["model"]["phi"] == 0
    assert manifest["model"]["num_classes"] == model.config.num_classes
    assert manifest["model"]["image_size"] == 128
    assert manifest["batch_size"] == 2
    assert manifest["fused_bn"] is True
    # Weights ride as inputs: every leaf is listed with dtype+shape.
    assert len(manifest["variables"]) > 50
    # And the loader reads the same manifest out of the zip.
    with zipfile.ZipFile(path) as zf:
        on_disk = json.loads(zf.read("manifest.json"))
    assert on_disk["model"] == manifest["model"]


def test_loader_rejects_newer_format(artifact, tmp_path):
    path, _, _, _ = artifact
    newer = tmp_path / "newer.edz"
    with zipfile.ZipFile(path) as src, zipfile.ZipFile(newer, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "manifest.json":
                m = json.loads(data)
                m["format_version"] = FORMAT_VERSION + 1
                data = json.dumps(m)
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="newer than this loader"):
        load_exported(str(newer))


def test_wrong_batch_shape_is_rejected(artifact):
    path, _, _, _ = artifact
    predict, _ = load_exported(path)
    bad = jnp.zeros((3, 128, 128, 3), jnp.uint8)  # exported batch is 2
    with pytest.raises(Exception):
        jax.block_until_ready(predict(bad))
