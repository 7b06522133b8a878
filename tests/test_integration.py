"""Integration tests (SURVEY.md SS4): train->eval loop on synthetic data and
GT-fed COCO eval through the full collect/rescale path."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

import efficientdet_tpu as ed
from efficientdet_tpu.configs import EvalConfig, ModelConfig, TrainConfig
from efficientdet_tpu.data import CocoDataset, CsvDataset, batch_iterator
from efficientdet_tpu.evaluation.coco_eval import evaluate_coco
from efficientdet_tpu.evaluation.voc import evaluate_voc, mean_ap
from efficientdet_tpu.models.detector import EfficientDet, make_predict_fn
from efficientdet_tpu.train_lib import create_train_state, make_train_step

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (pytest -m '')


def tiny_model(num_classes=1, image_size=128):
    cfg = dataclasses.replace(
        ModelConfig.for_phi(0, num_classes=num_classes, image_size=image_size),
        bifpn_width=16,
        bifpn_depth=1,
        head_depth=1,
    )
    return EfficientDet(config=cfg), cfg


@pytest.fixture(scope="module")
def synth_csv(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.RandomState(0)
    rows = []
    for i in range(6):
        w, h = int(rng.randint(100, 180)), int(rng.randint(100, 180))
        img = rng.randint(0, 60, (h, w, 3)).astype(np.uint8)
        x1, y1 = rng.randint(5, 30, 2)
        bw, bh = rng.randint(40, 70, 2)
        x2, y2 = int(min(x1 + bw, w - 2)), int(min(y1 + bh, h - 2))
        img[y1:y2, x1:x2] = (230, 40, 40)
        Image.fromarray(img).save(root / f"im{i}.png")
        rows.append(f"{root}/im{i}.png,{x1},{y1},{x2},{y2},box")
    (root / "a.csv").write_text("\n".join(rows) + "\n")
    (root / "c.csv").write_text("box,0\n")
    return CsvDataset(str(root / "a.csv"), str(root / "c.csv"))


class TestTrainEvalLoop:
    def test_overfit_then_eval(self, synth_csv):
        model, cfg = tiny_model(num_classes=1, image_size=128)
        tc = TrainConfig(batch_size=3, learning_rate=1e-3)
        state = create_train_state(model, tc, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, tc))
        it = batch_iterator(
            synth_csv, 3, target_size=128, max_gt=5, shuffle=True,
            repeat=True, seed=0,
        )
        from efficientdet_tpu.ops.preprocess import preprocess_batch_fixed

        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(30):
            b = next(it)
            batch = {
                "images": preprocess_batch_fixed(jnp.asarray(b["images"])),
                "gt_boxes": jnp.asarray(b["gt_boxes"]),
                "gt_labels": jnp.asarray(b["gt_labels"]),
            }
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.65, (losses[0], losses[-1])

        # eval path end-to-end (plumbing; tiny model may or may not detect)
        predict = make_predict_fn(
            model, EvalConfig(max_detections=20, pre_nms_top_k=200)
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        aps = evaluate_voc(
            synth_csv, predict, variables, 128, batch_size=3
        )
        assert set(aps) == {0}
        ap, n_ann = aps[0]
        assert n_ann == 6
        assert 0.0 <= ap <= 1.0
        assert 0.0 <= mean_ap(aps) <= 1.0


@pytest.fixture
def coco_ds(tmp_path):
    img_dir = tmp_path / "val2017"
    img_dir.mkdir()
    (tmp_path / "annotations").mkdir()
    rng = np.random.RandomState(1)
    images, anns = [], []
    aid = 1
    for i in range(1, 5):
        w, h = int(rng.randint(90, 160)), int(rng.randint(90, 160))
        Image.fromarray(rng.randint(0, 255, (h, w, 3)).astype(np.uint8)).save(
            img_dir / f"{i:012d}.jpg"
        )
        images.append({"id": i, "width": w, "height": h,
                       "file_name": f"{i:012d}.jpg"})
        for _ in range(rng.randint(1, 4)):
            bw, bh = int(rng.randint(20, 40)), int(rng.randint(20, 40))
            x = int(rng.randint(0, w - bw - 1))
            y = int(rng.randint(0, h - bh - 1))
            anns.append({
                "id": aid, "image_id": i,
                "category_id": int(rng.choice([3, 17])),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            aid += 1
    cats = [{"id": 3, "name": "car"}, {"id": 17, "name": "cat"}]
    with open(tmp_path / "annotations" / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": anns, "categories": cats}, f)
    return CocoDataset(str(tmp_path), "val2017")


class TestCocoEvalEndToEnd:
    def test_gt_fed_detections_give_ap_1(self, coco_ds):
        """Feed GT boxes through the full batched collect/rescale path."""
        batch_size, size = 2, 128

        # Precompute what each batch's "detections" should be, in model
        # coords, by walking the same deterministic iterator.
        ref_batches = list(
            batch_iterator(coco_ds, batch_size, target_size=size,
                           shuffle=False, drop_last=False)
        )
        state = {"i": 0}

        def fake_predict(variables, images):
            b = ref_batches[state["i"]]
            state["i"] += 1
            B = images.shape[0]
            D = 10
            boxes = np.zeros((B, D, 4), np.float32)
            scores = np.full((B, D), -1.0, np.float32)
            classes = np.full((B, D), -1, np.int32)
            nvalid = np.zeros((B,), np.int32)
            for bi in range(B):
                k = int((b["gt_labels"][bi] >= 0).sum())
                boxes[bi, :k] = b["gt_boxes"][bi, :k]
                scores[bi, :k] = 0.9
                classes[bi, :k] = b["gt_labels"][bi, :k]
                nvalid[bi] = k
            return boxes, scores, classes, nvalid

        stats = evaluate_coco(coco_ds, fake_predict, None, size,
                              batch_size=batch_size)
        assert stats["AP"] == pytest.approx(1.0, abs=1e-6), stats
        assert stats["AR100"] == pytest.approx(1.0, abs=1e-6)

    def test_shifted_detections_lower_ap(self, coco_ds):
        ref_batches = list(
            batch_iterator(coco_ds, 2, target_size=128, shuffle=False,
                           drop_last=False)
        )
        state = {"i": 0}

        def fake_predict(variables, images):
            b = ref_batches[state["i"]]
            state["i"] += 1
            B = images.shape[0]
            boxes = np.zeros((B, 10, 4), np.float32)
            scores = np.full((B, 10), -1.0, np.float32)
            classes = np.full((B, 10), -1, np.int32)
            nvalid = np.zeros((B,), np.int32)
            for bi in range(B):
                k = int((b["gt_labels"][bi] >= 0).sum())
                # shift boxes by 20% of their width -> IoU = 0.8/1.2 = 0.667:
                # TP at IoU thresholds .50/.55/.60/.65, FP above
                g = b["gt_boxes"][bi, :k].copy()
                g[:, [0, 2]] += 0.2 * (g[:, 2] - g[:, 0])[:, None]
                boxes[bi, :k] = g
                scores[bi, :k] = 0.9
                classes[bi, :k] = b["gt_labels"][bi, :k]
                nvalid[bi] = k
            return boxes, scores, classes, nvalid

        stats = evaluate_coco(coco_ds, fake_predict, None, 128, batch_size=2)
        # letterbox scaling preserves IoU exactly, so this is deterministic
        assert stats["AP50"] == pytest.approx(1.0, abs=1e-6)
        assert stats["AP75"] == pytest.approx(0.0, abs=1e-6)
        assert stats["AP"] == pytest.approx(0.4, abs=1e-6)  # 4/10 thresholds


class TestCliRoundTrip:
    @pytest.mark.skipif(
        not __import__("os").environ.get("RUN_SLOW_TESTS"),
        reason="full-size D0 through both CLIs on the 8-device CPU mesh "
        "takes >20 min; set RUN_SLOW_TESTS=1 to include (the same flow is "
        "driven on real hardware — README 'Tests / bench / driver hooks')",
    )
    def test_train_cli_then_evaluate_cli(self, synth_csv, tmp_path):
        """The reference workflow end-to-end at CLI level: train.py writes a
        snapshot, evaluate.py restores it and prints mAP (SURVEY.md SS2
        "Training CLI" / "VOC-style eval")."""
        from efficientdet_tpu import evaluate as eval_cli
        from efficientdet_tpu import train as train_cli

        import os

        base = synth_csv.base_dir  # CsvDataset fixture wrote a.csv / c.csv
        annots, classes = os.path.join(base, "a.csv"), os.path.join(base, "c.csv")
        snap = str(tmp_path / "ckpt")
        # conftest runs on 8 fake devices: batch must divide over the mesh
        train_cli.main([
            "csv", annots, classes,
            "--phi", "0", "--image-size", "128", "--batch-size", "8",
            "--epochs", "1", "--steps", "2", "--no-eval",
            "--snapshot-path", snap, "--log-file", str(tmp_path / "log.jsonl"),
        ])
        log = (tmp_path / "log.jsonl").read_text().strip().splitlines()
        assert log and np.isfinite(json.loads(log[-1])["loss"])

        eval_cli.main([
            "csv", annots, classes,
            "--snapshot", snap, "--phi", "0", "--image-size", "128",
            "--batch-size", "8", "--dtype", "f32", "--max-images", "4",
        ])

        # predict CLI straight off the train snapshot (partial restore of
        # params+batch_stats from the TrainState checkpoint)
        from efficientdet_tpu import predict as predict_cli
        from PIL import Image

        img_path = str(tmp_path / "in.png")
        Image.fromarray(
            np.random.RandomState(0).randint(
                0, 255, (96, 128, 3), np.uint8
            )
        ).save(img_path)
        out_path = str(tmp_path / "out.png")
        predict_cli.main([
            "--phi", "0", "--checkpoint", snap, "--image", img_path,
            "--output", out_path, "--num-classes", "1",
            "--score-threshold", "0.0",
        ])
        assert os.path.exists(out_path)
