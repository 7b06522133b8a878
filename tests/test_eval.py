"""Tests for the self-written COCO evaluator and VOC AP (SURVEY.md SS7 hard
part #2) on hand-computable fixtures."""

import numpy as np
import pytest

from efficientdet_tpu.evaluation.coco_eval import (
    CocoEvaluator,
    IOU_THRS,
    REC_THRS,
)
from efficientdet_tpu.evaluation.host_overlap import (
    compute_overlap,
    compute_overlap_numpy,
)
from efficientdet_tpu.evaluation.voc import _compute_ap


def gt(img, cat, x, y, w, h, crowd=0, ann_id=[0]):
    return {
        "image_id": img,
        "category_id": cat,
        "bbox": [x, y, w, h],
        "area": w * h,
        "iscrowd": crowd,
    }


def det(img, cat, x, y, w, h, score):
    return {"image_id": img, "category_id": cat, "bbox": [x, y, w, h],
            "score": score}


class TestCocoEval:
    def test_perfect_detections(self):
        gts = [gt(1, 1, 10, 10, 50, 60), gt(1, 1, 200, 200, 40, 40),
               gt(2, 1, 5, 5, 30, 30)]
        ev = CocoEvaluator(gts, image_ids=[1, 2], category_ids=[1])
        ev.add_detections(
            [det(g["image_id"], 1, *g["bbox"], 0.9) for g in gts]
        )
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)
        assert s["AP50"] == pytest.approx(1.0)
        assert s["AR100"] == pytest.approx(1.0)

    def test_half_recall(self):
        # 2 GT, 1 perfect detection -> precision 1 up to recall 0.5.
        gts = [gt(1, 1, 10, 10, 50, 50), gt(1, 1, 200, 200, 50, 50)]
        ev = CocoEvaluator(gts, [1], [1])
        ev.add_detections([det(1, 1, 10, 10, 50, 50, 0.9)])
        s = ev.summarize()
        want = np.mean(REC_THRS <= 0.5)  # 51/101
        assert s["AP50"] == pytest.approx(want, abs=1e-6)
        assert s["AR100"] == pytest.approx(0.5)

    def test_false_positive_after_tp(self):
        gts = [gt(1, 1, 10, 10, 50, 50)]
        ev = CocoEvaluator(gts, [1], [1])
        ev.add_detections(
            [
                det(1, 1, 10, 10, 50, 50, 0.9),  # TP
                det(1, 1, 300, 300, 50, 50, 0.5),  # FP (lower score)
            ]
        )
        s = ev.summarize()
        # precision at every recall point is 1.0 (TP comes first)
        assert s["AP50"] == pytest.approx(1.0)

    def test_iou_threshold_sweep(self):
        # detection with IoU ~0.6 vs gt: TP at thresholds .5,.55,.6, FP above.
        gts = [gt(1, 1, 0, 0, 100, 100)]
        ev = CocoEvaluator(gts, [1], [1])
        # shifted box: overlap 75x100 / union (100x100 + 75x100... compute:
        # det (25,0,100,100): inter 75*100=7500, union=10000+10000-7500=12500
        # IoU = 0.6
        ev.add_detections([det(1, 1, 25, 0, 100, 100, 0.9)])
        s = ev.summarize()
        n_pass = np.sum(IOU_THRS <= 0.6 + 1e-9)
        assert s["AP"] == pytest.approx(n_pass / len(IOU_THRS), abs=1e-6)
        assert s["AP50"] == pytest.approx(1.0)
        assert s["AP75"] == pytest.approx(0.0)

    def test_crowd_gt_ignored_not_fp(self):
        # A detection matching only a crowd gt is ignored (not FP); the
        # other normal gt defines npig=1.
        gts = [gt(1, 1, 0, 0, 100, 100, crowd=1), gt(1, 1, 300, 300, 50, 50)]
        ev = CocoEvaluator(gts, [1], [1])
        ev.add_detections(
            [
                det(1, 1, 10, 10, 50, 50, 0.9),  # inside crowd -> ignored
                det(1, 1, 300, 300, 50, 50, 0.8),  # TP on the normal gt
            ]
        )
        s = ev.summarize()
        assert s["AP50"] == pytest.approx(1.0)

    def test_area_ranges(self):
        small = gt(1, 1, 0, 0, 10, 10)  # area 100 < 32^2
        large = gt(1, 1, 100, 100, 200, 200)  # area 40000 > 96^2
        ev = CocoEvaluator([small, large], [1], [1])
        ev.add_detections(
            [det(1, 1, 0, 0, 10, 10, 0.9), det(1, 1, 100, 100, 200, 200, 0.8)]
        )
        s = ev.summarize()
        assert s["APs"] == pytest.approx(1.0)
        assert s["APl"] == pytest.approx(1.0)
        assert s["APm"] == -1.0  # no medium gt anywhere

    def test_max_dets_one(self):
        gts = [gt(1, 1, 0, 0, 50, 50), gt(1, 1, 200, 200, 50, 50)]
        ev = CocoEvaluator(gts, [1], [1])
        ev.add_detections(
            [det(1, 1, 0, 0, 50, 50, 0.9), det(1, 1, 200, 200, 50, 50, 0.8)]
        )
        s = ev.summarize()
        assert s["AR1"] == pytest.approx(0.5)
        assert s["AR100"] == pytest.approx(1.0)

    def test_duplicate_detection_is_fp(self):
        # second detection on the same gt must not double-match.
        gts = [gt(1, 1, 0, 0, 100, 100)]
        ev = CocoEvaluator(gts, [1], [1])
        ev.add_detections(
            [det(1, 1, 0, 0, 100, 100, 0.9), det(1, 1, 1, 1, 100, 100, 0.8)]
        )
        s = ev.summarize()
        # recall 1 reached with precision 1; beyond that precision drops but
        # 101-pt AP uses the envelope: at all recall points <= 1.0, best
        # precision AT OR AFTER that recall. rc=[1,1]; pr=[1,0.5].
        # envelope -> pr[0]=1. searchsorted(rc,thr,'left') gives idx 0 for
        # all thresholds <= 1 -> q=1.0 everywhere.
        assert s["AP50"] == pytest.approx(1.0)
        # but AR is unaffected
        assert s["AR100"] == pytest.approx(1.0)


class TestVocAp:
    def test_perfect(self):
        ap = _compute_ap(np.array([1.0]), np.array([1.0]))
        assert ap == pytest.approx(1.0)

    def test_half(self):
        ap = _compute_ap(np.array([0.5]), np.array([1.0]))
        assert ap == pytest.approx(0.5)

    def test_precision_envelope(self):
        # recall .5 @ precision .4, recall 1. @ precision .6 -> envelope lifts
        ap = _compute_ap(np.array([0.5, 1.0]), np.array([0.4, 0.6]))
        assert ap == pytest.approx(0.6)


class TestHostOverlap:
    def test_native_matches_numpy(self):
        rng = np.random.RandomState(7)
        a = np.concatenate(
            [rng.uniform(0, 50, (25, 2)), rng.uniform(60, 120, (25, 2))], -1
        )
        b = np.concatenate(
            [rng.uniform(0, 50, (9, 2)), rng.uniform(60, 120, (9, 2))], -1
        )
        np.testing.assert_allclose(
            compute_overlap(a, b), compute_overlap_numpy(a, b), atol=1e-12
        )

    def test_empty(self):
        assert compute_overlap(np.zeros((0, 4)), np.zeros((3, 4))).shape == (0, 3)


class TestResolveModelArgs:
    """evaluate.py's snapshot-config precedence (self-describing restore)."""

    def test_no_saved_config_passthrough(self):
        from efficientdet_tpu.evaluate import resolve_model_args

        assert resolve_model_args(None, 3, None, None, 20) == (3, None, None)

    def test_saved_phi_wins_and_fallbacks_apply(self, capsys):
        from efficientdet_tpu.evaluate import resolve_model_args

        saved = {"model": {"phi": 6, "weighted_bifpn": True,
                           "image_size": 1280, "num_classes": 20}}
        phi, weighted, size = resolve_model_args(saved, 0, None, None, 20)
        assert (phi, weighted, size) == (6, True, 1280)
        assert "WARNING" in capsys.readouterr().out  # phi override warned

    def test_cli_explicit_flags_beat_saved(self):
        from efficientdet_tpu.evaluate import resolve_model_args

        saved = {"model": {"phi": 0, "weighted_bifpn": True,
                           "image_size": 512, "num_classes": 20}}
        phi, weighted, size = resolve_model_args(saved, 0, False, 640, 20)
        assert (phi, weighted, size) == (0, False, 640)

    def test_num_classes_mismatch_warns(self, capsys):
        from efficientdet_tpu.evaluate import resolve_model_args

        saved = {"model": {"phi": 0, "num_classes": 90}}
        resolve_model_args(saved, 0, None, None, 20)
        assert "num_classes" in capsys.readouterr().out
