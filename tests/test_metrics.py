import numpy as np

from dedark_yolo_tpu.utils.metrics import (ap_per_class, compute_ap, match_predictions,
                                           ConfusionMatrix, DetMetrics)


def test_compute_ap_perfect():
    # perfect detector: precision 1 at all recalls
    recall = np.array([0.2, 0.4, 0.6, 0.8, 1.0])
    precision = np.ones(5)
    ap, _, _ = compute_ap(recall, precision)
    np.testing.assert_allclose(ap, 1.0, atol=0.01)


def test_compute_ap_half():
    recall = np.array([0.5])
    precision = np.array([1.0])
    ap, _, _ = compute_ap(recall, precision)
    # mrec [0, .5, 1], envelope mpre [1, 1, 0]: area = 0.5 + triangle 0.25 = 0.75
    # (np.interp is linear between PR points — matches the reference exactly)
    np.testing.assert_allclose(ap, 0.75, atol=0.01)


def test_ap_per_class_perfect_detector():
    n = 20
    tp = np.ones((n, 10), bool)
    conf = np.linspace(0.9, 0.5, n)
    pred_cls = np.zeros(n)
    target_cls = np.zeros(n)
    tp_c, fp_c, p, r, f1, ap, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_allclose(ap[0], 1.0, atol=0.01)
    assert classes.tolist() == [0]
    assert f1[0] > 0.95


def test_ap_per_class_all_wrong():
    n = 10
    tp = np.zeros((n, 10), bool)
    conf = np.linspace(0.9, 0.5, n)
    pred_cls = np.zeros(n)
    target_cls = np.zeros(5)
    *_, ap, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_allclose(ap[0], 0.0, atol=1e-6)


def test_match_predictions():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    gt_cls = np.array([0.0, 1.0])
    pred = np.array([[0, 0, 10, 10],      # perfect match cls 0
                     [21, 21, 30, 30],    # good match cls 1
                     [0, 0, 10, 10]])     # duplicate of gt0
    pred_cls = np.array([0.0, 1.0, 0.0])
    tp = match_predictions(pred, pred_cls, gt, gt_cls)
    assert tp.shape == (3, 10)
    assert tp[0, 0] and tp[0, -1]        # exact match passes all thresholds
    assert tp[1, 0]                       # iou ~0.73 passes 0.5
    assert not tp[1, -1]                  # but not 0.95
    assert not tp[2].any()                # duplicate unmatched


def test_match_predictions_wrong_class():
    gt = np.array([[0, 0, 10, 10]], float)
    gt_cls = np.array([0.0])
    pred = np.array([[0, 0, 10, 10]], float)
    pred_cls = np.array([1.0])
    tp = match_predictions(pred, pred_cls, gt, gt_cls)
    assert not tp.any()


def test_det_metrics_fitness_and_fork_extras():
    n = 50
    rng = np.random.default_rng(0)
    tp = np.zeros((n, 10), bool)
    tp[:40] = True
    tp[:40, 5:] = rng.random((40, 5)) > 0.3
    conf = rng.uniform(0.3, 1.0, n)
    pred_cls = rng.integers(0, 3, n).astype(float)
    target_cls = rng.integers(0, 3, 45).astype(float)
    dm = DetMetrics(names={0: "a", 1: "b", 2: "c"})
    dm.process(tp, conf, pred_cls, target_cls)
    fit = dm.fitness
    mr = dm.mean_results()
    np.testing.assert_allclose(fit, 0.1 * mr[2] + 0.9 * mr[3], atol=1e-9)
    # fork extras: f1s dense per class, map75 is the per-class AP@0.75 array
    assert dm.f1s.shape == (3,)
    assert dm.box.map75.shape[0] == len(dm.ap_class_index)
    assert 0.0 <= dm.box.mf1 <= 1.0
    assert set(dm.results_dict) == {"metrics/precision(B)", "metrics/recall(B)",
                                    "metrics/mAP50(B)", "metrics/mAP50-95(B)",
                                    "fitness"}


def test_confusion_matrix():
    cm = ConfusionMatrix(nc=2)
    dets = np.array([[0, 0, 10, 10, 0.9, 0],      # correct cls 0
                     [20, 20, 30, 30, 0.8, 1],    # correct cls 1
                     [50, 50, 60, 60, 0.7, 0]])   # false positive
    gt_boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [70, 70, 80, 80]], float)
    gt_cls = np.array([0.0, 1.0, 0.0])
    cm.process_batch(dets, gt_boxes, gt_cls)
    assert cm.matrix[0, 0] == 1          # tp cls0
    assert cm.matrix[1, 1] == 1          # tp cls1
    assert cm.matrix[0, 2] == 1          # fp (background col)
    assert cm.matrix[2, 0] == 1          # missed gt cls0 (background row)
    rate, miss = cm.detection_rates()
    np.testing.assert_allclose(rate, [0.5, 1.0])
    np.testing.assert_allclose(miss, [0.5, 0.0])


def test_confusion_matrix_empty_paths():
    cm = ConfusionMatrix(nc=2)
    cm.process_batch(None, np.zeros((0, 4)), np.zeros(0))  # nothing at all
    assert cm.matrix.sum() == 0
    cm.process_batch(np.array([[0, 0, 5, 5, 0.9, 1]]), np.zeros((0, 4)), np.zeros(0))
    assert cm.matrix[1, 2] == 1


def test_settings_manager(tmp_path):
    from dedark_yolo_tpu.utils.settings import SettingsManager
    f = tmp_path / "settings.yaml"
    s = SettingsManager(file=f)
    assert f.is_file()
    assert "datasets_dir" in s
    # corrupt -> heal
    f.write_text("not: valid: settings: { [")
    s2 = SettingsManager(file=f)
    assert "datasets_dir" in s2
    # drifted keys -> reset
    f.write_text("foo: 1\n")
    s3 = SettingsManager(file=f)
    assert "runs_dir" in s3 and "foo" not in s3


def test_check_imgsz():
    from dedark_yolo_tpu.utils.checks import check_imgsz
    assert check_imgsz(640) == 640
    assert check_imgsz(100) == 128
    assert check_imgsz([100, 640]) == [128, 640]
