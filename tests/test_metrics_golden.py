"""Golden mAP-machinery parity vs the reference (bit-for-bit on frozen vectors).

The constants below were computed ONCE by executing the reference's own code
on fixed inputs (ultralytics/utils/metrics.py ap_per_class:451-554 and the
detect/val.py:151-174 _process_batch matching semantics) and frozen here, so
our mAP stack is asserted equal to the reference's measurement definition
without importing the reference at test time.

Fixture (ap_per_class): 3 classes with GT counts {0:12, 1:10, 2:8}; 24 true
detections with nested TP rows + 13 false positives, seeded confidences.
Fixture (matching): 6 GT boxes / 8 detections with controlled overlaps,
duplicates, a wrong-class near-hit and a background box.
"""

import numpy as np

from dedark_yolo_tpu.utils.metrics import ap_per_class
from dedark_yolo_tpu.utils import match_predictions

# --- frozen inputs (generated with numpy default_rng(7), see module doc) ---
TP = np.array([
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1, 1, 0, 0, 0],
    [1, 1, 1, 1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
    [1, 1, 0, 0, 0, 0, 0, 0, 0, 0], [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
    [1, 1, 1, 1, 0, 0, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1], [1, 1, 0, 0, 0, 0, 0, 0, 0, 0],
    [1, 1, 1, 1, 1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
    [1, 1, 1, 0, 0, 0, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
    [1, 1, 1, 0, 0, 0, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 0, 0, 0, 0],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
    [1, 1, 1, 1, 1, 0, 0, 0, 0, 0], [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
] + [[0] * 10] * 13, bool)

CONF = np.array([
    0.279383, 0.450569, 0.504093, 0.548148, 0.94595, 0.763396, 0.609961,
    0.940064, 0.243778, 0.194191, 0.601286, 0.089548, 0.082112, 0.5134,
    0.469585, 0.875451, 0.616304, 0.512706, 0.497186, 0.272763, 0.060615,
    0.223162, 0.672829, 0.230546, 0.382583, 0.053361, 0.797043, 0.189015,
    0.290839, 0.842299, 0.508812, 0.812435, 0.625745, 0.717594, 0.132346,
    0.537029, 0.506995])

PRED_CLS = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
                     2, 2, 2, 2, 2, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 2, 2],
                    float)
TARGET_CLS = np.array([0] * 12 + [1] * 10 + [2] * 8, float)

# --- frozen reference outputs (ap_per_class at conf 0.25 f1-argmax point) ---
GOLD_P = [0.6428571428571429, 0.5384615384615384, 0.8]
GOLD_R = [0.75, 0.7, 1.0]
GOLD_F1 = [0.6923076923076924, 0.608695652173913, 0.888888888888889]
GOLD_AP = [
    [0.7360714285714287, 0.7360714285714287, 0.6868532467532467,
     0.6868532467532467, 0.5530927272727271, 0.5530927272727271,
     0.5530927272727271, 0.3325473098330241, 0.15824675324675327,
     0.08975999999999999],
    [0.5015384615384615, 0.5015384615384615, 0.42038461538461536,
     0.42038461538461536, 0.28115384615384614, 0.28115384615384614,
     0.2230769230769231, 0.2230769230769231, 0.2230769230769231,
     0.0423076923076923],
    [0.845, 0.845, 0.845, 0.5750000000000001, 0.3907142857142857,
     0.20624399999999998, 0.13125000000000003, 0.13125000000000003,
     0.13125000000000003, 0.0],
]
GOLD_MP, GOLD_MR = 0.6604395604395604, 0.8166666666666668
GOLD_MAP50, GOLD_MAP = 0.6942032967032968, 0.41013607296513005


def test_ap_per_class_matches_reference_golden():
    _, _, p, r, f1, ap, uc = ap_per_class(TP, CONF, PRED_CLS, TARGET_CLS,
                                          plot=False)
    np.testing.assert_array_equal(uc, [0, 1, 2])
    np.testing.assert_allclose(p, GOLD_P, rtol=1e-10)
    np.testing.assert_allclose(r, GOLD_R, rtol=1e-10)
    np.testing.assert_allclose(f1, GOLD_F1, rtol=1e-10)
    np.testing.assert_allclose(ap, GOLD_AP, rtol=1e-10)
    np.testing.assert_allclose(p.mean(), GOLD_MP, rtol=1e-10)
    np.testing.assert_allclose(r.mean(), GOLD_MR, rtol=1e-10)
    np.testing.assert_allclose(ap[:, 0].mean(), GOLD_MAP50, rtol=1e-10)
    np.testing.assert_allclose(ap.mean(), GOLD_MAP, rtol=1e-10)


# --- matching golden (reference detect/val.py:151-174 semantics) -----------
GT_BOXES = np.array([[10, 10, 50, 50], [60, 60, 120, 120], [30, 80, 90, 140],
                     [100, 10, 160, 60], [5, 100, 45, 150], [70, 5, 110, 45]],
                    np.float32)
GT_CLS = np.array([0, 1, 0, 2, 1, 0], np.float32)
DET = np.array([
    [12, 11, 49, 52, .9, 0],
    [58, 61, 118, 119, .85, 1],
    [31, 79, 88, 142, .8, 1],     # near-hit, wrong class
    [99, 12, 161, 58, .75, 2],
    [6, 101, 44, 149, .7, 1],
    [71, 6, 109, 44, .65, 0],
    [13, 12, 48, 51, .6, 0],      # duplicate of GT 0
    [200, 200, 240, 240, .5, 2],  # background
], np.float32)
GOLD_TP = np.array([
    [1, 1, 1, 1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0, 0, 0, 0, 0]], bool)


def test_match_predictions_matches_reference_golden():
    tp = match_predictions(DET[:, :4], DET[:, 5], GT_BOXES, GT_CLS)
    np.testing.assert_array_equal(tp, GOLD_TP)
