"""Evaluation metrics.

The reference's accuracy metric of record is sklearn's ``r2_score``
between true and inferred weights (demo notebook cell 14;
run_1v10_pipeline_reformatted.py:291-300). Re-implemented here to keep
the core dependency-light.
"""

from __future__ import annotations

import numpy as np


def r2_score(y_true, y_pred):
    """Coefficient of determination, sklearn semantics."""
    y_true = np.asarray(y_true, dtype=float)
    y_pred = np.asarray(y_pred, dtype=float)
    ss_res = np.sum((y_true - y_pred) ** 2)
    ss_tot = np.sum((y_true - y_true.mean()) ** 2)
    if ss_tot == 0:
        return 1.0 if ss_res == 0 else 0.0
    return 1.0 - ss_res / ss_tot


def correlation(a, b):
    """Pearson correlation between flattened arrays."""
    a = np.asarray(a, dtype=float).ravel()
    b = np.asarray(b, dtype=float).ravel()
    if a.std() == 0 or b.std() == 0:
        return 0.0
    return float(np.corrcoef(a, b)[0, 1])


def precision_recall_connections(w_true, w_est):
    """Connection-detection precision/recall from weight vectors."""
    t = np.asarray(w_true) != 0
    e = np.asarray(w_est) != 0
    tp = np.sum(t & e)
    precision = tp / max(np.sum(e), 1)
    recall = tp / max(np.sum(t), 1)
    return float(precision), float(recall)
