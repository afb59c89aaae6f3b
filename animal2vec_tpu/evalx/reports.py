"""Evaluation reports: frame-wise and segmented classification metrics.

Replaces nn/utils.py:214-348 (log_metrics) and the derived-metric lambdas of
nn/criterions.py:329-366: sklearn classification reports, micro-averaged
P/R/F1 from summed confusion counts, PR curves + mAP, IoU/split/merge
histograms — written to tensorboardX when available, always returned as
plain dicts.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger("animal2vec_tpu")


def derived_prf(tp: float, fp: float, tn: float, fn: float) -> Dict[str, float]:
    """Accuracy/precision/recall/F1 from summed counts, matching
    nn/criterions.py:329-366 (percentages, nan on empty denominators)."""
    def safe(num, den):
        return round(num / den, 3) if den > 0 else float("nan")

    total = tp + fp + tn + fn
    return {
        "accuracy": safe((tp + tn) * 100.0, total),
        "precision": safe(tp * 100.0, tp + fp),
        "recall": safe(tp * 100.0, tp + fn),
        "f1": safe(tp * 200.0, 2 * tp + fn + fp),
    }


def classification_report_frames(
    labels: np.ndarray,
    probs: np.ndarray,
    class_names: Sequence[str],
    threshold: float,
) -> Dict[str, Dict[str, float]]:
    """Per-class + micro/macro P/R/F1 on thresholded sigmoid probabilities
    (sklearn classification_report as used at nn/utils.py:224-231)."""
    from sklearn.metrics import classification_report

    labels = labels.reshape(-1, labels.shape[-1])
    preds = (probs.reshape(-1, probs.shape[-1]) >= threshold).astype(np.int64)
    return classification_report(
        labels, preds, target_names=list(class_names), zero_division=0, output_dict=True
    )


def mean_average_precision(labels: np.ndarray, probs: np.ndarray) -> float:
    from sklearn.metrics import average_precision_score

    labels = labels.reshape(-1, labels.shape[-1])
    probs = probs.reshape(-1, probs.shape[-1])
    return float(average_precision_score(labels, probs))


def confusion_matrix_figure(
    labels: np.ndarray,
    probs: np.ndarray,
    class_names: Sequence[str],
    threshold: float,
):
    """Per-class 2x2-summed confusion heatmap as a matplotlib figure
    (replaces nn/utils.py:175-202 without the tensorflow PNG round-trip —
    tensorboardX renders figures directly)."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    labels = labels.reshape(-1, labels.shape[-1]).astype(np.int64)
    preds = (probs.reshape(-1, probs.shape[-1]) >= threshold).astype(np.int64)
    # multilabel confusion: predicted-class x true-class co-occurrence
    n = len(class_names)
    mat = labels.T @ preds  # (true, predicted) co-activations
    fig, ax = plt.subplots(figsize=(max(4, 0.6 * n), max(4, 0.6 * n)))
    im = ax.imshow(mat, cmap="GnBu", origin="upper")
    short = [c[:5] for c in class_names]
    ax.set_xticks(range(n), labels=short, rotation=45, fontsize=8)
    ax.set_yticks(range(n), labels=short, fontsize=8)
    ax.set_xlabel("Prediction")
    ax.set_ylabel("Truth")
    for i in range(n):
        for j in range(n):
            ax.text(j, i, f"{mat[i, j]:.0f}", ha="center", va="center", fontsize=6)
    fig.colorbar(im, shrink=0.8)
    fig.tight_layout()
    return fig


def log_eval_report(
    labels: np.ndarray,
    probs: np.ndarray,
    class_names: Sequence[str],
    threshold: float,
    step: int,
    writer=None,
    prefix: str = "valid",
    segmented: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, float]:
    """Full verbose eval report (nn/utils.py:214-348): frame report, mAP,
    PR curves, optional segmented report + IoU/split/merge histograms."""
    report = classification_report_frames(labels, probs, class_names, threshold)
    out: Dict[str, float] = {}
    for avg in ("micro avg", "macro avg"):
        if avg in report:
            for k in ("precision", "recall", "f1-score"):
                out[f"{prefix}/{avg.split()[0]}_{k}"] = float(report[avg][k])
    out[f"{prefix}/mAP"] = mean_average_precision(labels, probs)

    seg_report = None
    if segmented is not None:
        seg_preds = (segmented["probs"] >= threshold).astype(np.int64)
        from sklearn.metrics import classification_report as cr

        seg_report = cr(
            segmented["targets"], seg_preds, target_names=list(class_names),
            zero_division=0, output_dict=True,
        )
        out[f"{prefix}/segmented_mAP"] = float(
            mean_average_precision(segmented["targets"], segmented["probs"])
        )

    if writer is not None:
        flat_l = labels.reshape(-1, labels.shape[-1])
        flat_p = probs.reshape(-1, probs.shape[-1])
        try:
            writer.add_figure(
                f"{prefix}/confusion",
                confusion_matrix_figure(labels, probs, class_names, threshold),
                step,
            )
        except Exception:  # plotting must never break eval
            pass
        writer.add_pr_curve(f"{prefix}/micro_average", flat_l, flat_p, global_step=step)
        writer.add_scalar(f"{prefix}/mAP", out[f"{prefix}/mAP"], step)
        for ci, name in enumerate(class_names):
            writer.add_pr_curve(
                f"{prefix}/class_{ci}_{name}", flat_l[:, ci], flat_p[:, ci], global_step=step
            )
        for key, value in out.items():
            if key.endswith("mAP"):
                continue
            writer.add_scalar(f"metrics/{key}", value, step)
        if segmented is not None:
            writer.add_pr_curve(
                f"{prefix}/segmented_micro_average",
                segmented["targets"], segmented["probs"], global_step=step,
            )
            for ci, name in enumerate(class_names):
                for hist_key, bins in (("iou", "auto"), ("splits", None), ("mergers", None)):
                    if hist_key not in segmented:
                        continue
                    vals = segmented[hist_key][:, ci]
                    vals = vals[vals != 0]
                    if vals.size > 1:
                        writer.add_histogram(
                            f"{prefix}/{hist_key}_{ci}_{name}", vals, global_step=step,
                            bins=bins or max(1, len(np.unique(vals))),
                        )
        writer.flush()

    logger.info("[step %d] frame report: %s", step, {k: out[k] for k in sorted(out)})
    return out
