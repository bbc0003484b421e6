"""Evaluation plots: threshold curves, per-joint bars, skeleton overlays.

Mirrors the plotting surface of reference handpose_evaluation.py:230-486
(fraction-of-frames-vs-threshold PDF, per-joint mean/max bar charts, 2D
skeleton overlay) using matplotlib's Agg backend — headless-safe.
The VTK 3D renders (plotResult3D/vtkPlotHand, handpose_evaluation.py:
488-681) are replaced by a matplotlib 3D scatter+skeleton (see
plot_result_3d): same information, no VTK dependency.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.colors import hsv_to_rgb


def _finger_colors(n_edges: int, n_fingers: int = 5):
    """HSV ramp per finger, like the reference's jointConnectionColors."""
    hues = [0.00, 0.33, 0.50, 0.66, 0.83, 0.16]
    per = max(1, n_edges // max(n_fingers, 1))
    colors = []
    for i in range(n_edges):
        h = hues[min(i // per, len(hues) - 1)]
        v = 0.5 + 0.5 * ((i % per) + 1) / per
        colors.append(hsv_to_rgb([h, 1.0, v]))
    return colors


def _ensure_dir(path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)


def plot_evaluation(ev, name: str, method_name="Ours", baseline=None):
    """Threshold curve + per-joint mean/max bars -> PDFs under
    ev.subfolder.  Returns the list of written files."""
    baseline = baseline or []
    out = []
    sub = ev.subfolder
    os.makedirs(sub, exist_ok=True)

    # fraction of frames within max-joint distance
    fig, ax = plt.subplots(figsize=(6, 4.5))
    t, frac = ev.successCurve()
    ax.plot(t, 100.0 * frac, label=method_name)
    for label, base in baseline:
        tb, fb = base.successCurve()
        ax.plot(tb, 100.0 * fb, "--", label=label)
    ax.set_xlabel("Distance threshold / mm")
    ax.set_ylabel("Fraction of frames within distance / %")
    ax.set_ylim(0, 100)
    ax.grid(True, alpha=0.3)
    if ev.dolegend:
        ax.legend(loc="lower right")
    p = os.path.join(sub, f"{name}_frameswithin.pdf")
    fig.savefig(p, bbox_inches="tight")
    plt.close(fig)
    out.append(p)

    # per-joint mean and max error bars
    nj = ev.dists.shape[1]
    names = list(ev.joint_names) or [str(i) for i in range(nj)]
    names = (names + [str(i) for i in range(nj)])[:nj] + ["Avg"]
    for kind, vals in (
        ("meanerror", [ev.getJointMeanError(j) for j in range(nj)] + [ev.getMeanError()]),
        ("maxerror", [ev.getJointMaxError(j) for j in range(nj)] + [ev.getMaxError()]),
    ):
        fig, ax = plt.subplots(figsize=(7, 4))
        x = np.arange(nj + 1)
        width = 0.8 / (1 + len(baseline))
        ax.bar(x, vals, width, label=method_name)
        for bi, (label, base) in enumerate(baseline):
            bvals = [base.getJointMeanError(j) if kind == "meanerror"
                     else base.getJointMaxError(j) for j in range(nj)]
            bvals.append(base.getMeanError() if kind == "meanerror" else base.getMaxError())
            ax.bar(x + (bi + 1) * width, bvals, width, label=label)
        ax.set_xticks(x + 0.4)
        ax.set_xticklabels(names, rotation=90, fontsize=7)
        ax.set_ylabel("Error / mm")
        if ev.dolegend:
            ax.legend()
        p = os.path.join(sub, f"{name}_{kind}.pdf")
        fig.savefig(p, bbox_inches="tight")
        plt.close(fig)
        out.append(p)
    return out


def _draw_skeleton(ax, joints2d, connections, annoscale=1.0, gt_style=False):
    colors = _finger_colors(len(connections))
    for ci, (a, b) in enumerate(connections):
        c = (0.5, 0.5, 0.5) if gt_style else colors[ci]
        ax.plot(
            [joints2d[a, 0], joints2d[b, 0]],
            [joints2d[a, 1], joints2d[b, 1]],
            c=c,
            linewidth=2.0 * annoscale,
            alpha=0.6 if gt_style else 1.0,
        )
    ax.scatter(
        joints2d[:, 0], joints2d[:, 1],
        c="0.7" if gt_style else "w", s=8 * annoscale, zorder=3,
    )


def plot_result(ev, dpt, gtcrop, joint_2d, name: Optional[str] = None, showGT=True):
    """2D skeleton overlay on a depth patch -> PNG (or return the figure).
    Mirrors handpose_evaluation.py:348-433."""
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(np.asarray(dpt), cmap="gray", interpolation="nearest")
    if showGT and gtcrop is not None:
        _draw_skeleton(ax, np.asarray(gtcrop), ev.joint_connections, gt_style=True)
    _draw_skeleton(ax, np.asarray(joint_2d), ev.joint_connections)
    ax.axis("off")
    if name is not None:
        p = os.path.join(ev.subfolder, f"{name}.png")
        _ensure_dir(p)
        fig.savefig(p, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return p
    return fig


def plot_result_3d(ev, joints3d, pcl: Optional[np.ndarray] = None,
                   name: Optional[str] = None):
    """3D stick figure (+ optional point cloud), the matplotlib counterpart
    of the reference's VTK render (handpose_evaluation.py:488-618)."""
    joints3d = np.asarray(joints3d)
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    if pcl is not None and len(pcl):
        sub = pcl[:: max(1, len(pcl) // 5000)]
        ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=1, c=sub[:, 2], alpha=0.3)
    colors = _finger_colors(len(ev.joint_connections))
    for ci, (a, b) in enumerate(ev.joint_connections):
        ax.plot(
            joints3d[[a, b], 0], joints3d[[a, b], 1], joints3d[[a, b], 2],
            c=colors[ci], linewidth=2,
        )
    ax.scatter(joints3d[:, 0], joints3d[:, 1], joints3d[:, 2], c="k", s=10)
    if name is not None:
        p = os.path.join(ev.subfolder, f"{name}_3d.png")
        _ensure_dir(p)
        fig.savefig(p, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return p
    return fig
