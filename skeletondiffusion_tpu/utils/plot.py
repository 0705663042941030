"""3D skeleton visualization: static pose plots and motion animations
(matplotlib); reference `src/utils/{plot,plot_parallel,image}.py`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def plot_pose(ax, pose: np.ndarray, limbseq, left_right: Optional[Sequence[bool]] = None,
              color_left="#3498db", color_right="#e74c3c", alpha=1.0):
    """Draw one [J,3] pose as limb segments on a 3D axis."""
    pose = np.asarray(pose)
    for li, (a, b) in enumerate(np.asarray(limbseq)):
        color = color_right
        if left_right is not None and not left_right[b]:
            color = color_left
        ax.plot(
            [pose[a, 0], pose[b, 0]], [pose[a, 1], pose[b, 1]], [pose[a, 2], pose[b, 2]],
            color=color, alpha=alpha, linewidth=2,
        )


def animate_motion(
    motions: Sequence[np.ndarray],
    skeleton,
    titles: Optional[Sequence[str]] = None,
    out_path: Optional[str] = None,
    fps: int = 25,
    mode: str = "node",
):
    """Side-by-side animation of [T,J,3] motions; saves gif/mp4 when
    ``out_path`` given, else returns the FuncAnimation.  Mirrors the
    reference's notebook visualization flow (`src/utils/plot.py`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    limbseq = skeleton.get_limbseq() if mode == "node" else skeleton.limbseq
    n = len(motions)
    fig = plt.figure(figsize=(4 * n, 4))
    axes = [fig.add_subplot(1, n, i + 1, projection="3d") for i in range(n)]
    T = max(len(m) for m in motions)

    all_pts = np.concatenate([np.asarray(m).reshape(-1, 3) for m in motions], axis=0)
    lo, hi = all_pts.min(0), all_pts.max(0)

    def draw(t):
        for i, (ax, motion) in enumerate(zip(axes, motions)):
            ax.clear()
            ax.set_xlim(lo[0], hi[0])
            ax.set_ylim(lo[1], hi[1])
            ax.set_zlim(lo[2], hi[2])
            ax.set_axis_off()
            if titles:
                ax.set_title(titles[i])
            plot_pose(ax, np.asarray(motion)[min(t, len(motion) - 1)], limbseq,
                      getattr(skeleton, "left_right_limb", None))
        return axes

    anim = FuncAnimation(fig, draw, frames=T, interval=1000 / fps)
    if out_path is not None:
        writer = "pillow" if out_path.endswith(".gif") else "ffmpeg"
        anim.save(out_path, writer=writer, fps=fps)
        plt.close(fig)
        return out_path
    return anim
