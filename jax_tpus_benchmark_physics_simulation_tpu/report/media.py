"""Animated GIF writers for trajectory / walker visualizations.

Reference GIF pipelines: scatter animation (three_particles...:95-112),
2-panel merger animation (nbody...:248-282), walker histogram frames +
imageio assembly (vmc_dmc...:156-183, 287-314). All reproduced without the
reference's temp-file round trip where possible (frames rendered straight to
RGB buffers).
"""

from __future__ import annotations

from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np



def _imageio():
    try:
        import imageio.v2 as imageio
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "GIF output requires imageio; install the extra: "
            "pip install 'jax_tpus_benchmark_physics_simulation_tpu[media]'"
        ) from e
    return imageio

def _fig_to_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def scatter_gif(
    trajectory,  # (T, N, 2)
    output: str = "trajectory.gif",
    xlim=(-2, 2),
    ylim=(-2, 2),
    fps: int = 50,
    frame_step: int = 1,
    max_frames: int = 500,
) -> str:
    """Particle scatter animation (three_particles...:95-112)."""
    imageio = _imageio()

    traj = np.asarray(trajectory)
    idxs = range(0, traj.shape[0], max(frame_step, traj.shape[0] // max_frames + 1))
    fig, ax = plt.subplots()
    frames = []
    for i in idxs:
        ax.clear()
        ax.set_xlim(*xlim)
        ax.set_ylim(*ylim)
        ax.plot(traj[i, :, 0], traj[i, :, 1], "o")
        frames.append(_fig_to_rgb(fig))
    plt.close(fig)
    imageio.mimsave(output, frames, fps=fps, loop=0)
    return output


def merger_gif(
    t,
    positions,  # (T, n, 2)
    h_plus,  # (T,)
    output: str = "n_body_merger.gif",
    fps: int = 10,
    frame_step: int = 2,
) -> str:
    """Two-panel positions + cumulative strain animation (nbody...:248-282)."""
    imageio = _imageio()

    t = np.asarray(t)
    pos = np.asarray(positions)
    h = np.asarray(h_plus)
    n_bodies = pos.shape[1]
    colors = plt.cm.Set1(np.linspace(0, 1, n_bodies))

    pad = lambda lo, hi: ((hi - lo) * 0.1 if hi > lo else 1.0)
    x_lo, x_hi = pos[..., 0].min(), pos[..., 0].max()
    y_lo, y_hi = pos[..., 1].min(), pos[..., 1].max()
    h_lo, h_hi = h.min(), h.max()

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 6))
    frames = []
    for frame in range(0, len(t), frame_step):
        ax1.clear()
        ax2.clear()
        for i in range(n_bodies):
            ax1.plot(pos[: frame + 1, i, 0], pos[: frame + 1, i, 1], color=colors[i], alpha=0.4, lw=1)
        ax1.scatter(pos[frame, :, 0], pos[frame, :, 1], c=colors[:n_bodies], s=100, zorder=10)
        ax1.set_xlim(x_lo - pad(x_lo, x_hi), x_hi + pad(x_lo, x_hi))
        ax1.set_ylim(y_lo - pad(y_lo, y_hi), y_hi + pad(y_lo, y_hi))
        ax1.set_title(f"Positions at t={t[frame]:.1f}")
        ax2.plot(t[: frame + 1], h[: frame + 1], "r-")
        ax2.set_title("Cumulative GW")
        ax2.set_ylim(h_lo - pad(h_lo, h_hi), h_hi + pad(h_lo, h_hi))
        ax2.grid(True)
        frames.append(_fig_to_rgb(fig))
    plt.close(fig)
    imageio.mimsave(output, frames, fps=fps, loop=0)
    return output


def walker_histogram_gif(
    snapshots,  # (S, n_walkers, dim)
    labels: Optional[Sequence[str]] = None,
    output: str = "walkers.gif",
    fps: int = 10,
    exact_sigma: Optional[float] = None,
) -> str:
    """Walker x-marginal histogram animation (vmc_dmc...:156-183)."""
    imageio = _imageio()

    snaps = np.asarray(snapshots)
    x_theory = np.linspace(-3.5, 3.5, 300)
    psi2 = None
    if exact_sigma is not None:
        psi2 = np.exp(-0.5 * (x_theory / exact_sigma) ** 2)
        psi2 /= np.trapezoid(psi2, x_theory)

    fig = plt.figure(figsize=(10, 6))
    frames = []
    for i, snap in enumerate(snaps):
        plt.clf()
        plt.hist(snap[:, 0], bins=50, density=True, alpha=0.7,
                 label=labels[i] if labels else f"frame {i}")
        if psi2 is not None:
            plt.plot(x_theory, psi2, "r-", linewidth=2, label=r"Exact $|\Psi_0|^2$")
        plt.xlim(-3.5, 3.5)
        plt.ylim(0, 0.8)
        plt.xlabel("Position (x)")
        plt.ylabel(r"$|\Psi(x)|^2$")
        plt.legend()
        frames.append(_fig_to_rgb(fig))
    plt.close(fig)
    imageio.mimsave(output, frames, fps=fps, loop=0)
    return output
