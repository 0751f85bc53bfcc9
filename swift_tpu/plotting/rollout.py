"""Forecast rollout animation: one variable over lead times -> GIF.

Equivalent of the reference rollout animation (reference:
src/swift/plotting/rollout.py:53-95, which uses cartopy; cartopy is not in
this environment so the maps are plain lat/lon pcolormesh — same data, no
coastlines).

CLI: ``python -m swift_tpu.plotting.rollout --pred forecast.zarr
--variable 2m_temperature [--level 500] [--member 0] [--sample 0]``
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def animate_rollout(
    pred_path: str,
    variable: str,
    out_path: str | None = None,
    sample: int = 0,
    member: int = 0,
    level: int | None = None,
    fps: int = 4,
    cmap: str = "coolwarm",
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as anim
    import matplotlib.pyplot as plt

    from swift_tpu.utils.zarr_lite import open_group

    g = open_group(pred_path)
    lat = np.asarray(g["latitude"])
    lon = np.asarray(g["longitude"])
    pred_td = np.asarray(g["prediction_timedelta"])
    arr = g[variable]
    if len(arr.shape) == 6:
        levels = arr.attrs.get("levels")
        lvl_idx = levels.index(level) if (levels and level in levels) else 0
        data = arr[sample, member][:, lvl_idx]  # (steps+1, H, W)
    else:
        data = arr[sample, member]  # (steps+1, H, W)

    vmin, vmax = np.percentile(data, [2, 98])
    fig, ax = plt.subplots(figsize=(8, 4))
    mesh = ax.pcolormesh(lon, lat, data[0], cmap=cmap, vmin=vmin, vmax=vmax,
                         shading="auto")
    fig.colorbar(mesh, ax=ax, shrink=0.8)
    title = ax.set_title(f"{variable} — lead 0h")

    def update(i):
        mesh.set_array(data[i].ravel())
        lead = pred_td[i].astype("timedelta64[h]").astype(int)
        title.set_text(f"{variable} — lead {lead}h")
        return mesh, title

    ani = anim.FuncAnimation(fig, update, frames=len(data), blit=False)
    out_path = out_path or os.path.join(
        os.path.dirname(pred_path), f"rollout_{variable}.gif"
    )
    ani.save(out_path, writer=anim.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True)
    p.add_argument("--variable", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--sample", type=int, default=0)
    p.add_argument("--member", type=int, default=0)
    p.add_argument("--level", type=int, default=None)
    p.add_argument("--fps", type=int, default=4)
    args = p.parse_args()
    out = animate_rollout(args.pred, args.variable, args.out, args.sample,
                          args.member, args.level, args.fps)
    print(f"saved: {out}")


if __name__ == "__main__":
    main()
