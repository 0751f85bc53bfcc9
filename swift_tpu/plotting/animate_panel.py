"""Multi-variable panel animation (3x3 grid) over forecast lead times.

Equivalent of the reference panel animation (reference:
src/swift/plotting/animate_panel.py:22-148), matplotlib-only.

CLI: ``python -m swift_tpu.plotting.animate_panel --pred forecast.zarr
--variables 2m_temperature geopotential_500 temperature_850 ...``
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _select(group, name: str, sample: int, member: int):
    """Resolve "geopotential_500"-style names against the store layout."""

    if name in group.array_names():
        arr = group[name]
        if len(arr.shape) == 6:
            return arr[sample, member][:, 0]
        return arr[sample, member]
    base, _, lvl = name.rpartition("_")
    if base and base in group.array_names() and lvl.isdigit():
        arr = group[base]
        levels = arr.attrs.get("levels", [])
        if int(lvl) in levels:
            return arr[sample, member][:, levels.index(int(lvl))]
    raise KeyError(f"variable {name} not found in store")


def animate_panel(
    pred_path: str,
    variables: list[str],
    out_path: str | None = None,
    sample: int = 0,
    member: int = 0,
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

    data = {v: _select(g, v, sample, member) for v in variables}
    n = len(variables)
    ncols = min(3, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 2.5 * nrows),
                             squeeze=False)
    meshes = {}
    for i, v in enumerate(variables):
        ax = axes[i // ncols][i % ncols]
        d = data[v]
        vmin, vmax = np.percentile(d, [2, 98])
        meshes[v] = ax.pcolormesh(lon, lat, d[0], cmap=cmap, vmin=vmin,
                                  vmax=vmax, shading="auto")
        ax.set_title(v, fontsize=9)
        ax.set_xticks([])
        ax.set_yticks([])
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    sup = fig.suptitle("lead 0h")

    def update(i):
        for v in variables:
            meshes[v].set_array(data[v][i].ravel())
        lead = pred_td[i].astype("timedelta64[h]").astype(int)
        sup.set_text(f"lead {lead}h")
        return list(meshes.values())

    frames = len(next(iter(data.values())))
    ani = anim.FuncAnimation(fig, update, frames=frames, blit=False)
    out_path = out_path or os.path.join(os.path.dirname(pred_path), "panel.gif")
    ani.save(out_path, writer=anim.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True)
    p.add_argument("--variables", nargs="+", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--sample", type=int, default=0)
    p.add_argument("--member", type=int, default=0)
    p.add_argument("--fps", type=int, default=4)
    args = p.parse_args()
    out = animate_panel(args.pred, args.variables, args.out, args.sample,
                        args.member, args.fps)
    print(f"saved: {out}")


if __name__ == "__main__":
    main()
