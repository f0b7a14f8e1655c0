"""Plot saved ray paths over the weld orientation map (reference
plot_rays.py:1-43 equivalent): one figure per source showing its rays over
``veln % 90`` with isotropic parent metal masked out."""

import os
import sys

import numpy as np

REF = "/root/reference"


def main(in_dir=".", source_index=None, save_to=None):
    import matplotlib

    if save_to:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    veln = np.load(os.path.join(REF, "weld_veln.npy"))
    velpn = np.load(os.path.join(REF, "weld_velpn.npy")).astype(int)
    ray_x = np.load(os.path.join(in_dir, "ray_paths_x.npy"))
    ray_y = np.load(os.path.join(in_dir, "ray_paths_y.npy"))
    ray_len = np.load(os.path.join(in_dir, "ray_len.npy"))

    plot_veln = np.where(velpn == 1, np.nan, veln % 90)

    sources = (
        [source_index]
        if source_index is not None
        else range(ray_len.shape[0])
    )
    for i in sources:
        if ray_len[i].max() == 0:
            continue
        plt.figure(figsize=(8, 7))
        plt.imshow(
            plot_veln, vmin=0, vmax=90, cmap="hsv", interpolation="nearest"
        )
        plt.gca().invert_yaxis()
        for j in range(ray_len.shape[1]):
            n = ray_len[i, j]
            if n > 0:
                plt.plot(ray_x[i, j, :n], ray_y[i, j, :n], "k", lw=0.7)
        plt.title(f"rays from source {i}")
        if save_to:
            plt.savefig(os.path.join(save_to, f"rays_src{i}.png"), dpi=120)
            plt.close()
        else:
            plt.show()


if __name__ == "__main__":
    main(source_index=int(sys.argv[1]) if len(sys.argv) > 1 else None)
