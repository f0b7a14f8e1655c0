"""Image-content regression for the plotting surface (C33).

The reference pins plot behaviour with committed expected images
(docs/_images/JupyterNotebook_*.png referenced from the docs pages); the
round-4 suite only smoke-tested that plot_rays.py writes *a* PNG.  Here a
deterministic ray buffer is rendered and STRUCTURAL image statistics (ink
fraction, ink bounding box, luminance histogram) are compared against a
committed golden (tests/golden/plot_stats.json, regenerated with
``python tests/make_plot_goldens.py``) -- the test fails when the plot
regresses (rays not drawn, orientation map missing, blank figure), not
just when the file stops being written, while staying robust to
matplotlib version drift in antialiasing and font rendering.
"""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(HERE, "golden", "plot_stats.json")


def ink_stats(png_path):
    """Structural summary of a rendered figure: where and how much ink."""
    import matplotlib.image as mpimg

    img = np.asarray(mpimg.imread(png_path), dtype=float)
    rgb = img[..., :3]
    lum = rgb.mean(axis=-1)
    ink = lum < 0.95
    rows = np.nonzero(ink.any(axis=1))[0]
    cols = np.nonzero(ink.any(axis=0))[0]
    hist, _ = np.histogram(lum[ink], bins=8, range=(0.0, 1.0))
    tot = max(1, int(hist.sum()))
    return dict(
        shape=[int(s) for s in ink.shape],
        ink_frac=float(ink.mean()),
        bbox=[int(rows[0]), int(rows[-1]), int(cols[0]), int(cols[-1])],
        hist=[round(float(h) / tot, 4) for h in hist],
    )


def render_plot_rays(tmp_path):
    """Render plot_rays.py on a fixed synthetic ray buffer (same seed as
    the round-2 smoke test).  Returns the PNG path or None when the
    reference weld arrays are not mounted."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plot_rays_example", os.path.join(HERE, "..", "examples",
                                          "plot_rays.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not os.path.isdir(mod.REF):
        return None
    rng = np.random.default_rng(0)
    n, L = 3, 16
    ray_x = rng.uniform(0, 499, (n, n, L))
    ray_y = rng.uniform(0, 423, (n, n, L))
    ray_len = np.zeros((n, n), dtype=int)
    ray_len[0, 1] = L
    ray_len[0, 2] = L // 2
    in_dir = tmp_path / "rays"
    in_dir.mkdir()
    np.save(in_dir / "ray_paths_x.npy", ray_x)
    np.save(in_dir / "ray_paths_y.npy", ray_y)
    np.save(in_dir / "ray_len.npy", ray_len)
    out = tmp_path / "png"
    out.mkdir()
    mod.main(in_dir=str(in_dir), save_to=str(out))
    return str(out / "rays_src0.png")


def assert_stats_close(got, want):
    assert got["shape"] == want["shape"], (got["shape"], want["shape"])
    rel = abs(got["ink_frac"] - want["ink_frac"]) / max(want["ink_frac"],
                                                        1e-9)
    assert rel < 0.25, (got["ink_frac"], want["ink_frac"])
    for g, w in zip(got["bbox"], want["bbox"]):
        assert abs(g - w) <= 12, (got["bbox"], want["bbox"])
    l1 = float(np.abs(np.array(got["hist"]) - np.array(want["hist"])).sum())
    assert l1 < 0.25, (l1, got["hist"], want["hist"])


def test_plot_rays_content_golden(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("no committed plot golden")
    png = render_plot_rays(tmp_path)
    if png is None:
        pytest.skip("reference weld arrays not mounted")
    want = json.load(open(GOLDEN))["plot_rays_src0"]
    assert_stats_close(ink_stats(png), want)


def test_ttf_contour_content_golden(tmp_path):
    """The tutorial's other plotted artifact class: a travel-time-field
    contour over the weld-crop model, rendered deterministically from the
    solver output and compared structurally."""
    if not os.path.exists(GOLDEN):
        pytest.skip("no committed plot golden")
    want = json.load(open(GOLDEN)).get("ttf_contour")
    if want is None:
        pytest.skip("no ttf_contour golden committed")
    png = render_ttf_contour(tmp_path)
    assert_stats_close(ink_stats(png), want)


def render_ttf_contour(tmp_path):
    """Contour plot of the committed weld-crop golden field (solver output
    is pinned separately by test_weld_crop_golden; this golden isolates
    the PLOTTING surface)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dat = np.load(os.path.join(HERE, "golden", "weld_crop.npz"))
    ttf = np.asarray(dat["fields"][0], dtype=float)
    fig, ax = plt.subplots(figsize=(4, 3), dpi=100)
    ax.contour(ttf * 1e6, levels=12)
    ax.set_title("TTF contours (us)")
    out = str(tmp_path / "ttf_contour.png")
    fig.savefig(out)
    plt.close(fig)
    return out
