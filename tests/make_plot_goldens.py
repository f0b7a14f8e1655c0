"""Regenerate tests/golden/plot_stats.json (the structural plot goldens
asserted by tests/test_plot_golden.py).  Run from the repo root:

    python tests/make_plot_goldens.py
"""

import json
import os
import sys
import tempfile
from pathlib import Path

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")

from test_plot_golden import (  # noqa: E402
    GOLDEN, ink_stats, render_plot_rays, render_ttf_contour,
)


def main():
    out = {}
    with tempfile.TemporaryDirectory() as td:
        png = render_plot_rays(Path(td))
        if png is not None:
            out["plot_rays_src0"] = ink_stats(png)
        else:
            print("reference weld arrays not mounted; skipping plot_rays")
    with tempfile.TemporaryDirectory() as td:
        out["ttf_contour"] = ink_stats(render_ttf_contour(Path(td)))
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN}: {json.dumps(out)[:200]}...")


if __name__ == "__main__":
    main()
