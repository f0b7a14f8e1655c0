"""Round-3 halo diagnostics: where do sharded-vs-single differences sit?

Cases mirror tests/test_shard.py's round-3 additions:
  2. telescoped halo (solve_ttf_halo) vs single-chip staged solve
  3. the non-multiple-Z pad/crop path
Run: python bench_data/diag_halo_r3.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from alifmm_tpu.utils.io import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from alifmm_tpu import grid as gridlib  # noqa: E402
from alifmm_tpu import solver  # noqa: E402
from alifmm_tpu.parallel import shard  # noqa: E402


def _model(Z=32, X=40, dnx=1e-3, v0=3000.0):
    return gridlib.make_model(
        np.zeros((Z, X)), np.ones((Z, X), dtype=int), v0 * np.ones((Z, X)),
        None, None, None, dnx, dtype=jnp.float64,
    )


SMALL_STAGES = ((1, 9), (2, 3))
SMALL_SEED = 4
DNX = 1e-3


def report(tag, sh, si, srcs):
    rel = np.abs(sh - si) / np.maximum(si, 1e-30)
    Z, X = si.shape[-2:]
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    for b in range(sh.shape[0]):
        r = rel[b]
        idx = np.unravel_index(np.argmax(r), r.shape)
        bad = r > 1e-3
        sz, sx = srcs[b]
        d = np.hypot(zz - sz, xx - sx)
        print(f"{tag} src{b}: max {r.max():.2e} at {idx} "
              f"(src=({sz},{sx})); n>1e-3: {bad.sum()}")
        if bad.any():
            print(f"   bad dist-from-src: {d[bad].min():.1f}..{d[bad].max():.1f}"
                  f"  rows {sorted(set(np.nonzero(bad)[0].tolist()))[:24]}")


def main():
    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    cfg = solver.SolveConfig(final_max_passes=48, final_polish_passes=8,
                             final_rel_tol=1e-10, final_max_polish=48)

    model = _model()
    scx = DNX * np.array([20.0, 5.0])
    scz = DNX * np.array([16.0, 3.0])
    sh, info = shard.solve_ttf_halo(
        model, scx, scz, mesh, cfg=cfg, stages=SMALL_STAGES,
        seed_side=SMALL_SEED, return_info=True,
    )
    sh = np.asarray(sh)
    si = np.asarray(solver._staged_solve(
        model, jnp.asarray(scx), jnp.asarray(scz), SMALL_STAGES,
        SMALL_SEED, -1.0, cfg,
    ))
    print("case2 passes:", int(np.asarray(info.passes)),
          "converged:", bool(np.asarray(info.converged)))
    report("case2", sh, si, [(16, 20), (3, 5)])
    # far-corner arbitration: which side is closer to the analytic
    # straight-ray solution where they disagree?
    Z, X = si.shape[-2:]
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    for b, (szb, sxb) in enumerate([(16, 20), (3, 5)]):
        exact = DNX * np.hypot(zz - szb, xx - sxb) / 3000.0
        rel = np.abs(sh[b] - si[b]) / np.maximum(si[b], 1e-30)
        bad = rel > 1e-3
        if bad.any():
            dsh = np.abs(sh[b] - exact)[bad]
            dsi = np.abs(si[b] - exact)[bad]
            print(f"  src{b} arbitration on {bad.sum()} cells: "
                  f"|sh-exact| mean {dsh.mean():.3e} vs "
                  f"|si-exact| mean {dsi.mean():.3e} "
                  f"({'sharded closer' if dsh.mean() < dsi.mean() else 'single closer'})")

    model30 = _model(Z=30)
    scx3 = DNX * np.array([20.0])
    scz3 = DNX * np.array([15.0])
    sh3 = np.asarray(shard.solve_ttf_halo(
        model30, scx3, scz3, mesh, cfg=cfg, stages=SMALL_STAGES,
        seed_side=SMALL_SEED,
    ))
    si3 = np.asarray(solver._staged_solve(
        model30, jnp.asarray(scx3), jnp.asarray(scz3), SMALL_STAGES,
        SMALL_SEED, -1.0, cfg,
    ))
    report("case3(pad)", sh3, si3, [(15, 20)])


if __name__ == "__main__":
    main()
