"""Halo-sharded vs single-device field agreement: budget sweep.

Hypotheses for the ~11% pockets in test_halo_sharded_matches_single_device:
(a) insufficient outer rounds; (b) ALI-update min-lock under the
slab-parallel iteration (stale halos act like the documented inner-mode
min-lock).  (a) is testable with the current API.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "true"
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from alifmm_tpu.ops import sweep  # noqa: E402
from alifmm_tpu.ops.stencils import INF  # noqa: E402
from alifmm_tpu.parallel import shard  # noqa: E402
from test_shard import _model  # noqa: E402


def main():
    model = _model(Z=32, X=40)
    Z, X = 32, 40
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[16, 20].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[16, 20].set(True)

    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=1e-12, max_passes=40, polish_passes=8
    )
    single = np.asarray(single)
    interior = np.s_[2:-2, 2:-2]

    for nd in (4,):
        mesh = Mesh(np.array(jax.devices()[:nd]), ("gz",))
        for n_outer, n_inner, polish in (
            (16, 1, 8), (48, 1, 8), (16, 1, 24), (48, 2, 24),
        ):
            out = np.asarray(shard.solve_halo_sharded(
                tt0, model, fixed, mesh, n_outer=n_outer, n_inner=n_inner,
                polish=polish,
            ))
            rel = np.abs(out[interior] - single[interior]) / np.maximum(
                single[interior], 1e-30)
            sgn = (out[interior] - single[interior])
            print(f"nd={nd} outer={n_outer} inner={n_inner} polish={polish}: "
                  f"median {np.median(rel):.2e} p99 "
                  f"{np.quantile(rel, 0.99):.2e} max {rel.max():.2e} "
                  f"min_signed {sgn.min():.2e} max_signed {sgn.max():.2e}",
                  flush=True)


def main_aniso():
    from alifmm_tpu import grid as gridlib
    from alifmm_tpu import materials as mats

    Z, X = 32, 40
    dnx = 1e-3
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.zeros((361, 2)); p = np.zeros((361, 2))
    g[:, 0] = np.arange(361); p[:, 0] = np.arange(361)
    g[:, 1] = mats.generate_group_vel_curve(c22, c23, c33, c44, rho)
    p[:, 1] = mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    veln = np.round((30.0 + 60.0 * np.sin(zz / 7.0) * np.cos(xx / 6.0)) % 180)
    model = gridlib.make_model(
        veln, np.ones((Z, X), dtype=int), np.ones((Z, X)), None, g, p, dnx,
        dtype=jnp.float64)
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[16, 20].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[16, 20].set(True)
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=1e-12, max_passes=40, polish_passes=8)
    single = np.asarray(single)
    interior = np.s_[2:-2, 2:-2]
    for nd in (4,):
        mesh = Mesh(np.array(jax.devices()[:nd]), ("gz",))
        for n_outer, n_inner, polish in ((16, 1, 8), (48, 1, 24)):
            out = np.asarray(shard.solve_halo_sharded(
                tt0, model, fixed, mesh, n_outer=n_outer, n_inner=n_inner,
                polish=polish))
            rel = np.abs(out[interior] - single[interior]) / np.maximum(
                single[interior], 1e-30)
            sgn = out[interior] - single[interior]
            print(f"ANISO nd={nd} outer={n_outer} inner={n_inner} "
                  f"polish={polish}: median {np.median(rel):.2e} p99 "
                  f"{np.quantile(rel, 0.99):.2e} max {rel.max():.2e} "
                  f"min_signed {sgn.min():.2e} max_signed {sgn.max():.2e}",
                  flush=True)


def main_pocket():
    """Characterise the host-dependent 'pockets': location, sign, absolute
    scale, and distance-split agreement, vs the analytic constant-velocity
    truth (run on the divergent host; see FINDINGS_r2.md 'halo')."""
    model = _model(Z=32, X=40)
    Z, X, dnx, v0, sz, sx = 32, 40, 1e-3, 3000.0, 16, 20
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[sz, sx].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[sz, sx].set(True)
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=1e-12, max_passes=40, polish_passes=8)
    single = np.asarray(single)
    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    out = np.asarray(shard.solve_halo_sharded(
        tt0, model, fixed, mesh, n_outer=16, n_inner=1, polish=8))
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    truth = np.hypot(zz - sz, xx - sx) * dnx / v0
    dist = np.hypot(zz - sz, xx - sx)
    diff = out - single
    rel = np.abs(diff) / np.maximum(single, 1e-30)
    interior = (zz >= 2) & (zz < Z - 2) & (xx >= 2) & (xx < X - 2)
    far = interior & (dist > 10)
    near = interior & (dist <= 10) & (dist > 0)
    bad = rel > 3e-2
    print(f"signed diff: min {diff.min():.3e} max {diff.max():.3e}")
    print(f"cells rel>3e-2: {bad.sum()} (all within dist<=11 of source)")
    print(f"far (dist>10) relmax {rel[far].max():.3e}")
    print(f"near |abs|max {np.abs(diff)[near].max():.3e} "
          f"on t-scale {single[near].max():.3e}")
    if bad.any():
        print("pocket |err vs analytic|: sharded "
              f"{np.abs(out - truth)[bad].max():.3e} single "
              f"{np.abs(single - truth)[bad].max():.3e}")


if __name__ == "__main__":
    import os as _os
    if _os.environ.get("ANISO") == "1":
        main_aniso()
    elif _os.environ.get("POCKET") == "1":
        main_pocket()
    else:
        main()
