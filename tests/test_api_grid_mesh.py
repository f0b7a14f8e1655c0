"""API-level grid-sharded solves: ALI_FMM(grid_mesh=...) must route every
travel-time solve through the telescoped halo-exchange path and match the
single-chip API result (the halo path is fp-identical to single-device
sweeps by construction -- tests/test_shard.py -- so the API comparison is
residual-stop-level)."""

import numpy as np

import jax
from jax.sharding import Mesh

from alifmm_tpu import ALI_FMM


def _weldish(Z=32, X=36):
    rng = np.random.default_rng(3)
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = 3000.0 + 500.0 * np.round(rng.uniform(0, 1, (Z, X)))
    return veln, velpn, vel_map


def test_update_through_grid_mesh_matches_single_chip():
    Z, X = 32, 36
    veln, velpn, vel_map = _weldish(Z, X)
    dnx = 1e-3
    scx = dnx * np.array([6.0, 20.0, 30.0])
    scz = dnx * np.array([0.0, 31.0, 14.0])
    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    opts = dict(final_rel_tol=1e-10, final_max_passes=48,
                final_polish_passes=8, final_max_polish=48)

    fm_mesh = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx,
                      dtype=np.float64, grid_mesh=mesh, solve_opts=opts)
    fm_one = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx,
                     dtype=np.float64, solve_opts=opts)
    got = fm_mesh.update(veln, velpn, vel_map)
    want = fm_one.update(veln, velpn, vel_map)
    assert got.shape == want.shape == (3, Z, X)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)
