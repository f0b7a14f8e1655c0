"""Round-5 solver-stage tuning on the weld workload (real TPU).

Measures: FD-free replace polish (final_polish_fd=False), patch_block,
and looser final budgets -- warm stage times (scalar-read synced) and
accuracy vs a generous accuracy-preset run.

Sync note: block_until_ready does not reliably wait through the axon
tunnel; every timing here ends with a scalar host read.  eps must exceed
the f32 ulp of the source coords (~7e-9) or the tunnel dedupes the run.
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/examples")
sys.path.insert(0, "/root/repo")

from weld_rays import build_workload

from alifmm_tpu import grid as gridlib
from alifmm_tpu import solver

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx = jnp.asarray(sx[rec])
    scz = jnp.asarray(sy[rec])

    def run(name, cfg, reps=4):
        t0 = time.time()
        out = solver.solve_ttf(model, scx, scz, 1, cfg)
        float(jnp.asarray(out).ravel()[0])
        log(f"{name}: compile+run {time.time()-t0:.1f}s")
        best, stages = 1e9, {}
        for r in range(1, reps + 1):
            st = {}

            def stage_rec(stage, total, name, seconds):
                st[f"s{stage}"] = round(seconds, 4)

            t0 = time.time()
            out = solver.solve_ttf(model, scx + r * 1e-7, scz, 1, cfg,
                                   progress=stage_rec)
            float(jnp.asarray(out).ravel()[0])
            dt = time.time() - t0
            if dt < best:
                best, stages = dt, st
        log(f"{name}: warm best {best*1e3:.0f} ms  stages {stages}")
        return np.asarray(out, np.float64), best

    base_cfg = solver.SolveConfig(final_rel_tol=2e-3, final_polish_passes=3,
                                  sweep_block=4, patch_block=2)
    runs = [
        ("base", base_cfg),
        ("nofd", solver.SolveConfig(
            final_rel_tol=2e-3, final_polish_passes=3, sweep_block=4,
            patch_block=2, final_polish_fd=False)),
        ("pblock4", solver.SolveConfig(
            final_rel_tol=2e-3, final_polish_passes=3, sweep_block=4,
            patch_block=4)),
        ("pblock8", solver.SolveConfig(
            final_rel_tol=2e-3, final_polish_passes=3, sweep_block=4,
            patch_block=8)),
        ("tol3e-3 pol2", solver.SolveConfig(
            final_rel_tol=3e-3, final_polish_passes=2, sweep_block=4,
            patch_block=2)),
        ("patchbudget", solver.SolveConfig(
            final_rel_tol=2e-3, final_polish_passes=3, sweep_block=4,
            patch_block=4, patch_max_passes=8, polish_passes=4)),
    ]
    fields = {}
    for name, cfg in runs:
        fields[name], _ = run(name, cfg)

    f_acc, _ = run("accuracy", solver.SolveConfig.accuracy(
        sweep_block=4, patch_block=2), reps=1)

    safe = np.maximum(f_acc, 1e-12)
    for name, f in fields.items():
        d = np.abs(f - f_acc) / safe
        log(f"{name} vs accuracy: max {d.max():.3e}  mean {d.mean():.3e} "
            f" p99 {np.percentile(d, 99):.3e}")


if __name__ == "__main__":
    main()
