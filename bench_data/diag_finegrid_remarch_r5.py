"""Round-5 (VERDICT item 4): DEMONSTRATE the anisotropic fine-grid tail
mechanism instead of arguing it.

Claim under test: the ~4-5e-2 L-inf deviation between our subgrid=9 solve
and the reference travel_finer_grid on rough anisotropic media is the
REFERENCE's one-pass heap partial-knowledge error -- when the reference's
own algorithm is iterated to convergence (re-marched with its own update /
fouds18_A operators and heap ordering, seeded with its previous field),
the converged reference field should agree with OUR field far tighter
than the one-pass field does.  If it does not, the defect is ours.

Method: Dijkstra-restart marches of the reference's final full-grid loop
(Anis_TTF_rays.py:2775-2817 semantics: pop-min freeze, recompute the 4
neighbours with update() -> fouds18_A() fallback, REPLACE their values),
implemented with heapq + lazy deletion over the reference's own exported
operators (tests/ref_shim.py oracle; no reference code copied).  Each
march uses the previous field as initial keys, so pop order approaches
the true causal order and partial-knowledge stencil selections heal;
iterate until the field stops changing.

Case: the adversarial random-orientation fine-grid golden
(tests/test_fine_and_api.py::test_fine_grid_accuracy_preset_golden_random_aniso,
19x17 grid, seed 3, source (9,8), subgrid 9).
"""
import heapq
import os
import sys
import time

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from alifmm_tpu.utils.io import host_cache_key

jax.config.update("jax_compilation_cache_dir",
                  f"/root/repo/.jax_cache/host-{host_cache_key()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ref_shim import load_reference

from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import solver

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def remarch_once(ref, ttn, frozen, veln_f, velpn_f, vel_map_f, stif_den,
                 dnx, phase_vel, avlist2):
    """One Dijkstra-restart march: every point starts 'far' with its
    previous value as the heap key; pop-min freezes a point and relaxes
    its 4 neighbours with the reference operator (replace semantics).
    ``frozen`` points keep their values (the analytic-seed/telescoped
    region the real algorithm never recomputes at this resolution)."""
    nnz, nnx = ttn.shape
    nsts = -np.ones((nnz, nnx), dtype=int)
    nsts[frozen] = 0
    ttn = ttn.copy()
    heap = [(ttn[z, x], z, x) for z in range(nnz) for x in range(nnx)]
    heapq.heapify(heap)
    n_upd = 0
    while heap:
        v, iz, ix = heapq.heappop(heap)
        if nsts[iz, ix] == 0 or v != ttn[iz, ix]:
            continue  # already frozen / stale key
        nsts[iz, ix] = 0
        for dz, dx in ((0, -1), (0, 1), (-1, 0), (1, 0)):
            z2, x2 = iz + dz, ix + dx
            if not (0 <= z2 < nnz and 0 <= x2 < nnx):
                continue
            if nsts[z2, x2] == 0:
                continue
            new_tt = ref.update(veln_f, velpn_f, vel_map_f, nsts, ttn, z2,
                                x2, dnx, nnz, nnx, phase_vel, stif_den)
            if new_tt == -1.0:
                new_tt = ref.fouds18_A(z2, x2, nsts, ttn, dnx, dnx, nnx,
                                       nnz, veln_f, velpn_f, vel_map_f,
                                       avlist2, stif_den)
            if new_tt != ttn[z2, x2]:
                ttn[z2, x2] = new_tt
                n_upd += 1
            heapq.heappush(heap, (ttn[z2, x2], z2, x2))
    return ttn, n_upd


def main():
    ref = load_reference()
    Z, X = 19, 17
    dnx = 1e-3
    sub = 9
    rng = np.random.default_rng(3)
    c = (263e9, 145e9, 216e9, 129e9, 7800.0)
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(*c)], axis=1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(*c)], axis=1)
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    sz, sx = 9, 8

    want = ref.travel_finer_grid(
        sx * dnx, sz * dnx, veln, velpn.astype(int), vel_map, None, sub,
        g, p, 0, 0, dnx, dnx,
    )
    log("reference one-pass field done")

    model = gridlib.make_model(veln, velpn, vel_map, None, g, p, dnx,
                               dtype=jnp.float64)
    ours = np.asarray(solver.solve_ttf(
        model, np.array([sx * dnx]), np.array([sz * dnx]), subgrid_size=sub,
        cfg=solver.SolveConfig.accuracy(),
    ))[0]
    log("our field done")

    # fine model exactly as travel_finer_grid builds it
    # (Anis_TTF_rays.py:2156-2163: veln int32-truncated, vel_map float32)
    veln_f = ref.finer_grid_n(veln, sub)
    velpn_f = ref.finer_grid_n(velpn.astype(int), sub)
    vel_map_f = ref.finer_grid_n(vel_map, sub, np.float32)
    stif_den = np.zeros((veln_f.shape[0], veln_f.shape[1], 5),
                        dtype=np.int64)

    mask = want > 0

    def rel(a, b):
        return np.abs(a - b)[mask] / want[mask]

    d0 = rel(ours, want)
    log(f"ours vs one-pass heap:  max {d0.max():.3e}  mean {d0.mean():.3e}"
        f"  p99 {np.quantile(d0, 0.99):.3e}")

    # Freeze what the real algorithm never recomputes at this resolution:
    # the analytic seed disc (side1 = 40 fine cells for subgrid 9,
    # Anis_TTF_rays.py:2222-2267) plus the telescoped 9x/3x patch window
    # (size2 = 49 fine cells) whose injected values carry sub-cell
    # resolution the 1x operator cannot reproduce.
    nnz, nnx = want.shape
    fz, fx = sz * sub, sx * sub
    zzf, xxf = np.meshgrid(np.arange(nnz), np.arange(nnx), indexing="ij")
    cheb = np.maximum(np.abs(zzf - fz), np.abs(xxf - fx))
    frozen = cheb <= 49

    ttn = want * sub  # unscaled fine-grid times (the march's native scale)
    prev = ttn.copy()
    for it in range(1, 7):
        ttn, n_upd = remarch_once(ref, ttn, frozen, veln_f, velpn_f,
                                  vel_map_f, stif_den, dnx, p, g)
        delta = np.abs(ttn - prev).max() / ttn.max()
        log(f"re-march {it}: {n_upd} value changes, max delta {delta:.3e}")
        prev = ttn.copy()
        if delta < 1e-12:
            break
    conv = ttn / sub

    d1 = rel(ours, conv)
    d2 = rel(conv, want)
    log(f"ours vs CONVERGED heap: max {d1.max():.3e}  mean {d1.mean():.3e}"
        f"  p99 {np.quantile(d1, 0.99):.3e}")
    log(f"converged vs one-pass:  max {d2.max():.3e}  mean {d2.mean():.3e}"
        f"  (the heap's self-correction)")
    r1 = np.where(mask, np.abs(ours - conv) / np.where(mask, want, 1), 0)
    iz, ix = np.unravel_index(np.argmax(r1), r1.shape)
    log(f"worst ours-vs-converged at ({iz},{ix}), "
        f"{max(abs(iz-fz), abs(ix-fx))} fine cells from source")

    # where the one-pass tail lived, does the converged field agree with us?
    safe = np.where(mask, want, 1.0)
    tail = mask & (np.abs(ours - want) / safe > 1e-2)
    if tail.any():
        dt1 = (np.abs(ours - conv) / safe)[tail]
        dt2 = (np.abs(ours - want) / safe)[tail]
        log(f"at the {tail.sum()} one-pass-tail points (>1e-2): "
            f"ours-vs-converged max {dt1.max():.3e} mean {dt1.mean():.3e} "
            f"vs ours-vs-one-pass max {dt2.max():.3e} mean {dt2.mean():.3e}")

    # region split: inside the frozen telescoped-patch window (where the
    # disagreement is patch-vs-patch, the re-march cannot arbitrate) vs
    # the free far field (where heap ordering is the candidate mechanism)
    for name, sel in (("patch window (cheb<=49)", mask & frozen),
                      ("far field (cheb>49)", mask & ~frozen)):
        a = (np.abs(ours - want) / safe)[sel]
        b = (np.abs(ours - conv) / safe)[sel]
        c2 = (np.abs(conv - want) / safe)[sel]
        log(f"{name}: ours-vs-onepass max {a.max():.3e} mean "
            f"{a.mean():.3e} | ours-vs-conv max {b.max():.3e} mean "
            f"{b.mean():.3e} | heap self-corr max {c2.max():.3e}")


if __name__ == "__main__":
    main()
