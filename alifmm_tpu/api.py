"""Public facade: class ALI_FMM with the reference's exact API surface
(Anis_TTF_rays.py:3789-4705).

Method-for-method parity with the reference class -- __init__ validation,
update / update_parallel / update_i, find_all_TTF_rays(_parallel),
ray_path, add_materials, generate_group_vel / generate_phase_vel,
plot_group / plot_phase -- on a TPU-native engine:

* every travel-time field is solved by the parallel line-sweep solver
  (solver.solve_ttf) and all sources run batched under one vmap;
* "parallel" methods accept the reference's n_threads / low_mem kwargs for
  drop-in compatibility but parallelise over the device instead of
  processes (n_threads is ignored beyond the reference's n_threads == 1
  error, Anis_TTF_rays.py:4573-4574);
* ray tracing runs all source-receiver pairs as one batch
  (rays.trace_rays), sharing each receiver field like the reference's
  fused worker (Anis_TTF_rays.py:3674-3733).

``ttf_mode`` selects the ray-tracing field representation:
  "interp" (default) -- receiver fields are solved on the model grid and
  sampled bilinearly at virtual fine coordinates: the fast path (the
  near-source accuracy comes from the solver's telescoping refinement).
  "grid" -- receiver fields are solved on the subgrid-refined grid like the
  reference's travel_finer_grid: exact parity, more compute/memory.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from . import grid as gridlib
from . import materials as mats
from . import rays as rayslib
from . import solver as solverlib
from .utils import progress as progresslib
from .utils import validate

__all__ = ["ALI_FMM"]


class ALI_FMM:
    """Travel-time fields and ray tracing in anisotropic 2D media.

    Drop-in equivalent of the reference class (Anis_TTF_rays.py:3789).
    """

    def __init__(
        self,
        veln,
        velpn,
        vel_map,
        scx,
        scz,
        group_vel=None,
        phase_vel=None,
        stif_den=None,
        dnx=1e-3,
        dtype=jnp.float32,
        ttf_mode="interp",
        ray_opts=None,
        solve_opts=None,
        grid_mesh=None,
        grid_axis="gz",
    ):
        # --- validation, matching Anis_TTF_rays.py:3818-3838 --------------
        self.stif_den = stif_den
        if stif_den is not None:
            stif_arr = np.asarray(stif_den)
            if stif_arr.dtype != np.int64:
                raise TypeError(
                    "Stifness tensors and density array must have the type "
                    "np.int64. 32bit integers will not work correctly."
                )
            if stif_arr[0, 0, 0] > 1e9:
                print(
                    "Warning: Stifness tensors must be in MPa, due to 64 bit "
                    "integer limitations when solving the christoffel equation"
                )
        velpn = np.asarray(velpn)
        try:
            if not np.issubdtype(velpn.dtype, np.integer):
                raise TypeError("velpn must be a numpy array of integers")
        except TypeError:
            raise
        except Exception:
            raise TypeError("velpn must be a numpy array of integers")

        if group_vel is None:
            g, p = mats.default_tables()
            self.velocity_dat = g
            self.phase_vel = p
        else:
            self.velocity_dat = np.asarray(group_vel)
            self.phase_vel = np.asarray(phase_vel)

        self.veln = np.asarray(veln)
        self.velpn = velpn
        self.vel_map = np.asarray(vel_map)
        self.dnx = dnx
        self.dnz = dnx  # dnz is forced equal (Anis_TTF_rays.py:3841)
        self.nnx = self.veln.shape[1]
        self.nnz = self.veln.shape[0]
        self.ttn = np.zeros(self.veln.shape)
        self.scx = np.asarray(scx, dtype=float)
        self.scz = np.asarray(scz, dtype=float)
        self.gox = 0
        self.goz = 0
        self.isx = np.round((self.scx - self.gox) / self.dnx)
        self.isz = np.round((self.scz - self.goz) / self.dnz)
        self.ntr = 0
        self.nsrc = len(self.scx)

        # Heap bookkeeping of the reference kept for attribute parity
        # (no heap exists here; the solver is sweep-based).
        snb = 0.5
        self.nsts = np.zeros((self.nnx, self.nnz), dtype=int)
        self.maxbt = round(snb * self.nnx * self.nnz)
        self.btg = np.zeros((self.maxbt, 2), dtype=int)

        self.ray_paths_x = None
        self.ray_paths_y = None
        self.ray_len = None

        self._dtype = dtype
        self._ttf_mode = ttf_mode
        # extra ray-tracer knobs: "tracer" picks the marcher ("search" |
        # "descent" | "auto"); the rest are that tracer's keyword args
        # (see _route_ray_opts: flat knobs reach whichever tracer accepts
        # them -- e.g. step_scale/relax_iters everywhere, quad_vel/
        # cand_stride/exact_materials only "search", score_k/score_stride
        # only "descent", tol/retrace_chunk/descent_kw/search_kw only
        # "auto") -- speed/accuracy trade, default reference geometry
        self._ray_opts = dict(ray_opts or {})
        # solver iteration budget: a solver.SolveConfig (e.g. the
        # SolveConfig.accuracy() / .for_mode("qsv") presets) or a dict of
        # its fields; default is the conservative reference-parity budget
        # -- the weld production tuning is e.g.
        # dict(final_rel_tol=2e-3, final_polish_passes=3, sweep_block=4)
        # (bench.py SOLVE_KW)
        if isinstance(solve_opts, solverlib.SolveConfig):
            self._cfg = solve_opts
        else:
            self._cfg = solverlib.SolveConfig(**dict(solve_opts or {}))
        # Optional jax.sharding.Mesh for grids larger than one chip: every
        # travel-time solve then runs the telescoped halo-exchange path
        # (parallel.shard.solve_ttf_halo) with the grid z-decomposed over
        # ``grid_axis``.  None (default) = single-chip batched solves.
        self._grid_mesh = grid_mesh
        self._grid_axis = grid_axis

    # ------------------------------------------------------------------ #
    # model assembly
    # ------------------------------------------------------------------ #
    def _make_model(self, veln, velpn, vel_map, stif_den):
        if vel_map is None:
            vel_map = np.ones(np.asarray(veln).shape)
        has_stif = stif_den is not None and np.any(np.asarray(stif_den))
        return gridlib.make_model(
            np.asarray(veln),
            np.asarray(velpn),
            np.asarray(vel_map),
            np.asarray(stif_den) if has_stif else None,
            self.velocity_dat,
            self.phase_vel,
            self.dnx,
            dtype=self._dtype,
        )

    def _solve_fields(self, model, scx, scz, subgrid_size, progress=None):
        """Dispatch a batched TTF solve: single-chip vmapped pipeline, or
        the telescoped halo-exchange path when a grid mesh was given."""
        if self._grid_mesh is not None:
            from .parallel import shard

            return shard.solve_ttf_halo(
                model, scx, scz, self._grid_mesh, axis=self._grid_axis,
                subgrid_size=int(subgrid_size), cfg=self._cfg,
            )
        return solverlib.solve_ttf(
            model, scx, scz, int(subgrid_size), self._cfg, progress=progress
        )

    # ------------------------------------------------------------------ #
    # travel-time fields
    # ------------------------------------------------------------------ #
    def update(self, veln, velpn, vel_map=None, stif_den=None,
               subgrid_size=1, sources=None):
        """All-source travel-time fields (ALI_FMM.update,
        Anis_TTF_rays.py:3870-3936).  Sources with mask 0 return zeros."""
        model = self._make_model(veln, velpn, vel_map, stif_den)
        if sources is None:
            sources = np.ones(self.nsrc, dtype=int)
        sources = np.asarray(sources)
        sel = np.nonzero(sources == 1)[0]
        out_fields = self._solve_fields(
            model, self.scx[sel], self.scz[sel], subgrid_size,
            progress=progresslib.auto_bar(f"TTF solve ({len(sel)} sources)"),
        )
        out_fields = np.asarray(out_fields, dtype=np.float64)
        full = np.zeros((self.nsrc,) + out_fields.shape[1:])
        full[sel] = out_fields
        return full

    def update_parallel(self, veln, velpn, vel_map=None, stif_den=None,
                        subgrid_size=1, sources=None, n_threads=2,
                        low_mem=False):
        """Parallel all-source fields (ALI_FMM.update_parallel,
        Anis_TTF_rays.py:3938-4051).  The device batch replaces the process
        pool; n_threads is accepted for compatibility.  With low_mem=True
        each field is saved as temp_TTF_{i}.npy and None is returned,
        matching the reference contract (:3611-3615)."""
        del n_threads
        fields = self.update(veln, velpn, vel_map, stif_den, subgrid_size,
                             sources)
        if low_mem:
            if sources is None:
                sources = np.ones(self.nsrc, dtype=int)
            for i in np.nonzero(np.asarray(sources) == 1)[0]:
                np.save(f"temp_TTF_{i}.npy", fields[i])
            return None
        return fields

    def update_i(self, source_i, veln, velpn, vel_map, stif_den=None,
                 subgrid_size=1):
        """Single-source field (ALI_FMM.update_i,
        Anis_TTF_rays.py:4053-4088)."""
        model = self._make_model(veln, velpn, vel_map, stif_den)
        out = self._solve_fields(
            model,
            self.scx[source_i : source_i + 1],
            self.scz[source_i : source_i + 1],
            subgrid_size,
        )
        return np.asarray(out, dtype=np.float64)[0]

    # ------------------------------------------------------------------ #
    # travel-time fields + rays
    # ------------------------------------------------------------------ #
    @staticmethod
    def _route_ray_opts(tracer, trace_fn, opts):
        """Filter/route the flat ray_opts knobs to the selected tracer.

        For tracer="auto" the flat knobs are placed into descent_kw /
        search_kw (whichever of the two tracers accepts them); explicit
        descent_kw/search_kw entries win over routed flat knobs.  Knobs
        that only a *different* tracer accepts are dropped with a warning;
        keys no tracer accepts raise TypeError.
        """
        import inspect
        import warnings

        _POSITIONAL = {
            "model", "rec_ttf", "ttf_index", "source_xy", "receiver_xy",
            "subgrid_size", "mode",
        }

        def params(fn):
            return set(inspect.signature(fn).parameters) - _POSITIONAL

        d_params = params(rayslib.trace_rays_descent)
        s_params = params(rayslib.trace_rays)
        any_params = d_params | s_params | params(rayslib.trace_rays_auto)
        unknown = [k for k in opts if k not in any_params]
        if unknown:
            raise TypeError(f"unknown ray_opts key(s): {unknown}")

        if tracer == "auto":
            routed = {
                k: opts[k] for k in list(opts)
                if k in params(rayslib.trace_rays_auto)
            }
            descent_kw = dict(routed.pop("descent_kw", None) or {})
            search_kw = dict(routed.pop("search_kw", None) or {})
            dropped = []
            for k, v in opts.items():
                if k in params(rayslib.trace_rays_auto):
                    continue
                hit = False
                if k in d_params:
                    descent_kw.setdefault(k, v)
                    hit = True
                if k in s_params:
                    search_kw.setdefault(k, v)
                    hit = True
                if not hit:
                    dropped.append(k)
            if dropped:
                warnings.warn(
                    f"ray_opts {dropped} not accepted by tracer='auto'; "
                    "dropped", stacklevel=3,
                )
            routed["descent_kw"] = descent_kw
            routed["search_kw"] = search_kw
            return routed

        accepted = params(trace_fn)
        dropped = [k for k in opts if k not in accepted]
        if dropped:
            warnings.warn(
                f"ray_opts {dropped} not accepted by tracer='{tracer}'; "
                "dropped", stacklevel=3,
            )
        return {k: v for k, v in opts.items() if k in accepted}

    def _solve_rays(self, veln, velpn, vel_map, stif_den, subgrid_size,
                    trans_pairs, save_rays):
        model = self._make_model(veln, velpn, vel_map, stif_den)
        s = int(subgrid_size)
        n_trans = len(self.isx)

        if trans_pairs is None:
            # default: upper triangle, one ray per pair
            # (Anis_TTF_rays.py:4291-4297)
            trans_pairs = np.triu(np.ones((n_trans, n_trans)), k=1)
        trans_pairs = np.asarray(trans_pairs)
        rec_idx = np.nonzero(trans_pairs.sum(axis=0) > 0)[0]

        # receiver travel-time fields, batched on device (stage bar =
        # the reference's TTF tqdm bar, Anis_TTF_rays.py:4645)
        ttf_bar = progresslib.auto_bar(
            f"TTF solve ({len(rec_idx)} receivers)"
        )
        ttfs = self._solve_fields(
            model, self.scx[rec_idx], self.scz[rec_idx],
            s if self._ttf_mode == "grid" else 1, progress=ttf_bar,
        )
        rec_pos = {j: k for k, j in enumerate(rec_idx)}

        pair_i, pair_j = np.nonzero(trans_pairs == 1)
        keep = pair_i != pair_j  # reference skips i == j (:4342)
        pair_i, pair_j = pair_i[keep], pair_j[keep]
        new_tx = s * self.isx
        new_ty = s * self.isz
        src_xy = np.stack([new_tx[pair_i], new_ty[pair_i]], axis=1)
        rec_xy = np.stack([new_tx[pair_j], new_ty[pair_j]], axis=1)
        ttf_index = np.array([rec_pos[j] for j in pair_j], dtype=np.int32)

        # tracer="search" (default): reference-parity plane search;
        # "descent": characteristic-descent marcher (fastest);
        # "auto": descent + certified plane-search fallback on any ray
        # whose integrated time exceeds the field's first arrival.
        # Flat knobs are routed to whichever tracer accepts them ("auto":
        # into descent_kw/search_kw); knobs only other tracers accept are
        # dropped with a warning, unknown keys raise.
        opts = dict(self._ray_opts)
        tracer = opts.pop("tracer", "search")
        trace_fn = {
            "search": rayslib.trace_rays,
            "descent": rayslib.trace_rays_descent,
            "auto": rayslib.trace_rays_auto,
        }[tracer]
        opts = self._route_ray_opts(tracer, trace_fn, opts)
        # single batched trace; the bar completes in one tick with the
        # wall time as postfix (reference rays bar, Anis_TTF_rays.py:4646)
        import time as _time

        ray_bar = progresslib.progress_bar(
            len(pair_i), f"rays ({len(pair_i)} pairs)"
        )
        _t0 = _time.perf_counter()
        rx, ry, lens, times = trace_fn(
            model,
            ttfs,
            jnp.asarray(ttf_index),
            jnp.asarray(src_xy),
            jnp.asarray(rec_xy),
            s,
            mode=self._ttf_mode,
            **opts,
        )
        jax.block_until_ready(times)
        ray_bar.set_postfix_str(f"{_time.perf_counter() - _t0:.2f}s")
        ray_bar.update(len(pair_i))
        ray_bar.close()
        rx = np.asarray(rx, dtype=np.float64)
        ry = np.asarray(ry, dtype=np.float64)
        lens = np.asarray(lens)
        times_arr = np.asarray(times, dtype=np.float64)

        times_mat = np.zeros((n_trans, n_trans))
        times_mat[pair_i, pair_j] = times_arr

        if save_rays:
            P = rx.shape[1]
            self.ray_paths_x = np.zeros((n_trans, n_trans, P))
            self.ray_paths_y = np.zeros((n_trans, n_trans, P))
            self.ray_len = np.zeros((n_trans, n_trans), dtype=int)
            # coordinates back on the original grid (:4355-4356)
            self.ray_paths_x[pair_i, pair_j] = rx / s
            self.ray_paths_y[pair_i, pair_j] = ry / s
            self.ray_len[pair_i, pair_j] = lens
        return times_mat

    def find_all_TTF_rays(self, veln, velpn, vel_map=None, subgrid_size=9,
                          trans_pairs=None, stif_den=None, save_rays=True):
        """Travel-time fields + ray tracing for all transducer pairs
        (ALI_FMM.find_all_TTF_rays, Anis_TTF_rays.py:4258-4364).  Returns
        the (n, n) travel-time matrix; paths via ray_path()."""
        return self._solve_rays(
            veln, velpn, vel_map, stif_den, subgrid_size, trans_pairs,
            save_rays,
        )

    def find_all_TTF_rays_parallel(self, veln, velpn, vel_map=None,
                                   subgrid_size=9, trans_pairs=None,
                                   stif_den=None, n_threads=2, low_mem=False,
                                   save_rays=True):
        """Parallel fields + rays (ALI_FMM.find_all_TTF_rays_parallel,
        Anis_TTF_rays.py:4550-4685).  Device batching replaces the process
        pool; results are identical to find_all_TTF_rays."""
        if n_threads == 1:
            raise Exception(
                "n_threads must be greater than 1 for parallel computation"
            )
        del low_mem
        model = self._make_model(veln, velpn, vel_map, stif_den)
        min_vel, max_vel = validate.min_max_vel(model)
        # velocity sanity warnings (Anis_TTF_rays.py:4583-4587)
        if min_vel < 1000:
            warnings.warn(
                f"Minimum velocity of {float(min_vel)} m/s is low: check "
                "model velocities"
            )
        if max_vel > 15000:
            warnings.warn(
                f"Maximum velocity of {float(max_vel)} m/s is high: check "
                "model velocities"
            )
        return self._solve_rays(
            veln, velpn, vel_map, stif_den, subgrid_size, trans_pairs,
            save_rays,
        )

    def ray_path(self, i, j):
        """Trimmed (ray_x, ray_y) for pair (i, j) (ALI_FMM.ray_path,
        Anis_TTF_rays.py:4687-4705)."""
        if self.ray_paths_x is None or self.ray_len is None:
            print("Ray paths have not been calculated")
            return None, None
        n = int(self.ray_len[i, j])
        if n == 0:
            print("Ray path has not been calculated for this pair")
            return None, None
        return self.ray_paths_x[i, j, :n], self.ray_paths_y[i, j, :n]

    # ------------------------------------------------------------------ #
    # materials
    # ------------------------------------------------------------------ #
    def generate_group_vel(self, c_22, c_23, c_33, c_44, density, plot=True):
        """361-entry group-velocity curve from stiffness (Pa) + density
        (ALI_FMM.generate_group_vel, Anis_TTF_rays.py:4112-4160)."""
        curve = mats.generate_group_vel_curve(c_22, c_23, c_33, c_44, density)
        if plot:
            self._plot_polar(curve, "Group Velocity")
        return curve

    def generate_phase_vel(self, c_22, c_23, c_33, c_44, density, plot=True):
        """361-entry phase-velocity curve (ALI_FMM.generate_phase_vel,
        Anis_TTF_rays.py:4162-4206)."""
        curve = mats.generate_phase_vel_curve(c_22, c_23, c_33, c_44, density)
        if plot:
            self._plot_polar(curve, "Phase Velocity")
        return curve

    def add_materials(self, materials, keep_materials=False):
        """Build/extend the velocity tables from material rows
        (ALI_FMM.add_materials, Anis_TTF_rays.py:4208-4256)."""
        g, p, ids = mats.build_tables(
            materials, self.velocity_dat, self.phase_vel, keep_materials
        )
        if keep_materials:
            if len(ids) == 1:
                print("material id of new material is " + str(ids[0]))
            else:
                print(
                    "material id's of new materials are "
                    + str(ids[0]) + " - " + str(ids[-1])
                )
        self.velocity_dat = g
        self.phase_vel = p

    # ------------------------------------------------------------------ #
    # plotting
    # ------------------------------------------------------------------ #
    @staticmethod
    def _plot_polar(curve, title):
        import matplotlib.pyplot as plt

        plt.polar(np.pi / 180 * np.arange(0, 361), curve)
        plt.title(title)
        plt.show()

    def plot_group(self, material_index=1):
        """Polar plot of a table material's group-velocity curve
        (Anis_TTF_rays.py:4101-4110)."""
        import matplotlib.pyplot as plt

        plt.polar(
            np.pi / 180 * self.velocity_dat[:, 0],
            self.velocity_dat[:, material_index],
        )
        plt.show()

    def plot_phase(self, material_index=1):
        """Polar plot of a table material's phase-velocity curve
        (Anis_TTF_rays.py:4090-4099)."""
        import matplotlib.pyplot as plt

        plt.polar(
            np.pi / 180 * self.velocity_dat[:, 0],
            self.phase_vel[:, material_index],
        )
        plt.show()
