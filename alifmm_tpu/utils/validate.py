"""Model sanity checks (min_max_vel, Anis_TTF_rays.py:3736-3787)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import grid as gridlib
from .. import materials as mats

__all__ = ["min_max_vel"]


def min_max_vel(model: gridlib.Model):
    """Minimum / maximum group velocity over the model.

    Replicates the reference check: stiffness cells sample the group
    velocity at 0/45/90/135 degrees (Anis_TTF_rays.py:3780); table cells
    scale the table's min/max by vel_map (:3785-3786).  Fully vectorised.
    """
    tab_min = jnp.min(model.group_tab, axis=0)
    tab_max = jnp.max(model.group_tab, axis=0)
    m = model.velpn
    v_tab_min = model.vel_map * jnp.take(tab_min, m)
    v_tab_max = model.vel_map * jnp.take(tab_max, m)
    if model.has_stif:
        vels = []
        for ang in (0.0, 45.0, 90.0, 135.0):
            vels.append(
                mats.group_velocity_christoffel(
                    jnp.full(model.shape, ang, model.vel_map.dtype),
                    model.stif[..., 0],
                    model.stif[..., 1],
                    model.stif[..., 2],
                    model.stif[..., 3],
                    model.stif[..., 4],
                    model.vel_map,
                )
            )
        v_st = jnp.stack(vels)
        v_st_min = jnp.min(v_st, axis=0)
        v_st_max = jnp.max(v_st, axis=0)
        use_tab = m != 0
        v_min = jnp.where(use_tab, v_tab_min, v_st_min)
        v_max = jnp.where(use_tab, v_tab_max, v_st_max)
    else:
        v_min, v_max = v_tab_min, v_tab_max
    return float(jnp.min(v_min)), float(jnp.max(v_max))
