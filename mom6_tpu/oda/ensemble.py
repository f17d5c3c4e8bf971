"""Ensemble management and ocean data assimilation.

Re-design of /root/reference/src/ocean_data_assim/MOM_oda_driver.F90
(ensemble filter driver over the ensemble_manager PE partition) and
MOM_oda_incupd.F90 (incremental analysis update).  Where the reference
splits MPI ranks into ensemble members, members here are a leading
vmapped axis — one program, N member states, with ensemble statistics
as axis-0 reductions.

Provided: vmapped ensemble propagation, ensemble mean/spread, a basic
EnKF-style analysis for pointwise observations with inflation, and the
incremental update that applies an analysis increment smoothly over N
steps (oda_incupd).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["EnsembleCfg", "propagate_ensemble", "ensemble_stats",
           "enkf_analysis", "IncrementalUpdate"]


@dataclasses.dataclass(frozen=True)
class EnsembleCfg:
    ensemble_size: int = 4
    inflation: float = 1.02        # multiplicative spread inflation
    obs_error: float = 0.1


def propagate_ensemble(step_fn: Callable, states, n_steps: int = 1):
    """Advance every member with the (member-independent) step_fn.

    states: a pytree whose leaves have a leading ensemble axis."""
    vstep = jax.vmap(step_fn)
    for _ in range(n_steps):
        states = vstep(states)
    return states


def propagate_ensemble_sharded(step_fn: Callable, states,
                               n_steps: int = 1, mesh=None,
                               axis: str = "ens"):
    """Multi-slice ensemble propagation: members sharded over devices
    (the reference ensemble_manager's PE-list partition,
    MOM_oda_driver.F90; here a one-axis device mesh instead of MPI
    pelists).  Each device advances its member slab with the same
    vmapped program; ensemble statistics afterwards are plain
    axis-0 reductions with XLA inserting the gathers.

    mesh: a Mesh with axis ``axis`` (default: all devices on one
    axis).  Leading ensemble dim must divide the axis size."""
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    import numpy as np
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (axis,))
    sharding = NamedSharding(mesh, P(axis))
    states = jax.tree.map(lambda a: jax.device_put(a, sharding),
                          states)
    vstep = jax.jit(jax.vmap(step_fn))
    for _ in range(n_steps):
        states = vstep(states)
    return states


def ensemble_stats(field):
    """(mean, spread) over the leading ensemble axis."""
    mean = jnp.mean(field, axis=0)
    spread = jnp.std(field, axis=0)
    return mean, spread


def enkf_analysis(cfg: EnsembleCfg, field, obs_value, obs_index):
    """Scalar-observation ensemble Kalman update of ``field``.

    field: (ne, ...) member states of one variable; obs_value: the
    observed value at flat index ``obs_index`` of the non-ensemble
    axes.  Returns the updated ensemble (perturbed-obs EnKF)."""
    ne = field.shape[0]
    flat = field.reshape(ne, -1)
    hx = flat[:, obs_index]                        # (ne,)
    hx_mean = jnp.mean(hx)
    x_mean = jnp.mean(flat, axis=0)
    x_pert = (flat - x_mean) * cfg.inflation
    hx_pert = hx - hx_mean
    var_hx = jnp.mean(hx_pert ** 2)
    cov_xh = jnp.mean(x_pert * hx_pert[:, None], axis=0)
    gain = cov_xh / (var_hx + cfg.obs_error ** 2)
    # perturbed observations (deterministic per member index)
    keys = jax.vmap(lambda m: jax.random.fold_in(jax.random.key(0), m))(
        jnp.arange(ne))
    obs_pert = jax.vmap(lambda k: cfg.obs_error * jax.random.normal(k)
                        )(keys)
    innov = (obs_value + obs_pert) - hx            # (ne,)
    new = x_mean[None] + x_pert + innov[:, None] * gain[None]
    return new.reshape(field.shape)


@dataclasses.dataclass
class IncrementalUpdate:
    """Apply an analysis increment over n_steps (oda_incupd)."""
    increment: dict            # {field_name: full increment array}
    n_steps: int

    def apply(self, fields: dict, step: int) -> dict:
        if step >= self.n_steps:
            return fields
        frac = 1.0 / self.n_steps
        return {k: (v + frac * self.increment[k] if k in self.increment
                    else v) for k, v in fields.items()}
