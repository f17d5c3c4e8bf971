"""Standard prognostic diagnostics: registration + posting.

The diag-mediator counterpart of the reference's register_diag_field
calls scattered through MOM.F90 / MOM_diagnostics.F90: the prognostic
state (u, v, h, temp, salt, SSH, speed, KE) plus z-space remapped
variants (temp_z, salt_z, u_z, v_z — MOM_diag_remap.F90's ``_z``
diagnostic coordinate).  Used by the solo driver each stats interval;
fields not requested by the diag_table cost nothing (fid = -1).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from mom6_tpu.framework.diag import DiagMediator
from mom6_tpu.framework.diag_remap import (DiagRemapCfg,
                                           build_z_thickness, remap_to_z,
                                           build_rho_thickness)

__all__ = ["PrognosticDiags"]

MODULE = "ocean_model"


@dataclasses.dataclass
class PrognosticDiags:
    med: DiagMediator
    remap_cfg: DiagRemapCfg | None = None
    _h_z: jnp.ndarray | None = None
    _ids: dict = dataclasses.field(default_factory=dict)

    @staticmethod
    def create(med: DiagMediator, grid, vgrid, max_depth: float,
               nz_diag: int | None = None) -> "PrognosticDiags":
        cfg = DiagRemapCfg.uniform(nz_diag or max(vgrid.nk, 1),
                                   max_depth)
        d = PrognosticDiags(med=med, remap_cfg=cfg,
                            _h_z=build_z_thickness(cfg, grid.bathyT))
        r = med.register
        ids = d._ids
        ids["u"] = r(MODULE, "u", "m s-1", "Zonal velocity")
        ids["v"] = r(MODULE, "v", "m s-1", "Meridional velocity")
        ids["h"] = r(MODULE, "h", "m", "Layer thickness")
        ids["temp"] = r(MODULE, "temp", "degC", "Potential temperature")
        ids["salt"] = r(MODULE, "salt", "psu", "Salinity")
        ids["SSH"] = r(MODULE, "SSH", "m", "Sea surface height")
        ids["KE"] = r(MODULE, "KE", "m2 s-2", "Kinetic energy per mass")
        for nm in ("u_z", "v_z", "temp_z", "salt_z"):
            ids[nm] = r(MODULE, nm, "", nm + " on z levels")
        # rho-space diagnostic coordinate (MOM_diag_remap.F90 rho):
        # remapped onto the vgrid's target-density layers
        for nm in ("temp_rho", "salt_rho", "h_rho"):
            ids[nm] = r(MODULE, nm, "", nm + " on rho layers")
        return d

    def any_requested(self) -> bool:
        return any(fid > 0 for fid in self._ids.values())

    def post_state(self, grid, vgrid, state, weight: float = 1.0,
                   eos=None):
        """Post the prognostic fields for one diag interval."""
        ids, med = self._ids, self.med
        med.post(ids["u"], state.u, weight)
        med.post(ids["v"], state.v, weight)
        med.post(ids["h"], state.h, weight)
        if state.T is not None:
            med.post(ids["temp"], state.T, weight)
            med.post(ids["salt"], state.S, weight)
        ssh = jnp.sum(state.h, axis=0) - grid.bathyT
        med.post(ids["SSH"], ssh, weight)
        if ids["KE"] > 0:
            from mom6_tpu.parallel.stencil import im1, jm1
            u2 = 0.5 * (state.u ** 2 + im1(state.u) ** 2)
            v2 = 0.5 * (state.v ** 2 + jm1(state.v) ** 2)
            med.post(ids["KE"], 0.5 * (u2 + v2), weight)
        from mom6_tpu.parallel.stencil import ip1, jp1
        # u/v live on faces: use face-averaged model/output thicknesses
        zfields = {"u_z": (state.u, 0.5 * (state.h + ip1(state.h)),
                           0.5 * (self._h_z + ip1(self._h_z))),
                   "v_z": (state.v, 0.5 * (state.h + jp1(state.h)),
                           0.5 * (self._h_z + jp1(self._h_z)))}
        if state.T is not None:
            zfields.update(temp_z=(state.T, state.h, self._h_z),
                           salt_z=(state.S, state.h, self._h_z))
        for nm, (f, hsrc, hdst) in zfields.items():
            if ids[nm] > 0:
                med.post(ids[nm],
                         remap_to_z(f, hsrc, hdst, self.remap_cfg),
                         weight)
        want_rho = any(ids[nm] > 0 for nm in ("temp_rho", "salt_rho",
                                              "h_rho"))
        if want_rho and state.T is not None and eos is not None \
                and vgrid.Rlay is not None:
            h_rho = build_rho_thickness(vgrid.Rlay, state.h,
                                        grid.bathyT, state.T, state.S,
                                        eos, rho0=vgrid.Rho0,
                                        g=vgrid.g_Earth)
            fill = jnp.nan
            for nm, f in (("temp_rho", state.T), ("salt_rho", state.S)):
                if ids[nm] > 0:
                    from mom6_tpu.ale.remapping import remap_column_means
                    out = remap_column_means(state.h, f, h_rho + 1e-30,
                                             self.remap_cfg.remap)
                    med.post(ids[nm], jnp.where(h_rho > 1e-6, out,
                                                fill), weight)
            if ids["h_rho"] > 0:
                med.post(ids["h_rho"], h_rho, weight)
