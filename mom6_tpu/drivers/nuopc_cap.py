"""NUOPC/CMEPS-shaped ocean cap.

Re-design of /root/reference/config_src/drivers/nuopc_cap/mom_cap.F90
(InitializeAdvertise :793, InitializeRealize, ModelAdvance :1483) and
mom_surface_forcing_nuopc.F90: the ESMF machinery is out of scope on
TPU, but this cap preserves the *interface contract* — the CMEPS
standard field names the reference advertises, the
advertise → realize → advance → finalize lifecycle, and the
import-state packing / export-state extraction — so a Python-level
coupler (or a future ESMF binding) can drive the ocean exactly as
CESM/UFS drive the reference.

The MCT cap (mct_cap/mom_ocean_model_mct.F90) wraps the same
ocean_model_init/update lifecycle with a different field dictionary;
`ocean_model.py` carries that shared lifecycle, so only one cap is
materialized here.
"""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.drivers.ocean_model import (IceOceanBoundary,
                                          ocean_model_init,
                                          extract_surface_state)
from mom6_tpu.parallel.stencil import ip1, jp1, im1, jm1

__all__ = ["MOM6Cap", "IMPORT_FIELDS", "EXPORT_FIELDS"]

# CMEPS import names the reference cap advertises (mom_cap.F90:798-829)
IMPORT_FIELDS = (
    "Fioi_salt", "Foxx_taux", "Foxx_tauy", "Foxx_sen", "Foxx_evap",
    "Foxx_lwnet", "Foxx_swnet_vdr", "Foxx_swnet_vdf",
    "Foxx_swnet_idr", "Foxx_swnet_idf", "Faxa_rain", "Faxa_snow",
    "Sa_pslv", "Foxx_rofl", "Foxx_rofi",
)
# CMEPS export names (mom_cap.F90:873-881)
EXPORT_FIELDS = (
    "So_omask", "So_t", "So_s", "So_u", "So_v", "So_dhdx", "So_dhdy",
    "Fioo_q", "So_bldepth",
)


class MOM6Cap:
    """advertise → realize → (import_fields → advance →
    export_fields)* → finalize."""

    def __init__(self):
        self.model = None
        self._state = None
        self._split = None
        self._tracers = None
        self._iob = IceOceanBoundary()
        self._n0 = 0
        self._frazil = None
        self._mld = None

    # -- InitializeAdvertise (mom_cap.F90:793) --
    def advertise(self):
        return {"import": list(IMPORT_FIELDS),
                "export": list(EXPORT_FIELDS)}

    # -- InitializeRealize: build the component --
    def realize(self, param_sources=None, text=None):
        self.model = ocean_model_init(param_sources, text=text)
        self._state = self.model.state
        self._split = self.model.split_state
        self._tracers = self.model.tracers
        return self

    # -- import-state packing (mom_surface_forcing_nuopc.F90
    # convert_IOB_to_fluxes essence) --
    def import_fields(self, fields: dict):
        g = lambda n: fields.get(n)
        sw = None
        sw_parts = [g(n) for n in ("Foxx_swnet_vdr", "Foxx_swnet_vdf",
                                   "Foxx_swnet_idr", "Foxx_swnet_idf")]
        if any(p is not None for p in sw_parts):
            sw = sum(p for p in sw_parts if p is not None)
        lprec = g("Faxa_rain")
        for extra in ("Faxa_snow", "Foxx_rofl", "Foxx_rofi"):
            if g(extra) is not None:
                lprec = g(extra) if lprec is None else lprec + g(extra)
        self._iob = IceOceanBoundary(
            u_flux=g("Foxx_taux"), v_flux=g("Foxx_tauy"),
            t_flux=g("Foxx_sen"), q_flux=g("Foxx_evap"),
            sw_flux=sw, lw_flux=g("Foxx_lwnet"), lprec=lprec,
            salt_flux=g("Fioi_salt"), p_surf=g("Sa_pslv"))
        return self

    # -- ModelAdvance (mom_cap.F90:1483) --
    def advance(self, dt_coupling: float):
        from mom6_tpu.drivers.ocean_model import _iob_to_forcing
        from mom6_tpu.core.orchestrator import step_ocean
        m = self.model
        forces, fluxes = _iob_to_forcing(self._iob, m.grid)
        nsteps = max(1, int(round(dt_coupling / m.dt)))
        for n in range(nsteps):
            self._state, self._split, self._tracers, diags = \
                step_ocean(m.domain, m.grid, m.vgrid, self._state,
                           self._split, self._tracers, forces, fluxes,
                           m.dt, m.ocean_cfg, eos=m.eos,
                           x_first=((self._n0 + n) % 2 == 0),
                           tracer_registry=m.tracer_registry,
                           obc=m.obc)
            if getattr(diags, "frazil", None) is not None:
                self._frazil = diags.frazil
            if getattr(diags, "mld", None) is not None:
                self._mld = diags.mld
        self._n0 += nsteps
        return self

    # -- export-state extraction (mom_cap export + MOM.F90:3686) --
    def export_fields(self) -> dict:
        m = self.model
        sfc = extract_surface_state(m, self._state)
        g = m.grid
        # sea-level slopes at h points (So_dhdx/So_dhdy)
        eta = sfc.sea_lev
        dhdx = 0.5 * ((ip1(eta) - eta) * g.IdxCu
                      + (eta - im1(eta)) * im1(g.IdxCu)) * g.mask2dT
        dhdy = 0.5 * ((jp1(eta) - eta) * g.IdyCv
                      + (eta - jm1(eta)) * jm1(g.IdyCv)) * g.mask2dT
        zero = jnp.zeros_like(eta)
        return {"So_omask": g.mask2dT, "So_t": sfc.sst,
                "So_s": sfc.sss, "So_u": sfc.u, "So_v": sfc.v,
                "So_dhdx": dhdx, "So_dhdy": dhdy,
                "Fioo_q": self._frazil if self._frazil is not None
                else zero,
                "So_bldepth": self._mld if self._mld is not None
                else zero}

    # -- ModelFinalize: checkpoint the component --
    def finalize(self, path=None):
        if path is not None:
            from mom6_tpu.framework.restart import save_restart
            save_restart(path, {"state": self._state,
                                "split": self._split})
        return self
