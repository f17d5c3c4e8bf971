"""mom6_tpu — a TPU-native ocean dynamical core and modeling framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of MOM6
(the GFDL/NCAR Modular Ocean Model): Arakawa C-grid finite-volume
dynamics with split barotropic/baroclinic time stepping, PPM continuity
and tracer advection, ALE vertical regridding/remapping, CVMix-style
vertical mixing, and a config/restart/diagnostics framework.  Horizontal
domain decomposition uses a 2D `jax.sharding.Mesh` with
`jax.lax.ppermute` halo rings inside `shard_map` in place of the
reference's FMS `mpp_domains`-over-MPI layer
(cf. /root/reference/config_src/infra/FMS2/MOM_domain_infra.F90).
"""

__version__ = "0.1.0"
