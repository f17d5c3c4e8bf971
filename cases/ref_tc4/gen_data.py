"""Generate the tc4 input files (supergrid, topography, z-space T/S
initial conditions, sponge damping) with the same formulas as the
reference's generators (/root/reference/.testing/tc4/gen_grid.F90,
gen_data.F90), re-implemented in numpy: a 14x10 spherical patch at
0.01 deg resolution, flat 100 m bottom, a conical surface temperature
anomaly decaying linearly over three z-levels, uniform salinity 35,
and a uniform 1/(20 d) sponge damping rate.

Run from the repo root:  python cases/ref_tc4/gen_data.py
"""

import os

import numpy as np

from mom6_tpu.framework.io import write_fields

HERE = os.path.dirname(os.path.abspath(__file__))

NX, NY = 14, 10
DEPTH0 = 100.0
DS = 0.01                      # degrees at the equator
RE = 6.378e6
RAD = np.pi / 180.0
NZ = 3
SALT0 = 35.0
DAMP_DAYS = 20.0


def gen(outdir=HERE):
    # ---- supergrid (ocean_hgrid.nc) ----
    xg = DS * np.arange(2 * NX + 1)
    yg = DS * np.arange(2 * NY + 1)
    x = np.tile(xg, (2 * NY + 1, 1))
    y = np.tile(yg[:, None], (1, 2 * NX + 1))
    dx = RAD * RE * (x[:, 1:] - x[:, :-1]) \
        * np.cos(0.5 * RAD * (y[:, 1:] + y[:, :-1]))
    dy = RAD * RE * (y[1:, :] - y[:-1, :])
    area = RAD * RE * RE \
        * (np.sin(RAD * yg[1:]) - np.sin(RAD * yg[:-1]))[:, None] \
        * (xg[1:] - xg[:-1])[None, :]
    angle = np.zeros_like(x)
    write_fields(
        os.path.join(outdir, "ocean_hgrid.nc"),
        dict(y=y, x=x, dy=dy, dx=dx, area=area, angle_dx=angle),
        dims=dict(y=("nyp", "nxp"), x=("nyp", "nxp"),
                  dy=("ny", "nxp"), dx=("nyp", "nx"),
                  area=("ny", "nx"), angle_dx=("nyp", "nxp")),
        attrs=dict(y={"units": "degrees"}, x={"units": "degrees"},
                   dy={"units": "meters"}, dx={"units": "meters"},
                   area={"units": "m2"}, angle_dx={"units": "degrees"}))

    # ---- topography (topog.nc) ----
    depth = np.full((NY, NX), DEPTH0)
    write_fields(os.path.join(outdir, "topog.nc"),
                 dict(depth=depth, h2=np.zeros_like(depth)),
                 dims=dict(depth=("ny", "nx"), h2=("ny", "nx")))

    # ---- z-space T/S initial conditions (temp_salt_ic.nc) ----
    lon = x[1, 1::2]               # T-point coordinates
    lat = y[1::2, 1]
    z = np.arange(NZ) * DEPTH0 / NZ
    x0 = lon[NX // 2]              # reference t_fc anomaly center
    y0 = lat[NY // 2]
    r = np.hypot(lon[None, :] - x0, lat[:, None] - y0)
    zd = z / z[-1] if NZ > 1 else np.zeros(NZ)
    temp = (1.0 - np.minimum(r / 5.0, 1.0))[None] \
        * (1.0 - zd)[:, None, None]
    salt = np.full_like(temp, SALT0)
    write_fields(
        os.path.join(outdir, "temp_salt_ic.nc"),
        dict(depth=z, lon=lon, lat=lat, Time=np.array([0.0]),
             ptemp=temp[None], salt=salt[None]),
        dims=dict(depth=("depth",), lon=("lon",), lat=("lat",),
                  Time=("Time",),
                  ptemp=("Time", "depth", "lat", "lon"),
                  salt=("Time", "depth", "lat", "lon")),
        attrs=dict(Time={"calendar": "noleap",
                         "units": "days since 0001-01-01 00:00:00.0",
                         "modulo": " "}))

    # ---- sponge damping (sponge.nc) ----
    idamp = np.full((NY, NX), 1.0 / (DAMP_DAYS * 86400.0))
    write_fields(os.path.join(outdir, "sponge.nc"),
                 dict(lon=lon, lat=lat, Idamp=idamp),
                 dims=dict(lon=("lon",), lat=("lat",),
                           Idamp=("lat", "lon")))
    return outdir


if __name__ == "__main__":
    gen()
    print("wrote tc4 input files to", HERE)
