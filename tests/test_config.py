import os

import pytest

from mom6_tpu.framework.config import ParamFile, param_doc_text

REF_TC0 = "/root/reference/.testing/tc0/MOM_input"


def test_basic_parse():
    pf = ParamFile(text="""
! comment line
DT = 8.64E+04  ! [s] the time step
SPLIT = False
NIGLOBAL = 4
COORD_CONFIG = "none"
/* block
   comment KEY = 99 */
ALE_RESOLUTION = 1.0, 2.0, 3.5
""")
    assert pf.get("DT", float) == 86400.0
    assert pf.get("SPLIT", bool, True) is False
    assert pf.get("NIGLOBAL", int) == 4
    assert pf.get("COORD_CONFIG", str) == "none"
    assert pf.get("ALE_RESOLUTION", list) == [1.0, 2.0, 3.5]
    assert pf.get("MISSING", float, 7.0) == 7.0
    assert pf.get("KEY", int, 1) == 1   # block comment stripped
    pf.close()


def test_override_precedence():
    pf = ParamFile(text="""
SPLIT = True
#override SPLIT = False
""")
    assert pf.get("SPLIT", bool, True) is False
    pf.close()


def test_duplicate_plain_is_error():
    with pytest.raises(ValueError):
        ParamFile(text="DT = 1.0\nDT = 2.0\n")


def test_unused_param_audit():
    pf = ParamFile(text="DT = 1.0\nTYPO_PARAM = 3\n")
    pf.get("DT", float)
    with pytest.raises(ValueError):
        pf.close()


def test_reads_reference_tc0():
    """The parser must ingest unmodified reference MOM_input files."""
    if not os.path.exists(REF_TC0):
        pytest.skip("reference not mounted")
    pf = ParamFile(REF_TC0)
    assert pf.get("NIGLOBAL", int) == 4
    assert pf.get("NJGLOBAL", int) == 4
    assert pf.get("NK", int) == 1
    assert pf.get("SPLIT", bool, True) is False
    assert pf.get("ADIABATIC", bool, False) is True
    assert pf.get("DT", float) == 86400.0


def test_reads_reference_tc_variants():
    for tc in ("tc1", "tc2", "tc3", "tc4", "p0"):
        path = f"/root/reference/.testing/{tc}/MOM_input"
        if not os.path.exists(path):
            pytest.skip("reference not mounted")
        pf = ParamFile(path)
        assert pf.get("NIGLOBAL", int) > 0


def test_doc_output():
    pf = ParamFile(text="DT = 10.0\n")
    pf.module("MOM")
    pf.get("DT", float, 3600.0, units="s", desc="time step")
    pf.get("NK", int, 2, units="nondim", desc="layers")
    doc = param_doc_text(pf)
    assert "DT = 10" in doc
    assert "module MOM" in doc
    short = param_doc_text(pf, short=True)
    assert "DT" in short and "NK" not in short


def test_parity_lists_honest():
    """No parameter in the accepted-but-inert lists may also be read
    for real elsewhere in the package (the round-2 verdict found
    RESOLN_SCALED_KH/VISBECK_L_SCALE listed as inert while wired)."""
    import os
    import re
    from mom6_tpu.model import _PARITY_POLICY, _PARITY_UNIMPL
    root = os.path.join(os.path.dirname(__file__), "..", "mom6_tpu")
    sources = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(dirpath, f)
                sources[p] = open(p).read()
    # strip the list definitions themselves from model.py
    mp = os.path.join(root, "model.py")
    body = sources[mp]
    body = re.sub(r"_PARITY_POLICY = \[.*?\]", "", body,
                  flags=re.DOTALL)
    body = re.sub(r"_PARITY_UNIMPL = \[.*?\]", "", body,
                  flags=re.DOTALL)
    sources[mp] = body
    offenders = []
    for name, _, _ in _PARITY_POLICY + _PARITY_UNIMPL:
        for p, src in sources.items():
            if f'"{name}"' in src or f"'{name}'" in src:
                offenders.append((name, os.path.relpath(p, root)))
    assert not offenders, (
        "inert-listed parameters are read for real elsewhere — move "
        f"them out of the parity lists: {offenders}")


def test_obsolete_params_guard():
    """Obsolete parameters fail fast with the reference's hint text
    (MOM_obsolete_params.F90)."""
    import pytest
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.framework.error_handler import FatalError
    from mom6_tpu.framework.obsolete_params import \
        check_obsolete_params
    pf = ParamFile(text="OBC_CONFIG = DOME\n")
    with pytest.raises(FatalError, match="OBC_SEGMENT"):
        check_obsolete_params(pf)
    # safe value: warning only
    pf2 = ParamFile(text="CORRECT_DENSITY = True\n")
    check_obsolete_params(pf2)
    # wrong value of a safe-valued obsolete param: fatal
    pf3 = ParamFile(text="CORRECT_DENSITY = False\n")
    with pytest.raises(FatalError):
        check_obsolete_params(pf3)
