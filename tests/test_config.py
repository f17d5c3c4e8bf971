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
