"""Eigenvalue (Lanczos) golden regressions vs examples/eigen fixtures.

Compares eigenvalues and total mass from the RESULT OF EIGEN VALUE ANALYSIS
table (4 significant digits).  Participation-factor columns in the old
goldens are unphysical (nonzero Z for 2D models) and are not compared.
"""

import os
import re

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

EIG = os.path.join(REFERENCE, "examples", "eigen")


def _parse_golden(path):
    lams, tm = [], None
    with open(path) as f:
        for line in f:
            if "TOTAL MASS" in line:
                tm = float(line.split("=")[1])
            m = re.match(r"^\s+(\d+)\s+([0-9.E+-]+)\s+", line)
            if m and tm is not None:
                lams.append(float(m.group(2)))
    return np.asarray(lams), tm


def _cases():
    out = []
    for suite in ("exJ", "exK"):
        d = os.path.join(EIG, suite)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith("_correct.log"):
                name = f[:-len("_correct.log")]
                if name.startswith("A7"):   # shells not yet supported
                    continue
                cnt = ("J" if suite == "exJ" else "K") + \
                    ("200.cnt" if int(name[1]) < 3 else "300.cnt")
                out.append((suite, name, cnt))
    return out


@requires_reference
@pytest.mark.parametrize("suite,name,cnt", _cases())
def test_eigen_golden(suite, name, cnt):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.eigen import run_eigen
    d = os.path.join(EIG, suite)
    mesh = read_mesh(os.path.join(d, name + ".msh"))
    cfg = read_cnt(os.path.join(d, cnt))
    model = build_struct_model(mesh, cfg)
    res = run_eigen(model)
    glam, gtm = _parse_golden(os.path.join(d, name + "_correct.log"))
    assert gtm is not None
    np.testing.assert_allclose(res.total_mass, gtm, rtol=2e-4)
    nc = min(len(glam), len(res.eigenvalues))
    assert nc >= 1
    np.testing.assert_allclose(res.eigenvalues[:nc], glam[:nc], rtol=2e-4,
                               err_msg=f"{suite}/{name}")
