"""Constitutive models — elastic matrices and material parameter records.

Linear isotropic elasticity replicates calElasticMatrix
(fistr1/src/lib/physics/ElasticLinear.f90), section types per
fistr1/src/lib/physics/material.f90:75-79:
  D3 (=-1), PlaneStress(=1), Planestrain(=0), AxisSymetric(=2), Shell(=3).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

# section type enum (material.f90:75-79)
D3 = -1
PLANE_STRAIN = 0
PLANE_STRESS = 1
AXISYMMETRIC = 2
SHELL = 3

# mtype families (subset of mMaterial's constants, same semantics)
ELASTIC = "ELASTIC"
ORTHOELASTIC = "ORTHOELASTIC"
EPLASTIC = "EPLASTIC"
HYPERELASTIC_NEOHOOKE = "NEOHOOKE"
HYPERELASTIC_MOONEYRIVLIN = "MOONEY-RIVLIN"
HYPERELASTIC_ARRUDABOYCE = "ARRUDA-BOYCE"
VISCOELASTIC = "VISCOELASTIC"
CREEP = "NORTON"

# nlgeom flags (mMaterial kINFINITE/kTOTALLAG/kUPDATELAG semantics)
INFINITESIMAL = 0
TOTALLAG = 1
UPDATELAG = 2


@dataclasses.dataclass
class Material:
    """Host-side material record (the analogue of tMaterial,
    fistr1/src/lib/physics/material.f90:56-108)."""
    name: str
    mtype: str = ELASTIC
    nlgeom: int = INFINITESIMAL
    youngs: float = 0.0
    poisson: float = 0.0
    density: float = 0.0
    expansion: float = 0.0
    # plasticity (Mises; yield stress table or (sigma_y, H) pair)
    yield_func: str = "MISES"
    hardening: str = "LINEAR"   # LINEAR / MULTILINEAR / SWIFT / RAMBERG-OSGOOD / KINEMATIC / COMBINED
    plastic_consts: Optional[np.ndarray] = None       # raw !PLASTIC rows
    # hyperelastic constants (c10, c01, d / c10 d / c1 lambda_m d)
    hyper_consts: Optional[np.ndarray] = None
    # viscoelastic Prony series rows (g_i, tau_i)
    visco_consts: Optional[np.ndarray] = None
    trs_consts: Optional[np.ndarray] = None
    # Norton creep (A, n, m)
    creep_consts: Optional[np.ndarray] = None
    # temperature-dependent elastic table rows: (E, nu, temp)
    elastic_table: Optional[np.ndarray] = None
    # heat: rows of (value..., temp) tables
    heat_density: Optional[np.ndarray] = None
    heat_capacity: Optional[np.ndarray] = None
    heat_conductivity: Optional[np.ndarray] = None


def elastic_D(youngs, poisson, sect_type: int) -> np.ndarray:
    """Isotropic elastic matrix (ElasticLinear.f90 calElasticMatrix)."""
    ee, pp = float(youngs), float(poisson)
    if sect_type == D3:
        D = np.zeros((6, 6))
        c = ee / ((1 + pp) * (1 - 2 * pp))
        D[0, 0] = D[1, 1] = D[2, 2] = c * (1 - pp)
        off = c * pp
        D[0, 1] = D[0, 2] = D[1, 0] = D[1, 2] = D[2, 0] = D[2, 1] = off
        g = ee / (1 + pp) * 0.5
        D[3, 3] = D[4, 4] = D[5, 5] = g
        return D
    if sect_type == PLANE_STRESS:
        D = np.zeros((4, 4))
        c1 = ee / (1 - pp * pp)
        D[0, 0] = D[1, 1] = c1
        D[0, 1] = D[1, 0] = c1 * pp
        D[2, 2] = c1 * 0.5 * (1 - pp)
        return D
    if sect_type == PLANE_STRAIN:
        D = np.zeros((4, 4))
        c1 = ee / ((1 + pp) * (1 - 2 * pp))
        D[0, 0] = D[1, 1] = c1 * (1 - pp)
        D[0, 1] = D[1, 0] = c1 * pp
        D[2, 2] = ee / (2 * (1 + pp))
        return D
    if sect_type == AXISYMMETRIC:
        D = np.zeros((4, 4))
        c1 = ee * (1 - pp) / ((1 + pp) * (1 - 2 * pp))
        c2 = (1 - 2 * pp) / (2 * (1 - pp))
        rr = pp / (1 - pp)
        D[0, 0] = D[1, 1] = D[3, 3] = c1
        D[0, 1] = D[1, 0] = c1 * rr
        D[0, 3] = D[3, 0] = c1 * rr
        D[1, 3] = D[3, 1] = c1 * rr
        D[2, 2] = c1 * c2
        return D
    raise ValueError(f"unsupported sect_type {sect_type}")
