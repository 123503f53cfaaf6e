"""Finite-volume method schemes (reference: ``source/Storm/Feathers/``)."""

from stormx.fvm.bc import far_field_bc, no_slip_bc, slip_bc
from stormx.fvm.convdiff import (
    assemble_convection_diffusion,
    convection_diffusion_operator,
    face_normal_velocity,
)
from stormx.fvm.convection import linear_upwind_convection, upwind_convection
from stormx.fvm.divgrad import assemble_divgrad, div_grad, face_flux_coefficients
from stormx.fvm.field import cell_field, face_field, node_field
from stormx.fvm.flux import hll_flux, lax_friedrichs_flux
from stormx.fvm.gradient import lsq_gradient_matrices, lsq_gradients
from stormx.fvm.hydro import GAMMA, NUM_VARS, GasState, state_from_cons, state_from_prim
from stormx.fvm.limiter import (
    compute_limiters,
    cubic_limiter,
    cubic_second_limiter,
    dummy_second_limiter,
    minmod_limiter,
    venkatakrishnan_limiter,
)
from stormx.fvm.solver import FvSolver

__all__ = [
    "assemble_convection_diffusion",
    "convection_diffusion_operator",
    "face_normal_velocity",
    "far_field_bc",
    "no_slip_bc",
    "slip_bc",
    "linear_upwind_convection",
    "upwind_convection",
    "assemble_divgrad",
    "div_grad",
    "face_flux_coefficients",
    "cell_field",
    "face_field",
    "node_field",
    "hll_flux",
    "lax_friedrichs_flux",
    "lsq_gradient_matrices",
    "lsq_gradients",
    "GAMMA",
    "NUM_VARS",
    "GasState",
    "state_from_cons",
    "state_from_prim",
    "compute_limiters",
    "cubic_limiter",
    "cubic_second_limiter",
    "dummy_second_limiter",
    "minmod_limiter",
    "venkatakrishnan_limiter",
    "FvSolver",
]
