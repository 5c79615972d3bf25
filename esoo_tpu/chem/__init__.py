from .basis import BASIS_SETS, Shell, build_shells
from .driver import ElectronicStructureProblem, MoleculeDriver
from .fcidump import read_fcidump, write_fcidump
from .geometry import (casscf_dipole_fn, casscf_energy_fn,
                       casscf_polarizability_fn, casscf_state_energy_fn,
                       dipole_derivatives, geometry_string,
                       harmonic_frequencies, hessian, ir_intensities,
                       nuclear_gradient, optimize_geometry,
                       raman_activities)
from .integrals import IntegralEngine
from .properties import (AU_TO_BUCKINGHAM, AU_TO_DEBYE, apply_field,
                         bond_orders, density_ao, dipole_moment,
                         hf_density_spatial, natural_orbitals,
                         oscillator_strengths, polarizability,
                         populations, quadrupole_moment,
                         transition_dipoles)
from .scf import rhf
from .thermo import thermochemistry

__all__ = [
    "BASIS_SETS",
    "Shell",
    "build_shells",
    "ElectronicStructureProblem",
    "MoleculeDriver",
    "read_fcidump",
    "write_fcidump",
    "IntegralEngine",
    "AU_TO_BUCKINGHAM",
    "AU_TO_DEBYE",
    "apply_field",
    "bond_orders",
    "density_ao",
    "polarizability",
    "quadrupole_moment",
    "dipole_moment",
    "hf_density_spatial",
    "natural_orbitals",
    "oscillator_strengths",
    "populations",
    "transition_dipoles",
    "casscf_dipole_fn",
    "casscf_energy_fn",
    "casscf_polarizability_fn",
    "casscf_state_energy_fn",
    "dipole_derivatives",
    "ir_intensities",
    "geometry_string",
    "harmonic_frequencies",
    "hessian",
    "nuclear_gradient",
    "optimize_geometry",
    "raman_activities",
    "rhf",
    "thermochemistry",
]
