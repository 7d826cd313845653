"""Shared test fixtures: tiny systems built through the public builder."""
import numpy as np

from mpmc_tpu.state import Species, build_system


def atom_species(name="Ar", eps=120.0, sig=3.4, charge=0.0, polar=0.0,
                 mass=39.948):
    return Species(
        name=name, atom_names=(name,), pos=np.zeros((1, 3)),
        mass=np.array([mass]), charge=np.array([charge]),
        polar=np.array([polar]), eps=np.array([eps]), sig=np.array([sig]))


def free_atoms(box, coords, eps=120.0, sig=3.4, charge=0.0, polar=0.0,
               dtype=None, **kw):
    """N single-atom molecules at given coords (each its own molecule)."""
    import jax.numpy as jnp
    coords = np.asarray(coords, np.float64)
    n = len(coords)
    sp = atom_species(eps=eps, sig=sig, charge=charge, polar=polar)
    return build_system(
        box, species=(sp,), capacity=(n,), initial_counts=(n,),
        initial_pos={0: coords[:, None, :]},
        dtype=dtype or jnp.float64, **kw)


def two_species_lattice(box, coords_a, coords_b, qa=1.0, qb=-1.0,
                        eps=0.0, sig=0.0, polar=0.0, dtype=None):
    import jax.numpy as jnp
    a = atom_species("A", eps=eps, sig=sig, charge=qa, polar=polar)
    b = atom_species("B", eps=eps, sig=sig, charge=qb, polar=polar)
    ca = np.asarray(coords_a, np.float64)
    cb = np.asarray(coords_b, np.float64)
    return build_system(
        box, species=(a, b), capacity=(len(ca), len(cb)),
        initial_counts=(len(ca), len(cb)),
        initial_pos={0: ca[:, None, :], 1: cb[:, None, :]},
        dtype=dtype or jnp.float64)
