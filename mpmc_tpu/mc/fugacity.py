"""Fugacity equation-of-state module.

Rebuild of the reference's fugacity layer (SURVEY.md §2 "Fugacity EoS",
src/mc/fugacity.c [C]): converts ``pressure`` [atm] into per-sorbate
fugacities for the uVT acceptance rule.  The reference uses
species-specific empirical fits (Zhou/Shaw H2, Peng-Robinson/BACK CO2,
CH4, N2 [M]); since the exact fit polynomials were unverifiable
(SURVEY.md §0), this rebuild uses the Peng-Robinson equation of state with
literature critical constants for all four species — thermodynamically
standard, accurate to a few percent over sorption-relevant conditions, and
clearly documented here as the contract.  Explicit ``fugacities``/
``user_fugacities`` bypass the EoS entirely, exactly like the reference.

Host-side (numpy) — runs once per (T, P) change, never inside jit.
"""
from __future__ import annotations

import dataclasses
import math

R_L_ATM_MOL_K = 0.0820573660809596


@dataclasses.dataclass(frozen=True)
class CriticalConstants:
    tc: float     # K
    pc: float     # atm
    omega: float  # acentric factor


# literature critical constants (NIST/CRC)
SPECIES = {
    "h2": CriticalConstants(tc=33.19, pc=12.96, omega=-0.216),
    "co2": CriticalConstants(tc=304.13, pc=72.81, omega=0.224),
    "ch4": CriticalConstants(tc=190.56, pc=45.39, omega=0.011),
    "n2": CriticalConstants(tc=126.19, pc=33.51, omega=0.037),
    "he": CriticalConstants(tc=5.19, pc=2.24, omega=-0.385),
    "ar": CriticalConstants(tc=150.69, pc=47.87, omega=-0.002),
}


def _cubic_roots(a2, a1, a0):
    """Real roots of z^3 + a2 z^2 + a1 z + a0 = 0 (Cardano)."""
    q = (3 * a1 - a2 * a2) / 9.0
    r = (9 * a2 * a1 - 27 * a0 - 2 * a2 ** 3) / 54.0
    d = q ** 3 + r ** 2
    roots = []
    if d >= 0:
        s = math.copysign(abs(r + math.sqrt(d)) ** (1 / 3), r + math.sqrt(d))
        t = math.copysign(abs(r - math.sqrt(d)) ** (1 / 3), r - math.sqrt(d))
        roots.append(-a2 / 3 + s + t)
    else:
        theta = math.acos(r / math.sqrt(-q ** 3))
        m = 2 * math.sqrt(-q)
        for k in range(3):
            roots.append(m * math.cos((theta + 2 * math.pi * k) / 3)
                         - a2 / 3)
    return roots


def peng_robinson_fugacity(temperature: float, pressure: float,
                           crit: CriticalConstants) -> float:
    """Fugacity [atm] of a pure gas at (T [K], P [atm]) via Peng-Robinson."""
    if pressure <= 0:
        return 0.0
    tc, pc, w = crit.tc, crit.pc, crit.omega
    tr = temperature / tc
    kappa = 0.37464 + 1.54226 * w - 0.26992 * w * w
    alpha = (1.0 + kappa * (1.0 - math.sqrt(tr))) ** 2
    r = R_L_ATM_MOL_K
    a = 0.45724 * r * r * tc * tc / pc * alpha
    b = 0.07780 * r * tc / pc
    big_a = a * pressure / (r * r * temperature * temperature)
    big_b = b * pressure / (r * temperature)
    # z^3 - (1-B) z^2 + (A - 3B^2 - 2B) z - (AB - B^2 - B^3) = 0
    roots = _cubic_roots(-(1.0 - big_b),
                         big_a - 3 * big_b * big_b - 2 * big_b,
                         -(big_a * big_b - big_b * big_b - big_b ** 3))
    z = max(x for x in roots if x > big_b)
    s2 = math.sqrt(2.0)
    ln_phi = (z - 1.0 - math.log(z - big_b)
              - big_a / (2 * s2 * big_b)
              * math.log((z + (1 + s2) * big_b) / (z + (1 - s2) * big_b)))
    return pressure * math.exp(ln_phi)


def fugacity(species_key: str, temperature: float, pressure: float) -> float:
    """Fugacity [atm] for a named species ('h2','co2','ch4','n2',...)."""
    key = species_key.lower()
    if key not in SPECIES:
        return pressure   # ideal-gas fallback: f = P
    return peng_robinson_fugacity(temperature, pressure, SPECIES[key])


def guess_species_key(name: str) -> str:
    """Map a model/molecule name (e.g. 'H2B', 'CO2', 'N2E') to an EoS key."""
    n = name.lower()
    for key in ("co2", "ch4", "h2", "n2", "he", "ar"):
        if n.startswith(key):
            return key
    return n
