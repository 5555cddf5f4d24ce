"""
NeRF (Natural Extension Reference Frame): internal coordinates -> Cartesian.

Reference behavior: foldingdiff/nerf.py. The reference builds chains with a
sequential python loop over residues, one `place_dihedral` call per atom
(nerf.py:99-122 for numpy, 251-292 for the batched torch path). Here the chain
build is a single `lax.scan` over residues with a 3-atom carry, vectorized over
the batch -- one compiled program instead of 3(L-1) kernel launches. A float64
numpy path (`nerf_build_np`) is kept for PDB-writing fidelity (the reference's
round-trip gate is TM ~ 1.0, tests/test_nerf.py:90).

Angle storage convention (see geometry/featurize.py and reference
angles_and_coords.py:60-107): row i of the bond-angle features holds the value
consumed when PLACING residue i+1, i.e. tau[i] is residue (i+1)'s N-CA-C angle.
The last row is padding. Dihedral rows are per-residue (phi[0], psi[-1],
omega[-1] undefined); the build consumes psi[:-1], omega[:-1], phi[1:].
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

# Idealized backbone bond lengths (angstroms), reference nerf.py:17-19
N_CA_LENGTH = 1.46
CA_C_LENGTH = 1.54
C_N_LENGTH = 1.34

# Idealized bond angles (radians), reference nerf.py:40-42
BOND_ANGLE_N_CA = 121.0 / 180.0 * np.pi  # C:1N:1CA
BOND_ANGLE_CA_C = 109.0 / 180.0 * np.pi  # tau = N:CA:C
BOND_ANGLE_C_N = 115.0 / 180.0 * np.pi  # CA:C:1N

# Initial seed coordinates: N/CA/C of 1CRN's first residue (reference nerf.py:22-24)
N_INIT = np.array([17.047, 14.099, 3.625])
CA_INIT = np.array([16.967, 12.784, 4.338])
C_INIT = np.array([15.685, 12.755, 5.133])
INIT_COORDS = np.stack([N_INIT, CA_INIT, C_INIT])  # (3, 3)


def place_dihedral(
    a: jnp.ndarray,
    b: jnp.ndarray,
    c: jnp.ndarray,
    bond_angle: jnp.ndarray,
    bond_length: jnp.ndarray,
    torsion_angle: jnp.ndarray,
) -> jnp.ndarray:
    """
    Place atom d so that (a, b, c, d) has the given c-d bond length, b-c-d bond
    angle, and a-b-c-d torsion. Fully broadcast: points (..., 3), scalars (...,).
    """
    bond_angle = jnp.asarray(bond_angle)[..., None]
    bond_length = jnp.asarray(bond_length)[..., None]
    torsion_angle = jnp.asarray(torsion_angle)[..., None]

    def unit(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    ab = b - a
    bc = unit(c - b)
    n = unit(jnp.cross(ab, bc))
    nbc = jnp.cross(n, bc)
    # d expressed in the (bc, nbc, n) local frame
    d_local = (
        -bond_length * jnp.cos(bond_angle) * bc
        + bond_length * jnp.cos(torsion_angle) * jnp.sin(bond_angle) * nbc
        + bond_length * jnp.sin(torsion_angle) * jnp.sin(bond_angle) * n
    )
    return d_local + c


def place_dihedral_np(a, b, c, bond_angle, bond_length, torsion_angle) -> np.ndarray:
    """Float64 numpy twin of `place_dihedral` for host-side chain building."""
    a, b, c = (np.asarray(x, dtype=np.float64) for x in (a, b, c))
    bond_angle = np.asarray(bond_angle, dtype=np.float64)[..., None]
    bond_length = np.asarray(bond_length, dtype=np.float64)[..., None]
    torsion_angle = np.asarray(torsion_angle, dtype=np.float64)[..., None]

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    ab = b - a
    bc = unit(c - b)
    n = unit(np.cross(ab, bc))
    nbc = np.cross(n, bc)
    d_local = (
        -bond_length * np.cos(bond_angle) * bc
        + bond_length * np.cos(torsion_angle) * np.sin(bond_angle) * nbc
        + bond_length * np.sin(torsion_angle) * np.sin(bond_angle) * n
    )
    return d_local + c


def _broadcast_param(v, like: jnp.ndarray, default: float) -> jnp.ndarray:
    if v is None:
        return jnp.full_like(like, default)
    v = jnp.asarray(v, dtype=like.dtype)
    return jnp.broadcast_to(v, like.shape)


def nerf_build_batch(
    phi: jnp.ndarray,
    psi: jnp.ndarray,
    omega: jnp.ndarray,
    bond_angle_n_ca_c: jnp.ndarray,  # tau
    bond_angle_ca_c_n: jnp.ndarray,
    bond_angle_c_n_ca: jnp.ndarray,
    bond_len_n_ca: Optional[jnp.ndarray] = None,
    bond_len_ca_c: Optional[jnp.ndarray] = None,
    bond_len_c_n: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """
    Batched chain build: all inputs (B, L) -> coords (B, 3L, 3) ordered
    N, CA, C per residue. Residue 0 is pinned at INIT_COORDS. Equivalent to
    reference nerf.nerf_build_batch (nerf.py:207-292) but as one lax.scan.
    """
    assert phi.ndim == 2
    b, length = phi.shape
    dtype = phi.dtype

    bond_len_c_n_arr = _broadcast_param(bond_len_c_n, phi, C_N_LENGTH)
    bond_len_n_ca_arr = _broadcast_param(bond_len_n_ca, phi, N_CA_LENGTH)
    bond_len_ca_c_arr = _broadcast_param(bond_len_ca_c, phi, CA_C_LENGTH)

    # Per-step inputs, shape (L-1, B): placing residue i+1 consumes psi_i,
    # omega_i, phi_{i+1}, and bond angles/lengths at storage row i.
    xs = {
        "psi": psi[:, :-1].T,
        "omega": omega[:, :-1].T,
        "phi": phi[:, 1:].T,
        "ang_ca_c_n": bond_angle_ca_c_n[:, :-1].T,
        "ang_c_n_ca": bond_angle_c_n_ca[:, :-1].T,
        "ang_n_ca_c": bond_angle_n_ca_c[:, :-1].T,
        "len_c_n": bond_len_c_n_arr[:, :-1].T,
        "len_n_ca": bond_len_n_ca_arr[:, :-1].T,
        "len_ca_c": bond_len_ca_c_arr[:, :-1].T,
    }

    init = jnp.broadcast_to(jnp.asarray(INIT_COORDS, dtype=dtype), (b, 3, 3))

    def step(carry, x):
        pa, pb, pc = carry[:, 0], carry[:, 1], carry[:, 2]
        n_at = place_dihedral(pa, pb, pc, x["ang_ca_c_n"], x["len_c_n"], x["psi"])
        ca_at = place_dihedral(pb, pc, n_at, x["ang_c_n_ca"], x["len_n_ca"], x["omega"])
        c_at = place_dihedral(pc, n_at, ca_at, x["ang_n_ca_c"], x["len_ca_c"], x["phi"])
        new = jnp.stack([n_at, ca_at, c_at], axis=1)
        return new, new

    _, ys = jax.lax.scan(step, init, xs)  # (L-1, B, 3, 3)
    all_res = jnp.concatenate([init[None], ys], axis=0)  # (L, B, 3, 3)
    coords = jnp.transpose(all_res, (1, 0, 2, 3)).reshape(b, length * 3, 3)
    return coords


def nerf_build_np(
    phi: np.ndarray,
    psi: np.ndarray,
    omega: np.ndarray,
    bond_angle_n_ca_c: Optional[np.ndarray] = None,  # tau
    bond_angle_ca_c_n: Optional[np.ndarray] = None,
    bond_angle_c_n_ca: Optional[np.ndarray] = None,
    bond_len_n_ca: Union[float, np.ndarray, None] = None,
    bond_len_ca_c: Union[float, np.ndarray, None] = None,
    bond_len_c_n: Union[float, np.ndarray, None] = None,
    init_coords: np.ndarray = INIT_COORDS,
) -> np.ndarray:
    """
    Float64 host-side single-chain build (reference NERFBuilder equivalent,
    nerf.py:27-142). Inputs are (L,) arrays; missing bond angles/lengths fall
    back to idealized constants. Returns (3L, 3) coords.
    """
    phi = np.asarray(phi, dtype=np.float64).reshape(-1)
    psi = np.asarray(psi, dtype=np.float64).reshape(-1)
    omega = np.asarray(omega, dtype=np.float64).reshape(-1)
    length = phi.shape[0]

    def param(v, default):
        if v is None:
            return np.full(length, default, dtype=np.float64)
        v = np.asarray(v, dtype=np.float64)
        return np.broadcast_to(v, (length,)).astype(np.float64)

    ang_n_ca_c = param(bond_angle_n_ca_c, BOND_ANGLE_CA_C)
    ang_ca_c_n = param(bond_angle_ca_c_n, BOND_ANGLE_C_N)
    ang_c_n_ca = param(bond_angle_c_n_ca, BOND_ANGLE_N_CA)
    len_n_ca = param(bond_len_n_ca, N_CA_LENGTH)
    len_ca_c = param(bond_len_ca_c, CA_C_LENGTH)
    len_c_n = param(bond_len_c_n, C_N_LENGTH)

    coords = [np.asarray(c, dtype=np.float64) for c in init_coords]
    for i in range(length - 1):
        n_at = place_dihedral_np(
            coords[-3], coords[-2], coords[-1], ang_ca_c_n[i], len_c_n[i], psi[i]
        )
        ca_at = place_dihedral_np(
            coords[-2], coords[-1], n_at, ang_c_n_ca[i], len_n_ca[i], omega[i]
        )
        c_at = place_dihedral_np(
            coords[-1], n_at, ca_at, ang_n_ca_c[i], len_ca_c[i], phi[i + 1]
        )
        coords.extend([n_at, ca_at, c_at])
    return np.array(coords)
