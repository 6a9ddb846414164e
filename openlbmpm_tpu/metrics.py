"""Structured run metrics: JSONL logging, diagnostics, breakthrough detection.

Replaces the reference's print()-only observability and its .dat scalar
files (``NumNodesOccupied.dat``, ``ConcOnPoint.dat``,
``Transport2DRK.py:1172-1176``; ``ContactAngle.dat``,
``ShanChenD2Q9.py:856-861``) with one JSONL stream carrying mass totals,
max |u|, invading-fluid saturation, interface front position, breakthrough
step, and MLUPS (SURVEY.md section 5).
"""

from __future__ import annotations

import json
import time

import jax.numpy as jnp
import numpy as np

__all__ = ["MetricsLogger", "flow_diagnostics", "steady_state_criterion",
           "measured_contact_angle", "analytic_sc_contact_angle"]


def analytic_sc_contact_angle(g_solid_0: float, g_solid_1: float,
                              g_fluid: float, rho_main: float,
                              rho_dissolved: float) -> float:
    """Analytic Shan-Chen contact-angle prediction (Huang et al. 2007):
    cos(theta) = (G_s1 - G_s0) / (G (rho_main - rho_dissolved) / 2)
    (``ShanChenD2Q9.__calContactAngle:852-861``).  Returns degrees."""
    cos_t = (g_solid_1 - g_solid_0) / (
        g_fluid * (rho_main - rho_dissolved) / 2.0)
    return float(np.degrees(np.arccos(np.clip(cos_t, -1.0, 1.0))))


def flow_diagnostics(rho_inv, rho_def, ux, uy, is_fluid,
                     front_threshold: float = 0.5,
                     breakthrough_row: int = 1) -> dict:
    """Scalar diagnostics of a two-fluid field.

    rho_inv / rho_def: invading and defending fluid densities (ny, nx).
    Front position = lowest row the invading fluid has reached (canonical
    flow direction is -y, inlet at the top; geometry conventions in
    ``geometry.py``).
    """
    fl = jnp.asarray(is_fluid)
    m_inv = float(jnp.sum(rho_inv * fl))
    m_def = float(jnp.sum(rho_def * fl))
    occupied = (rho_inv > front_threshold) & fl
    rows = jnp.any(occupied, axis=-1)
    ny = rows.shape[0]
    # lowest occupied row (front has advanced to smaller y)
    row_ids = jnp.where(rows, jnp.arange(ny), ny)
    front = int(jnp.min(row_ids))
    umax = float(jnp.max(jnp.sqrt(ux * ux + uy * uy)))
    sat = m_inv / (m_inv + m_def) if (m_inv + m_def) else 0.0
    return {
        "mass_invading": m_inv,
        "mass_defending": m_def,
        "saturation": sat,
        "front_row": front,
        "breakthrough": bool(front <= breakthrough_row),
        "umax": umax,
    }


def steady_state_criterion(ux, uy, ux_prev, uy_prev) -> float:
    """Relative L2 velocity change between observations
    (``ShanChenD2Q9.__calSteadyStateCritiria:831-850``)."""
    num = jnp.sqrt(jnp.sum((ux - ux_prev) ** 2 + (uy - uy_prev) ** 2))
    den = jnp.sqrt(jnp.sum(ux * ux + uy * uy))
    return float(num / jnp.where(den > 0, den, 1.0))


def measured_contact_angle(drop_mask: np.ndarray, wall_row: int) -> float:
    """Spherical-cap contact-angle fit from base chord and cap height
    (``ShanChenD2Q9.calMeasuredContactAngle:864-886``).

    drop_mask: (ny, nx) bool of droplet voxels; wall_row: first fluid row
    above the wall.  Returns degrees.
    """
    drop = np.asarray(drop_mask, bool).copy()
    drop[:wall_row] = False
    base = float(drop[wall_row].sum())
    heights = drop.any(axis=1)
    height = float(heights.sum())
    if height == 0 or base == 0:
        return float("nan")
    r_cap = (base ** 2 / 4.0 + height ** 2) / (2.0 * height)
    cos_theta = np.clip((r_cap - height) / r_cap, -1.0, 1.0)
    return float(np.degrees(np.arccos(cos_theta)))


class MetricsLogger:
    """JSONL metrics stream + MLUPS meter."""

    def __init__(self, path: str | None, active_sites: int,
                 echo: bool = False):
        self.path = path
        self.active_sites = int(active_sites)
        self.echo = echo
        self._fh = open(path, "a") if path else None
        self._t_last = None
        self._steps_last = 0
        self.breakthrough_step = None

    def log(self, step: int, **scalars):
        now = time.perf_counter()
        rec = {"step": int(step), **scalars}
        if self._t_last is not None and step > self._steps_last:
            dt = now - self._t_last
            rec["mlups"] = round(
                self.active_sites * (step - self._steps_last) / dt / 1e6, 2)
            rec["steps_per_s"] = round((step - self._steps_last) / dt, 2)
        self._t_last = now
        self._steps_last = step
        if scalars.get("breakthrough") and self.breakthrough_step is None:
            self.breakthrough_step = int(step)
            rec["breakthrough_step"] = self.breakthrough_step
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line, flush=True)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
