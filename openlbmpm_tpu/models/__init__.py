"""Model families: single-phase, Shan-Chen MCMP, color-gradient RK, transport."""

from .single_phase import SinglePhaseD2Q9  # noqa: F401
