"""Model families: single-phase, Shan-Chen MCMP, color-gradient RK, transport."""

from .colorgradient import (CGBoundaryConfig, ColorGradientParams,  # noqa: F401
                            ColorGradientRK)
from .flow3d import (ColorGradientParams3D, ColorGradientRK3D,  # noqa: F401
                     ShanChenMCMP3D, ShanChenParams3D, SinglePhaseD3Q19,
                     TransportD3Q7, TransportRK3D)
from .shanchen import (SCBoundaryConfig, ShanChenMCMP,  # noqa: F401
                       ShanChenParams)
from .single_phase import BoundaryConfig, SinglePhaseD2Q9  # noqa: F401
from .transport import (TransportParams, TransportRK,  # noqa: F401
                        TransportState)
