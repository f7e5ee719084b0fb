"""Incremental SfM engine: mapper, triangulator, controller.

Host-side orchestration (data-dependent control flow) over the device
kernels: registration (P6L RANSAC), robust line triangulation, implicit-
Schur bundle adjustment.  Mirrors ``src/sfm/`` and ``src/controllers/``.
"""

from privacy_preserving_sfm_tpu.sfm.incremental_triangulator import (  # noqa: F401
    IncrementalTriangulator, TriangulatorOptions,
)
from privacy_preserving_sfm_tpu.sfm.incremental_mapper import (  # noqa: F401
    IncrementalMapper, MapperOptions,
)
