"""Data model + persistence: database, correspondence graph, reconstruction.

Host-side bookkeeping structures (SoA numpy) around the device kernels:
the SQLite database is byte/schema-compatible with the reference
(``src/base/database.{h,cc}``) so databases interoperate; the
correspondence graph and reconstruction mirror
``src/base/correspondence_graph.*`` and ``src/base/reconstruction.*``.
"""

from privacy_preserving_sfm_tpu.models.database import Database  # noqa: F401
from privacy_preserving_sfm_tpu.models.correspondence_graph import (  # noqa: F401
    CorrespondenceGraph,
)
from privacy_preserving_sfm_tpu.models.reconstruction import (  # noqa: F401
    Camera, Image, Point3D, Reconstruction,
)
