"""Four-view initializer from gravity-aligned + random lines.

The unique bootstrap of the privacy-preserving pipeline (reference
``src/init/``): gravity-aligned lines become 2D bearing observations in the
horizontal plane; a 2D trifocal tensor over three views plus a 2D absolute
pose for the fourth yields an up-to-scale planar reconstruction; the missing
vertical offsets are then solved linearly from the *random* lines.
"""

from privacy_preserving_sfm_tpu.init import sfm2d  # noqa: F401
from privacy_preserving_sfm_tpu.init import initializer  # noqa: F401
