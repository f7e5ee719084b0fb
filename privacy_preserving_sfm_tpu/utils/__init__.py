"""Runtime utilities: configuration, timing, logging.

Counterpart of ``src/util/`` minus what JAX/Python already provide
(threading pools, PRNG wrappers, OpenGL plumbing).
"""

from privacy_preserving_sfm_tpu.utils.config import AllOptions  # noqa: F401
from privacy_preserving_sfm_tpu.utils.timer import Timer  # noqa: F401
