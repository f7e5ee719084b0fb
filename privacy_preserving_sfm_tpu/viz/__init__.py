"""Headless model visualization (the GUI-replacement subsystem)."""

from privacy_preserving_sfm_tpu.viz.render import (  # noqa: F401
    render_model, render_turntable,
)
