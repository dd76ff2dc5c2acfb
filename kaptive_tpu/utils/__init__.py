r"""Shared utilities: profiling/tracing hooks (SURVEY §5 observability)."""

from kaptive_tpu.utils.profiling import (  # noqa: F401
    device_trace,
    phase_report,
    phase_timer,
    phases_enabled,
    reset_phases,
)
