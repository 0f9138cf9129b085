"""Cross-cutting utilities: checkpoint migration, profiling, logging."""

from galaxy_deconv_tpu.utils.convert_torch import (
    convert_resunet_state_dict,
    convert_tikhonet_state_dict,
    convert_xdense_state_dict,
    load_reference_tikhonet,
)
from galaxy_deconv_tpu.utils.profiling import profile_trace
from galaxy_deconv_tpu.utils.watchdog import STALL_EXIT_CODE, StallWatchdog

__all__ = [
    "STALL_EXIT_CODE",
    "StallWatchdog",
    "convert_resunet_state_dict",
    "convert_tikhonet_state_dict",
    "convert_xdense_state_dict",
    "load_reference_tikhonet",
    "profile_trace",
]
