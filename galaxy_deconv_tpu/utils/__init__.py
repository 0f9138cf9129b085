"""Cross-cutting utilities: checkpoint migration, profiling, logging."""

from galaxy_deconv_tpu.utils.convert_torch import (
    convert_resunet_state_dict,
    convert_tikhonet_state_dict,
    convert_xdense_state_dict,
    load_reference_tikhonet,
)
from galaxy_deconv_tpu.utils.profiling import profile_trace

__all__ = [
    "convert_resunet_state_dict",
    "convert_tikhonet_state_dict",
    "convert_xdense_state_dict",
    "load_reference_tikhonet",
    "profile_trace",
]
