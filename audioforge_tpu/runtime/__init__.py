"""Runtime: the compiled chain step, the processor runtime, control and
metrics plumbing, supervision/recovery, and the stress harness."""

from . import chain  # noqa: F401
from . import live_chain  # noqa: F401
from .processor import (  # noqa: F401
    AudioProcessor,
    DeviceInfo,
    list_input_devices,
    list_output_devices,
    register_virtual_input,
    register_virtual_output,
)
from .ringbuffer import AudioRing, native_ring_available  # noqa: F401
from .serving import ServingConfig, ServingEngine  # noqa: F401
