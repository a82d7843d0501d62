"""Runtime: the compiled chain step, the processor runtime, control and
metrics plumbing, supervision/recovery, and the stress harness."""

from . import chain  # noqa: F401
