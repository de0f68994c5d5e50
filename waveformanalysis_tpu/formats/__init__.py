"""DAQ format adapters: specs, readers, directory layouts, registry."""

from waveformanalysis_tpu.formats.adapter import (
    DAQAdapter,
    get_adapter,
    is_adapter_registered,
    list_adapters,
    register_adapter,
    unregister_adapter,
)
from waveformanalysis_tpu.formats.base import (
    ColumnMapping,
    FormatReader,
    FormatSpec,
    RawTimestampMode,
)
from waveformanalysis_tpu.formats.directory import DirectoryLayout
from waveformanalysis_tpu.foundation.units import TimestampUnit

__all__ = [
    "DAQAdapter",
    "register_adapter",
    "get_adapter",
    "list_adapters",
    "is_adapter_registered",
    "unregister_adapter",
    "FormatSpec",
    "FormatReader",
    "ColumnMapping",
    "RawTimestampMode",
    "TimestampUnit",
    "DirectoryLayout",
]
