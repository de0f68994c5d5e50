"""Exception hierarchy and error severity model.

Mirrors the behavior of the reference exception layer
(reference: waveform_analysis/core/foundation/exceptions.py): a severity enum
drives how the execution engine reacts to plugin failures (FATAL aborts the
run, RECOVERABLE lets the scheduler continue / retry).
"""

from __future__ import annotations

import enum
from typing import Any, Optional


class ErrorSeverity(enum.Enum):
    """Severity classes for plugin errors."""

    FATAL = "fatal"
    RECOVERABLE = "recoverable"
    WARNING = "warning"


class WaveformAnalysisError(Exception):
    """Base class for all framework errors."""


class PluginError(WaveformAnalysisError):
    """Error raised by / attributed to a plugin execution.

    Attributes:
        plugin_name: provides-name of the failing plugin.
        severity: how the executor should react.
        recoverable: convenience flag (severity != FATAL).
        context: optional structured diagnostic snapshot.
    """

    def __init__(
        self,
        message: str,
        plugin_name: str = "",
        severity: ErrorSeverity = ErrorSeverity.FATAL,
        context: Optional[dict[str, Any]] = None,
        cause: Optional[BaseException] = None,
    ) -> None:
        super().__init__(message)
        self.plugin_name = plugin_name
        self.severity = severity
        self.context = context or {}
        self.cause = cause

    @property
    def recoverable(self) -> bool:
        return self.severity is not ErrorSeverity.FATAL

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        base = super().__str__()
        if self.plugin_name:
            return f"[{self.plugin_name}] {base}"
        return base


class ConfigError(WaveformAnalysisError):
    """Invalid or unresolvable configuration."""


class StorageError(WaveformAnalysisError):
    """Storage backend failure."""


class CacheError(StorageError):
    """Cache lookup / consistency failure."""


class ValidationError(WaveformAnalysisError):
    """Data contract violation (dtype/shape/time-ordering)."""


class CancelledError(WaveformAnalysisError):
    """Raised when a cancellation token fires mid-task."""


class TimeoutError_(WaveformAnalysisError):
    """Raised when a plugin exceeds its execution timeout."""
