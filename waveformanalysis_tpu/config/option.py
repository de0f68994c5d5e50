"""Plugin configuration options.

Behavioral analog of the reference Option class
(reference: waveform_analysis/core/plugins/core/base.py:38-317): typed,
range/choice-validated options with unit auto-conversion, lineage tracking
flags, deprecation warnings, and the ``@option`` / ``@takes_config`` class
decorators.
"""

from __future__ import annotations

import logging
import warnings
from typing import Any, Callable, Dict, List, Optional, Tuple, Type, Union

from waveformanalysis_tpu.foundation.units import (
    StandardUnits,
    convert_frequency,
    convert_time,
)

logger = logging.getLogger(__name__)


class Option:
    """A configuration option declared by a plugin.

    Args:
        default: default value.
        type: expected type (int/float/bool/str/... or tuple of types); coercion
            from strings/numbers is attempted before rejecting.
        help: human-readable description.
        validate: custom predicate applied after all other checks.
        track: whether the value participates in lineage hashing.
        unit / internal_unit: user-facing vs stored unit; numeric values are
            auto-converted (time units ps..s, frequency units Hz..GHz).
        choices: allowed values.
        min_value / max_value: numeric range constraints.
        deprecated / deprecated_message: deprecation warning on use.
        alias: legacy name accepted for this option.
    """

    def __init__(
        self,
        default: Any = None,
        type: Optional[Union[Type, Tuple[Type, ...]]] = None,
        help: str = "",
        validate: Optional[Callable[[Any], bool]] = None,
        track: bool = True,
        unit: Optional[str] = None,
        internal_unit: Optional[str] = None,
        choices: Optional[List[Any]] = None,
        min_value: Optional[float] = None,
        max_value: Optional[float] = None,
        deprecated: bool = False,
        deprecated_message: str = "",
        alias: Optional[str] = None,
    ) -> None:
        self.default = default
        self.type = type
        self.help = help
        self.validate = validate
        self.track = track
        self.unit = unit
        self.internal_unit = internal_unit
        self.choices = choices
        self.min_value = min_value
        self.max_value = max_value
        self.deprecated = deprecated
        self.deprecated_message = deprecated_message
        self.alias = alias

    def _convert_unit(self, value: float, plugin_name: str, name: str) -> float:
        if self.unit is None or self.internal_unit is None or self.unit == self.internal_unit:
            return value
        if (
            self.unit in StandardUnits.TIME_TO_PS
            and self.internal_unit in StandardUnits.TIME_TO_PS
        ):
            return convert_time(value, self.unit, self.internal_unit)
        if (
            self.unit in StandardUnits.FREQ_TO_HZ
            and self.internal_unit in StandardUnits.FREQ_TO_HZ
        ):
            return convert_frequency(value, self.unit, self.internal_unit)
        logger.warning(
            "Plugin '%s' option '%s': cannot convert from '%s' to '%s'",
            plugin_name, name, self.unit, self.internal_unit,
        )
        return value

    def validate_value(self, name: str, value: Any, plugin_name: str = "unknown") -> Any:
        """Validate and convert a config value.

        Order: deprecation warning -> type coercion/check -> choices ->
        range -> unit conversion -> custom validator.
        """
        if self.deprecated:
            msg = f"Plugin '{plugin_name}' option '{name}' is deprecated."
            if self.deprecated_message:
                msg += f" {self.deprecated_message}"
            warnings.warn(msg, DeprecationWarning, stacklevel=4)

        if value is None and self.default is None:
            return None

        if self.type is not None and not isinstance(value, self.type):
            try:
                if self.type is int:
                    value = int(value)
                elif self.type is float:
                    value = float(value)
                elif self.type is bool:
                    if isinstance(value, str):
                        value = value.lower() in ("true", "1", "yes", "on")
                    else:
                        value = bool(value)
            except (ValueError, TypeError):
                pass

        if self.type is not None and not isinstance(value, self.type):
            raise TypeError(
                f"Plugin '{plugin_name}' option '{name}' must be of type {self.type}, "
                f"but got {builtins_type_name(value)} (value: {value!r})"
            )

        if self.choices is not None and value not in self.choices:
            raise ValueError(
                f"Plugin '{plugin_name}' option '{name}' must be one of {self.choices}, "
                f"but got {value!r}"
            )

        if isinstance(value, (int, float)) and not isinstance(value, bool):
            if self.min_value is not None and value < self.min_value:
                raise ValueError(
                    f"Plugin '{plugin_name}' option '{name}' must be >= {self.min_value}, "
                    f"but got {value}"
                )
            if self.max_value is not None and value > self.max_value:
                raise ValueError(
                    f"Plugin '{plugin_name}' option '{name}' must be <= {self.max_value}, "
                    f"but got {value}"
                )

        if isinstance(value, (int, float)) and self.unit and self.internal_unit:
            value = self._convert_unit(value, plugin_name, name)

        if self.validate is not None and not self.validate(value):
            raise ValueError(
                f"Plugin '{plugin_name}' option '{name}' failed validation for value: {value!r}"
            )

        return value

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"Option(default={self.default!r}, type={self.type}, track={self.track})"


def builtins_type_name(value: Any) -> str:
    return type(value).__name__


def option(name: str, **kwargs: Any):
    """Class decorator adding a single Option to a Plugin class."""

    def decorator(cls):
        if "options" not in cls.__dict__:
            cls.options = dict(getattr(cls, "options", {}))
        cls.options[name] = Option(**kwargs)
        return cls

    return decorator


def takes_config(config_dict: Dict[str, Option]):
    """Class decorator adding multiple Options to a Plugin class."""

    def decorator(cls):
        if "options" not in cls.__dict__:
            cls.options = dict(getattr(cls, "options", {}))
        cls.options.update(config_dict)
        return cls

    return decorator
