"""Config resolution result types.

Behavioral analog of the reference config types
(reference: waveform_analysis/core/config/types.py:16-272): each resolved
value carries its source (explicit / adapter-inferred / plugin-default), the
original vs canonical key, and the inference provenance — these feed both
debugging summaries and the lineage dict.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional, Tuple


class ConfigSource(enum.Enum):
    EXPLICIT = "explicit"
    PLUGIN_DEFAULT = "plugin_default"
    ADAPTER_INFERRED = "adapter_inferred"
    GLOBAL_DEFAULT = "global_default"


@dataclass
class ConfigValue:
    """A single resolved configuration value with provenance."""

    value: Any
    source: ConfigSource
    original_key: str
    canonical_key: str
    inferred_from: Optional[str] = None

    def summary(self) -> str:
        value_str = repr(self.value)
        if len(value_str) > 50:
            value_str = value_str[:47] + "..."
        if self.source == ConfigSource.EXPLICIT:
            return f"{value_str} (explicit)"
        if self.source == ConfigSource.PLUGIN_DEFAULT:
            return f"{value_str} (default)"
        if self.source == ConfigSource.ADAPTER_INFERRED:
            if self.inferred_from:
                return f"{value_str} (inferred from {self.inferred_from})"
            return f"{value_str} (inferred)"
        if self.source == ConfigSource.GLOBAL_DEFAULT:
            return f"{value_str} (global default)"
        return value_str

    def is_explicit(self) -> bool:
        return self.source == ConfigSource.EXPLICIT

    def is_inferred(self) -> bool:
        return self.source == ConfigSource.ADAPTER_INFERRED


@dataclass
class ResolvedConfig:
    """All resolved config values for one plugin."""

    plugin_name: str
    values: Dict[str, ConfigValue] = field(default_factory=dict)
    adapter_name: Optional[str] = None

    def get(self, key: str, default: Any = None) -> Any:
        if key in self.values:
            return self.values[key].value
        return default

    def get_value(self, key: str) -> Optional[ConfigValue]:
        return self.values.get(key)

    def __getitem__(self, key: str) -> Any:
        if key not in self.values:
            raise KeyError(
                f"Config key '{key}' not found in resolved config for '{self.plugin_name}'"
            )
        return self.values[key].value

    def __contains__(self, key: str) -> bool:
        return key in self.values

    def keys(self) -> List[str]:
        return list(self.values.keys())

    def items(self) -> Iterator[Tuple[str, Any]]:
        for key, cv in self.values.items():
            yield key, cv.value

    def to_dict(self) -> Dict[str, Any]:
        return {key: cv.value for key, cv in self.values.items()}

    def to_lineage_dict(self, include_non_tracked: bool = False) -> Dict[str, Any]:
        """Config dict for lineage: explicit + inferred values only (unless
        include_non_tracked)."""
        result = {}
        for key, cv in self.values.items():
            if cv.source in (ConfigSource.EXPLICIT, ConfigSource.ADAPTER_INFERRED):
                result[key] = cv.value
            elif include_non_tracked:
                result[key] = cv.value
        return result

    def get_explicit_values(self) -> Dict[str, Any]:
        return {k: cv.value for k, cv in self.values.items() if cv.source == ConfigSource.EXPLICIT}

    def get_inferred_values(self) -> Dict[str, Any]:
        return {
            k: cv.value
            for k, cv in self.values.items()
            if cv.source == ConfigSource.ADAPTER_INFERRED
        }

    def get_default_values(self) -> Dict[str, Any]:
        return {
            k: cv.value
            for k, cv in self.values.items()
            if cv.source == ConfigSource.PLUGIN_DEFAULT
        }

    def summary(self, verbose: bool = False) -> str:
        lines = [f"ResolvedConfig for '{self.plugin_name}'"]
        if self.adapter_name:
            lines.append(f"  Adapter: {self.adapter_name}")
        lines.append("")
        groups = {"Explicit": [], "Inferred from adapter": [], "Defaults": []}
        for key, cv in sorted(self.values.items()):
            if cv.source == ConfigSource.EXPLICIT:
                groups["Explicit"].append((key, cv))
            elif cv.source == ConfigSource.ADAPTER_INFERRED:
                groups["Inferred from adapter"].append((key, cv))
            else:
                groups["Defaults"].append((key, cv))
        for title, rows in groups.items():
            if not rows or (title == "Defaults" and not verbose):
                continue
            lines.append(f"  {title}:")
            for key, cv in rows:
                lines.append(f"    {key}: {cv.summary() if verbose else repr(cv.value)}")
        return "\n".join(lines)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"ResolvedConfig(plugin='{self.plugin_name}', keys={list(self.values.keys())})"
