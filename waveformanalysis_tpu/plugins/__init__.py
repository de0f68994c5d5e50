"""Plugin system: base class, specs, stats, loader, streaming."""

from waveformanalysis_tpu.plugins.base import Option, Plugin, option, takes_config
from waveformanalysis_tpu.plugins.spec import PluginSpec
from waveformanalysis_tpu.plugins.stats import PluginStatsCollector

__all__ = ["Plugin", "Option", "option", "takes_config", "PluginSpec", "PluginStatsCollector"]
